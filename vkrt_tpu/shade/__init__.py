from vkrt_tpu.shade.sampling import sample_material
from vkrt_tpu.shade import shading

__all__ = ["sample_material", "shading"]
