from vkrt_tpu.shade.sampling import sample_bilinear
from vkrt_tpu.shade import shading

__all__ = ["sample_bilinear", "shading"]
