from vkrt_tpu.wavefront.engine import Renderer

__all__ = ["Renderer"]
