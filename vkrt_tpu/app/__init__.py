from vkrt_tpu.app.camera import Camera

__all__ = ["Camera"]
