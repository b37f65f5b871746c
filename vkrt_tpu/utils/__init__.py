from vkrt_tpu.utils.log import get_logger, check
from vkrt_tpu.utils import mathutils

__all__ = ["get_logger", "check", "mathutils"]
