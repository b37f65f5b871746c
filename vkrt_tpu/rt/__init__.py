from vkrt_tpu.rt.traverse import trace_closest, trace_occluded

__all__ = ["trace_closest", "trace_occluded"]
