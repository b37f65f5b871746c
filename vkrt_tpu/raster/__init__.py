from vkrt_tpu.raster.pipeline import render_raster_frame, Rasterizer

__all__ = ["render_raster_frame", "Rasterizer"]
