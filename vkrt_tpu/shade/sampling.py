"""Texture sampling — bilinear / repeat-wrap over the flat texel heap.

Implements the reference sampler's semantics (linear min/mag, repeat UVW,
no anisotropy — ref: src/Raytracer.cpp:436-458). `texture()` in a
ray-tracing stage has no derivatives, so the reference samples the base
mip; `lod` is exposed for completeness (mip chains are built by
scene/textures.py, matching the blit loop at src/Raytracer.cpp:572-640).

This is the XLA gather implementation — the correctness reference and the
default path. Gathers are slow on TPU (~30M rows/s measured), so the
performance plan is per-cluster texture tiles sampled inside the trace
kernel; this module remains the semantics oracle those tiles are tested
against.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(texels, level_offset, level_width, level_height,
                    tex_ids, uv, lod: int = 0):
    """texels u8[N,4]; tables i32[I,L]; tex_ids i32[M]; uv f32[M,2] → f32[M,4]."""
    off = level_offset[tex_ids, lod]
    w = level_width[tex_ids, lod]
    h = level_height[tex_ids, lod]

    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def texel(xi, yi):
        xi = jnp.mod(xi, w)
        yi = jnp.mod(yi, h)
        return texels[off + yi * w + xi].astype(jnp.float32) / 255.0

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)
