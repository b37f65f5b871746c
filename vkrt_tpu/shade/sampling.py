"""Texture sampling — bilinear / repeat-wrap over the quad-texel heap.

Implements the reference sampler's semantics (linear min/mag, repeat UVW,
no anisotropy — ref: src/Raytracer.cpp:436-458). `texture()` in a
ray-tracing stage has no derivatives, so the reference samples the base
mip; `lod` is exposed for completeness (mip chains are built by
scene/textures.py, matching the blit loop at src/Raytracer.cpp:572-640).

TPU-shaped storage: the heap stores, for every texel, its full bilinear
2x2 quad with repeat wrap pre-applied (scene/textures.py quad_texels), so
one gather per sample fetches the whole footprint — measured TPU gather
cost is per-row (~34ns) regardless of row width, making this 4x cheaper
than 4 single-texel gathers at 4x memory.

Lane-major interface: tex_ids [Nb,128], uv [2,Nb,128] → rgba [4,Nb,128].
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(texels_quad, level_offset, level_width, level_height,
                    tex_ids, uv, lod: int = 0):
    off = level_offset[tex_ids, lod]         # [Nb,128] gathers (small table)
    w = level_width[tex_ids, lod]
    h = level_height[tex_ids, lod]

    x = uv[0] * w - 0.5
    y = uv[1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    xi = jnp.mod(x0, w)
    yi = jnp.mod(y0, h)
    quad = texels_quad[off + yi * w + xi]    # [Nb,128,16] u8
    q = quad.astype(jnp.float32) / 255.0
    c00, c10, c01, c11 = q[..., 0:4], q[..., 4:8], q[..., 8:12], q[..., 12:16]
    rgba = (c00 * ((1 - fx) * (1 - fy))[..., None]
            + c10 * (fx * (1 - fy))[..., None]
            + c01 * ((1 - fx) * fy)[..., None]
            + c11 * (fx * fy)[..., None])    # [Nb,128,4]
    return jnp.moveaxis(rgba, -1, 0)         # [4,Nb,128]
