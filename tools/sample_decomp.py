"""Decompose the depth-0 sampling floor (~128 ms at 1080p, round 3).

sample_material is believed gather-bound (~60ns/row x 2.07M rows), but
the round-2 microbench measured ~34ns/row — a 2x gap. Splits:

  1. full sample_material (reference point)
  2. gather-only (rows fetched + summed, no lerp math)
  3. lerp-only (fixed row index 0 — math cost without random access)
  4. gather from an i32[N,12] bitcast view (dtype vs row cost)
  5. gather from a small (1M-row) table vs the real heap (table-size /
     TLB effect on per-row cost)
  6. 2x2 pixel-quad texel-uniformity (numpy): fraction of quads whose 4
     rays land in the same texel cell — the share of rows a
     quad-representative gather + compacted fixup could save

Run: python -u tools/sample_decomp.py > /tmp/sdec.out 2>&1
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.rt.dense import trace_dense
from vkrt_tpu.shade import shading
from vkrt_tpu.shade.sampling import sample_material
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import (cached_backend, camera_ray_blocks,
                                       _broadcast_points)

SCENE = "/root/reference/models/sponza/Sponza.gltf"
BLOCK = 512


def tmr(name, jf, *args, extra=None):
    r = jf(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            r = jf(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / 3)
    out = {"step": name, "ms": round(best * 1e3, 1)}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)
    return r


def main():
    enable_compilation_cache()
    flat, tex, backend = cached_backend(SCENE, 512, "dense")
    tree = backend.tree
    cfg = C.config4_flythrough()
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)

    op, d0, active0 = jax.jit(
        functools.partial(camera_ray_blocks, cfg=cfg))(pi, vi)

    def hit_state(tree, op, d, act):
        o = _broadcast_points(
            jnp.broadcast_to(op[None, :], (d.shape[1] * 128 // BLOCK, 3)), d)
        tm = jnp.where(act, C.RAY_TMAX, 0.0)
        t, slot, u, v, attrs = trace_dense(tree, o, d, tm,
                                           with_attributes=True)
        hit = (slot >= 0) & act
        _, _, uv, _, mat_ids = shading.interpolate(attrs, u, v)
        return (jnp.where(hit, mat_ids[0], 0),
                jnp.where(hit[None], uv, 0.0), hit)

    slot_ids, uv, hit = jax.jit(hit_state)(tree, op, d0, active0)
    jax.block_until_ready(uv)
    n_rays = slot_ids.size
    heap_rows = tex.texels_tri.shape[0]
    print(json.dumps({"n_rays": int(n_rays), "heap_rows": int(heap_rows),
                      "heap_mb": round(heap_rows * 48 / 1e6, 1)}), flush=True)

    # 1. full sampler
    samp_j = jax.jit(lambda tt, s, u: sample_material(
        tt, tex.level_offset, tex.level_width, tex.level_height, s, u))
    tmr("sample_full", samp_j, tex.texels_tri, slot_ids, uv)

    # row indices exactly as the sampler computes them
    def row_idx(s, u):
        off = tex.level_offset[s, 0]
        w = tex.level_width[s, 0]
        h = tex.level_height[s, 0]
        x = u[0] * w - 0.5
        y = u[1] * h - 0.5
        xi = jnp.mod(jnp.floor(x).astype(jnp.int32), w)
        yi = jnp.mod(jnp.floor(y).astype(jnp.int32), h)
        return off + yi * w + xi

    idx = jax.jit(row_idx)(slot_ids, uv)
    jax.block_until_ready(idx)

    # 2. gather-only
    g_j = jax.jit(lambda tt, i: jnp.sum(tt[i].astype(jnp.float32)))
    tmr("gather_only_u8x48", g_j, tex.texels_tri, idx)

    # 3. lerp-only (index forced to a constant -> no random access)
    zt_j = jax.jit(lambda tt, s, u: sample_material(
        tt, tex.level_offset, tex.level_width, tex.level_height,
        jnp.zeros_like(s), jnp.zeros_like(u)))
    tmr("sample_const_idx", zt_j, tex.texels_tri, slot_ids, uv)

    # 4. dtype: same rows as i32[N,12]
    t_i32 = jnp.asarray(
        np.ascontiguousarray(np.asarray(tex.texels_tri)).view(np.int32))
    gi_j = jax.jit(lambda tt, i: jnp.sum(tt[i]))
    tmr("gather_only_i32x12", gi_j, t_i32, idx)
    # ... and f32[N,12] bitcast
    t_f32 = jax.lax.bitcast_convert_type(
        t_i32, jnp.float32)
    gf_j = jax.jit(lambda tt, i: jnp.sum(jnp.abs(tt[i])))
    tmr("gather_only_f32x12", gf_j, t_f32, idx)

    # 5. table size: same index COUNT into a small 1M-row u8 table
    small = tex.texels_tri[:1_000_000]
    idx_small = jnp.mod(idx, 1_000_000)
    jax.block_until_ready(idx_small)
    tmr("gather_small_table", g_j, small, idx_small)
    # and a coherent (sorted-ish) pattern on the real heap: rows in
    # ascending order, same count
    idx_sorted = jnp.sort(idx.reshape(-1)).reshape(idx.shape)
    jax.block_until_ready(idx_sorted)
    tmr("gather_sorted_idx", g_j, tex.texels_tri, idx_sorted)

    # 6. quad-uniformity (numpy, on the tile layout): lanes are 8x16
    # subtiles (engine.tile) — a 2x2 pixel quad = lanes (2r, 2r+1) x
    # (2c, 2c+1) within the 8x16 group? The tile transform packs pixels
    # row-major inside each group: lane = py*16+px for the 8x16 group.
    iarr = np.asarray(idx)  # [Nb,128]
    lanes = iarr.reshape(-1, 8, 16)
    q = lanes.reshape(-1, 4, 2, 8, 2)  # [rows4, py2, cols8, px2]
    uniform = ((q == q[:, :, :1, :, :1]).all(axis=(2, 4))).mean()
    print(json.dumps({"quad_uniform_frac": round(float(uniform), 4)}),
          flush=True)


if __name__ == "__main__":
    main()
