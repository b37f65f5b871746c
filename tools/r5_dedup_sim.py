"""Cross-depth hit-point dedup rate (VERDICT r4 item 6, second half).

The only sampling cost lever left is fewer gather rows (per-row cost is
the measured floor). This sim measures how many depth-1 reflection-hit
sampling rows (heap row = level_offset[slot] + yi*w + xi) coincide with
the SAME pixel's depth-0 row — the only dedup a zero-movement
(elementwise-select) scheme could exploit. Cross-PIXEL dedup would need
per-ray compaction, whose measured roundtrip (26.6 ms, lanesort) already
exceeds the 2x2 quad-dedupe ceiling (~25 ms, tools/r5_hw_queue4.py
sample_gather_rows_082N) — recorded dead in BASELINE.md.

CPU interpret run at 480x270 (row-index stats are resolution-stable).

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
       python -u tools/r5_dedup_sim.py
"""
import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.rt.dense import trace_dense
from vkrt_tpu.shade import shading
from vkrt_tpu.utils import layout as L
from vkrt_tpu.wavefront.engine import (cached_backend, camera_ray_blocks,
                                       _broadcast_points)

SCENE = "/root/reference/models/sponza/Sponza.gltf"
W, H = 480, 272


def rows_for(tex, slot_ids, uv, hit):
    off = np.asarray(tex.level_offset)[slot_ids, 0]
    w = np.asarray(tex.level_width)[slot_ids, 0]
    h = np.asarray(tex.level_height)[slot_ids, 0]
    x = uv[0] * w - 0.5
    y = uv[1] * h - 0.5
    xi = np.mod(np.floor(x).astype(np.int64), np.maximum(w, 1))
    yi = np.mod(np.floor(y).astype(np.int64), np.maximum(h, 1))
    r = off + yi * w + xi
    return np.where(hit, r, -1)


def main():
    flat, tex, backend = cached_backend(SCENE, 256, "dense")
    cfg = C.config4_flythrough()
    import dataclasses
    cfg = dataclasses.replace(cfg, width=W, height=H)
    cam = Camera(W, H)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)
    op, d0, active0 = jax.jit(
        functools.partial(camera_ray_blocks, cfg=cfg))(pi, vi)
    o0 = _broadcast_points(
        jnp.broadcast_to(op[None, :], (d0.shape[1] * 128 // 512, 3)), d0)

    def depth_state(o, d, act):
        tm = jnp.where(act, C.RAY_TMAX, 0.0)
        t, slot, u, v, attrs = trace_dense(backend.tree, o, d, tm,
                                           with_attributes=True,
                                           interpret=True)
        hit = (slot >= 0) & act
        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        return t, hit, pos, normal, tangent, uv, mat_ids, attrs

    t, hit0, pos, normal, tangent, uv0, mat0, attrs = depth_state(
        o0, d0, active0)
    # reflection continuation (engine.py metallic threshold path)
    from vkrt_tpu.shade.sampling import sample_material
    _, mr4, nmap4 = sample_material(
        tex.texels_tri, tex.level_offset, tex.level_width,
        tex.level_height, jnp.where(hit0, mat0[0], 0),
        jnp.where(hit0[None], uv0, 0.0))
    pn = shading.perturbed_normal(normal, tangent, nmap4[:3])
    refl = hit0 & (mr4[2] > C.METALLIC_THRESHOLD)
    o1 = L.where3(refl, pos, o0)
    d1 = L.where3(refl, shading.reflect(d0, pn), d0)
    _, hit1, _, _, _, uv1, mat1, _ = depth_state(o1, d1, refl)

    h0 = np.asarray(hit0)
    h1 = np.asarray(hit1)
    r0 = rows_for(tex, np.asarray(mat0[0]), np.asarray(uv0), h0)
    r1 = rows_for(tex, np.asarray(mat1[0]), np.asarray(uv1), h1)
    live1 = h1
    same_pixel_dup = (r1 == r0) & live1
    # cross-pixel global dup among depth-1 rows (upper bound for ANY
    # dedup scheme, movement aside)
    rows1 = r1[live1]
    uniq = len(np.unique(rows1))
    out = {"sim": "cross_depth_dedup", "res": f"{W}x{H}",
           "d0_hits": int(h0.sum()), "d1_hits": int(live1.sum()),
           "d1_rows_eq_d0_same_pixel": int(same_pixel_dup.sum()),
           "same_pixel_dup_frac": round(
               float(same_pixel_dup.sum()) / max(int(live1.sum()), 1), 4),
           "d1_unique_rows": uniq,
           "d1_global_dup_frac": round(1.0 - uniq / max(len(rows1), 1), 4)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
