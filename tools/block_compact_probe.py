"""Cost structure of sparse/incoherent depth-1 dispatches (round 3).

Stage 1 findings (this file's first version, measured):
  d1 live rays 15.1%, live rows 25.7%, live 512-blocks 35.0%
  closest_d1 full 150.1ms | conditioned 145.5 | packed-live-blocks 145.8
  stats: live blocks sweep 41.9 clusters (vs ~8 coherent d0), dead sweep 0
  -> block compaction & mean-ray conditioning are DEAD ENDS: dead blocks
     are already free (tmax=0 parking); the cost is live incoherent
     blocks' sweep count.

Stage 2 (this version): the real depth-1 SHADOW cost (stage 1 used a
0.5-constant normal map -> degenerate perturbed normal -> zero casts),
and whether SMALLER trace blocks (tighter cones -> fewer gated clusters
per block) pay for their extra per-block fixed costs on incoherent work.
Run: python -u tools/block_compact_probe.py > /tmp/bcp2.out 2>&1
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
from vkrt_tpu.rt.occl_multi import occluded_multi
from vkrt_tpu.shade import shading
from vkrt_tpu.shade.sampling import sample_material
from vkrt_tpu.utils import layout as L
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
    lights = jnp.asarray(C.LIGHT_POSITIONS)[:cfg.num_lights]
    nl = cfg.num_lights

    op, d0, active0 = jax.jit(
        functools.partial(camera_ray_blocks, cfg=cfg))(pi, vi)
    nb = d0.shape[1]

    # ---- real depth-0 and depth-1 state (engine construction, real pn) ---
    def frame_state(tree, tex, op, d, act):
        o = _broadcast_points(
            jnp.broadcast_to(op[None, :], (d.shape[1] * 128 // BLOCK, 3)), d)
        tm = jnp.where(act, C.RAY_TMAX, 0.0)
        t, slot, u, v, attrs = trace_dense(tree, o, d, tm,
                                           with_attributes=True)
        hit = (slot >= 0) & act
        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        _, mr4, nmap4 = sample_material(
            tex.texels_tri, tex.level_offset, tex.level_width,
            tex.level_height, jnp.where(hit, mat_ids[0], 0),
            jnp.where(hit[None], uv, 0.0))
        pn = shading.perturbed_normal(normal, tangent, nmap4[:3])
        geo = [shading.light_geometry(pos, lights[li]) for li in range(nl)]
        casts = [hit & (L.dot3(pn, g[0]) > 0) for g in geo]
        sd = jnp.stack([-g[0] for g in geo])
        st = jnp.stack([jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                        for c, g in zip(casts, geo)])
        refl = hit & (mr4[2] > C.METALLIC_THRESHOLD)
        o1 = L.where3(refl, pos, o)
        d1 = L.where3(refl, shading.reflect(d, pn), d)
        return sd, st, o1, d1, refl

    state_j = jax.jit(frame_state)
    sd0, st0, o1, d1, refl = state_j(tree, tex, op, d0, active0)
    sd1, st1, _, _, _ = state_j(tree, tex, op, d1, refl)
    tm1 = jnp.where(refl, C.RAY_TMAX, 0.0)

    for name, st in (("sh0", st0), ("sh1", st1)):
        s = np.asarray(st)
        for ob in (1024, 512):
            bl = (s > 0).any(axis=(0, 2)).reshape(-1, ob // 128).any(axis=1)
            print(json.dumps({
                f"{name}_live_rays": round(float((s > 0).mean()), 4),
                f"{name}_live_blocks_{ob}": round(float(bl.mean()), 4)}),
                flush=True)

    # ---- occlusion: block-size sweep on real d0 + d1 segment sets ----
    for ob in (1024, 512):
        occl_j = jax.jit(functools.partial(occluded_multi, block=ob))
        tmr(f"shadow_d0_multi_b{ob}", occl_j, tree, lights, sd0, st0)
        tmr(f"shadow_d1_multi_b{ob}", occl_j, tree, lights, sd1, st1)
        if ob == 1024:
            # packed live 1024-blocks at depth 1 (upper bound for block
            # compaction on the shadow pass)
            s = np.asarray(st1)
            bl = (s > 0).any(axis=(0, 2)).reshape(-1, 8).any(axis=1)
            perm = np.argsort(~bl, kind="stable")
            snl = max(2, -(-int(bl.sum()) // 2) * 2)
            srows = (np.repeat(perm[:snl] * 8, 8)
                     + np.tile(np.arange(8), snl))
            sdp = jnp.asarray(np.asarray(sd1)[:, :, srows])
            stp = jnp.asarray(s[:, srows])
            tmr("shadow_d1_pack_b1024", occl_j, tree, lights, sdp, stp,
                extra={"blocks": snl, "of": nb * 128 // 1024})

    # ---- closest depth-1: block-size sweep ----
    def closest(blk):
        return jax.jit(functools.partial(
            lambda tree, o, d, tm: trace_dense(
                tree, o, d, tm, with_attributes=True, block=blk)))

    for blk in (512, 256, 128):
        tmr(f"closest_d1_b{blk}", closest(blk), tree, o1, d1, tm1)


if __name__ == "__main__":
    main()
