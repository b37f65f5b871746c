"""Multi-segment vs per-light occlusion on the REAL 1080p shadow state."""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
from vkrt_tpu.wavefront.engine import (camera_ray_blocks, load_scene_assets,
                                       make_backend)

SCENE = "/root/reference/models/sponza/Sponza.gltf"


def tmr(name, jf, *args):
    r = jf(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            r = jf(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / 3)
    print(json.dumps({"step": name, "ms": round(best * 1e3, 1)}), flush=True)
    return r


def main():
    flat, tex, _ = load_scene_assets(SCENE, 64)
    backend = make_backend(flat, "dense")
    tree = backend.tree
    cfg = C.config4_flythrough()
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)
    nl = cfg.num_lights
    lights = jnp.asarray(C.LIGHT_POSITIONS)[:nl]

    op, d, valid = jax.jit(functools.partial(camera_ray_blocks, cfg=cfg))(
        pi, vi)
    nb = d.shape[1]
    o_full = jnp.broadcast_to(op[:, None, None], (3, nb, 128))

    def shadow_state(tree, tex, o_full, d, valid):
        tmax = jnp.where(valid, C.RAY_TMAX, 0.0)
        t, slot, u, v, attrs = trace_dense(tree, o_full, d, tmax,
                                           with_attributes=True)
        hit = (slot >= 0) & valid
        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        _, mr4, nmap4 = sample_material(tex.texels_tri, tex.level_offset,
                                        tex.level_width, tex.level_height,
                                        mat_ids[0], uv)
        pn = shading.perturbed_normal(normal, tangent, nmap4[:3])
        geo = [shading.light_geometry(pos, lights[li]) for li in range(nl)]
        casts = [hit & (L.dot3(pn, g[0]) > 0) for g in geo]
        sd = jnp.stack([-g[0] for g in geo])                 # [NS,3,Nb,128]
        st = jnp.stack([jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                        for c, g in zip(casts, geo)])        # [NS,Nb,128]
        return sd, st

    sd0, st0 = jax.jit(shadow_state)(tree, tex, o_full, d, valid)

    # per-light baseline (current production: concat + block 1024)
    for blk in (1024,):
        per_light = nb * 128 // blk
        so_pts = jnp.concatenate(
            [jnp.broadcast_to(lights[li][None, :], (per_light, 3))
             for li in range(nl)], axis=0)
        sdc = jnp.concatenate(list(sd0), axis=1)
        stc = jnp.concatenate(list(st0), axis=0)

        def occl(tree, so_pts, sd, st, b=blk):
            return trace_dense(tree, so_pts, sd, st, occlusion=True,
                               point_origin=True, block=b)[1]

        tmr(f"perlight_block{blk}", jax.jit(occl), tree, so_pts, sdc, stc)

    for blk in (512, 1024):
        def om(tree, lights, sd, st, b=blk):
            return occluded_multi(tree, lights, sd, st, block=b)

        tmr(f"multi_block{blk}", jax.jit(om), tree, lights, sd0, st0)

    # spot-parity on the real state
    occ_m = jax.jit(lambda tr, li, sd, st: occluded_multi(
        tr, li, sd, st, block=512))(tree, lights, sd0, st0)
    per_light = nb * 128 // 1024
    so_pts = jnp.concatenate(
        [jnp.broadcast_to(lights[li][None, :], (per_light, 3))
         for li in range(nl)], axis=0)
    occ_p = jax.jit(lambda tr, so, sd, st: trace_dense(
        tr, so, sd, st, occlusion=True, point_origin=True,
        block=1024)[1])(tree, so_pts, jnp.concatenate(list(sd0), axis=1),
                        jnp.concatenate(list(st0), axis=0))
    occ_p = (np.asarray(occ_p) >= 0).reshape(4, -1, 128)
    agree = float((np.asarray(occ_m) == occ_p).mean())
    print(json.dumps({"step": "parity_real", "agree": agree,
                      "blocked_multi": int(np.asarray(occ_m).sum()),
                      "blocked_perlight": int(occ_p.sum())}), flush=True)


if __name__ == "__main__":
    main()
