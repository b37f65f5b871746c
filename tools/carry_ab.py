"""A/B: depth-1 closest cost with the two dead-ray carry rules.

A (old): dead rays keep camera origin/dir; only reflective rays carry
         reflection geometry.
B (new): every HIT ray carries reflection geometry (dead ones at tmax=0).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vkrt_tpu import config as C
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.rt.dense import trace_dense
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

    def d0(tree, tex, o_full, d, valid):
        tmax = jnp.where(valid, C.RAY_TMAX, 0.0)
        t, slot, u, v, attrs = trace_dense(tree, o_full, d, tmax,
                                           with_attributes=True)
        hit = (slot >= 0) & valid
        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        _, mr4, nmap4 = sample_material(tex.texels_tri, tex.level_offset,
                                        tex.level_width, tex.level_height,
                                        mat_ids[0], uv)
        pn = shading.perturbed_normal(normal, tangent, nmap4[:3])
        reflective = hit & (mr4[2] > C.METALLIC_THRESHOLD)
        rdir = shading.reflect(d, pn)
        return pos, rdir, hit, reflective

    pos, rdir, hit, refl = jax.jit(d0)(tree, tex, o_full, d, valid)

    oA = L.where3(refl, pos, o_full)
    dA = L.where3(refl, rdir, d)
    oB = L.where3(hit, pos, o_full)
    dB = L.where3(hit, rdir, d)

    def closest(tree, o, d, act):
        tm = jnp.where(act, C.RAY_TMAX, 0.0)
        return trace_dense(tree, o, d, tm, with_attributes=True)

    cj = jax.jit(closest)
    if not os.environ.get("ONLY_BLOCKS"):
        tmr("closest_d1_carryA_reflonly", cj, tree, oA, dA, refl)
        tmr("closest_d1_carryB_allhit", cj, tree, oB, dB, refl)

    def shadows(tree, attrs_in):
        o, dd, act = attrs_in
        t, slot, u, v, attrs = trace_dense(tree, o, dd,
                                           jnp.where(act, C.RAY_TMAX, 0.0),
                                           with_attributes=True)
        hit2 = (slot >= 0) & act
        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        _, mr4, nmap4 = sample_material(tex.texels_tri, tex.level_offset,
                                        tex.level_width, tex.level_height,
                                        mat_ids[0], uv)
        pn = shading.perturbed_normal(normal, tangent, nmap4[:3])
        geo = [shading.light_geometry(pos, lights[li]) for li in range(nl)]
        casts = [hit2 & (L.dot3(pn, g[0]) > 0) for g in geo]
        nbl = nb * 128 // 512
        so_pts = jnp.concatenate(
            [jnp.broadcast_to(lights[li][None, :], (nbl, 3))
             for li in range(nl)], axis=0)
        sd = jnp.concatenate([-g[0] for g in geo], axis=1)
        st = jnp.concatenate([jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                              for c, g in zip(casts, geo)], axis=0)
        _, oslot, _, _ = trace_dense(tree, so_pts, sd, st, occlusion=True,
                                     point_origin=True)
        return jnp.sum(oslot >= 0)

    sj = jax.jit(shadows)
    if not os.environ.get("ONLY_BLOCKS"):
        tmr("d1_trace_shade_shadow_A", sj, tree, (oA, dA, refl))
        tmr("d1_trace_shade_shadow_B", sj, tree, (oB, dB, refl))

    # --- occlusion block-size sweep on REAL depth-0 shadow state ---
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
        sd = jnp.concatenate([-g[0] for g in geo], axis=1)
        st = jnp.concatenate([jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                              for c, g in zip(casts, geo)], axis=0)
        return sd, st

    sd0, st0 = jax.jit(shadow_state)(tree, tex, o_full, d, valid)
    for blk in (512, 1024, 2048):
        per_light = nb * 128 // blk      # blocks per light SECTION
        so_pts = jnp.concatenate(
            [jnp.broadcast_to(lights[li][None, :], (per_light, 3))
             for li in range(nl)], axis=0)

        def occl(tree, so_pts, sd, st, b=blk):
            return trace_dense(tree, so_pts, sd, st, occlusion=True,
                               point_origin=True, block=b)[1]

        try:
            tmr(f"shadow_occl_block{blk}", jax.jit(occl), tree, so_pts,
                sd0, st0)
        except Exception as e:  # VMEM OOM etc.
            print(json.dumps({"step": f"shadow_occl_block{blk}",
                              "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
