"""Sub-rung bisect of the depth-0 round: where do the extra ~220ms
materialize when phases fuse into one graph?

a: raygen + closest                       (isolated: ~102)
b: a + interpolate + material sample      (isolated: +128)
c: b + light geo + shadow arrays + occl   (isolated: +48)
d: c + full shading accumulation + carry  (isolated: +trivial)
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


def main():
    flat, tex, _ = load_scene_assets(SCENE, 512)
    backend = make_backend(flat, "dense")
    tree = backend.tree
    cfg = C.config4_flythrough()
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)
    nl = cfg.num_lights
    lights = jnp.asarray(C.LIGHT_POSITIONS)[:nl]

    def stage(tree, tex, pi, vi, sub):
        op, d, valid = camera_ray_blocks(pi, vi, cfg=cfg)
        nb = d.shape[1]
        nblocks = nb * 128 // 512
        o_full = jnp.broadcast_to(op[:, None, None], (3, nb, 128))
        tmax = jnp.where(valid, C.RAY_TMAX, 0.0)
        t, slot, u, v, attrs = trace_dense(tree, o_full, d, tmax,
                                           with_attributes=True)
        hit = (slot >= 0) & valid
        if sub == "a":
            return t, slot
        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        base4, mr4, nmap4 = sample_material(
            tex.texels_tri, tex.level_offset, tex.level_width,
            tex.level_height, mat_ids[0], uv)
        if sub == "b":
            return base4, mr4, nmap4, pos
        pn = shading.perturbed_normal(normal, tangent, nmap4[:3])
        geo = [shading.light_geometry(pos, lights[li]) for li in range(nl)]
        ndotls = [L.dot3(pn, g[0]) for g in geo]
        casts = [hit & (nd > 0) for nd in ndotls]
        so_pts = jnp.concatenate(
            [jnp.broadcast_to(lights[li][None, :], (nblocks, 3))
             for li in range(nl)], axis=0)
        sd = jnp.concatenate([-g[0] for g in geo], axis=1)
        st = jnp.concatenate([jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                              for c, g in zip(casts, geo)], axis=0)
        _, oslot, _, _ = trace_dense(tree, so_pts, sd, st, occlusion=True,
                                     point_origin=True)
        if sub == "c":
            return oslot, base4
        occs = jnp.split(oslot >= 0, nl, axis=0)
        base = base4[:3]
        att = jnp.ones((nb, 128), jnp.float32)
        total_light = jnp.zeros_like(u)
        for li in range(nl):
            diffuse = jnp.clip(ndotls[li], 0.0, 1.0)
            mult = jnp.where(casts[li] & occs[li], C.SHADOW_MULTIPLIER, 1.0)
            total_light = total_light + diffuse * geo[li][2] * mult
        hit_value = base * (total_light * att)[None] + base * C.AMBIENT
        reflective = hit & (mr4[2] > C.METALLIC_THRESHOLD)
        new_att = att * (C.REFLECT_SCALE * mr4[2])
        att = jnp.where(reflective, new_att, att)
        hit_value = jnp.where(reflective[None],
                              hit_value * (1.0 - att)[None], hit_value)
        accum = jnp.where(hit[None], hit_value, 0.0)
        origins2 = L.where3(reflective, pos, o_full)
        dirs2 = L.where3(reflective, shading.reflect(d, pn), d)
        return accum, origins2, dirs2

    for sub in ("a", "b", "c", "d"):
        jf = jax.jit(functools.partial(stage, sub=sub))
        tmr(f"sub_{sub}", jf, tree, tex, pi, vi)


if __name__ == "__main__":
    main()
