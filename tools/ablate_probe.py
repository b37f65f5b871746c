"""In-graph ablation of the FULL 2-round frame (1080p, texdim 512):

  full        — production frame (ground truth ~1017ms)
  no_occl     — both shadow occlusion traces replaced by all-unblocked
  no_sample   — material sampling replaced by constants
  no_both     — both ablations

Deltas = exact in-frame cost of the occlusion traces and the sampler.
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
                                       make_backend, untile, _pad_dims)

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

    def frame(tree, tex, pi, vi, do_occl, do_sample):
        op, d, valid = camera_ray_blocks(pi, vi, cfg=cfg)
        nb = d.shape[1]
        nblocks = nb * 128 // 512
        accum = jnp.zeros((3, nb, 128), jnp.float32)
        att = jnp.ones((nb, 128), jnp.float32)
        rc = jnp.zeros((nb, 128), jnp.int32)
        origins = jnp.broadcast_to(op[:, None, None], (3, nb, 128))
        dirs = d
        active = valid
        for _depth in range(cfg.max_depth):
            tmax = jnp.where(active, C.RAY_TMAX, 0.0)
            t, slot, u, v, attrs = trace_dense(tree, origins, dirs, tmax,
                                               with_attributes=True)
            hitm = slot >= 0
            hit = hitm & active
            miss = active & ~hitm
            sky = jnp.asarray(C.SKY_COLOR)
            accum = accum + jnp.where(miss[None], sky[:, None, None], 0.0)
            rc = rc + active.astype(jnp.int32)
            pos, normal, uv, tangent, mat_ids = shading.interpolate(
                attrs, u, v)
            if do_sample:
                base4, mr4, nmap4 = sample_material(
                    tex.texels_tri, tex.level_offset, tex.level_width,
                    tex.level_height, mat_ids[0], uv)
                base, metallic, map_n = base4[:3], mr4[2], nmap4[:3]
            else:
                base = jnp.full((3, nb, 128), 0.6, jnp.float32)
                metallic = (uv[0] * 0.3) % 1.0     # data-dependent stand-in
                map_n = jnp.stack([uv[0] % 1.0, uv[1] % 1.0,
                                   jnp.ones_like(u)])
            pn = shading.perturbed_normal(normal, tangent, map_n)
            geo = [shading.light_geometry(pos, lights[li])
                   for li in range(nl)]
            ndotls = [L.dot3(pn, g[0]) for g in geo]
            casts = [hit & (nd > 0) for nd in ndotls]
            if do_occl:
                so_pts = jnp.concatenate(
                    [jnp.broadcast_to(lights[li][None, :], (nblocks, 3))
                     for li in range(nl)], axis=0)
                sd = jnp.concatenate([-g[0] for g in geo], axis=1)
                st = jnp.concatenate(
                    [jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                     for c, g in zip(casts, geo)], axis=0)
                _, oslot, _, _ = trace_dense(tree, so_pts, sd, st,
                                             occlusion=True,
                                             point_origin=True)
                occs = jnp.split(oslot >= 0, nl, axis=0)
            else:
                occs = [c & (u > 0.5) for c in casts]   # data-dep stand-in
            for c in casts:
                rc = rc + c.astype(jnp.int32)
            total_light = jnp.zeros_like(u)
            for li in range(nl):
                diffuse = jnp.clip(ndotls[li], 0.0, 1.0)
                mult = jnp.where(casts[li] & occs[li],
                                 C.SHADOW_MULTIPLIER, 1.0)
                total_light = total_light + diffuse * geo[li][2] * mult
            hit_value = (base * (total_light * att)[None]
                         + base * C.AMBIENT)
            reflective = hit & (metallic > C.METALLIC_THRESHOLD)
            new_att = att * (C.REFLECT_SCALE * metallic)
            att = jnp.where(reflective, new_att, att)
            hit_value = jnp.where(reflective[None],
                                  hit_value * (1.0 - att)[None], hit_value)
            accum = accum + jnp.where(hit[None], hit_value, 0.0)
            origins = L.where3(reflective, pos, origins)
            dirs = L.where3(reflective, shading.reflect(dirs, pn), dirs)
            active = reflective
        wp, hp = _pad_dims(cfg.width, cfg.height)
        fb = jnp.stack([untile(accum[k], hp, wp)[: cfg.height, : cfg.width]
                        for k in range(3)], axis=-1)
        fb8 = jnp.clip(fb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        return fb8, jnp.sum(rc)

    for name, oc, sa in (("full", True, True), ("no_occl", False, True),
                         ("no_sample", True, False),
                         ("no_both", False, False)):
        jf = jax.jit(functools.partial(frame, do_occl=oc, do_sample=sa))
        tmr(f"ablate_{name}", jf, tree, tex, pi, vi)


if __name__ == "__main__":
    main()
