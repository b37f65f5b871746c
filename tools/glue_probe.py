"""Locate the ~380ms of frame time not covered by trace/sample phases.

One TPU process: (1) whole jitted frame (ground truth, no host download),
(2) the engine's exact shade-glue between trace and shadow dispatch +
post-shadow accumulation, (3) pure heap gather vs full bilinear math.
"""

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
from vkrt_tpu.shade import shading
from vkrt_tpu.shade.sampling import sample_material
from vkrt_tpu.utils import layout as L
from vkrt_tpu.wavefront.engine import (camera_ray_blocks, load_scene_assets,
                                       make_backend, render_frame_u8)

SCENE = "/root/reference/models/sponza/Sponza.gltf"


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
    flat, tex, _ = load_scene_assets(SCENE, 512)
    backend = make_backend(flat, "dense")
    tree = backend.tree
    cfg = C.config4_flythrough()
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)
    lights_all = jnp.asarray(C.LIGHT_POSITIONS)
    nl = cfg.num_lights
    lights = lights_all[:nl]

    # 1. ground truth: the full frame op on device (no host download)
    frame_j = jax.jit(functools.partial(render_frame_u8, cfg=cfg))
    tmr("frame_total", frame_j, backend, tex, pi, vi, lights_all)

    # inputs for the pieces
    op, d, valid = jax.jit(functools.partial(camera_ray_blocks, cfg=cfg))(
        pi, vi)
    nb = d.shape[1]
    nblocks = nb * 128 // 512
    opts = jnp.broadcast_to(op[None, :], (nblocks, 3))

    def closest_pt(tree, opts, d, act):
        tm = jnp.where(act, C.RAY_TMAX, 0.0)
        return trace_dense(tree, opts, d, tm, with_attributes=True,
                           point_origin=True)

    t, slot, u, v, attrs = jax.jit(closest_pt)(tree, opts, d, valid)
    hit = (slot >= 0) & valid
    occ_fake = jnp.zeros((nl * nb, 128), jnp.bool_)

    # 2. the engine's exact glue for depth 0 (no traces, no sampling):
    # interpolate -> perturbed normal -> light geometry -> shadow-ray
    # arrays -> diffuse/shadow accumulation -> reflection carry
    def shade_glue(attrs, u, v, hit, occ_all, d):
        base = jnp.full((3, nb, 128), 0.5, jnp.float32)
        map_n = jnp.full((3, nb, 128), 0.5, jnp.float32)
        metallic = jnp.full((nb, 128), 0.5, jnp.float32)
        accum = jnp.zeros((3, nb, 128), jnp.float32)
        attenuation = jnp.ones((nb, 128), jnp.float32)
        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        pn = shading.perturbed_normal(normal, tangent, map_n)
        geo = [shading.light_geometry(pos, lights[li]) for li in range(nl)]
        ndotls = [L.dot3(pn, g[0]) for g in geo]
        casts = [hit & (nd > 0) for nd in ndotls]
        so_pts = jnp.concatenate(
            [jnp.broadcast_to(lights[li][None, :], (nblocks, 3))
             for li in range(nl)], axis=0)
        sd = jnp.concatenate([-g[0] for g in geo], axis=1)
        st = jnp.concatenate([jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                              for c, g in zip(casts, geo)], axis=0)
        occs = jnp.split(occ_all, nl, axis=0)
        total_light = jnp.zeros((nb, 128), jnp.float32)
        for li in range(nl):
            diffuse = jnp.clip(ndotls[li], 0.0, 1.0)
            cast = hit & (ndotls[li] > 0)
            mult = jnp.where(cast & occs[li], C.SHADOW_MULTIPLIER, 1.0)
            total_light = total_light + diffuse * geo[li][2] * mult
        hit_value = base * (total_light * attenuation)[None] + base * C.AMBIENT
        reflective = hit & (metallic > C.METALLIC_THRESHOLD)
        new_att = attenuation * (C.REFLECT_SCALE * metallic)
        attenuation = jnp.where(reflective, new_att, attenuation)
        hit_value = jnp.where(reflective[None],
                              hit_value * (1.0 - attenuation)[None], hit_value)
        accum = accum + jnp.where(hit[None], hit_value, 0.0)
        origins = jnp.broadcast_to(op[:, None, None], (3, nb, 128))
        origins = L.where3(reflective, pos, origins)
        dirs2 = L.where3(reflective, shading.reflect(d, pn), d)
        return accum, so_pts, sd, st, origins, dirs2, attenuation

    tmr("shade_glue_d0", jax.jit(shade_glue), attrs, u, v, hit, occ_fake, d)

    # 3. sampler split: pure gather vs full bilinear
    sid = jnp.where(hit, jnp.abs(attrs[33]).astype(jnp.int32), 0)
    pos, normal, uv, tangent, mat_ids = jax.jit(
        lambda a, uu, vv: shading.interpolate(a, uu, vv))(attrs, u, v)
    sidr = jnp.where(hit, mat_ids[0], 0)
    uvs = jnp.where(hit[None], uv, 0.0)

    def pure_gather(tex, sid, uvs):
        off = tex.level_offset[sid, 0]
        w = tex.level_width[sid, 0]
        h = tex.level_height[sid, 0]
        x0 = jnp.floor(uvs[0] * w - 0.5).astype(jnp.int32)
        y0 = jnp.floor(uvs[1] * h - 0.5).astype(jnp.int32)
        rows = tex.texels_tri[off + jnp.mod(y0, h) * w + jnp.mod(x0, w)]
        return jnp.sum(rows.astype(jnp.uint32), axis=(0, 1))

    tmr("sample_pure_gather", jax.jit(pure_gather), tex, sidr, uvs)

    def full_sample(tex, sid, uvs):
        return sample_material(tex.texels_tri, tex.level_offset,
                               tex.level_width, tex.level_height, sid, uvs)

    tmr("sample_full", jax.jit(full_sample), tex, sidr, uvs)


if __name__ == "__main__":
    main()
