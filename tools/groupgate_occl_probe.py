"""Per-(set,group) sweep gating in the multi-segment shadow kernel.

Companion to tools/groupgate_probe.py (closest_d1: 158.5 -> 109.2 ms at
block 1024 with group_gate, beating production b512's 123.3). Measures
occluded_multi group_gate on REAL depth-0 and depth-1 shadow segment
sets (block 1024: ns*G = 4*8 = 32 bits, exactly one smask word) and
checks the blocked masks are identical.

Run: python -u tools/groupgate_occl_probe.py > /tmp/ggo.out 2>&1
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

    outs = {}
    for depth, sd, st in (("d0", sd0, st0), ("d1", sd1, st1)):
        for gg in (False, True):
            occl_j = jax.jit(functools.partial(
                occluded_multi, block=1024, sort=(depth == "d0"),
                group_gate=gg))
            r = tmr(f"shadow_{depth}_b1024_gg{int(gg)}",
                    occl_j, tree, lights, sd, st)
            outs[(depth, gg)] = np.asarray(r)

    for depth in ("d0", "d1"):
        same = np.array_equal(outs[(depth, False)], outs[(depth, True)])
        print(json.dumps({"check": f"{depth} blocked masks identical",
                          "ok": bool(same)}), flush=True)


if __name__ == "__main__":
    main()
