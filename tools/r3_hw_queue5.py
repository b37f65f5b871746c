"""Round-3 hardware queue, part 5: lane-slice group-gate prepass in the
closest kernel (rt/dense.py pre_body) — replaces the masked-iota form
that re-read the full [K2,R] hit matrix per group (G x cost). Expected:
closest_d1+gg at or below the 94.8-95.3 ms masked-iota row
(tools/r3_hw_queue2/3.py), identical outputs (CPU CI already pins
bit-exactness). Plus a fresh config-4 frame.

Run: python -u tools/r3_hw_queue5.py > /tmp/r3q5.out 2>&1
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
from vkrt_tpu.utils import layout as L
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import (cached_backend, camera_ray_blocks,
                                       render_frame, _broadcast_points)

SCENE = "/root/reference/models/sponza/Sponza.gltf"
BLOCK = 512


def tmr(name, jf, *args, reps=3, extra=None):
    r = jf(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = jf(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    out = {"step": name, "ms": round(best * 1e3, 1)}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)
    return r, best * 1e3


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
        refl = hit & (mr4[2] > C.METALLIC_THRESHOLD)
        o1 = L.where3(refl, pos, o)
        d1 = L.where3(refl, shading.reflect(d, pn), d)
        return o1, d1, refl

    o1, d1, refl = jax.jit(frame_state)(tree, tex, op, d0, active0)
    tm1 = jnp.where(refl, C.RAY_TMAX, 0.0)

    cj = jax.jit(functools.partial(
        lambda tree, o, d, tm: trace_dense(
            tree, o, d, tm, with_attributes=True, block=1024, sort=False,
            group_gate=True)))
    tmr("closest_d1_b1024_gg_sliceprepass", cj, tree, o1, d1, tm1,
        extra={"masked_iota_was_ms": 94.8})

    fj = jax.jit(functools.partial(render_frame, cfg=cfg))
    r, _ = tmr("frame_config4", fj, backend, tex, pi, vi, lights)
    fb = np.asarray(r[0])
    print(json.dumps({"finite": bool(np.isfinite(fb).all()),
                      "rays": int(np.asarray(r[1]).sum())}), flush=True)


if __name__ == "__main__":
    main()
