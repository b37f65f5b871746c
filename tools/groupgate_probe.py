"""Per-group (128-lane) sweep gating + per-group btmax on real d1 state.

tools/rowgate_sim.py (round 3, on the cached real wavefront state): at
depth 1 only ~51-64% of a gated cluster's whole-block sweep lanes belong
to rows that gate it (0.95 at coherent depth 0 — don't bother there).
This measures the kernel with group_gate=True vs the production kernel
on the REAL reflection wavefront, and checks outputs are bit-identical
(the gate/prune only skips provably-unimprovable work).

Run: python -u tools/groupgate_probe.py > /tmp/ggp.out 2>&1
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
        refl = hit & (mr4[2] > C.METALLIC_THRESHOLD)
        o1 = L.where3(refl, pos, o)
        d1 = L.where3(refl, shading.reflect(d, pn), d)
        return o1, d1, refl

    o1, d1, refl = jax.jit(frame_state)(tree, tex, op, d0, active0)
    tm1 = jnp.where(refl, C.RAY_TMAX, 0.0)
    print(json.dumps({"live_rays": round(float(jnp.mean(refl)), 4)}),
          flush=True)

    def closest(blk, gg):
        return jax.jit(functools.partial(
            lambda tree, o, d, tm: trace_dense(
                tree, o, d, tm, with_attributes=True, block=blk,
                sort=False, group_gate=gg)))

    outs = {}
    for blk in (512, 1024):
        for gg in (False, True):
            r = tmr(f"closest_d1_b{blk}_gg{int(gg)}",
                    closest(blk, gg), tree, o1, d1, tm1)
            outs[(blk, gg)] = [np.asarray(x) for x in r]

    for blk in (512, 1024):
        same = all(np.array_equal(a, b) for a, b in
                   zip(outs[(blk, False)], outs[(blk, True)]))
        print(json.dumps({"check": f"b{blk} outputs identical",
                          "ok": bool(same)}), flush=True)


if __name__ == "__main__":
    main()
