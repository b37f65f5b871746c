"""Round-5 hardware queue, part 5: the in-sweep sub-cluster hierarchy
(cfg.sub_gate_shadows / sub_gate_closest — VERDICT r4 item 5).

8 per-cluster 16-tri sub-run AABBs ride tri_data's pad columns; the
kernels slab-test them and run only the hitting 16-tri sub-sweeps
(rt/dense.py / rt/occl_multi.py sweep_cluster). Sim said 0.69-0.88
sub-box hit fraction (tools/subgroup_sim.py) — marginal, never
hardware-timed; these are the ship-or-post-mortem rows.

  1. config-4 frames: defaults / +sub_shadows / +sub_closest / +both
     (bit-equality checked against defaults)
  2. config-5 frames (depth 4, refit): defaults vs both
  3. isolated dispatch probes on camera rays: closest_d0 and the
     4-light shadow_d0 multi-occl, sub_gate on/off

Run: python -u tools/r5_hw_queue5.py > /tmp/r5q5.out 2>&1
"""
import dataclasses
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import (cached_backend, camera_ray_blocks,
                                       render_frame)

SCENE = "/root/reference/models/sponza/Sponza.gltf"


def tmr(name, jf, *args, reps=3, extra=None):
    try:
        r = jf(*args)
        jax.block_until_ready(r)
    except Exception as e:
        print(json.dumps({"step": name, "error": repr(e)[:400]}), flush=True)
        import traceback
        traceback.print_exc()
        return None, None
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
    lights = jnp.asarray(C.LIGHT_POSITIONS)

    # --- isolated dispatch probes (1080p camera rays) -------------------
    cfg = C.config4_flythrough()
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    pi = jnp.asarray(cam.proj_inverse)
    vi = jnp.asarray(cam.view_inverse)

    op, d0, active0 = jax.jit(
        functools.partial(camera_ray_blocks, cfg=cfg))(pi, vi)
    tm0 = jnp.where(active0, C.RAY_TMAX, 0.0)

    from vkrt_tpu.rt.dense import trace_dense
    from vkrt_tpu.wavefront.engine import _broadcast_points
    o0 = _broadcast_points(
        jnp.broadcast_to(op[None, :], (d0.shape[1] * 128 // 1024, 3)), d0,
        1024)

    res = {}
    for sg in (False, True):
        f = jax.jit(functools.partial(
            trace_dense, block=1024, with_attributes=True, sub_gate=sg))
        r, _ = tmr(f"closest_d0_sub{int(sg)}", f, backend.tree, o0, d0, tm0)
        if r is not None:
            res[f"c{int(sg)}"] = np.asarray(r[1])
    if "c0" in res and "c1" in res:
        print(json.dumps({"check": "closest_d0 slots",
                          "ok": bool((res["c0"] == res["c1"]).all())}),
              flush=True)

    # shadow_d0: real depth-0 surface points -> 4-light multi-occl
    t, slot, u, v, attrs = jax.jit(functools.partial(
        trace_dense, block=1024, with_attributes=True))(
            backend.tree, o0, d0, tm0)
    from vkrt_tpu.shade import shading
    hit = (slot >= 0) & active0
    pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
    nl = cfg.num_lights
    geo = [shading.light_geometry(pos, lights[li]) for li in range(nl)]
    sd = jnp.stack([-g[0] for g in geo])
    st = jnp.stack([jnp.where(hit & (jnp.sum(normal * g[0], axis=0) > 0),
                              g[1] - C.RAY_TMIN, 0.0) for g in geo])
    from vkrt_tpu.rt.occl_multi import occluded_multi
    occ = {}
    for sg in (False, True):
        f = jax.jit(functools.partial(
            occluded_multi, block=1024, sub_gate=sg))
        r, _ = tmr(f"shadow_d0_sub{int(sg)}", f,
                   backend.tree, lights[:nl], sd, st)
        if r is not None:
            occ[int(sg)] = np.asarray(r)
    if 0 in occ and 1 in occ:
        print(json.dumps({"check": "shadow_d0 masks",
                          "ok": bool((occ[0] == occ[1]).all())}), flush=True)

    # --- frames ---------------------------------------------------------
    frames = {}
    for cname, fcfg0 in (("cfg4", cfg),
                         ("cfg5", dataclasses.replace(
                             C.config5_stress(), rebuild_per_frame=False))):
        fcam = Camera(fcfg0.width, fcfg0.height)
        fcam.set_position(C.CAMERA_START_POSITION)
        fcam.set_rotation(C.CAMERA_START_ROTATION)
        fpi = jnp.asarray(fcam.proj_inverse)
        fvi = jnp.asarray(fcam.view_inverse)
        variants = [("defaults", {}),
                    ("sub_shadows", {"sub_gate_shadows": True}),
                    ("sub_closest", {"sub_gate_closest": True}),
                    ("sub_both", {"sub_gate_shadows": True,
                                  "sub_gate_closest": True})]
        if cname == "cfg5":
            variants = [variants[0], variants[3]]
        for name, flags in variants:
            fcfg = dataclasses.replace(fcfg0, **flags)
            fj = jax.jit(functools.partial(render_frame, cfg=fcfg))
            r, _ = tmr(f"frame_{cname}_{name}", fj, backend, tex, fpi, fvi,
                       lights)
            if r is not None:
                frames[f"{cname}_{name}"] = (np.asarray(r[0]),
                                             int(np.asarray(r[1]).sum()))
        a = frames.get(f"{cname}_defaults")
        for name in ("sub_shadows", "sub_closest", "sub_both"):
            b = frames.get(f"{cname}_{name}")
            if a and b:
                d = float(np.abs(a[0] - b[0]).max())
                print(json.dumps({"check": f"{cname} {name} frame",
                                  "max_d": d, "rays_a": a[1],
                                  "rays_b": b[1],
                                  "ok": bool(d == 0.0 and a[1] == b[1])}),
                      flush=True)


if __name__ == "__main__":
    main()
