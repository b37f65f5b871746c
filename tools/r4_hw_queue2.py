"""Round-4 hardware queue, part 2: device SAH build + gated group-sort.

Rows:
  1. config-4 frame A/B with the DEPTH-GATED group_sort_shadows
     (queue-1 measured the ungated version: d0 loses 21 ms, d1-on-pack
     wins 7.4 ms — the gate keeps only the win)
  2. device_sah_order timing on TPU (L=16) + full build_clusters(sah)
     vs build_clusters(morton) vs refit
  3. config-5 stress e2e: rebuild="refit" vs "full" (device SAH) vs
     "full_morton" — the VERDICT r3 item-2 acceptance row (full within
     ~15% of refit)
  4. golden smoke (320x240, stable-set metrics) — every queue ends here

Run: python -u tools/r4_hw_queue2.py > /tmp/r4q2.out 2>&1
"""
import dataclasses
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
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import (Renderer, cached_backend,
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


def rot_y(ang):
    c, s = np.cos(ang), np.sin(ang)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0],
                     [0, 0, 0, 1]], np.float32)


def main():
    enable_compilation_cache()
    flat, tex, backend = cached_backend(SCENE, 512, "dense")
    cfg = C.config4_flythrough()
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)
    lights = jnp.asarray(C.LIGHT_POSITIONS)

    # --- 1. gated group-sort frame A/B --------------------------------
    base = None
    for name, gs in (("frame_cfg4_gs_off", False),
                     ("frame_cfg4_gs_d1_gated", True)):
        fcfg = dataclasses.replace(cfg, group_sort_shadows=gs)
        fj = jax.jit(functools.partial(render_frame, cfg=fcfg))
        r, ms = tmr(name, fj, backend, tex, pi, vi, lights,
                    extra={"baseline_ms": base} if base else None)
        if base is None:
            base = ms
        if gs and r is not None:
            fb_on = np.asarray(r[0])

    # --- 2. build timings ----------------------------------------------
    from vkrt_tpu.accel.clusters import build_clusters, scene_attrs
    from vkrt_tpu.accel.device_sah import device_sah_order
    from vkrt_tpu.accel.refit import refit_clusters

    idx = np.asarray(flat.indices, dtype=np.int64)
    p = flat.positions
    v0 = jnp.asarray(p[idx[:, 0]])
    e1 = jnp.asarray(p[idx[:, 1]] - p[idx[:, 0]])
    e2 = jnp.asarray(p[idx[:, 2]] - p[idx[:, 0]])
    attrs = scene_attrs(flat)
    c = np.asarray(v0) + (np.asarray(e1) + np.asarray(e2)) / 3.0
    aabb = (c.min(axis=0), c.max(axis=0))

    oj = jax.jit(functools.partial(device_sah_order, max_levels=16))
    tmr("device_sah_order_L16", oj, v0, e1, e2)
    for lv in (12, 20):
        ojv = jax.jit(functools.partial(device_sah_order, max_levels=lv))
        tmr(f"device_sah_order_L{lv}", ojv, v0, e1, e2)

    def build(method):
        return build_clusters(v0, e1, e2, attrs=attrs,
                              with_attributes=True, device=True,
                              aabb=aabb, method=method)
    bs_j = jax.jit(functools.partial(build, "sah"))
    bm_j = jax.jit(functools.partial(build, "morton"))
    r_sah, _ = tmr("build_clusters_device_sah", bs_j)
    r_mor, _ = tmr("build_clusters_device_morton", bm_j)
    rf_j = jax.jit(refit_clusters)
    tmr("refit_clusters", rf_j, backend.tree, jnp.eye(4))

    # --- 3. config-5 stress e2e ----------------------------------------
    cfg5 = C.config5_stress()
    m = rot_y(0.02)
    for name, rb in (("cfg5_refit", "refit"), ("cfg5_full_sah", "full"),
                     ("cfg5_full_morton", "full_morton")):
        rend = Renderer(SCENE, cfg5, backend="dense", max_texture_dim=512,
                        rebuild=rb)
        def run():
            out = rend.render_async(cam, transform=m)
            return out
        try:
            out = run()
            jax.block_until_ready(out)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = run()
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"step": name, "ms": round(best * 1e3, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"step": name, "error": repr(e)[:400]}),
                  flush=True)
            import traceback
            traceback.print_exc()

    # --- 4. golden smoke ------------------------------------------------
    sys.path.insert(0, "/root/repo/tools")
    from r4_hw_queue import golden_smoke
    golden_smoke()


if __name__ == "__main__":
    main()
