"""Benchmark driver — one JSON line for the judge.

Metric (BASELINE.json): Mrays/s at 1080p Sponza, primary + shadow +
reflection (depth-2 trace, 4 lights — the reference workload's shading
contract at config-4 resolution). vs_baseline is measured against the
north-star target of 200 Mrays/s on a v5e-8 (8 chips); this runs on ONE
chip, so parity with the target is vs_baseline = 8 × value / 200 ≈
value / 25 per chip. We report vs_baseline = value / 200 (the honest
whole-target ratio) and include the per-chip context in extra fields.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCENE = "/root/reference/models/sponza/Sponza.gltf"


def main():
    from vkrt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if os.environ.get("VKRT_BENCH_MODE") == "kernel":
        return kernel_bench()

    from vkrt_tpu import config as C
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.wavefront.engine import Renderer

    cfg = C.config4_flythrough()   # 1920x1080, depth 2, 4 lights, shadows+refl
    backend = os.environ.get("VKRT_BENCH_BACKEND", "dense")
    # texture heap upload rides an ~11MB/s tunnel; 512^2 textures keep bench
    # setup bounded (sampling COST is resolution-independent — gather count
    # per ray is fixed — so the Mrays/s metric is unaffected)
    texdim = int(os.environ.get("VKRT_BENCH_TEXDIM", "512"))
    # quantize=True: u8 framebuffer + scalar ray count leave the device
    # (the f32 image alone was ~1.1s/frame of tunnel transfer)
    renderer = Renderer(SCENE, cfg, backend=backend, max_texture_dim=texdim,
                        quantize=True)

    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)

    # warm-up (compile)
    fb, rays = renderer.render(cam)

    # frames-in-flight (runtime.FrameScheduler = the reference's
    # 3-swapchain-image pipelining): submit overlaps device execution
    # with host bookkeeping + framebuffer download of earlier frames
    from vkrt_tpu.runtime import FrameScheduler
    reps = int(os.environ.get("VKRT_BENCH_REPS", "5"))
    sched = FrameScheduler(inflight=3)
    t0 = time.perf_counter()
    total_rays = 0
    for _ in range(reps):
        retired = sched.submit(renderer.render_async, cam)
        if retired is not None:
            total_rays += int(retired[1][1])
    for _idx, out in sched.drain():
        total_rays += int(out[1])
    dt = (time.perf_counter() - t0) / reps

    mrays = (total_rays / reps) / dt / 1e6
    result = {
        "metric": "Mrays/s at 1080p Sponza (primary+shadow+reflection)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "frame_ms": round(dt * 1000.0, 1),
        "rays_per_frame": int(total_rays / reps),
        "backend": backend,
        "chips": 1,
        "note": "target 200 Mrays/s is for v5e-8 (8 chips); single-chip parity = vs_baseline*8",
    }
    if os.environ.get("VKRT_BENCH_REBUILD", "1") == "1" and backend == "dense":
        result.update(rebuild_bench(renderer))
    print(json.dumps(result))


def rebuild_bench(renderer):
    """Per-frame accel-update costs (BASELINE config-5 contract; the
    driver-build analogue is ref src/Raytracer.cpp:1146-1280)."""
    import jax.numpy as jnp

    def force_tree(tree):
        return float(jnp.sum(tree.sc_boxes[0, :1]))

    m = jnp.eye(4)
    from vkrt_tpu.accel.refit import refit_clusters
    force_tree(refit_clusters(renderer.backend.tree, m))   # compile
    t0 = time.perf_counter()
    for _ in range(3):
        t = refit_clusters(renderer.backend.tree, m)
    force_tree(t)
    refit_ms = (time.perf_counter() - t0) / 3 * 1000.0

    from vkrt_tpu.wavefront.engine import Renderer
    full = Renderer(SCENE, renderer.cfg, backend="dense", rebuild="full",
                    max_texture_dim=int(os.environ.get("VKRT_BENCH_TEXDIM",
                                                       "512")))
    force_tree(full._full_rebuild(m))                      # compile
    t0 = time.perf_counter()
    for _ in range(3):
        t = full._full_rebuild(m)
    force_tree(t)
    full_ms = (time.perf_counter() - t0) / 3 * 1000.0
    return {"rebuild_refit_ms": round(refit_ms, 1),
            "rebuild_full_ms": round(full_ms, 1)}


def kernel_bench():
    """Raw trace-kernel throughput (VKRT_BENCH_MODE=kernel): closest-hit
    over coherent 720p primary blocks — the number kernel work moves."""
    import time

    import jax.numpy as jnp
    import numpy as np

    from vkrt_tpu import config as C
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.rt.dense import trace_dense
    from vkrt_tpu.utils import layout as L
    from vkrt_tpu.wavefront.engine import (generate_rays,
                                           load_scene_assets, make_backend,
                                           tile)

    flat, _, _ = load_scene_assets(SCENE, 64)
    backend = make_backend(flat, "dense")
    w, h = 1280, 704
    cam = Camera(w, h)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    o, d = generate_rays(jnp.asarray(cam.proj_inverse),
                         jnp.asarray(cam.view_inverse), w, h)
    oj = jnp.stack([tile(c) for c in o])
    dj = L.normalize3(jnp.stack([tile(c) for c in d]))
    n = oj.shape[1] * 128
    tmax = jnp.full((oj.shape[1], 128), C.RAY_TMAX, jnp.float32)
    tree = backend.tree
    r = trace_dense(tree, oj, dj, tmax)
    _ = float(jnp.sum(jnp.where(jnp.isfinite(r[0]), r[0], 0)))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        for _j in range(5):
            r = trace_dense(tree, oj, dj, tmax)
        _ = float(jnp.sum(jnp.where(jnp.isfinite(r[0]), r[0], 0)))
        best = min(best, (time.perf_counter() - t0) / 5)
    print(json.dumps({
        "metric": "raw closest-hit kernel Mrays/s (720p coherent primaries)",
        "value": round(n / best / 1e6, 2), "unit": "Mrays/s",
        "vs_baseline": round(n / best / 1e6 / 200.0, 4),
        "frame_ms": round(best * 1000, 1),
    }))


if __name__ == "__main__":
    main()
