"""Refresh the BASELINE.md config rows (1-3) + kernel bench on hardware,
in one process. Configs 4/5 were measured by tools/r3_hw_queue2.py
(604.9 ms; refit 1354.9 / full 2367.1).

Run: python -u tools/r3_rows.py > /tmp/r3rows.out 2>&1
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import Renderer

SCENE = "/root/reference/models/sponza/Sponza.gltf"


def main():
    enable_compilation_cache()
    rows = [("config1_800x600_primary", C.config1_primary()),
            ("config2_1280x720_shadows", C.config2_shadows()),
            ("config3_1280x720_refl", C.config3_reflections())]
    from vkrt_tpu.runtime import FrameScheduler
    for name, cfg in rows:
        ren = Renderer(SCENE, cfg, backend="dense", max_texture_dim=512,
                       quantize=True)
        cam = Camera(cfg.width, cfg.height)
        cam.set_position(C.CAMERA_START_POSITION)
        cam.set_rotation(C.CAMERA_START_ROTATION)
        fb, rays = ren.render(cam)            # compile + warm
        # frames-in-flight pacing, exactly like bench.py: device work
        # overlaps the u8 framebuffer fetch of earlier frames (the
        # synchronous render() would charge the ~25MB/s tunnel fetch to
        # every frame — an environment artifact, not device cost)
        reps = 5
        sched = FrameScheduler(inflight=3)
        t0 = time.perf_counter()
        total = 0
        for _ in range(reps):
            retired = sched.submit(ren.render_async, cam)
            if retired is not None:
                total += int(jax.numpy.sum(retired[1][1]))
        for _idx, out in sched.drain():
            total += int(jax.numpy.sum(out[1]))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"step": name, "ms": round(dt * 1e3, 1),
                          "mrays_s": round(total / reps / dt / 1e6, 2),
                          "rays": int(total / reps)}), flush=True)
        # device-only: no framebuffer fetch (the axon tunnel moves
        # ~25MB/s, so small frames are transfer-dominated through it;
        # a real v5e host link makes fetch negligible)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                out = ren.render_async(cam)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 3)
        rays = int(np.asarray(out[1]))
        print(json.dumps({"step": name + "_device_only",
                          "ms": round(best * 1e3, 1),
                          "mrays_s": round(rays / best / 1e6, 2)}),
              flush=True)

    # raw kernel numbers (the bench.py kernel mode, inline)
    import os
    os.environ["VKRT_BENCH_MODE"] = "kernel"
    import bench
    bench.kernel_bench()


if __name__ == "__main__":
    main()
