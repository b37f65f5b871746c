"""Round-4: golden-gate resolution sweep (VERDICT r3 item 3).

Renders the reference workload (depth 2, 4 lights) through the
production dense backend ON HARDWARE at 320x240 / 640x480 / 1600x1200
(the reference's own resolution, src/Utils.hpp:32-33) and compares each
against the stability-certified native oracle. Documents:

  * raw RMSE vs resolution — the scaling of boundary-flip noise
    (flip_frac ~ silhouette density ~ 1/linear-res; raw RMSE ~ sqrt)
  * rmse_stable — the BASELINE.json 1e-3 bar on the oracle-certified
    set at EVERY resolution, including the reference's 1600x1200
  * stable_frac vs resolution — certification coverage rises as
    boundary pixels thin out

ONE process (axon rule). Oracle at 1600x1200 is ~1-2 min single-thread.

Run: python -u tools/r4_golden_sweep.py > /tmp/r4gs.out 2>&1
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.app.framebuffer import golden_metrics
from vkrt_tpu.golden import render_golden
from vkrt_tpu.scene import build_texture_heap
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import (cached_backend, cached_model,
                                       render_frame)

SCENE = "/root/reference/models/sponza/Sponza.gltf"


def main():
    enable_compilation_cache()
    flat, tex, backend = cached_backend(SCENE, 512, "dense")
    model = cached_model(SCENE, 512)
    heap = build_texture_heap(model.images)

    for w, h in ((320, 240), (640, 480), (1600, 1200)):
        cfg = dataclasses.replace(C.reference_config(), width=w, height=h)
        cam = Camera(w, h)
        cam.set_position(C.CAMERA_START_POSITION)
        cam.set_rotation(C.CAMERA_START_ROTATION)
        t0 = time.perf_counter()
        fb, _ = render_frame(backend, tex, jnp.asarray(cam.proj_inverse),
                             jnp.asarray(cam.view_inverse),
                             jnp.asarray(C.LIGHT_POSITIONS), cfg)
        fb = np.asarray(fb)
        t_eng = time.perf_counter() - t0
        t0 = time.perf_counter()
        golden, stable = render_golden(flat, heap, cam.proj_inverse,
                                       cam.view_inverse, cfg,
                                       accel="native", with_stable=True)
        t_ora = time.perf_counter() - t0
        m = golden_metrics(fb, golden, stable=stable)
        print(json.dumps({
            "res": f"{w}x{h}",
            "rmse": round(m["rmse"], 6),
            "rmse_trimmed": round(m["rmse_trimmed"], 6),
            "flip_frac": round(m["flip_frac"], 7),
            "rmse_stable": round(m["rmse_stable"], 6),
            "stable_frac": round(m["stable_frac"], 5),
            "engine_s": round(t_eng, 1), "oracle_s": round(t_ora, 1)}),
            flush=True)


if __name__ == "__main__":
    main()
