"""Golden-image harness CLI — engine vs the independent CPU oracle.

The BASELINE.json acceptance metric is ≤1e-3 RMSE against the reference
frame; with no Vulkan GPU available, the brute-force oracle is the
golden source (see golden/cpu_tracer.py). This tool renders the same
frame through the real engine and through the oracle and reports RMSE —
the standalone version of tests/test_golden.py, usable on any scene,
config, pose, and resolution:

  python -m vkrt_tpu.golden.harness --config 3 --width 96 --height 64
  python -m vkrt_tpu.golden.harness --config 2 --submeshes 10 \
      --oracle native --save-diff /tmp/diff.png
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from vkrt_tpu.app.cli import DEFAULT_SCENE, build_parser, resolve_config


def main(argv=None) -> int:
    base = build_parser()
    p = argparse.ArgumentParser(parents=[base], add_help=False,
                                prog="vkrt-tpu-golden")
    p.add_argument("--submeshes", type=int, default=0,
                   help="limit to the first N submeshes (keeps the brute "
                        "oracle tractable; 0 = all)")
    p.add_argument("--oracle", choices=["brute", "native"], default="brute")
    p.add_argument("--save-diff", help="write |engine - oracle| heatmap PNG")
    p.add_argument("--threshold", type=float, default=1e-3)
    args = p.parse_args(argv)
    cfg = resolve_config(args)

    import jax.numpy as jnp

    from vkrt_tpu import config as C
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.app.framebuffer import rmse, write_png
    from vkrt_tpu.golden import render_golden
    from vkrt_tpu.scene import flatten_model, load_model
    from vkrt_tpu.scene.model import Model
    from vkrt_tpu.wavefront.engine import (make_backend, render_frame,
                                           texture_arrays)

    model = load_model(args.scene or DEFAULT_SCENE,
                       max_texture_dim=args.max_texture_dim or 64)
    if args.submeshes:
        model = Model(submeshes=model.submeshes[: args.submeshes],
                      materials=model.materials, images=model.images)
    flat = flatten_model(model)
    tex = texture_arrays(model.images, flat)
    from vkrt_tpu.scene import build_texture_heap
    heap = build_texture_heap(model.images)   # oracle-side (independent)
    backend = make_backend(flat, args.backend)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)

    fb, _ = render_frame(backend, tex, jnp.asarray(cam.proj_inverse),
                         jnp.asarray(cam.view_inverse),
                         jnp.asarray(C.LIGHT_POSITIONS), cfg)
    fb = np.asarray(fb)
    golden = render_golden(flat, heap, cam.proj_inverse, cam.view_inverse,
                           cfg, accel=args.oracle)

    err = rmse(fb, golden)
    result = {
        "rmse": err,
        "threshold": args.threshold,
        "pass": bool(err <= args.threshold),
        "resolution": [cfg.width, cfg.height],
        "backend": args.backend,
        "oracle": args.oracle,
        "submeshes": args.submeshes or len(model.submeshes),
    }
    if args.save_diff:
        diff = np.abs(np.clip(fb, 0, 1) - np.clip(golden, 0, 1))
        write_png(args.save_diff, diff / max(diff.max(), 1e-6))
        result["diff_png"] = args.save_diff
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
