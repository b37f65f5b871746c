"""Round-5 hardware queue, part 4: the SORTED-DEPTH pipeline
(partition_closest v2) frame rows.

The whole depth>=1 iteration runs in repartitioned order; only the
contributions (+ carry) return through a 4-12 channel inverse. Variant
1's 40-channel inverse measured 110.2 vs 95.0 baseline even though the
re-tiled dispatch ran ~0.56x (tools/r5_hw_queue.py /tmp/r5q1b.out).

  1. config-4 frames: r5 defaults (partition_shadows only) vs
     + partition_closest (sorted-depth)
  2. config-5 frames (max_depth 4 — the carry path), refit rebuild
  3. golden smoke with both partitions on

Run: python -u tools/r5_hw_queue4.py > /tmp/r5q4.out 2>&1
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
from vkrt_tpu.wavefront.engine import cached_backend, render_frame

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

    frames = {}
    for cname, cfg in (("cfg4", C.config4_flythrough()),
                       ("cfg5", dataclasses.replace(
                           C.config5_stress(), rebuild_per_frame=False))):
        cam = Camera(cfg.width, cfg.height)
        cam.set_position(C.CAMERA_START_POSITION)
        cam.set_rotation(C.CAMERA_START_ROTATION)
        pi = jnp.asarray(cam.proj_inverse)
        vi = jnp.asarray(cam.view_inverse)
        for name, flags in (
                (f"frame_{cname}_r5_defaults", {}),
                (f"frame_{cname}_sorted_depth",
                 {"partition_closest": True})):
            fcfg = dataclasses.replace(cfg, **flags)
            fj = jax.jit(functools.partial(render_frame, cfg=fcfg))
            r, _ = tmr(name, fj, backend, tex, pi, vi, lights)
            if r is not None:
                frames[name] = (np.asarray(r[0]),
                                int(np.asarray(r[1]).sum()))
        a = frames.get(f"frame_{cname}_r5_defaults")
        b = frames.get(f"frame_{cname}_sorted_depth")
        if a and b:
            d = float(np.abs(a[0] - b[0]).max())
            print(json.dumps({"check": f"{cname} sorted-depth frame",
                              "max_d": d, "rays_a": a[1], "rays_b": b[1],
                              "ok": bool(d <= 1e-5 and a[1] == b[1])}),
                  flush=True)

    # sampling row-count bound (queue-3 retry: the heap must be an
    # ARGUMENT — closing over it made it a jit constant and the 419MB
    # remote-compile payload hit the relay's 413 limit). The
    # quad-dedupe ceiling is 0.82N issued rows (24% quad uniformity,
    # ROADMAP); gather cost is per-row, so this bounds the win.
    rows = tex.texels_tri.shape[0]
    n = 1920 * 1088
    rng = np.random.default_rng(1)
    idx_full = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
    idx_82 = idx_full[: int(n * 0.82) // 128 * 128]

    def g(heap, ix):
        return jnp.sum(heap[ix].astype(jnp.uint32))
    gj = jax.jit(g)
    tmr("sample_gather_rows_N", gj, tex.texels_tri, idx_full)
    tmr("sample_gather_rows_082N", gj, tex.texels_tri, idx_82)

    from r5_hw_queue import golden_smoke
    golden_smoke()


if __name__ == "__main__":
    main()
