"""Round-5 hardware queue, part 3: SAH settings + golden sweep +
sampling row-bound.

  1. device_sah_order candidates at the CPU-quality-passing settings
     (bar: host-parity clusters/ray — L12 11.62 / L14 11.17 vs host
     11.53, /tmp/sah_knee.out): L14 NB16 stable0/1, L14 NB8 stable0,
     L12 NB16 stable0
  2. config-5 stress e2e rebuild="full" with sah_opts L12 vs L14
     (decides the shipped default; bar = within ~15% of refit 833.4)
  3. golden resolution sweep 320/640/1600 (VERDICT item 4 — recorded,
     gates reconciled in bench.py/BASELINE.md from these rows)
  4. sampling row-count bound: the quad-dedupe ceiling is 0.82N issued
     rows (24% quad uniformity) — gather 0.82N vs N directly bounds the
     win against the pack cost
  5. golden smoke

Run: python -u tools/r5_hw_queue3.py > /tmp/r5q3.out 2>&1
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
from vkrt_tpu.accel.device_sah import device_sah_order
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import Renderer, cached_backend

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
    return np.array(
        [[np.cos(ang), 0, np.sin(ang), 0], [0, 1, 0, 0],
         [-np.sin(ang), 0, np.cos(ang), 0], [0, 0, 0, 1]], np.float32)


def main():
    enable_compilation_cache()
    flat, tex, backend = cached_backend(SCENE, 512, "dense")
    idx = np.asarray(flat.indices, np.int64)
    p = flat.positions
    v0 = jnp.asarray(p[idx[:, 0]])
    e1 = jnp.asarray(p[idx[:, 1]] - p[idx[:, 0]])
    e2 = jnp.asarray(p[idx[:, 2]] - p[idx[:, 0]])

    # --- 1. SAH candidates --------------------------------------------------
    for lv, nb, st in ((14, 16, False), (14, 16, True), (14, 8, False),
                       (12, 16, False)):
        f = jax.jit(functools.partial(device_sah_order, max_levels=lv,
                                      nbins=nb, stable=st))
        tmr(f"device_sah_L{lv}_NB{nb}_stable{int(st)}", f, v0, e1, e2)

    # --- 2. config-5 e2e with sah_opts --------------------------------------
    cfg5 = C.config5_stress()
    cam = Camera(cfg5.width, cfg5.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    m = rot_y(0.01)
    for name, opts in (("L12", dict(max_levels=12, stable=False)),
                       ("L14", dict(max_levels=14, stable=False))):
        try:
            rend = Renderer(SCENE, cfg5, backend="dense",
                            max_texture_dim=512, rebuild="full",
                            sah_opts=opts)
            def run():
                out = rend.render_async(cam, transform=m)
                jax.block_until_ready(out)
                return out
            run()
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"step": f"config5_e2e_full_{name}",
                              "ms": round(best * 1e3, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"step": f"config5_e2e_full_{name}",
                              "error": repr(e)[:400]}), flush=True)

    # --- 3. golden resolution sweep ------------------------------------------
    import r4_golden_sweep
    try:
        r4_golden_sweep.main()
    except Exception as e:
        print(json.dumps({"step": "golden_sweep", "error": repr(e)[:400]}),
              flush=True)

    # --- 4. sampling row-count bound -----------------------------------------
    # the quad-dedupe ceiling: 24% quad uniformity -> 0.82N issued rows.
    # Gather cost is per-row (ROADMAP), so gathering 0.82N rows from the
    # real material heap bounds the attainable win directly.
    rows = tex.texels_tri.shape[0]
    n = 1920 * 1088
    rng = np.random.default_rng(1)
    idx_full = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
    idx_82 = idx_full[: int(n * 0.82)]

    def g(ix):
        return jnp.sum(tex.texels_tri[ix].astype(jnp.uint32))
    gj = jax.jit(g)
    tmr("sample_gather_rows_N", gj, idx_full)
    tmr("sample_gather_rows_082N", gj, idx_82)

    # --- 5. golden smoke -----------------------------------------------------
    from r5_hw_queue import golden_smoke
    golden_smoke()


if __name__ == "__main__":
    main()
