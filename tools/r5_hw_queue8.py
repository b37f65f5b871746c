"""Round-5 hardware queue, part 8: chunked sampling gather, frame A/B.

Same-process A/B of the shipped flat-chunked heap gather
(shade/sampling._chunked_take, from the q6/q7 rows) on config-4/5
frames + golden smoke. The single-gather baseline is forced by lifting
_GATHER_CHUNK_MIN.

Run: python -u tools/r5_hw_queue8.py > /tmp/r5q8.out 2>&1
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
import vkrt_tpu.shade.sampling as S
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
    chunk_min = S._GATHER_CHUNK_MIN

    frames = {}
    for cname, cfg in (("cfg4", C.config4_flythrough()),
                       ("cfg5", dataclasses.replace(
                           C.config5_stress(), rebuild_per_frame=False))):
        cam = Camera(cfg.width, cfg.height)
        cam.set_position(C.CAMERA_START_POSITION)
        cam.set_rotation(C.CAMERA_START_ROTATION)
        pi = jnp.asarray(cam.proj_inverse)
        vi = jnp.asarray(cam.view_inverse)
        for name, cmin in (("whole", 1 << 60), ("chunked", chunk_min)):
            S._GATHER_CHUNK_MIN = cmin
            # distinct lambda object per variant -> distinct jit cache
            # entry; the trace (first call, inside tmr) reads the
            # module-level threshold set just above
            fj = jax.jit(lambda be, tx, a, b, c, _cfg=cfg, _m=cmin:
                         render_frame(be, tx, a, b, c, _cfg))
            r, _ = tmr(f"frame_{cname}_{name}", fj, backend, tex, pi, vi,
                       lights)
            if r is not None:
                frames[f"{cname}_{name}"] = (np.asarray(r[0]),
                                             int(np.asarray(r[1]).sum()))
        S._GATHER_CHUNK_MIN = chunk_min
        a = frames.get(f"{cname}_whole")
        b = frames.get(f"{cname}_chunked")
        if a and b:
            d = float(np.abs(a[0] - b[0]).max())
            print(json.dumps({"check": f"{cname} chunked frame",
                              "max_d": d, "rays_a": a[1], "rays_b": b[1],
                              "ok": bool(d == 0.0 and a[1] == b[1])}),
                  flush=True)

    from r5_hw_queue import golden_smoke
    golden_smoke()


if __name__ == "__main__":
    main()
