"""Round-5 hardware queue, part 6: the sampling-gather row-count curve.

q4's bound row measured 0.82N rows at 0.59x the full-N gather time —
SUPER-linear in row count, which per-row cost models (round-4 sampling
post-mortem) do not predict. If the curve is convex, splitting the one
big gather into K sequential chunks is a free, bit-exact win. These
rows map the curve and time chunked variants.

Run: python -u tools/r5_hw_queue6.py > /tmp/r5q6.out 2>&1
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import cached_backend

SCENE = "/root/reference/models/sponza/Sponza.gltf"


def tmr(name, jf, *args, reps=3, extra=None):
    try:
        r = jf(*args)
        jax.block_until_ready(r)
    except Exception as e:
        print(json.dumps({"step": name, "error": repr(e)[:400]}), flush=True)
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
    heap = tex.texels_tri
    rows = heap.shape[0]
    n = 1920 * 1088
    rng = np.random.default_rng(1)
    idx_full = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))

    def g(heap, ix):
        return jnp.sum(heap[ix].astype(jnp.uint32))
    gj = jax.jit(g)

    # the row-count curve
    for frac in (1.0, 0.9, 0.82, 0.75, 0.5, 0.25, 0.125):
        m = int(n * frac) // 128 * 128
        tmr(f"gather_{frac:g}N", gj, heap, idx_full[:m],
            extra={"rows": m})

    # chunked full-N gathers (bit-exact rewrites of the one big gather)
    def gk(heap, ix, k):
        tot = jnp.uint32(0)
        step = ix.shape[0] // k
        for i in range(k):
            tot = tot + jnp.sum(
                heap[ix[i * step:(i + 1) * step]].astype(jnp.uint32))
        return tot
    import functools
    for k in (2, 4, 8, 16):
        tmr(f"gather_chunk{k}", jax.jit(functools.partial(gk, k=k)),
            heap, idx_full)

    # 2D-shaped gather (the production sample_material shape [Nb,128])
    idx2 = idx_full.reshape(-1, 128)

    def g2(heap, ix):
        return jnp.sum(heap[ix].astype(jnp.uint32))
    tmr("gather_2d_full", jax.jit(g2), heap, idx2)

    def g2k(heap, ix, k):
        tot = jnp.uint32(0)
        step = ix.shape[0] // k
        for i in range(k):
            tot = tot + jnp.sum(
                heap[ix[i * step:(i + 1) * step]].astype(jnp.uint32))
        return tot
    for k in (2, 4, 8):
        tmr(f"gather_2d_chunk{k}", jax.jit(functools.partial(g2k, k=k)),
            heap, idx2)


if __name__ == "__main__":
    main()
