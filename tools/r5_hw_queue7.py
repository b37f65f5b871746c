"""Round-5 hardware queue, part 7: chunked-gather win — artifact or real?

q6 found the 2.09M-row packed-heap gather is 61.3 ms whole but 41.7 ms
as 16 sequential FLAT chunks (bit-exact row set; 2D [Nb,128] chunking
shows no win). These rows check (a) the win survives output
MATERIALIZATION (q6 fused a sum into each chunk), (b) the optimal chunk
count, (c) a chunked sample_material prototype on production-shaped
inputs vs the shipped sampler.

Run: python -u tools/r5_hw_queue7.py > /tmp/r5q7.out 2>&1
"""
import functools
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

    # (a)+(b): materialized chunked gather — concat THEN reduce, so every
    # chunk's [m,48] output is a real buffer
    def gmat(heap, ix, k):
        step = ix.shape[0] // k
        outs = [heap[ix[i * step:(i + 1) * step]] for i in range(k)]
        return jnp.sum(jnp.concatenate(outs).astype(jnp.uint32))
    for k in (1, 8, 16, 32, 64, 128):
        tmr(f"gather_mat_chunk{k}",
            jax.jit(functools.partial(gmat, k=k)), heap, idx_full)

    # (c): production-shaped sampler A/B — random hit ids/uvs over the
    # real material tables, lane-major [Nb,128]
    nb = n // 128
    ids = jnp.asarray(rng.integers(0, tex.level_offset.shape[0],
                                   (nb, 128)).astype(np.int32))
    uv = jnp.asarray(rng.uniform(0, 1, (2, nb, 128)).astype(np.float32))

    from vkrt_tpu.shade.sampling import sample_material

    def samp(heap, ids, uv):
        return [x.sum() for x in sample_material(
            heap, tex.level_offset, tex.level_width, tex.level_height,
            ids, uv)]
    tmr("sample_material_prod", jax.jit(samp), heap, ids, uv)

    def samp_chunk(heap, ids, uv, k):
        off = tex.level_offset[ids, 0]
        w = tex.level_width[ids, 0]
        h = tex.level_height[ids, 0]
        x = uv[0] * w - 0.5
        y = uv[1] * h - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx, fy = x - x0, y - y0
        xi = jnp.mod(x0, w)
        yi = jnp.mod(y0, h)
        ixf = (off + yi * w + xi).reshape(-1)          # flat [N]
        step = ixf.shape[0] // k
        outs = [heap[ixf[i * step:(i + 1) * step]] for i in range(k)]
        rows_ = jnp.concatenate(outs).reshape(ids.shape[0], 128, 48)
        q = rows_.astype(jnp.float32) / 255.0
        w00 = ((1 - fx) * (1 - fy))[..., None]
        w10 = (fx * (1 - fy))[..., None]
        w01 = ((1 - fx) * fy)[..., None]
        w11 = (fx * fy)[..., None]
        return [q.sum(), (w00 + w10 + w01 + w11).sum()]
    for k in (16, 32):
        tmr(f"sample_gatherflat_chunk{k}",
            jax.jit(functools.partial(samp_chunk, k=k)), heap, ids, uv)


if __name__ == "__main__":
    main()
