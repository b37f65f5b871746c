"""Round-4: device-SAH cost decomposition, take 2 — CHAINED in-graph
repetition (one scalar out per jit; the tunnel's ~5ms/leaf readback
poisoned the take-1 numbers; tools/r4_sah_probe.py post-mortem).

Each op runs n times inside one jit with a data dependency between
iterations; per-op cost = (t(n=17) - t(n=1)) / 16.

Run: python -u tools/r4_sah_probe2.py > /tmp/r4sp2.out 2>&1
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu.utils.cache import enable_compilation_cache

Tp = 262400
K1 = 128
Nc = Tp // K1
NBINS = 16


def timed(jf, *args, reps=3):
    r = jf(*args)
    float(jnp.sum(r))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = jf(*args)
        float(jnp.sum(r))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def chain(name, body, init, n_lo=1, n_hi=17):
    import functools

    def run(n):
        @jax.jit
        def f(*a):
            c = a
            for _ in range(n):
                c = body(*c)
            return jnp.sum(c[0].astype(jnp.float32))
        return timed(f, *init)
    t1 = run(n_lo)
    t2 = run(n_hi)
    per = (t2 - t1) / (n_hi - n_lo)
    print(json.dumps({"step": name, "ms_per_op": round(per, 2),
                      "t1": round(t1, 1), "t17": round(t2, 1)}), flush=True)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 30, Tp), jnp.uint32)
    idx = jnp.arange(Tp, dtype=jnp.int32)
    x3 = jnp.asarray(rng.normal(size=(Tp, 3)).astype(np.float32))

    def sort_body(k, i):
        k2, i2 = jax.lax.sort((k, i), num_keys=1, is_stable=True)
        return (k2 ^ i2.astype(jnp.uint32)) & jnp.uint32((1 << 30) - 1), i2
    chain("lax_sort_262k", sort_body, (key, idx))

    def gather_body(x, p):
        y = x[p]
        return y, (p + 1) % Tp
    chain("gather_Tp3", gather_body, (x3, idx[::-1] % Tp))

    # binned axis-choice block, chained via bin-id perturbation
    sid_c = jnp.asarray(np.sort(rng.integers(0, 64, Nc)).astype(np.int32))
    omin = jnp.asarray(rng.normal(size=(Nc, K1, 3)).astype(np.float32))

    def bin_body(omin, sid_c):
        omax = omin + 1.0
        cen_o = (omin + omax) * 0.5
        smin = jax.ops.segment_min(cen_o.min(axis=1), sid_c,
                                   num_segments=Nc)
        smax = jax.ops.segment_max(cen_o.max(axis=1), sid_c,
                                   num_segments=Nc)
        lo_c = smin[sid_c]
        span_c = jnp.maximum(smax[sid_c] - lo_c, 1e-12)
        bin_t = jnp.clip((cen_o - lo_c[:, None, :]) / span_c[:, None, :]
                         * NBINS, 0.0, NBINS - 1.0).astype(jnp.int32)
        acc = jnp.zeros((Nc, 3), jnp.float32)
        for ax in range(3):
            for b in range(NBINS):
                m = (bin_t[..., ax] == b)
                cmn = jnp.where(m[..., None], omin, 3e38).min(axis=1)
                acc = acc + jax.ops.segment_min(cmn, sid_c,
                                                num_segments=Nc)
        return omin + acc[:, None, :] * 1e-9, sid_c
    chain("bin_axis_choice", bin_body, (omin, sid_c), n_lo=1, n_hi=9)

    from vkrt_tpu.accel.device_sah import _seg_scan_box
    cb = jnp.zeros(Nc, bool).at[jnp.arange(0, Nc, 32)].set(True)
    nmin = jnp.asarray(rng.normal(size=(Nc, 3)).astype(np.float32))

    def scan_body(nmin, cb):
        a = _seg_scan_box(cb, nmin, nmin + 1.0, nmin[:, 0])
        b = _seg_scan_box(jnp.concatenate([cb[1:], jnp.ones(1, bool)])[::-1],
                          nmin[::-1], nmin[::-1] + 1.0, nmin[::-1, 0])
        return nmin + a[0] * 1e-9 + b[0][::-1] * 1e-9, cb
    chain("segscan_pair", scan_body, (nmin, cb), n_lo=1, n_hi=9)


if __name__ == "__main__":
    main()
