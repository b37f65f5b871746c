"""Round-4: device-SAH per-level cost decomposition on TPU.

device_sah_order(L16) measured 386 ms = ~24 ms/level (tools/r4_hw_queue2).
This probe times the level's components in isolation so optimization
targets the real cost:
  (a) lax.sort of [Tp] u32 key + i32 payload (the per-level sort)
  (b) the same sort with 11 f32 payload operands (carry-state variant)
  (c) one [Tp,3] f32 gather by permutation (x7 per level currently)
  (d) the triangle-granularity binned axis choice block alone
  (e) segmented chunk scans + cut selection alone

Run: python -u tools/r4_sah_probe.py > /tmp/r4sp.out 2>&1
"""
import functools
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


def _force(r):
    # block_until_ready undercounts on the axon tunnel (CLAUDE.md) —
    # force completion by summing every leaf
    leaves = jax.tree_util.tree_leaves(r)
    return sum(float(jnp.sum(x.astype(jnp.float32))) if x.dtype != jnp.uint32
               else float(jnp.sum(x.astype(jnp.float32))) for x in leaves)


def tmr(name, jf, *args, reps=5):
    r = jf(*args)
    _force(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = jf(*args)
        _force(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(json.dumps({"step": name, "ms": round(best * 1e3, 2)}), flush=True)
    return r


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 30, Tp), jnp.uint32)
    idx = jnp.arange(Tp, dtype=jnp.int32)
    perm = jnp.asarray(rng.permutation(Tp).astype(np.int32))
    x3 = jnp.asarray(rng.normal(size=(Tp, 3)).astype(np.float32))
    states = [jnp.asarray(rng.normal(size=(Tp,)).astype(np.float32))
              for _ in range(11)]

    tmr("sort_key_idx", jax.jit(
        lambda k, i: jax.lax.sort((k, i), num_keys=1, is_stable=True)),
        key, idx)
    tmr("sort_key_11payloads", jax.jit(
        lambda k, *s: jax.lax.sort((k,) + s, num_keys=1, is_stable=True)),
        key, *states)
    tmr("gather_Tp3", jax.jit(lambda x, p: x[p]), x3, perm)
    tmr("gather_Tp3_x7", jax.jit(
        lambda x, p: [x[p] + i for i in range(7)]), x3, perm)

    # (d) binned axis choice block (as in device_sah.level)
    sid_c = jnp.asarray(np.sort(rng.integers(0, 64, Nc)).astype(np.int32))
    omin = jnp.asarray(rng.normal(size=(Nc, K1, 3)).astype(np.float32))
    omax = omin + 1.0
    tw = jnp.ones((Nc, K1), jnp.float32)

    def bin_block(omin, omax, tw, sid_c):
        cen_o = (omin + omax) * 0.5
        smin = jax.ops.segment_min(cen_o.min(axis=1), sid_c,
                                   num_segments=Nc)
        smax = jax.ops.segment_max(cen_o.max(axis=1), sid_c,
                                   num_segments=Nc)
        lo_c = smin[sid_c]
        span_c = jnp.maximum(smax[sid_c] - lo_c, 1e-12)
        bin_t = jnp.clip((cen_o - lo_c[:, None, :]) / span_c[:, None, :]
                         * NBINS, 0.0, NBINS - 1.0).astype(jnp.int32)
        outs = []
        for ax in range(3):
            for b in range(NBINS):
                m = (bin_t[..., ax] == b)
                cmn = jnp.where(m[..., None], omin, 3e38).min(axis=1)
                cct = (m * tw).sum(axis=1)
                outs.append(jax.ops.segment_min(cmn, sid_c,
                                                num_segments=Nc))
                outs.append(jax.ops.segment_sum(cct, sid_c,
                                                num_segments=Nc))
        return outs
    tmr("bin_axis_choice_block", jax.jit(bin_block), omin, omax, tw, sid_c)

    # (e) segmented scans + cut selection
    from vkrt_tpu.accel.device_sah import _seg_scan_box
    cb = jnp.zeros(Nc, bool).at[jnp.arange(0, Nc, 32)].set(True)
    nmin = jnp.asarray(rng.normal(size=(Nc, 3)).astype(np.float32))
    nmax = nmin + 1.0
    ncnt = jnp.full((Nc,), 128.0)

    def scans(cb, nmin, nmax, ncnt):
        a = _seg_scan_box(cb, nmin, nmax, ncnt)
        b = _seg_scan_box(jnp.concatenate([cb[1:],
                                           jnp.ones(1, bool)])[::-1],
                          nmin[::-1], nmax[::-1], ncnt[::-1])
        return a, b
    tmr("segmented_scans", jax.jit(scans), cb, nmin, nmax, ncnt)

    # full level reference
    from vkrt_tpu.accel.device_sah import device_sah_order
    v0 = jnp.asarray(rng.uniform(-5, 5, (262267, 3)).astype(np.float32))
    e1 = jnp.asarray(rng.uniform(-0.1, 0.1, (262267, 3)).astype(np.float32))
    e2 = jnp.asarray(rng.uniform(-0.1, 0.1, (262267, 3)).astype(np.float32))
    tmr("device_sah_order_L16_synth", jax.jit(
        functools.partial(device_sah_order, max_levels=16)), v0, e1, e2,
        reps=1)


if __name__ == "__main__":
    main()
