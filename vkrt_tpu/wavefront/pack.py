"""Cross-block live-ray consolidation (Pallas) — occupancy compaction
without XLA scatters.

Problem (round-3 measured): depth>=1 shadow wavefronts are ~25% live,
spread over ~35% of trace blocks; every live block pays near-full
gating + sweeps for a handful of rays. Re-sorting with XLA machinery is
hardware-dead: cumsum+scatter radix permutations cost ~420 ms/frame at
1080p against XLA's ~30M scatter-rows/s ceiling (ROADMAP.md, resort
post-mortem) — the IDEA (7.7x fewer dispatched blocks at depth 1,
tools/dirsort_sim2.py) died on the data movement, not on the sim.

This module moves the rays with Pallas instead, using only primitives
the trace kernels already prove on this hardware:

  * scalar-prefetched dynamic-offset HBM DMA READS (the cluster-slab
    pattern from rt/dense.py) — never a dynamic write;
  * one-hot MXU matmuls at precision=HIGHEST (the attribute-select
    pattern) to permute lanes inside VMEM;
  * static out_specs writes.

Layout contract: a STABLE compaction by global live rank. Stability
preserves the camera-tile surface order inside the live prefix, so
packed blocks stay spatially coherent (the property the dirsort sims
showed carries most of the shadow win). Rank arithmetic:

  grank[ray]  = index among live rays (XLA cumsum — one pass, no
                scatter), -1 for dead rays
  dst block d = rays with grank in [R*d, R*(d+1))

`consolidate` runs one program per DESTINATION block: it walks the
contiguous range of source blocks whose rank intervals intersect
(while_loop over a scalar-prefetch [lo, hi] pair — ranks are
monotone in ray order, so sources form a contiguous run), DMAs each
source's channel slab, and accumulates

  packed[c, dst_lane] += sum_src state[c, src] * PT[src, dst]

where PT's one-hot column for source lane j is (grank[j] - R*d ==
dst_lane) — built per 128-lane source group from a (1,128)->(128,1)
transpose (the only Mosaic-legal narrow transpose shape) so the MXU
contraction runs over the group's lanes. Dead rays carry grank -1 and
match no column. `scatter_back` is the mirror: one program per SOURCE
block; a source's live ranks span at most two destination blocks, so
it DMAs <=2 packed-result slabs and contracts with the transposed
one-hot built directly from a sublane iota (no transpose needed).

Cost model (1080p, R=1024, C~17): ~132MB of state moved twice at HBM
bandwidth + ~2 DMAs per block + G small [C,128]x[128,R] matmuls per
(dst, src) pair — milliseconds, vs ~420 ms for the XLA route.

Exactness: one-hot f32 matmuls at precision=HIGHEST reproduce the
selected f32 values exactly (bf16x3 passes multiply by exact 0/1 —
same argument as the rt/dense.py attribute select); verified bit-exact
in tests and on hardware (tools/r3_hw_queue6.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_HIGH = jax.lax.Precision.HIGHEST


def consolidate_plan(live, block: int):
    """XLA prologue: ranks + per-destination source ranges. No scatters.

    live: bool[Nb, 128] (row-major ray order). Returns dict with
      grank   f32[Nb,128]   global live rank, -1 on dead rays
      src_lo  i32[Nbk]      first source block intersecting dst d
      src_hi  i32[Nbk]      last  source block intersecting dst d
      nlive   i32[]         total live rays
    """
    nb = live.shape[0]
    n = live.size
    nbk = n // block
    flat = live.reshape(-1)
    incl = jnp.cumsum(flat.astype(jnp.int32))
    grank = jnp.where(flat, incl - 1, -1).astype(jnp.float32)
    nlive = incl[-1]
    # cum[s] = live rays in blocks < s  (cum has Nbk+1 entries)
    cnt = flat.astype(jnp.int32).reshape(nbk, block).sum(axis=1)
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)])
    d_lo = jnp.arange(nbk, dtype=jnp.int32) * block        # rank R*d
    # first s with cum[s+1] > R*d ; last s with cum[s] < R*(d+1)
    src_lo = jnp.sum(cum[1:][None, :] <= d_lo[:, None], axis=1)
    src_hi = jnp.sum(cum[:-1][None, :] < (d_lo + block)[:, None],
                     axis=1) - 1
    return dict(grank=grank.reshape(live.shape), src_lo=src_lo,
                src_hi=src_hi, nlive=nlive)


def _consolidate_kernel(range_ref, state_hbm,
                        out_ref,
                        slab, sem, *, block: int, cp: int, nbuf: int):
    R = block
    G = R // LANES
    d = pl.program_id(0)
    out_ref[...] = jnp.zeros((1, cp, R), jnp.float32)
    lo = range_ref[0, 0, 0]
    hi = range_ref[0, 0, 1]

    def issue(s, slot):
        cp_ = pltpu.make_async_copy(state_hbm.at[s], slab.at[slot],
                                    sem.at[slot])
        cp_.start()

    def wait(s, slot):
        pltpu.make_async_copy(state_hbm.at[s], slab.at[slot],
                              sem.at[slot]).wait()

    # prime the pipeline
    @pl.when(lo <= hi)
    def _():
        for b in range(nbuf):
            @pl.when(lo + b <= hi)
            def _():
                issue(lo + b, (lo + b) % nbuf)

    def body(s, _):
        slot = s % nbuf
        wait(s, slot)
        acc = out_ref[...]                       # [1, cp, R]
        base = jnp.float32(block) * jnp.float32(d)
        for g in range(G):
            sl = slice(g * LANES, (g + 1) * LANES)
            # fresh ref loads per group (lane-slices of loaded values
            # carry offset layouts Mosaic rejects — rt/dense.py note)
            rel = slab[slot, cp - 1:cp, sl] - base       # [1,128] grank
            rel_t = jnp.transpose(rel).astype(jnp.int32)  # [128,1] exact
            pt = jnp.where(
                rel_t == jax.lax.broadcasted_iota(jnp.int32,
                                                  (LANES, R), 1),
                1.0, 0.0)                                # [128, R]
            xg = slab[slot, :, sl]                       # [cp, 128]
            acc = acc + jax.lax.dot_general(
                xg, pt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_HIGH)[None, :, :]
        out_ref[...] = acc
        # re-issue into the freed slot only AFTER the matmuls consumed it
        # (issuing before the reads races the DMA against the compute)
        @pl.when(s + nbuf <= hi)
        def _():
            issue(s + nbuf, (s + nbuf) % nbuf)
        return 0

    @pl.when(lo <= hi)
    def _():
        jax.lax.fori_loop(lo, hi + 1, body, 0, unroll=False)


def consolidate(channels, grank, src_lo, src_hi, *, block: int,
                interpret: bool = False):
    """Pack `channels` (list of f32[Nb,128]) by live rank.

    Returns list of packed f32[Nb,128] (dead tail = 0). Rays with
    grank -1 vanish; position p holds the ray whose grank == p.
    """
    nb, lanes = grank.shape
    n = nb * lanes
    nbk = n // block
    G = block // LANES
    C = len(channels)
    cp = -(-(C + 1) // 8) * 8                     # +1 rank channel, 8-align
    state = jnp.stack(list(channels)
                      + [jnp.zeros_like(grank)] * (cp - 1 - C)
                      + [grank], axis=0)          # [cp, Nb, 128]
    state = state.reshape(cp, nbk, block).transpose(1, 0, 2)  # [Nbk,cp,R]

    nbuf = 2
    out = pl.pallas_call(
        functools.partial(_consolidate_kernel, block=block, cp=cp,
                          nbuf=nbuf),
        grid=(nbk,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, cp, block), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbk, cp, block), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, cp, block), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=interpret,
    )(jnp.stack([src_lo, src_hi]
                + [jnp.zeros(nbk, jnp.int32)] * 6,
                axis=1).reshape(nbk, 1, 8), state)
    return [out[:, c, :].reshape(nb, lanes) for c in range(C)]


def _scatter_kernel(grank_ref, res_hbm, out_ref, slab, sem,
                    *, block: int, ns: int, nbk: int):
    R = block
    G = R // LANES
    out_ref[...] = jnp.zeros((1, ns, R), jnp.float32)

    # destination blocks this source's live ranks touch: live ranks are
    # a contiguous range of <= R, so at most 2 packed blocks
    g0 = grank_ref[0, 0]                       # [1, R] f32 (-1 dead)
    live = g0 >= 0
    rmin = jnp.min(jnp.where(live, g0, jnp.float32(3e38)))
    rmax = jnp.max(jnp.where(live, g0, -1.0))
    d0 = jnp.floor(rmin / R).astype(jnp.int32)
    d1 = jnp.floor(rmax / R).astype(jnp.int32)
    d1 = jnp.minimum(d1, nbk - 1)

    def body(d, _):
        cp_ = pltpu.make_async_copy(res_hbm.at[d], slab.at[0], sem.at[0])
        cp_.start()
        cp_.wait()
        acc = out_ref[...]                       # [1, ns, R]
        base = jnp.float32(R) * jnp.float32(d)
        rel = (grank_ref[0, 0] - base).astype(jnp.int32)   # [1, R] exact
        # Q[dst_sub, src_lane] = (dst_sub == rel[src]) — no transpose
        for g in range(G):
            qg = jnp.where(
                jax.lax.broadcasted_iota(
                    jnp.int32, (LANES, R), 0) + jnp.int32(g * LANES)
                == rel, 1.0, 0.0)                # [128 dst, R src]
            resg = slab[0, :, g * LANES:(g + 1) * LANES]   # [ns, 128]
            acc = acc + jax.lax.dot_general(
                resg, qg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_HIGH)[None, :, :]
        out_ref[...] = acc
        return 0

    @pl.when(rmax >= 0)
    def _():
        jax.lax.fori_loop(d0, d1 + 1, body, 0, unroll=False)


def scatter_back(results, grank, *, block: int, interpret: bool = False):
    """Inverse of `consolidate` for per-ray RESULTS of the packed
    dispatch: results f32[ns, Nb, 128] in packed order → original
    order (dead rays get 0)."""
    ns, nb, lanes = results.shape
    n = nb * lanes
    nbk = n // block
    res = results.reshape(ns, nbk, block).transpose(1, 0, 2)  # [Nbk,ns,R]
    gr = grank.reshape(1, nbk, 1, block).transpose(1, 0, 2, 3)
    # ns must 8-align for the VMEM slab sublane dim
    nsp = -(-ns // 8) * 8
    if nsp != ns:
        res = jnp.concatenate(
            [res, jnp.zeros((nbk, nsp - ns, block), jnp.float32)], axis=1)

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, block=block, ns=nsp, nbk=nbk),
        grid=(nbk,),
        in_specs=[
            pl.BlockSpec((1, 1, 1, block), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, nsp, block), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbk, nsp, block), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, nsp, block), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(gr, res)
    return jnp.stack([out[:, s, :].reshape(nb, lanes) for s in range(ns)])
