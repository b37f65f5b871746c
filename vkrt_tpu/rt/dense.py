"""Dense-streaming trace kernel (Pallas) — the production TPU hot loop.

This is the TPU-shaped replacement for `vkCmdTraceRaysKHR`
(ref: src/Raytracer.cpp:157). Design rationale (measured on v5e):

  * XLA random gathers: ~30M rows/s — a per-ray BVH walk needs ~100
    gathers/ray → hard-capped at ~0.3 Mrays/s. Dead end.
  * dense vector tests: 17 Gtests/s in plain XLA, more in Pallas where
    operands stay in VMEM/registers.

So rays never chase pointers. Instead, a grid of coherent ray blocks
(one Pallas program per block of R rays) streams the scene through VMEM:

  phase 1  all supercluster AABBs (VMEM-resident) tested densely against
           the block; OR-reduced over rays → multi-word scalar bitmask
           (any scene size), walked in per-block front-to-back order
           (precomputed in the XLA prologue).
  phase 2  per gated supercluster, its 64 VMEM-resident cluster AABBs are
           dense-tested once; gated CLUSTER ids + a conservative t lower
           bound (min slab-entry t over hitting rays) land in an SMEM
           work list, then the list is insertion-sorted by that bound so
           the walk is strictly nearest-first.
  phase 3  the sorted list is streamed with an NBUF-deep per-cluster DMA
           pipeline (K1·ROWS·4 = 64KB per slab, 256KB of VMEM at
           NBUF=4); a scalar prune against the block's
           shrinking max-t (btmax) skips both the DMA and the sweep of
           clusters no live ray can reach. Each surviving cluster:
           Möller–Trumbore of all R rays against its 128 triangles in one
           VPU sweep; best hits (and, with `with_attributes`, all 36
           per-corner shading attributes) are committed with masked
           reductions — no gather anywhere.

SWEEP ORIENTATION (round-2 rework): triangles live on SUBLANES, rays on
LANES — sweeps are [K1, R] with tri constants [K1,1] and ray components
[1,R]. The round-1 orientation (rays on sublanes) needed 28 input
transposes, 40+ output relayouts and 64-vreg [R,1] per-ray state per
block; in this orientation ray I/O is a free reshape of the engine's
lane-major layout, per-ray state is [1,R] (4 vregs), and per-ray
reductions run along the cheap sublane axis.

Dead rays park with tmax=0 (wavefront/engine.py): the `t_s > TMIN` gate
clause makes them invisible to all gating, so sparse secondary-ray
wavefronts cost only their live blocks — compaction without a sort.

Closest-hit and occlusion variants mirror the reference's two trace
flavors (shader.rgen:51-62 vs shader.rchit:113-116). The occlusion
variant adds an all-rays-blocked early-out on the triangle work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkrt_tpu.accel.clusters import (K1, K2, ROWS, SUBRUNS, SUB_COL,
                                     ClusterTree)

TMIN = 0.001          # ref: shaders/shader.rgen:59
_INF = 3.0e38
_DET_EPS = 1e-12
LANES = 128


def _safe_inv(x):
    tiny = 1e-20
    return 1.0 / jnp.where(jnp.abs(x) < tiny, jnp.where(x < 0, -tiny, tiny), x)


def _partition_worklists(gate, tlb, extra=None):
    """Compact gated clusters to the front WITHOUT sorting: a stable
    cumsum partition (one scatter), NOT argsort — fusing lax.sort into
    the frame jit is the measured ~400s-remote-compile landmine
    (CLAUDE.md). Used by pregate="recheck", which refines per-entry t
    bounds in-kernel at DMA-issue time, so a front-to-back prologue
    order is not load-bearing there (secondary dispatches run
    sort=False anyway — ROADMAP per-depth sort policy)."""
    nblocks, maxc = gate.shape
    g = gate.astype(jnp.int32)
    iota = jnp.arange(maxc, dtype=jnp.int32)[None, :]
    ones = jnp.cumsum(g, axis=1)                   # inclusive gated count
    count = ones[:, -1]
    pos = jnp.where(gate, ones - 1, count[:, None] + iota - ones)
    rows = jnp.broadcast_to(
        jnp.arange(nblocks, dtype=jnp.int32)[:, None], pos.shape)
    order = jnp.zeros_like(pos).at[rows, pos].set(
        jnp.broadcast_to(iota, pos.shape), unique_indices=True)
    tlb_sorted = jnp.take_along_axis(jnp.where(gate, tlb, 0.0), order,
                                     axis=1)
    cp = -(-maxc // 64) * 64
    pad = cp - maxc
    order_p = jnp.pad(order, ((0, 0), (0, pad)))
    tlb_p = jnp.pad(tlb_sorted, ((0, 0), (0, pad)))
    count8 = jnp.broadcast_to(count[:, None, None], (nblocks, 1, 8))
    out = (order_p.reshape(nblocks, 1, cp), tlb_p.reshape(nblocks, 1, cp),
           count8)
    if extra is not None:
        ex = jnp.take_along_axis(extra, order, axis=1)
        out = out + (jnp.pad(ex, ((0, 0), (0, pad)))
                     .reshape(nblocks, 1, cp),)
    return out


def _cluster_bounds_smem(tree):
    """Flat per-cluster AABB table [6, maxc] (lo xyz, hi xyz) — the
    SMEM operand pregate="recheck" reads per work-list entry (dynamic
    scalar SMEM indexing; cl_boxes lives in VMEM where dynamic-lane
    scalar reads are a Mosaic no-go)."""
    maxc = tree.tri_data.shape[0]
    lo = [tree.cl_boxes[:, a, :].reshape(-1)[:maxc] for a in range(3)]
    hi = [tree.cl_boxes[:, a + 3, :].reshape(-1)[:maxc] for a in range(3)]
    return jnp.stack(lo + hi)


def _pregate_worklists(tree, origins, dirs, tmax, *, block: int,
                       point_origin: bool):
    """XLA-prologue work lists for coherent dispatches (pregate=True).

    Replaces the kernel's per-ray prepass (dense [C,R] box tests +
    scalar emission + scalar insertion sort) with ONE vectorized
    interval-arithmetic slab test per (block, cluster): the block's live
    rays are summarized as per-axis origin/direction intervals, and a
    cluster is gated iff the interval slab test can't rule out every
    ray. This is a conservative SUPERSET of the per-ray union (outputs
    stay bit-identical; extra clusters only cost sweeps), tight for
    coherent blocks — camera tiles and point-origin shadow cones — and
    hopeless for scattered depth>=1 wavefronts (a wide direction
    interval spans zero on every axis → gates everything), so callers
    use it at depth 0 only.

    Returns (order i32[nblocks, Cp], tlb f32[nblocks, Cp],
    count i32[nblocks, 1, 8]): cluster ids sorted front-to-back by a
    conservative entry lower bound, their bounds, and the per-block
    gated count (lane 0).
    """
    gate, tlb, _ = _interval_gate(tree, origins, dirs, tmax, block=block,
                                  point_origin=point_origin)
    return _pack_worklists(gate, tlb)


def _interval_gate(tree, origins, dirs, tmax, *, block: int,
                   point_origin: bool):
    """Conservative per-(block, cluster) gate + entry lower bound via
    interval-arithmetic slab tests (see _pregate_worklists). Returns
    (gate bool[nblocks, maxc], tlb f32[nblocks, maxc], nblocks)."""
    maxc = tree.tri_data.shape[0]
    nblocks = tmax.size // block
    live = tmax.reshape(nblocks, block) > TMIN
    d = dirs.reshape(3, nblocks, block)
    big = jnp.float32(_INF)

    def masked_minmax(v):
        return (jnp.min(jnp.where(live, v, big), axis=1),
                jnp.max(jnp.where(live, v, -big), axis=1))

    dmin, dmax = zip(*[masked_minmax(d[a]) for a in range(3)])
    if point_origin:
        ob = origins.T                                   # [3, nblocks]
        omin = omax = [ob[a] for a in range(3)]
        omin, omax = list(omin), list(omax)
    else:
        o = origins.reshape(3, nblocks, block)
        omin, omax = zip(*[masked_minmax(o[a]) for a in range(3)])
    tmax_max = jnp.max(jnp.where(live, tmax.reshape(nblocks, block), 0.0),
                       axis=1)                           # [nblocks]

    lo = [tree.cl_boxes[:, a, :].reshape(-1)[:maxc] for a in range(3)]
    hi = [tree.cl_boxes[:, a + 3, :].reshape(-1)[:maxc] for a in range(3)]

    tn_low = jnp.full((nblocks, maxc), -big)
    tf_high = jnp.full((nblocks, maxc), big)
    for a in range(3):
        pos = dmin[a] > 1e-20
        neg = dmax[a] < -1e-20
        bounded = pos | neg
        # reciprocal interval [1/dmax, 1/dmin] (valid for all-pos or
        # all-neg direction intervals; sign-spanning axes are unbounded
        # and add no constraint)
        i_lo = jnp.where(bounded, 1.0 / jnp.where(bounded, dmax[a], 1.0),
                         -big)[:, None]
        i_hi = jnp.where(bounded, 1.0 / jnp.where(bounded, dmin[a], 1.0),
                         big)[:, None]
        n_l = [lo[a][None, :] - omax[a][:, None],
               hi[a][None, :] - omax[a][:, None]]
        n_h = [lo[a][None, :] - omin[a][:, None],
               hi[a][None, :] - omin[a][:, None]]

        def hull(nl, nh):
            c = [nl * i_lo, nl * i_hi, nh * i_lo, nh * i_hi]
            m_lo = jnp.minimum(jnp.minimum(c[0], c[1]),
                               jnp.minimum(c[2], c[3]))
            m_hi = jnp.maximum(jnp.maximum(c[0], c[1]),
                               jnp.maximum(c[2], c[3]))
            return m_lo, m_hi

        t0_lo, t0_hi = hull(n_l[0], n_h[0])
        t1_lo, t1_hi = hull(n_l[1], n_h[1])
        tn_a_lo = jnp.minimum(t0_lo, t1_lo)
        tf_a_hi = jnp.maximum(t0_hi, t1_hi)
        unb = ~bounded[:, None]
        tn_low = jnp.maximum(tn_low, jnp.where(unb, -big, tn_a_lo))
        tf_high = jnp.minimum(tf_high, jnp.where(unb, big, tf_a_hi))

    valid = lo[0] <= hi[0]                               # padded clusters
    gate = ((tn_low <= tf_high) & (tf_high >= TMIN)
            & (tn_low <= tmax_max[:, None]) & valid[None, :])
    tlb = 0.9999 * jnp.maximum(jnp.where(tn_low <= -big, 0.0, tn_low), 0.0)
    return gate, tlb, nblocks


def _pack_worklists(gate, tlb, extra=None):
    """Sort gated clusters front-to-back and pad for SMEM streaming.
    extra: optional i32[nblocks, maxc] per-cluster payload (multi-kernel
    segment-set bits) reordered alongside."""
    nblocks, maxc = gate.shape
    key = jnp.where(gate, tlb, jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)   # [nblocks, maxc]
    tlb_sorted = jnp.take_along_axis(jnp.where(gate, tlb, 0.0), order,
                                     axis=1)
    count = jnp.sum(gate, axis=1).astype(jnp.int32)
    cp = -(-maxc // 64) * 64
    pad = cp - maxc
    order_p = jnp.pad(order, ((0, 0), (0, pad)), constant_values=-1)
    tlb_p = jnp.pad(tlb_sorted, ((0, 0), (0, pad)))
    count8 = jnp.broadcast_to(count[:, None, None], (nblocks, 1, 8))
    out = (order_p.reshape(nblocks, 1, cp), tlb_p.reshape(nblocks, 1, cp),
           count8)
    if extra is not None:
        ex = jnp.take_along_axis(extra, order, axis=1)
        out = out + (jnp.pad(ex, ((0, 0), (0, pad)))
                     .reshape(nblocks, 1, cp),)
    return out


def _trace_kernel(order_ref, sc_ref, cl_ref, o_ref, d_ref, tmax_ref,
                  wl_order, wl_tlb, wl_count, clb, tri_hbm,
                  # outputs
                  t_out, slot_out, u_out, v_out, attr_out, stats_out,
                  # scratch
                  tris, sem, gated, tlb, started, nlist,
                  counters, sc_mask, btmax, t_s, slot_s, u_s, v_s, attr_s,
                  gmask, btmaxg,
                  *, n_sc: int, occlusion: bool, with_attributes: bool,
                  stats: bool, point_origin: bool, approx_recip: bool,
                  sort: bool = True, group_gate: bool = False,
                  pregate: str = "", ablate: str = "",
                  sub_gate: bool = False):
    recheck = pregate == "recheck"
    R = d_ref.shape[-1]           # rays per block, on lanes
    NBUF = sem.shape[0]           # per-cluster DMA pipeline depth
    K1 = tris.shape[1]            # triangles per cluster (from the build)
    G = R // LANES                # 128-lane ray groups per block

    if point_origin:
        # the whole block shares ONE origin point (primary rays: the
        # camera; shadow rays: the light) — scalars from SMEM. Everything
        # mixing origin with per-TRIANGLE constants then stays [K1,1]
        # instead of [K1,R] (s, q = s x e1, tp = e2·q): ~27% fewer sweep
        # VPU ops, measured round 2
        ox, oy, oz = o_ref[0, 0, 0], o_ref[0, 0, 1], o_ref[0, 0, 2]
    else:
        ox, oy, oz = o_ref[0, 0], o_ref[1, 0], o_ref[2, 0]   # [1,R]
    dx, dy, dz = d_ref[0, 0], d_ref[1, 0], d_ref[2, 0]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    tmax = tmax_ref[0]                                        # [1,R]

    t_s[:] = tmax
    slot_s[:] = jnp.full((1, R), -1, jnp.int32)
    u_s[:] = jnp.zeros((1, R), jnp.float32)
    v_s[:] = jnp.zeros((1, R), jnp.float32)
    btmax[0] = jnp.max(tmax)
    if group_gate:
        for g in range(G):
            btmaxg[g] = jnp.max(tmax[:, g * LANES:(g + 1) * LANES])
    nlist[0] = 0
    if with_attributes:
        attr_s[:] = jnp.zeros_like(attr_s)
    if stats:
        counters[0] = 0
        counters[1] = 0

    def slab_entry(bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z):
        """Dense slab test boxes x rays ([L,1] vs [1,R] → [L,R]).
        Returns (any-hit per box [L,1], conservative box-entry t [L,1] =
        min over hitting rays of their slab tn — the tight, DIRECTIONAL
        lower bound on any hit t inside the box).

        The `t_s > TMIN` clause removes parked rays (engine passes tmax=0
        for inactive lanes) and occlusion-blocked rays (t_s pinned to TMIN)
        from all gating — dead rays gate nothing, so all-dead blocks cost
        only this one sweep."""
        t0x = (bmin_x - ox) * ix
        t1x = (bmax_x - ox) * ix
        t0y = (bmin_y - oy) * iy
        t1y = (bmax_y - oy) * iy
        t0z = (bmin_z - oz) * iz
        t1z = (bmax_z - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        hit = (tn <= tf) & (tf >= TMIN) & (tn <= t_s[:]) & (t_s[:] > TMIN)
        entry = jnp.min(jnp.where(hit, tn, _INF), axis=1, keepdims=True)
        return jnp.any(hit, axis=1, keepdims=True), entry, hit

    def tri_block(slot, base_slot, g=None, run=None):
        """Möller–Trumbore: R rays (lanes) against the 128 tris
        (sublanes) of pipeline buffer `slot`; base_slot = global cluster
        id. All products are [K1, R]. With group_gate, g selects ONE
        128-lane ray group (static slice): products shrink to [K1,128]
        and only that group's state is read/committed — depth>=1 blocks
        mix converged rows with live rows whose directions span a wide
        cone, so ~half the whole-block sweep lanes never gate the
        cluster (tools/rowgate_sim.py: gating-row/row ratio 0.51-0.64
        at depth 1 vs 0.95 at coherent depth 0).

        With sub_gate, `run` (static) selects ONE 16-tri sub-run: the
        sweep shrinks to the [16, Rg] sublane slice; commits offset the
        selected tri index by run*16 — tie-breaks match the full sweep
        (runs visit in ascending sublane order, commits are strict <)."""
        sl = slice(None) if g is None else slice(g * LANES, (g + 1) * LANES)
        Rg = R if g is None else LANES
        rsub = K1 // SUBRUNS
        rs = slice(None) if run is None else slice(run * rsub,
                                                   (run + 1) * rsub)
        Ks = K1 if run is None else rsub
        tri_off = 0 if run is None else run * rsub
        if g is None:
            dxg, dyg, dzg = dx, dy, dz
            oxg, oyg, ozg = ox, oy, oz
        else:
            # per-group operands are FRESH tile-aligned ref loads: a lane
            # slice of an already-loaded [1,R] value carries a lane-offset
            # layout Mosaic cannot broadcast against [K1,1] operands
            # ("Invalid input layout" on vector.broadcast, measured)
            dxg = d_ref[0, 0, :, sl]
            dyg = d_ref[1, 0, :, sl]
            dzg = d_ref[2, 0, :, sl]
            if point_origin:
                oxg, oyg, ozg = ox, oy, oz           # SMEM scalars
            else:
                oxg = o_ref[0, 0, :, sl]
                oyg = o_ref[1, 0, :, sl]
                ozg = o_ref[2, 0, :, sl]
        tsg = t_s[:, sl]
        chunk = tris[slot]                            # [K1, ROWS]
        v0x, v0y, v0z = chunk[rs, 0:1], chunk[rs, 1:2], chunk[rs, 2:3]
        e1x, e1y, e1z = chunk[rs, 3:4], chunk[rs, 4:5], chunk[rs, 5:6]
        e2x, e2y, e2z = chunk[rs, 6:7], chunk[rs, 7:8], chunk[rs, 8:9]

        hx = dyg * e2z - dzg * e2y            # [K1,Rg]
        hy = dzg * e2x - dxg * e2z
        hz = dxg * e2y - dyg * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        sx, sy, sz = oxg - v0x, oyg - v0y, ozg - v0z
        up = sx * hx + sy * hy + sz * hz
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        vp = dxg * qx + dyg * qy + dzg * qz
        tp = e2x * qx + e2y * qy + e2z * qz
        adet = jnp.abs(det)

        if occlusion:
            # any-hit semantics, DIVISION-FREE: compare the pre-division
            # barycentrics/t against sign-corrected det — occlusion never
            # needs the actual u,v,t values
            sgn = jnp.where(det < 0, -1.0, 1.0)
            su, sv, st = up * sgn, vp * sgn, tp * sgn
            ok = ((adet > _DET_EPS) & (su >= 0) & (sv >= 0)
                  & (su + sv <= adet) & (st > TMIN * adet)
                  & (st < tsg * adet))
            anyhit = jnp.any(ok, axis=0, keepdims=True)   # [1,Rg]
            @pl.when(jnp.any(anyhit))
            def _():
                slot_s[:, sl] = jnp.where(anyhit, 1, slot_s[:, sl])
                t_s[:, sl] = jnp.where(anyhit, TMIN, t_s[:, sl])
                btmax[0] = jnp.max(t_s[:])    # culls later gates
                if group_gate and g is not None:
                    btmaxg[g] = jnp.max(t_s[:, sl])
            return

        safe_det = jnp.where(det == 0, 1.0, det)
        if approx_recip:
            # VPU fast reciprocal + 1 Newton step: rel err ~(2^-12)^2 —
            # below f32 roundoff of the subsequent multiplies
            r0 = pl.reciprocal(safe_det, approx=True)
            rec = r0 * (2.0 - safe_det * r0)
        else:
            rec = 1.0 / safe_det
        inv_det = jnp.where(adet > _DET_EPS, rec, 0.0)
        uu = up * inv_det
        vv = vp * inv_det
        tt = tp * inv_det
        ok = ((adet > _DET_EPS) & (uu >= 0) & (vv >= 0)
              & (uu + vv <= 1) & (tt > TMIN) & (tt < tsg))

        tm = jnp.min(jnp.where(ok, tt, _INF), axis=0, keepdims=True)  # [1,Rg]
        better = tm < tsg

        @pl.when(jnp.any(better))
        def _():
            subl = jax.lax.broadcasted_iota(jnp.int32, (Ks, Rg), 0)
            eq = ok & (tt == tm)
            tri_sel = jnp.min(jnp.where(eq, subl, Ks), axis=0, keepdims=True)
            onehot = subl == tri_sel          # [K1,Rg], one tri per better ray
            u_sel = jnp.sum(jnp.where(onehot, uu, 0.0), axis=0, keepdims=True)
            v_sel = jnp.sum(jnp.where(onehot, vv, 0.0), axis=0, keepdims=True)
            t_s[:, sl] = jnp.where(better, tm, t_s[:, sl])
            btmax[0] = jnp.max(t_s[:])
            if group_gate and g is not None:
                btmaxg[g] = jnp.max(t_s[:, sl])
            slot_s[:, sl] = jnp.where(better,
                                      base_slot * K1 + tri_off + tri_sel,
                                      slot_s[:, sl])
            u_s[:, sl] = jnp.where(better, u_sel, u_s[:, sl])
            v_s[:, sl] = jnp.where(better, v_sel, v_s[:, sl])
            if with_attributes:
                # all 36 shading attributes of each ray's winning tri in
                # ONE MXU matmul: attrs[K1,36]ᵀ·onehot[K1,R] → [36,R]
                # (36 VPU masked reduces per commit made the attrs path
                # 2x slower than the plain trace — measured round 2).
                # precision=HIGHEST: the MXU's default bf16 operand
                # truncation ROUNDS THE SELECTED ATTRIBUTES (uv/normals
                # to 8 mantissa bits) — bent reflection rays and warped
                # uvs, RMSE 0.104 vs the oracle at depth 2 (round-2 bug,
                # found by the full-scene hardware golden run)
                sel = jax.lax.dot_general(
                    chunk[rs, 0:36], onehot.astype(jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                attr_s[:, sl] = jnp.where(better, sel, attr_s[:, sl])

    def sweep_cluster(slot, base_slot, g=None):
        """One cluster's triangle work. With sub_gate, slab-test the
        SUBRUNS 16-tri sub-run AABBs riding the slab's pad columns
        (annotated at build — accel/clusters._assemble) and run only the
        hitting sub-sweeps; ~45% of swept (cluster,ray) pairs belong to
        rays whose per-ray gate is off (tools/subgroup_sim.py), which
        whole-cluster sweeps cannot skip."""
        if not sub_gate:
            tri_block(slot, base_slot, g)
            return
        sl = slice(None) if g is None else slice(g * LANES, (g + 1) * LANES)
        if g is None:
            ixg, iyg, izg = ix, iy, iz
            oxg, oyg, ozg = ox, oy, oz
        else:
            # fresh tile-aligned loads (lane-offset layout; see tri_block)
            ixg = _safe_inv(d_ref[0, 0, :, sl])
            iyg = _safe_inv(d_ref[1, 0, :, sl])
            izg = _safe_inv(d_ref[2, 0, :, sl])
            if point_origin:
                oxg, oyg, ozg = ox, oy, oz
            else:
                oxg = o_ref[0, 0, :, sl]
                oyg = o_ref[1, 0, :, sl]
                ozg = o_ref[2, 0, :, sl]
        chunk = tris[slot]
        bnx = chunk[0:SUBRUNS, SUB_COL + 0:SUB_COL + 1]      # [8,1]
        bny = chunk[0:SUBRUNS, SUB_COL + 1:SUB_COL + 2]
        bnz = chunk[0:SUBRUNS, SUB_COL + 2:SUB_COL + 3]
        bxx = chunk[0:SUBRUNS, SUB_COL + 3:SUB_COL + 4]
        bxy = chunk[0:SUBRUNS, SUB_COL + 4:SUB_COL + 5]
        bxz = chunk[0:SUBRUNS, SUB_COL + 5:SUB_COL + 6]
        tsg = t_s[:, sl]
        t0x = (bnx - oxg) * ixg
        t1x = (bxx - oxg) * ixg
        t0y = (bny - oyg) * iyg
        t1y = (bxy - oyg) * iyg
        t0z = (bnz - ozg) * izg
        t1z = (bxz - ozg) * izg
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        hit8 = ((tn <= tf) & (tf >= TMIN) & (tn <= tsg)
                & (tsg > TMIN))                              # [8,Rg]
        for r_ in range(SUBRUNS):
            @pl.when(jnp.any(hit8[r_:r_ + 1, :]))
            def _(r_=r_):
                tri_block(slot, base_slot, g, run=r_)

    # One dense pass over ALL supercluster boxes → multi-word scalar
    # bitmask in SMEM (32 superclusters per i32 word — scenes of any size,
    # the driver-BVH generality analogue of ref Raytracer.cpp:1027-1157).
    # This is the coarse (t-unaware) cull; the per-supercluster recheck
    # below implements early termination as t_s shrinks.
    if not pregate:
        scb = jnp.swapaxes(sc_ref[:], 0, 1)   # [C2p, 8]: boxes → sublanes
        sc_hits, _, _ = slab_entry(scb[:, 0:1], scb[:, 1:2], scb[:, 2:3],
                                   scb[:, 3:4], scb[:, 4:5], scb[:, 5:6])
        sc_sub = jax.lax.broadcasted_iota(jnp.int32, sc_hits.shape, 0)
        sc_w = jnp.left_shift(jnp.int32(1), sc_sub & 31)
        n_words = sc_mask.shape[0]
        for w in range(n_words):
            in_word = (sc_sub >= w * 32) & (sc_sub < (w + 1) * 32)
            sc_mask[w] = jnp.sum(jnp.where(sc_hits & in_word, sc_w, 0))

    def test_sc(s):
        word = sc_mask[jax.lax.shift_right_logical(s, 5)]
        return (jax.lax.shift_right_logical(word, s & 31) & 1) == 1

    def ctz32(low):
        # branchless scalar count-trailing-zeros of a power-of-two
        # (Mosaic has no scalar popcount)
        c = jnp.int32(0)
        for shift in (16, 8, 4, 2, 1):
            mask = (jnp.int32(1) << shift) - 1
            z = (low & mask) == 0
            c = c + jnp.where(z, shift, 0)
            low = jnp.where(z, jax.lax.shift_right_logical(low, shift), low)
        return c

    # Prepass: walk gated superclusters in front-to-back order; per SC,
    # one dense cluster-box test emits the gated CLUSTERS (global ids +
    # their conservative t lower bound) into the SMEM work list. The main
    # loop below streams INDIVIDUAL clusters (64KB slabs).
    cl_sub = jax.lax.broadcasted_iota(jnp.int32, (K2, 1), 0)

    def pre_body(k, _):
        s = order_ref[0, 0, k]

        @pl.when((s >= 0) & test_sc(s))
        def _():
            cb = jnp.swapaxes(cl_ref[s], 0, 1)    # [K2, 8]
            cl_any, entry, cl_hit = slab_entry(
                cb[:, 0:1], cb[:, 1:2], cb[:, 2:3],
                cb[:, 3:4], cb[:, 4:5], cb[:, 5:6])
            # entry = per-cluster conservative t lower bound (min slab tn
            # over hitting rays); 0.9999 guards f32 rounding of tn so the
            # prune can never discard a boundary hit
            good = cl_any & (entry < btmax[0])    # [K2,1]
            if group_gate:
                # per-cluster word of WHICH 128-lane ray groups gate it
                # (the sweep loop skips non-gating groups). Lane-slice
                # any-reduces (1/G of the hit matrix each, total 1x) —
                # the masked-iota form this replaces re-read the full
                # [K2,R] matrix per group (G x the minimal cost); the
                # slice form is the one occl_multi.py ships and compiles
                # on hardware. A/B in tools/r3_hw_queue5.py; outputs
                # bit-identical (tests/test_dense.py group-gate tests).
                gword = jnp.zeros_like(cl_sub)
                for g in range(G):
                    any_g = jnp.any(cl_hit[:, g * LANES:(g + 1) * LANES],
                                    axis=1, keepdims=True)
                    gword = gword | jnp.where(any_g, jnp.int32(1 << g), 0)
            w_bits = jnp.left_shift(jnp.int32(1), cl_sub & 31)
            cl_lo = jnp.sum(jnp.where(good & (cl_sub < 32), w_bits, 0))
            cl_hi = jnp.sum(jnp.where(good & (cl_sub >= 32), w_bits, 0))

            def word_emit(word_base, mask0):
                def body(m):
                    c = ctz32(m & (-m)) + word_base
                    cnt = nlist[0]
                    gated[cnt] = s * K2 + c
                    tlb[cnt] = 0.9999 * jnp.sum(
                        jnp.where(cl_sub == c, entry, 0.0))
                    if group_gate:
                        gmask[cnt] = jnp.sum(
                            jnp.where(cl_sub == c, gword, 0))
                    nlist[0] = cnt + 1
                    return m & (m - 1)

                jax.lax.while_loop(lambda m: m != 0, body, mask0)

            if ablate == "noemit":
                # probe-only: consume the gate words without the scalar
                # emission loops (isolates vector box-test cost; Mosaic
                # would DCE an unconsumed prepass). count stays 0 so the
                # sort/DMA/sweep stages all skip.
                counters[0] = counters[0] ^ cl_lo ^ cl_hi
            else:
                word_emit(0, cl_lo)
                word_emit(32, cl_hi)
        return 0

    # ablate (probe-only, tools/phase_decomp.py): "onlysc" stops after the
    # supercluster mask (launch + sc-pass cost); "noemit" runs the box
    # tests but skips the scalar emission loops; "nodma_nosort" emits but
    # skips sort+DMA+sweeps; "nodma" adds the sort back; "nosweep" runs
    # everything but the MT sweeps. Production always passes "".
    if pregate:
        # pregate: the XLA prologue already gated and bounded the
        # cluster work list (_pregate_worklists / _partition_worklists)
        # — the kernel reads it from SMEM inputs and skips the whole
        # prepass. "interval" trusts the (conservative, sorted) interval
        # bounds; "recheck" re-tests each entry per-ray at DMA-issue
        # time and refines the bound in the tlb scratch.
        count = wl_count[0, 0, 0]

        if recheck and sort:
            # coherent-dispatch flavor: copy the candidate list into
            # scratch and nearest-first insertion-sort it by the
            # INTERVAL bound (the per-ray refinement happens later, at
            # issue time) — short lists at depth 0, and visiting
            # near-first shrinks btmax early exactly as the in-kernel
            # prepass path does
            def cp_body(i, _):
                gated[i] = wl_order[0, 0, i]
                tlb[i] = wl_tlb[0, 0, i]
                return 0

            jax.lax.fori_loop(0, count, cp_body, 0)

            def rd_gated(i):
                return gated[i]
        else:
            def rd_gated(i):
                return wl_order[0, 0, i]

        if recheck:
            def rd_tlb(i):
                return tlb[i]            # refined at DMA-issue time
        else:
            def rd_tlb(i):
                return wl_tlb[0, 0, i]
    elif ablate == "onlysc":
        nlist[0] = 0
        count = nlist[0]
    else:
        jax.lax.fori_loop(0, n_sc, pre_body, 0)
        count = nlist[0]
    if not pregate:
        def rd_gated(i):
            return gated[i]

        def rd_tlb(i):
            return tlb[i]
    if stats:
        counters[0] = count

    # Insertion-sort the work list by conservative t lower bound (scalar,
    # SMEM): visiting strictly nearest-first shrinks btmax as early as
    # possible, so far clusters get pruned before their DMA is even
    # issued. Worth it ONLY for coherent depth-0 dispatches: at depth>=1
    # the lists are long (~42 clusters) and scattered rays barely shrink
    # btmax, so the O(n^2) scalar sort costs more than it saves (measured
    # round 3: occl_d1 271→252 ms, closest_d1 149→125 ms with sort off;
    # depth 0 regresses without it). Callers pass sort=(depth==0).
    def ins_body(i, _):
        key_t = tlb[i]
        key_g = gated[i]
        if group_gate:
            key_m = gmask[i]

        def shift_cond(j):
            return jnp.logical_and(j > 0, tlb[j - 1] > key_t)

        def shift_body(j):
            tlb[j] = tlb[j - 1]
            gated[j] = gated[j - 1]
            if group_gate:
                gmask[j] = gmask[j - 1]
            return j - 1

        j = jax.lax.while_loop(shift_cond, shift_body, i)
        tlb[j] = key_t
        gated[j] = key_g
        if group_gate:
            gmask[j] = key_m
        return 0

    if (sort and (not pregate or recheck)
            and ablate not in ("nodma_nosort", "nosort")):
        jax.lax.fori_loop(1, count, ins_body, 0)

    def recheck_issue(j):
        """pregate="recheck": ONE per-ray [1,R] slab test of work-list
        entry j's cluster box (bounds scalar-read from the SMEM clb
        table) against the CURRENT t state decides its DMA + sweep.
        The interval prologue over-gates scattered secondaries 1.7-5x
        (tools/pregate_sim.py / resort_pregate_sim.py) because a block
        interval has no per-ray `tn <= tmax(ray)` clause — this re-check
        IS that clause, at ~1-2% of a sweep's cost, and replaces the
        whole in-kernel prepass (dense [K2,R] box tests per gated SC +
        scalar emission). Also refines the entry bound to the per-ray
        min (tlb[j] — the interval bound is looser) and records the
        gating ray groups (gmask[j]) for the group_gate sweep skip."""
        c = wl_order[0, 0, j]
        t0x = (clb[0, c] - ox) * ix
        t1x = (clb[3, c] - ox) * ix
        t0y = (clb[1, c] - oy) * iy
        t1y = (clb[4, c] - oy) * iy
        t0z = (clb[2, c] - oz) * iz
        t1z = (clb[5, c] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        # 0.9999 guards f32 rounding of tn against the shrunken t state
        # (same guard class as the emitted-tlb prune) — the prune can
        # never discard a boundary hit
        hit = ((tn <= tf) & (tf >= TMIN) & (0.9999 * tn <= t_s[:])
               & (t_s[:] > TMIN))
        entry = jnp.min(jnp.where(hit, tn, _INF))
        ok = jnp.any(hit)
        started[j] = ok.astype(jnp.int32)
        tlb[j] = 0.9999 * entry
        if group_gate:
            lane_g = jax.lax.broadcasted_iota(jnp.int32, hit.shape,
                                              1) // LANES
            gw = jnp.int32(0)
            for g in range(G):
                any_g = jnp.any(hit & (lane_g == g))
                gw = gw | jnp.where(any_g, jnp.int32(1 << g), 0)
            gmask[j] = gw

    def cluster_dmas(i, slot):
        """The per-cluster copies (a list so further per-cluster streams
        can join the same started/wait protocol)."""
        return [pltpu.make_async_copy(
            tri_hbm.at[rd_gated(i)], tris.at[slot], sem.at[slot])]

    # NBUF-deep cluster pipeline. DMA start/wait pairing must be
    # deterministic (an unwaited started DMA wedges the core), but the
    # issue decision itself may depend on the moving btmax: the decision
    # is RECORDED in started[j] at issue time and the wait reads the same
    # flag — start and wait always agree.
    if ablate in ("nodma", "nodma_nosort"):
        # prepass(+sort) only: skip the DMA pipeline and sweeps entirely
        pass
    else:
        for j in range(NBUF - 1):
            @pl.when(j < count)
            def _(j=j):
                if recheck:
                    recheck_issue(j)
                else:
                    started[j] = 1

                @pl.when(started[j] == 1)
                def _(j=j):
                    for dma in cluster_dmas(j, j % NBUF):
                        dma.start()

        def cl_body(i, _):
            j = i + NBUF - 1

            @pl.when(j < count)
            def _():
                if recheck:
                    recheck_issue(j)
                else:
                    go = rd_tlb(j) < btmax[0]     # issue-time scalar prune
                    started[j] = go.astype(jnp.int32)

                @pl.when(started[j] == 1)
                def _():
                    for dma in cluster_dmas(j, jax.lax.rem(j, NBUF)):
                        dma.start()

            @pl.when(started[i] == 1)
            def _():
                slot = jax.lax.rem(i, NBUF)
                for dma in cluster_dmas(i, slot):
                    dma.wait()

                @pl.when(rd_tlb(i) < btmax[0])    # sweep-time scalar prune
                def _():
                    if stats:
                        counters[1] = counters[1] + 1
                    if ablate != "nosweep":
                        if group_gate:
                            gm = gmask[i]
                            for g in range(G):
                                # per-group gate bit + per-group btmax
                                # prune (converged subtiles stop paying
                                # for far clusters — VERDICT r2 item 5)
                                @pl.when(((jax.lax.shift_right_logical(
                                           gm, g) & 1) == 1)
                                         & (rd_tlb(i) < btmaxg[g]))
                                def _(g=g):
                                    sweep_cluster(slot, rd_gated(i), g)
                        else:
                            sweep_cluster(slot, rd_gated(i))
            return 0

        jax.lax.fori_loop(0, count, cl_body, 0)

    # outputs are already lane-major [1,R] — plain copies, no relayout
    t_out[0] = t_s[:]
    slot_out[0] = slot_s[:]
    u_out[0] = u_s[:]
    v_out[0] = v_s[:]
    if with_attributes:
        attr_out[:, 0, 0, :] = attr_s[:]
    if stats:
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        stats_out[:] = jnp.where(lane128 == 0, counters[0],
                                 jnp.where(lane128 == 1, counters[1], 0))


def trace_dense(tree: ClusterTree, origins, dirs, tmax, *,
                block: int = 512, occlusion: bool = False,
                with_attributes: bool = False, interpret: bool = False,
                stats: bool = False, point_origin: bool = False,
                approx_recip: bool = True, sort: bool = True,
                group_gate: bool = False, pregate=False,
                ablate: str = "", sub_gate: bool = False):
    """Trace rays against the cluster tree (lane-major I/O).

    origins/dirs: f32[3, Nb, 128]; tmax: f32[Nb, 128]. N = Nb*128 must be
    a multiple of `block` (the wavefront engine pads + orders rays into
    coherent blocks). Returns (t, slot, u, v[, attrs f32[36, Nb, 128]])
    all [Nb, 128]; slot = -1 on miss (occlusion mode: >=0 means blocked),
    else an index into leaf order (tree.leaf_tri maps to triangle ids).

    approx_recip (default True, hardware only — interpret mode always
    uses exact division): the closest sweep's 1/det uses the VPU fast
    reciprocal + one Newton step (rel err ~2^-24, below the f32 roundoff
    of the barycentric multiplies); measured +2.9% with bit-identical
    hit selection on Sponza camera rays (tools/kernel_bench.py recip).

    point_origin=True: all rays of a 512-ray block share ONE origin
    (primary rays: the camera; shadow rays traced from the light); then
    `origins` is f32[N/block, 3] — one point per block, consumed as SMEM
    scalars. Origin-x-triangle terms drop from [K1,R] to [K1,1] in the
    sweep (~27% fewer VPU ops).

    group_gate=True (depth>=1 dispatches): the prepass also records
    WHICH 128-lane ray groups gate each cluster and the sweep loop
    skips non-gating groups and groups whose per-group max-t the
    cluster's entry bound exceeds. Pure work-skipping — outputs
    bit-identical; pays only where a block's rows diverge
    (tools/rowgate_sim.py; closest_d1 158.5→109.2 ms at block=1024).

    pregate=True / "interval" (coherent depth-0 dispatches): gating
    moves to an XLA prologue — one interval slab test per (block,
    cluster), sorted front-to-back and streamed to the kernel through
    SMEM, skipping the in-kernel prepass/emission/sort. Conservative
    superset gating — outputs bit-identical; over-gates ~+9% on camera
    tiles but 3x+ on shadow cones and scattered bounces
    (tools/pregate_sim.py), so use at depth 0 closest only. Exclusive
    with group_gate.

    pregate="recheck" (scattered depth>=1 dispatches): two-level gate —
    the interval prologue only nominates candidates (compacted by a
    cumsum partition, no argsort), and the kernel re-tests each one
    per-ray ([1,R] slab vs the CURRENT t state, bounds scalar-read from
    an SMEM table) at DMA-issue time, refining the entry bound and the
    group_gate word. Sweeps stay at true-gated counts (the re-check IS
    the per-ray `tn <= t(ray)` clause the interval lacks) while the
    whole in-kernel prepass + scalar emission + sort disappear.
    Composes with group_gate. Occlusion outputs bit-identical; closest
    identical up to near-tie commits (visit order differs — same
    contract as wavefront/resort.py).

    sub_gate: in-sweep sub-cluster hierarchy — slab-test the 8 16-tri
    sub-run AABBs riding the cluster slab's pad columns (annotated at
    build, accel/clusters) and run only the hitting 16-tri sub-sweeps.
    Outputs bit-identical (ascending-run visits + strict-< commits keep
    tie-breaks). MEASURED DEAD on this chip (branch + commit
    fragmentation > the 12-31% sweep math skipped; config.py
    sub_gate_* post-mortem) — kept for scenes with far lower sub-box
    hit fractions.
    """
    # VKRT_NO_APPROX_RECIP resolves HERE, outside the jit, into the
    # static approx_recip argument (so it is part of the jit cache key —
    # reading it inside the traced function made post-first-trace
    # toggles silently no-ops; advisor finding, round 2). Interpret mode
    # always uses exact division (pl.reciprocal is TPU-only).
    import os
    approx_recip = (approx_recip and not interpret
                    and not os.environ.get("VKRT_NO_APPROX_RECIP"))
    pregate = {True: "interval", False: ""}.get(pregate, pregate)
    return _trace_dense(tree, origins, dirs, tmax, block=block,
                        occlusion=occlusion,
                        with_attributes=with_attributes,
                        interpret=interpret, stats=stats,
                        point_origin=point_origin,
                        approx_recip=approx_recip, sort=sort,
                        group_gate=group_gate, pregate=pregate,
                        ablate=ablate, sub_gate=sub_gate)


@functools.partial(jax.jit, static_argnames=("block", "occlusion",
                                             "with_attributes", "interpret",
                                             "stats", "point_origin",
                                             "approx_recip", "sort",
                                             "group_gate", "pregate",
                                             "ablate", "sub_gate"))
def _trace_dense(tree: ClusterTree, origins, dirs, tmax, *,
                 block: int, occlusion: bool, with_attributes: bool,
                 interpret: bool, stats: bool, point_origin: bool,
                 approx_recip: bool, sort: bool = True,
                 group_gate: bool = False, pregate: str = "",
                 ablate: str = "", sub_gate: bool = False):
    nb = dirs.shape[1]
    N = nb * LANES
    assert N % block == 0, f"ray count {N} not a multiple of block {block}"
    k1 = tree.tri_data.shape[1]   # triangles per cluster
    n_sc = tree.num_superclusters
    c2p = tree.sc_boxes.shape[1]
    NBUF = 4                          # cluster DMA pipeline depth (8 measured neutral)
    maxc = tree.tri_data.shape[0]     # work-list capacity: every cluster
    nblocks = N // block

    # Per-block front-to-back supercluster visit order: entry distance of
    # each supercluster box along the block's mean ray. Cheap XLA prologue
    # that unlocks early termination inside the kernel. (Unused — and
    # skipped — under pregate, which carries its own sorted work list.)
    order_w = -(-n_sc // 64) * 64
    if pregate:
        sc_order = jnp.zeros((nblocks, 1, order_w), jnp.int32)
    else:
        if point_origin:
            assert origins.shape == (nblocks, 3), origins.shape
            ob = origins.T                                   # [3,nb]
        else:
            ob = origins.reshape(3, nblocks, block).mean(axis=2)
        db = dirs.reshape(3, nblocks, block).mean(axis=2)
        db_n = jnp.sqrt(jnp.maximum(
            db[0] ** 2 + db[1] ** 2 + db[2] ** 2, 1e-24))
        db = db / db_n[None]
        inv = 1.0 / jnp.where(jnp.abs(db) < 1e-12,
                              jnp.where(db < 0, -1e-12, 1e-12), db)
        tn = None
        tf = None
        for a in range(3):
            lo = tree.sc_boxes[a, :n_sc]                     # [n_sc]
            hi = tree.sc_boxes[a + 3, :n_sc]
            t0 = (lo[None, :] - ob[a][:, None]) * inv[a][:, None]
            t1 = (hi[None, :] - ob[a][:, None]) * inv[a][:, None]
            lo_t = jnp.minimum(t0, t1)
            hi_t = jnp.maximum(t0, t1)
            tn = lo_t if tn is None else jnp.maximum(tn, lo_t)
            tf = hi_t if tf is None else jnp.minimum(tf, hi_t)
        key = jnp.where(tn <= tf, jnp.maximum(tn, 0.0), jnp.inf)
        sc_order = jnp.argsort(key, axis=1).astype(jnp.int32)
        sc_order = jnp.concatenate(
            [sc_order, jnp.full((nblocks, order_w - n_sc), -1, jnp.int32)],
            axis=1)
        sc_order = sc_order.reshape(nblocks, 1, order_w)

    assert not (pregate == "interval" and group_gate), \
        "interval pregate (coherent depth-0) and group_gate are exclusive"
    if pregate == "recheck":
        # interval gate + cumsum partition (NO argsort) — per-entry
        # bounds/order are refined in-kernel by the per-ray re-check
        gate_iv, tlb_iv, _ = _interval_gate(tree, origins, dirs, tmax,
                                            block=block,
                                            point_origin=point_origin)
        wl_order, wl_tlb, wl_count = _partition_worklists(gate_iv, tlb_iv)
        clb = _cluster_bounds_smem(tree)
        cp = wl_order.shape[-1]
    elif pregate:
        wl_order, wl_tlb, wl_count = _pregate_worklists(
            tree, origins, dirs, tmax, block=block,
            point_origin=point_origin)
        clb = jnp.zeros((6, 8), jnp.float32)
        cp = wl_order.shape[-1]
    else:
        cp = 64
        wl_order = jnp.zeros((nblocks, 1, cp), jnp.int32)
        wl_tlb = jnp.zeros((nblocks, 1, cp), jnp.float32)
        wl_count = jnp.zeros((nblocks, 1, 8), jnp.int32)
        clb = jnp.zeros((6, 8), jnp.float32)

    kernel = functools.partial(_trace_kernel, n_sc=n_sc, occlusion=occlusion,
                               with_attributes=with_attributes, stats=stats,
                               point_origin=point_origin,
                               approx_recip=approx_recip, sort=sort,
                               group_gate=group_gate, pregate=pregate,
                               ablate=ablate, sub_gate=sub_gate)
    grid = (nblocks,)
    attr_rows = 36 if with_attributes else 1
    # Ray I/O rides as [·, nblocks, 1, block] — a free reshape of the
    # engine's [Nb, 128] lane-major layout, consumed by the kernel as
    # [1, block] rows directly (no in-kernel transposes).
    if point_origin:
        # [nblocks, 1, 3] + block (1,1,3): the SMEM block-shape rule wants
        # the last two dims equal to the array dims
        o_k = origins.reshape(nblocks, 1, 3)
        o_spec = pl.BlockSpec((1, 1, 3), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)
    else:
        o_k = origins.reshape(3, nblocks, 1, block)
        o_spec = pl.BlockSpec((3, 1, 1, block), lambda i: (0, i, 0, 0),
                              memory_space=pltpu.VMEM)
    d_k = dirs.reshape(3, nblocks, 1, block)
    tmax_k = tmax.reshape(nblocks, 1, block)
    out_shape = [
        jax.ShapeDtypeStruct((nblocks, 1, block), jnp.float32),   # t
        jax.ShapeDtypeStruct((nblocks, 1, block), jnp.int32),     # slot
        jax.ShapeDtypeStruct((nblocks, 1, block), jnp.float32),   # u
        jax.ShapeDtypeStruct((nblocks, 1, block), jnp.float32),   # v
        jax.ShapeDtypeStruct((attr_rows, nblocks, 1, block), jnp.float32),
        jax.ShapeDtypeStruct((nblocks, 1, 128), jnp.int32),   # stats
    ]
    out_specs = [
        pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((attr_rows, 1, 1, block), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    in_specs = [
        pl.BlockSpec((1, 1, order_w), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((8, c2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_sc, 8, K2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        o_spec,
        pl.BlockSpec((3, 1, 1, block), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(tuple(clb.shape), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),    # cluster bounds (recheck)
        pl.BlockSpec(memory_space=pl.ANY),        # tri_data stays in HBM
    ]
    t, slot, u, v, attrs, stat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NBUF, k1, ROWS), jnp.float32),   # cluster DMA pipeline
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SMEM((maxc,), jnp.int32),              # gated cluster list
            pltpu.SMEM((maxc,), jnp.float32),            # conservative t bounds
            pltpu.SMEM((maxc,), jnp.int32),              # DMA-issued flags
            pltpu.SMEM((1,), jnp.int32),                 # work-list length
            pltpu.SMEM((2,), jnp.int32),                 # visit counters
            pltpu.SMEM((order_w // 32,), jnp.int32),     # supercluster hit words
            pltpu.SMEM((1,), jnp.float32),               # block max-t (btmax)
            pltpu.VMEM((1, block), jnp.float32),          # t state
            pltpu.VMEM((1, block), jnp.int32),            # slot state
            pltpu.VMEM((1, block), jnp.float32),          # u state
            pltpu.VMEM((1, block), jnp.float32),          # v state
            pltpu.VMEM((attr_rows, block), jnp.float32),  # attr state
            pltpu.SMEM((maxc,), jnp.int32),               # ray-group words
            pltpu.SMEM((block // LANES,), jnp.float32),   # per-group max-t
        ],
        interpret=interpret,
    )(sc_order, tree.sc_boxes, tree.cl_boxes, o_k, d_k, tmax_k,
      wl_order, wl_tlb, wl_count, clb, tree.tri_data)

    t = t.reshape(nb, LANES)
    slot = slot.reshape(nb, LANES)
    u = u.reshape(nb, LANES)
    v = v.reshape(nb, LANES)
    attrs = attrs.reshape(attr_rows, nb, LANES)

    miss = slot < 0
    t = jnp.where(miss, jnp.inf, t)
    out = [t, slot, u, v]
    if with_attributes:
        out.append(attrs)
    if stats:
        out.append(stat[:, 0, :2])
    return tuple(out)


def trace_dense_rays(tree: ClusterTree, origins, dirs, tmax, **kw):
    """Convenience wrapper over row-major rays ([N,3], [N]) — converts to
    lane-major, traces, converts back. Test/tooling API; the engine uses
    the lane-major form directly."""
    from vkrt_tpu.utils import layout as L

    out = trace_dense(tree, L.to_cvec(jnp.asarray(origins)),
                      L.to_cvec(jnp.asarray(dirs)),
                      L.to_lanes(jnp.asarray(tmax)), **kw)
    flat = [L.from_lanes(out[0]), L.from_lanes(out[1]),
            L.from_lanes(out[2]), L.from_lanes(out[3])]
    rest = out[4:]
    if kw.get("with_attributes"):
        attrs = rest[0]
        flat.append(jnp.moveaxis(attrs, 0, -1).reshape(-1, attrs.shape[0]))
        rest = rest[1:]
    flat.extend(rest)
    return tuple(flat)
