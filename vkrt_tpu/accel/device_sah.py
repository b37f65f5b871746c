"""Device-side variable-cut SAH cluster build (round 4).

The host build (accel/clusters.split_permutation) delivers ~10 camera
clusters/ray; the device Morton rebuild ~31 — worth ~1.2s of extra
sweeps per config-5 frame (round-3 measurement). Coarser device
formulations lose badly (tools/r4_device_sah_sim.py: 32..2-triangle
atoms all land at 17-26 clusters/ray; batched MEDIAN hierarchies at
triangle granularity reach only 14.4): the host recursion's value is
per-TRIANGLE granularity + VARIABLE K1-aligned cuts. This module is the
host algorithm itself, re-expressed as fixed-shape batched device
passes:

  level loop (static trip count; every level processes ALL current
  segments at once — the BFS form of the host recursion, identical
  result since each node's cut depends only on its own content):
    1. per-segment AXIS CHOICE from a binned SAH estimate (chunk-
       granular boxes scattered into [seg, axis, NBINS] tables — no
       sort needed; the exact cut position is re-derived post-sort, so
       binning only ever affects which axis wins near-ties)
    2. ONE stable sort of all triangles by (segment, centroid along the
       segment's chosen axis) — jax.lax.sort with a composite key
    3. chunk-granular segmented prefix/suffix AABB scans over the
       sorted order, exact SAH at every K1-aligned cut (K1*K2-aligned
       while the segment exceeds a supercluster, mirroring the host
       build's supercluster-subtree invariant)
    4. per-segment best cut applied: one new boundary bit per segment

The result feeds accel/clusters._assemble unchanged. Quality parity is
pinned by tools/r4_device_sah_check.py (clusters/ray within a few % of
split_permutation on Sponza camera rays).

Replaces the driver's high-quality BLAS build for the per-frame rebuild
path (ref: src/Raytracer.cpp:1027-1157; the once-at-startup host build
remains the static-scene path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

K1 = 128     # triangles per cluster (== clusters.K1)
K2 = 64      # clusters per supercluster (== clusters.K2)
NBINS = 16   # axis-choice SAH bins
_INF = 3.0e38
_CEN_BITS = 18            # quantized centroid bits in the composite key


def _area(ext):
    return (ext[..., 0] * ext[..., 1] + ext[..., 1] * ext[..., 2]
            + ext[..., 2] * ext[..., 0])


def _seg_scan_box(flags, bmin, bmax, cnt, reverse=False):
    """Segmented inclusive scan of AABB union + count over chunks.

    flags bool[Nc] — True where a segment starts (in scan direction);
    bmin/bmax f32[Nc,3], cnt f32[Nc]. Uses lax.associative_scan with the
    classic segmented-scan combiner."""
    def combine(a, b):
        fa, mna, mxa, ca = a
        fb, mnb, mxb, cb = b
        f = fa | fb
        mn = jnp.where(fb[..., None], mnb, jnp.minimum(mna, mnb))
        mx = jnp.where(fb[..., None], mxb, jnp.maximum(mxa, mxb))
        c = jnp.where(fb, cb, ca + cb)
        return f, mn, mx, c

    return jax.lax.associative_scan(combine, (flags, bmin, bmax, cnt),
                                    reverse=reverse)[1:]


@partial(jax.jit, static_argnames=("max_levels",))
def _device_sah_order(cen, tmin, tmax, valid, max_levels: int):
    """Triangle permutation i32[Tp] (padding slots at the tail carry
    their original indices). cen/tmin/tmax f32[Tp,3] indexed by
    ORIGINAL padded triangle id; valid bool[Tp] False on padding."""
    Tp = cen.shape[0]
    Nc = Tp // K1

    order = jnp.arange(Tp, dtype=jnp.int32)
    cb = jnp.zeros(Nc, jnp.bool_).at[0].set(True)
    tcnt = valid.astype(jnp.float32)

    def level(state, _):
        order, cb = state
        sid_c = jnp.cumsum(cb.astype(jnp.int32)) - 1           # [Nc]

        # chunk boxes/counts/centroids from the current order
        omin = tmin[order].reshape(Nc, K1, 3)
        omax = tmax[order].reshape(Nc, K1, 3)
        cmin = omin.min(axis=1)
        cmax = omax.max(axis=1)
        ccnt = tcnt[order].reshape(Nc, K1).sum(axis=1)
        # empty (all-padding) chunks: (INF + -INF)/2 = NaN — guard them
        # out of the segment bounds and pin them to the top bin
        nonempty = (ccnt > 0)[:, None]
        ccen = jnp.where(nonempty, (cmin + cmax) * 0.5, 0.0)   # [Nc,3]

        # segment geometry (chunk granularity)
        seg_start = jnp.where(cb, jnp.arange(Nc, dtype=jnp.int32), 0)
        seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
        off_c = jnp.arange(Nc, dtype=jnp.int32) - seg_start    # offset in seg
        # segment length: first boundary index AFTER k, via reverse min-scan
        nxt_after = jnp.where(cb, jnp.arange(Nc, dtype=jnp.int32), Nc)
        nxt_after = jnp.concatenate([nxt_after[1:], jnp.array([Nc],
                                                              jnp.int32)])
        nxt_after = jax.lax.associative_scan(jnp.minimum,
                                             nxt_after[::-1])[::-1]
        seg_len = nxt_after - seg_start                        # [Nc] chunks

        # --- 1. binned SAH axis choice per segment ----------------------
        # TRIANGLE-granularity binning: chunk-granular bins are garbage
        # while chunks are still spatially mixed (level 0 chunks span the
        # whole scene — measured 22.9 clusters/ray vs host 9.96 before
        # this fix). Triangle boxes one-hot-reduce into per-chunk bin
        # tables (NBINS small), then a cheap [Nc]-row segment reduce.
        nseg = Nc
        cen_o = cen[order].reshape(Nc, K1, 3)                   # [Nc,K1,3]
        tvalid = (tcnt[order] > 0).reshape(Nc, K1)
        tin = jnp.where(tvalid[..., None], cen_o, _INF)
        tix = jnp.where(tvalid[..., None], cen_o, -_INF)
        smin = jax.ops.segment_min(tin.min(axis=1), sid_c,
                                   num_segments=nseg)           # [S,3]
        smax = jax.ops.segment_max(tix.max(axis=1), sid_c,
                                   num_segments=nseg)
        lo_c = smin[sid_c]                                      # [Nc,3]
        span_c = jnp.maximum(smax[sid_c] - lo_c, 1e-12)
        bin_t = jnp.clip((cen_o - lo_c[:, None, :]) / span_c[:, None, :]
                         * NBINS, 0.0, NBINS - 1.0).astype(jnp.int32)
        axis_cost = []
        tw = tcnt[order].reshape(Nc, K1)
        for ax in range(3):
            bmns, bmxs, bcts = [], [], []
            for b in range(NBINS):
                m = tvalid & (bin_t[..., ax] == b)              # [Nc,K1]
                cmn_b = jnp.where(m[..., None], omin, _INF).min(axis=1)
                cmx_b = jnp.where(m[..., None], omax, -_INF).max(axis=1)
                cct_b = (m * tw).sum(axis=1)
                bmns.append(jax.ops.segment_min(cmn_b, sid_c,
                                                num_segments=nseg))
                bmxs.append(jax.ops.segment_max(cmx_b, sid_c,
                                                num_segments=nseg))
                bcts.append(jax.ops.segment_sum(cct_b, sid_c,
                                                num_segments=nseg))
            bmn = jnp.stack(bmns, axis=1)                       # [S,NB,3]
            bmx = jnp.stack(bmxs, axis=1)
            bct = jnp.stack(bcts, axis=1)                       # [S,NB]
            # prefix/suffix over the NBINS axis
            pmn = jax.lax.associative_scan(jnp.minimum, bmn, axis=1)
            pmx = jax.lax.associative_scan(jnp.maximum, bmx, axis=1)
            pct = jnp.cumsum(bct, axis=1)
            smn = jax.lax.associative_scan(jnp.minimum, bmn, axis=1,
                                           reverse=True)
            smx = jax.lax.associative_scan(jnp.maximum, bmx, axis=1,
                                           reverse=True)
            sct = jnp.cumsum(bct[:, ::-1], axis=1)[:, ::-1]
            aL = _area(jnp.maximum(pmx - pmn, 0.0))             # [S,NB]
            aR = _area(jnp.maximum(smx - smn, 0.0))
            # cut AFTER bin b: left = prefix[b], right = suffix[b+1]
            cost = (aL[:, :-1] * pct[:, :-1]
                    + aR[:, 1:] * sct[:, 1:])                   # [S,NB-1]
            cost = jnp.where((pct[:, :-1] > 0) & (sct[:, 1:] > 0),
                             cost, _INF)
            axis_cost.append(cost.min(axis=1))                  # [S]
        best_ax = jnp.argmin(jnp.stack(axis_cost, axis=1), axis=1)  # [S]

        # --- 2. ONE stable sort by (segment, centroid on chosen axis) ---
        ax_t = jnp.repeat(best_ax[sid_c], K1)                   # [Tp]
        key_cen = jnp.take_along_axis(cen_o.reshape(Nc * K1, 3),
                                      ax_t[:, None], axis=1)[:, 0]
        # quantize within the segment's exact triangle-centroid span
        # (composite u32 key)
        lo_t = jnp.repeat(
            jnp.take_along_axis(lo_c, best_ax[sid_c][:, None],
                                axis=1)[:, 0], K1)
        span_t = jnp.repeat(
            jnp.take_along_axis(span_c, best_ax[sid_c][:, None],
                                axis=1)[:, 0], K1)
        q = jnp.clip((key_cen - lo_t) / span_t * ((1 << _CEN_BITS) - 1),
                     0.0, float((1 << _CEN_BITS) - 1)).astype(jnp.int32)
        # dead padding sorts to its segment's tail
        q = jnp.where(tcnt[order] > 0, q, (1 << _CEN_BITS) - 1)
        sid_t = jnp.repeat(sid_c, K1)
        key = (sid_t.astype(jnp.uint32) << _CEN_BITS) | q.astype(jnp.uint32)
        _, order_new = jax.lax.sort((key, order), num_keys=1,
                                    is_stable=True)

        # --- 3. exact SAH over the sorted order (chunk granularity) -----
        nmin = tmin[order_new].reshape(Nc, K1, 3).min(axis=1)
        nmax = tmax[order_new].reshape(Nc, K1, 3).max(axis=1)
        ncnt = tcnt[order_new].reshape(Nc, K1).sum(axis=1)
        pmn, pmx, pct = _seg_scan_box(cb, nmin, nmax, ncnt)
        # suffix scan: a segment ENDS where the next chunk starts one
        cb_rev_flags = jnp.concatenate([cb[1:], jnp.ones(1, jnp.bool_)])
        smn, smx, sct = _seg_scan_box(cb_rev_flags[::-1], nmin[::-1],
                                      nmax[::-1], ncnt[::-1])
        smn, smx, sct = smn[::-1], smx[::-1], sct[::-1]

        align = jnp.where(seg_len > K2, K2, 1)
        costL = _area(jnp.maximum(pmx - pmn, 0.0)) * pct        # at k-1
        costR = _area(jnp.maximum(smx - smn, 0.0)) * sct        # at k
        costL_prev = jnp.concatenate([jnp.full((1,), _INF), costL[:-1]])
        pct_prev = jnp.concatenate([jnp.zeros(1), pct[:-1]])
        # a valid cut is aligned AND leaves real triangles on BOTH sides
        # (cutting off an all-padding tail is free but useless)
        valid_cut = ((off_c > 0) & (off_c % align == 0)
                     & (pct_prev > 0) & (sct > 0))
        cut_cost = jnp.where(valid_cut, costL_prev + costR, _INF)

        # per-segment argmin over chunk positions
        best_cost = jax.ops.segment_min(cut_cost, sid_c, num_segments=Nc)
        is_best = (cut_cost == best_cost[sid_c]) & valid_cut \
            & (best_cost[sid_c] < _INF)
        # first position achieving the min (deterministic tie-break)
        pos = jnp.where(is_best, jnp.arange(Nc, dtype=jnp.int32), Nc)
        first_best = jax.ops.segment_min(pos, sid_c, num_segments=Nc)
        # scatter-MAX: unused segment slots all point at Nc-1 with value
        # 0 and must not clear a genuine bit there
        bits = jnp.zeros(Nc, jnp.int32).at[
            jnp.clip(first_best, 0, Nc - 1)].max(
            (first_best < Nc).astype(jnp.int32))
        cb_new = cb | (bits > 0)
        return (order_new, cb_new), 0

    (order, cb), _ = jax.lax.scan(level, (order, cb), None,
                                  length=max_levels)
    return order


def device_sah_order(v0, e1, e2, max_levels: int = 20):
    """Device variable-cut SAH triangle permutation.

    v0/e1/e2 f32[T,3] (device arrays). Returns i32[T] (a permutation of
    0..T-1 — padding slots are stripped). Fully jittable; one lax.sort
    + segmented scans per level (max_levels static)."""
    T = v0.shape[0]
    Tp = -(-T // K1) * K1
    pad = Tp - T
    assert Tp // K1 < (1 << (32 - _CEN_BITS)), (
        "composite u32 sort key overflows: raise K1 or lower _CEN_BITS")

    p1, p2 = v0 + e1, v0 + e2
    tmin = jnp.minimum(jnp.minimum(v0, p1), p2)
    tmax = jnp.maximum(jnp.maximum(v0, p1), p2)
    cen = v0 + (e1 + e2) / 3.0
    if pad:
        tmin = jnp.concatenate([tmin, jnp.full((pad, 3), _INF)], axis=0)
        tmax = jnp.concatenate([tmax, jnp.full((pad, 3), -_INF)], axis=0)
        cen = jnp.concatenate([cen, jnp.full((pad, 3), _INF)], axis=0)
    valid = jnp.arange(Tp) < T

    order = _device_sah_order(cen, tmin, tmax, valid, max_levels)
    # strip padding slots, preserving order (stable compaction)
    if pad:
        keep_key = (order >= T).astype(jnp.int32)
        _, order = jax.lax.sort((keep_key, order), num_keys=1,
                                is_stable=True)
        order = order[:T]
    return order
