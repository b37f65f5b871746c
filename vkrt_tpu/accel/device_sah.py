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

import re
from functools import partial

import jax
import jax.numpy as jnp

K1 = 128     # triangles per cluster (== clusters.K1)
K2 = 64      # clusters per supercluster (== clusters.K2)
NBINS = 16   # axis-choice SAH bins
_MULTI_CUT_LEVELS = 4   # trailing levels that run cuts>1 rounds per sort
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


@partial(jax.jit, static_argnames=("max_levels", "axis_mode", "stable",
                                   "cuts", "nbins"))
def _device_sah_order(cen, tmin, tmax, valid, max_levels: int,
                      axis_mode: str = "binned", stable: bool = True,
                      cuts: int = 1, nbins: int = NBINS):
    """Triangle permutation i32[Tp] (padding slots at the tail carry
    their original indices). cen/tmin/tmax f32[Tp,3] indexed by
    ORIGINAL padded triangle id; valid bool[Tp] False on padding.

    The level loop CARRIES the permuted triangle data (cen/tmin/tmax/
    weight in current order) so each level applies exactly ONE gather
    (by the sort's position permutation) instead of re-gathering every
    operand from the original arrays twice per level — the dominant
    cost of the first hardware version (502 ms at L16 on Sponza).
    Round 5: the carry is PACKED into one [Tp,11] array so the level's
    permutation is ONE wide-row gather instead of five narrow ones —
    gather cost is per-ROW, not per-byte (the sampling-heap result,
    ROADMAP.md), so this cuts the gather share 5x. `stable=False` drops
    the sort's stability guarantee: tied (segment, quantized-centroid)
    keys may land in either order — still a valid permutation with
    identical SAH cut counts (ties share a centroid cell), kept as a
    measured timing knob (tools/r5_hw_queue2.py).

    axis_mode:
      "binned" — per-segment nbins-binned SAH axis choice at triangle
                 granularity (the expensive, most faithful form).
      "extent" — largest per-segment triangle-centroid extent (the
                 classic builder heuristic). MEASURED WORSE on Sponza:
                 17.9 camera clusters/ray vs binned 9.70 (thin layered
                 walls punish a wrong axis) — kept only as the
                 quality-ablation reference.
      "hybrid:N" — triangle-granularity binning for the first N levels
                 (while chunks are still spatially mixed), then CHUNK-
                 granularity binning (bin the [Nc] chunk boxes — three
                 orders of magnitude fewer rows) for the rest.
                 MEASURED WORSE at every N (28-65 clusters/ray) —
                 kept as the ablation reference.
      "sampled:S" — triangle binning on every S-th triangle of each
                 chunk (the cut stays exact; only the axis estimate is
                 sampled). MEASURED WORSE at S=4/8/16 (14.2/14.2/14.6
                 clusters/ray) — a chunk's strided sample is spatially
                 biased while chunks are mixed. Ablation reference.
    """
    Tp = cen.shape[0]
    Nc = Tp // K1

    stride = (int(axis_mode.split(":")[1])
              if axis_mode.startswith("sampled") else 1)

    order = jnp.arange(Tp, dtype=jnp.int32)
    cb = jnp.zeros(Nc, jnp.bool_).at[0].set(True)
    w0 = valid.astype(jnp.float32)
    # packed carry: cen | tmin | tmax | w | order  (order exact in f32
    # for Tp < 2**24)
    S0 = jnp.concatenate(
        [cen, tmin, tmax, w0[:, None], order.astype(jnp.float32)[:, None]],
        axis=1)                                                # [Tp,11]

    def level(state, _, tri_bins=True, n_cuts=1):
        S, cb = state
        cen_s = S[:, 0:3]
        tmin_s = S[:, 3:6]
        tmax_s = S[:, 6:9]
        w_s = S[:, 9]
        sid_c = jnp.cumsum(cb.astype(jnp.int32)) - 1           # [Nc]

        # chunk boxes/counts from the CARRIED (already permuted) data
        omin = tmin_s.reshape(Nc, K1, 3)
        omax = tmax_s.reshape(Nc, K1, 3)
        ccnt = w_s.reshape(Nc, K1).sum(axis=1)

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

        # --- 1. axis choice per segment ---------------------------------
        nseg = Nc
        cen_o = cen_s.reshape(Nc, K1, 3)                        # [Nc,K1,3]
        tvalid = (w_s > 0).reshape(Nc, K1)
        tin = jnp.where(tvalid[..., None], cen_o, _INF)
        tix = jnp.where(tvalid[..., None], cen_o, -_INF)
        smin = jax.ops.segment_min(tin.min(axis=1), sid_c,
                                   num_segments=nseg)           # [S,3]
        smax = jax.ops.segment_max(tix.max(axis=1), sid_c,
                                   num_segments=nseg)
        lo_c = smin[sid_c]                                      # [Nc,3]
        span_c = jnp.maximum(smax[sid_c] - lo_c, 1e-12)

        if axis_mode == "extent":
            # largest triangle-centroid extent of the segment
            best_ax = jnp.argmax(smax - smin, axis=1)           # [S]
        elif axis_mode == "slab":
            # round 5: counts-only binned SAH — bin boxes approximated
            # by the bin-SLAB extent in the candidate axis (quantized to
            # the outermost OCCUPIED bins) x the segment's exact extents
            # in the other two axes. Only per-bin COUNTS are reduced
            # ([Nc,K1,NB] once per axis vs the exact mode's
            # [Nc,K1,NB,3] min/max pairs — the ~7 ms/level residual,
            # tools/r5_hw_queue2.py). Axis choice only; the cut stays
            # exact post-sort.
            bid = jnp.arange(nbins, dtype=jnp.int32)
            tw = w_s.reshape(Nc, K1)
            bin_t = jnp.clip((cen_o - lo_c[:, None, :])
                             / span_c[:, None, :]
                             * nbins, 0.0, nbins - 1.0).astype(jnp.int32)
            ext = jnp.maximum(smax - smin, 1e-12)               # [S,3]
            axis_cost = []
            for ax in range(3):
                oh = (bin_t[..., ax][..., None] == bid) \
                    & tvalid[..., None]                     # [Nc,K1,NB]
                cct = (oh * tw[..., None]).sum(axis=1)      # [Nc,NB]
                bct = jax.ops.segment_sum(cct, sid_c,
                                          num_segments=nseg)  # [S,NB]
                occ = bct > 0
                pmax = jax.lax.associative_scan(
                    jnp.maximum, jnp.where(occ, bid[None, :], -1), axis=1)
                smin_b = jax.lax.associative_scan(
                    jnp.minimum, jnp.where(occ, bid[None, :], nbins),
                    axis=1, reverse=True)
                pct = jnp.cumsum(bct, axis=1)
                tot = pct[:, -1:]
                unit = ext[:, ax:ax + 1] / nbins
                eL = (pmax[:, :-1].astype(jnp.float32) + 1.0) * unit
                eR = (nbins - smin_b[:, 1:].astype(jnp.float32)) * unit
                o1 = ext[:, (ax + 1) % 3][:, None]
                o2 = ext[:, (ax + 2) % 3][:, None]
                aL = eL * o1 + o1 * o2 + o2 * eL
                aR = eR * o1 + o1 * o2 + o2 * eR
                nL = pct[:, :-1]
                nR = tot - nL
                cost = jnp.where((nL > 0) & (nR > 0),
                                 aL * nL + aR * nR, _INF)
                axis_cost.append(cost.min(axis=1))
            best_ax = jnp.argmin(jnp.stack(axis_cost, axis=1), axis=1)
        elif axis_mode == "variance":
            # round 5: largest weighted CENTROID VARIANCE — a
            # density-aware SAH proxy at triangle granularity with NO
            # bin dimension: the binned estimate materializes
            # [Nc,K1,nbins,3] masked boxes (~7 ms/level, the dominant
            # residual after the packed carry — tools/r5_hw_queue2.py);
            # variance needs only chunk-level moment sums. Centered on
            # the segment min to bound f32 cancellation.
            cen_rel = jnp.where(tvalid[..., None],
                                cen_o - lo_c[:, None, :], 0.0)
            s1 = cen_rel.sum(axis=1)                            # [Nc,3]
            s2 = (cen_rel * cen_rel).sum(axis=1)
            seg_s1 = jax.ops.segment_sum(s1, sid_c, num_segments=nseg)
            seg_s2 = jax.ops.segment_sum(s2, sid_c, num_segments=nseg)
            seg_n = jnp.maximum(
                jax.ops.segment_sum(ccnt, sid_c, num_segments=nseg), 1.0)
            mean = seg_s1 / seg_n[:, None]
            var = seg_s2 / seg_n[:, None] - mean * mean
            best_ax = jnp.argmax(var, axis=1)                   # [S]
        elif not tri_bins:
            # CHUNK-granularity binning: after the first few levels the
            # sort has made chunks spatially tight, so binning the [Nc]
            # chunk boxes (3 orders of magnitude fewer rows than
            # triangles) gives the same axis choice at ~zero cost.
            cmin = omin.min(axis=1)                             # [Nc,3]
            cmax = omax.max(axis=1)
            nonempty = ccnt > 0
            ccen = jnp.where(nonempty[:, None], (cmin + cmax) * 0.5,
                             _INF)
            bin_c = jnp.clip((ccen - lo_c) / span_c * nbins, 0.0,
                             nbins - 1.0).astype(jnp.int32)     # [Nc,3]
            axis_cost = []
            for ax in range(3):
                bmns, bmxs, bcts = [], [], []
                for b in range(nbins):
                    m = nonempty & (bin_c[:, ax] == b)          # [Nc]
                    cmn_b = jnp.where(m[:, None], cmin, _INF)
                    cmx_b = jnp.where(m[:, None], cmax, -_INF)
                    cct_b = jnp.where(m, ccnt, 0.0)
                    bmns.append(jax.ops.segment_min(cmn_b, sid_c,
                                                    num_segments=nseg))
                    bmxs.append(jax.ops.segment_max(cmx_b, sid_c,
                                                    num_segments=nseg))
                    bcts.append(jax.ops.segment_sum(cct_b, sid_c,
                                                    num_segments=nseg))
                bmn = jnp.stack(bmns, axis=1)                   # [S,NB,3]
                bmx = jnp.stack(bmxs, axis=1)
                bct = jnp.stack(bcts, axis=1)                   # [S,NB]
                pmn = jax.lax.associative_scan(jnp.minimum, bmn, axis=1)
                pmx = jax.lax.associative_scan(jnp.maximum, bmx, axis=1)
                pct = jnp.cumsum(bct, axis=1)
                smn = jax.lax.associative_scan(jnp.minimum, bmn, axis=1,
                                               reverse=True)
                smx = jax.lax.associative_scan(jnp.maximum, bmx, axis=1,
                                               reverse=True)
                sct = jnp.cumsum(bct[:, ::-1], axis=1)[:, ::-1]
                aL = _area(jnp.maximum(pmx - pmn, 0.0))
                aR = _area(jnp.maximum(smx - smn, 0.0))
                cost = (aL[:, :-1] * pct[:, :-1]
                        + aR[:, 1:] * sct[:, 1:])
                cost = jnp.where((pct[:, :-1] > 0) & (sct[:, 1:] > 0),
                                 cost, _INF)
                axis_cost.append(cost.min(axis=1))
            best_ax = jnp.argmin(jnp.stack(axis_cost, axis=1), axis=1)
        else:
            # TRIANGLE-granularity binned SAH: chunk-granular bins are
            # garbage while chunks are still spatially mixed (level 0
            # chunks span the whole scene — measured 22.9 clusters/ray
            # vs host 9.96 before this fix; mixing granularities across
            # levels is even worse — hybrid:2/4/6 = 65/53/28
            # clusters/ray). Triangle boxes one-hot-reduce into
            # per-chunk bin tables (nbins small), then a cheap [Nc]-row
            # segment reduce. The axis choice is only an ESTIMATE (the
            # cut is exact post-sort), so a strided triangle SAMPLE is
            # enough — `stride` divides the binning cost by S.
            cen_b = cen_o[:, ::stride, :]                   # [Nc,K1/S,3]
            omin_b = omin[:, ::stride, :]
            omax_b = omax[:, ::stride, :]
            tval_b = tvalid[:, ::stride]
            bin_t = jnp.clip((cen_b - lo_c[:, None, :])
                             / span_c[:, None, :]
                             * nbins, 0.0, nbins - 1.0).astype(jnp.int32)
            tw = w_s.reshape(Nc, K1)[:, ::stride]
            # one-hot over bins: ONE fused masked reduce per axis
            # (vs nbins separate passes) and ONE batched segment
            # reduce for all 3*nbins tables (vs 144 small scatters —
            # the dominant per-level launch overhead on TPU).
            bmn_ax, bmx_ax, bct_ax = [], [], []
            bid = jnp.arange(nbins, dtype=jnp.int32)
            for ax in range(3):
                oh = (bin_t[..., ax][..., None] == bid) \
                    & tval_b[..., None]                     # [Nc,K1/S,NB]
                cmn = jnp.where(oh[..., None], omin_b[:, :, None, :],
                                _INF).min(axis=1)           # [Nc,NB,3]
                cmx = jnp.where(oh[..., None], omax_b[:, :, None, :],
                                -_INF).max(axis=1)
                cct = (oh * tw[..., None]).sum(axis=1)      # [Nc,NB]
                bmn_ax.append(cmn)
                bmx_ax.append(cmx)
                bct_ax.append(cct)
            bmn_c = jnp.stack(bmn_ax, axis=1)               # [Nc,3,NB,3]
            bmx_c = jnp.stack(bmx_ax, axis=1)
            bct_c = jnp.stack(bct_ax, axis=1)               # [Nc,3,NB]
            bmn = jax.ops.segment_min(bmn_c, sid_c, num_segments=nseg)
            bmx = jax.ops.segment_max(bmx_c, sid_c, num_segments=nseg)
            bct = jnp.cumsum(jax.ops.segment_sum(
                bct_c, sid_c, num_segments=nseg), axis=2)   # prefix cnt
            # prefix/suffix over the nbins axis, all 3 axes at once
            pmn = jax.lax.associative_scan(jnp.minimum, bmn, axis=2)
            pmx = jax.lax.associative_scan(jnp.maximum, bmx, axis=2)
            pct = bct                                        # [S,3,NB]
            smn = jax.lax.associative_scan(jnp.minimum, bmn, axis=2,
                                           reverse=True)
            smx = jax.lax.associative_scan(jnp.maximum, bmx, axis=2,
                                           reverse=True)
            tot = bct[:, :, -1:]
            sct = tot - jnp.concatenate(
                [jnp.zeros_like(tot), bct[:, :, :-1]], axis=2)
            aL = _area(jnp.maximum(pmx - pmn, 0.0))          # [S,3,NB]
            aR = _area(jnp.maximum(smx - smn, 0.0))
            # cut AFTER bin b: left = prefix[b], right = suffix[b+1]
            cost = (aL[:, :, :-1] * pct[:, :, :-1]
                    + aR[:, :, 1:] * sct[:, :, 1:])          # [S,3,NB-1]
            cost = jnp.where((pct[:, :, :-1] > 0) & (sct[:, :, 1:] > 0),
                             cost, _INF)
            best_ax = jnp.argmin(cost.min(axis=2), axis=1)   # [S]

        # --- 2. ONE stable sort by (segment, centroid on chosen axis) ---
        ax_t = jnp.repeat(best_ax[sid_c], K1)                   # [Tp]
        # arithmetic column select — take_along_axis here is a
        # [Tp]-row gather (~2 ms/level at the measured per-row rate)
        key_cen = (jnp.where(ax_t == 0, cen_s[:, 0], 0.0)
                   + jnp.where(ax_t == 1, cen_s[:, 1], 0.0)
                   + jnp.where(ax_t == 2, cen_s[:, 2], 0.0))
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
        q = jnp.where(w_s > 0, q, (1 << _CEN_BITS) - 1)
        sid_t = jnp.repeat(sid_c, K1)
        key = (sid_t.astype(jnp.uint32) << _CEN_BITS) | q.astype(jnp.uint32)
        pos = jnp.arange(Tp, dtype=jnp.int32)
        _, pos_new = jax.lax.sort((key, pos), num_keys=1, is_stable=stable)
        # ONE wide-row gather applies the level's permutation to the
        # whole packed carry (gather cost is per-row, not per-byte)
        S_new = S[pos_new]
        tmin_n = S_new[:, 3:6]
        tmax_n = S_new[:, 6:9]
        w_n = S_new[:, 9]

        # --- 3. exact SAH over the sorted order (chunk granularity) -----
        # `cuts` rounds per sorted order: round 1 is the host
        # recursion's cut; further rounds re-run the cheap [Nc]-scan
        # selection on the refined segmentation, cutting each CHILD
        # along its parent's sort axis without a re-sort — the round-5
        # "sort once, cut twice" lever (children re-choose their axis
        # at the next level's sort as before).
        nmin = tmin_n.reshape(Nc, K1, 3).min(axis=1)
        nmax = tmax_n.reshape(Nc, K1, 3).max(axis=1)
        ncnt = w_n.reshape(Nc, K1).sum(axis=1)

        def cut_round(cb_r):
            iota_c = jnp.arange(Nc, dtype=jnp.int32)
            sid_r = jnp.cumsum(cb_r.astype(jnp.int32)) - 1
            seg_start_r = jax.lax.associative_scan(
                jnp.maximum, jnp.where(cb_r, iota_c, 0))
            off_r = iota_c - seg_start_r
            nxt = jnp.where(cb_r, iota_c, Nc)
            nxt = jnp.concatenate([nxt[1:], jnp.array([Nc], jnp.int32)])
            nxt = jax.lax.associative_scan(jnp.minimum, nxt[::-1])[::-1]
            seg_len_r = nxt - seg_start_r
            pmn, pmx, pct = _seg_scan_box(cb_r, nmin, nmax, ncnt)
            # suffix scan: a segment ENDS where the next chunk starts
            cb_rev = jnp.concatenate([cb_r[1:], jnp.ones(1, jnp.bool_)])
            smn, smx, sct = _seg_scan_box(cb_rev[::-1], nmin[::-1],
                                          nmax[::-1], ncnt[::-1])
            smn, smx, sct = smn[::-1], smx[::-1], sct[::-1]

            align = jnp.where(seg_len_r > K2, K2, 1)
            costL = _area(jnp.maximum(pmx - pmn, 0.0)) * pct    # at k-1
            costR = _area(jnp.maximum(smx - smn, 0.0)) * sct    # at k
            costL_prev = jnp.concatenate([jnp.full((1,), _INF),
                                          costL[:-1]])
            pct_prev = jnp.concatenate([jnp.zeros(1), pct[:-1]])
            # a valid cut is aligned AND leaves real triangles on BOTH
            # sides (cutting off an all-padding tail is free but
            # useless)
            valid_cut = ((off_r > 0) & (off_r % align == 0)
                         & (pct_prev > 0) & (sct > 0))
            cut_cost = jnp.where(valid_cut, costL_prev + costR, _INF)

            # per-segment argmin over chunk positions
            best_cost = jax.ops.segment_min(cut_cost, sid_r,
                                            num_segments=Nc)
            is_best = (cut_cost == best_cost[sid_r]) & valid_cut \
                & (best_cost[sid_r] < _INF)
            # first position achieving the min (deterministic tie-break)
            cand_pos = jnp.where(is_best, iota_c, Nc)
            first_best = jax.ops.segment_min(cand_pos, sid_r,
                                             num_segments=Nc)
            # scatter-MAX: unused segment slots all point at Nc-1 with
            # value 0 and must not clear a genuine bit there
            bits = jnp.zeros(Nc, jnp.int32).at[
                jnp.clip(first_best, 0, Nc - 1)].max(
                (first_best < Nc).astype(jnp.int32))
            return cb_r | (bits > 0)

        cb_new = cb
        for _ in range(n_cuts):
            cb_new = cut_round(cb_new)
        return (S_new, cb_new), 0

    state = (S0, cb)
    if axis_mode.startswith("hybrid"):
        n_tri = min(int(axis_mode.split(":")[1]), max_levels)
        if n_tri:
            state, _ = jax.lax.scan(partial(level, tri_bins=True),
                                    state, None, length=n_tri)
        if max_levels > n_tri:
            state, _ = jax.lax.scan(partial(level, tri_bins=False),
                                    state, None,
                                    length=max_levels - n_tri)
    elif cuts > 1:
        # mixed schedule: single own-axis cuts while segments are large
        # (the axis estimate matters most there), `cuts` rounds per sort
        # for the last `_MULTI_CUT_LEVELS` levels where parent-axis
        # inheritance is cheap
        n_single = max(max_levels - _MULTI_CUT_LEVELS, 0)
        if n_single:
            state, _ = jax.lax.scan(partial(level, n_cuts=1),
                                    state, None, length=n_single)
        if max_levels > n_single:
            state, _ = jax.lax.scan(partial(level, n_cuts=cuts),
                                    state, None,
                                    length=max_levels - n_single)
    else:
        state, _ = jax.lax.scan(level, state, None, length=max_levels)
    return state[0][:, 10].astype(jnp.int32)


def device_sah_order(v0, e1, e2, max_levels: int = 14,
                     axis_mode: str = "binned", stable: bool = True,
                     cuts: int = 1, nbins: int = NBINS):
    """Device variable-cut SAH triangle permutation.

    v0/e1/e2 f32[T,3] (device arrays). Returns i32[T] (a permutation of
    0..T-1 — padding slots are stripped). Fully jittable; one lax.sort
    + segmented scans per level (max_levels static). `cuts` > 1 applies
    that many cut rounds per sorted order (children cut along the
    parent's axis without a re-sort) — the effective tree depth is
    ~max_levels*cuts at ~max_levels sorts."""
    if not re.fullmatch(r"binned|extent|variance|slab|hybrid:\d+"
                        r"|sampled:\d+", axis_mode):
        raise ValueError(
            f"axis_mode {axis_mode!r} invalid: expected 'binned', 'extent', "
            f"'variance', 'slab', 'hybrid:N' or 'sampled:S' (N/S integers)")
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

    order = _device_sah_order(cen, tmin, tmax, valid, max_levels,
                              axis_mode, stable, cuts, nbins)
    # strip padding slots, preserving order (stable compaction)
    if pad:
        keep_key = (order >= T).astype(jnp.int32)
        _, order = jax.lax.sort((keep_key, order), num_keys=1,
                                is_stable=True)
        order = order[:T]
    return order
