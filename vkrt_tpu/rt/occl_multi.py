"""Multi-segment occlusion kernel: NS point-origin segment sets per block.

The 4-light shadow pass dispatches 4 occlusion traces over the SAME
surface tiles (wavefront/engine.py concatenates one section per light).
Each section re-gates the same superclusters, re-emits and re-sorts the
same work list, and re-DMAs the same cluster slabs — only the
Möller–Trumbore sweep differs per light. This kernel processes all NS
segment sets of a surface tile in ONE grid block:

  * gating / work list / insertion sort / cluster DMA: ONCE per block
    (gates = union over sets, t bound = min over sets)
  * MT sweep: once per (cluster, set), with per-set scalar origins and
    per-set early-outs (a fully-blocked set skips its remaining sweeps)

Replaces the per-light sections of the shadow dispatch (ref contract:
shader.rchit:119-152 — one shadow ray per light per hit). The segment
sets share surface points but have different origins (the lights), so
this is NOT expressible as a bigger block in the single-segment kernel
(which would widen the cone and was measured 2048-regressive).

The slab test / ctz / work-list machinery intentionally mirrors
rt/dense.py rather than importing it: the kernels evolve independently
(per-set t states here, hit commit there), and sharing ref-closing
helpers across pallas kernels couples their scratch layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkrt_tpu.accel.clusters import K2, ROWS, SUBRUNS, SUB_COL, ClusterTree
from vkrt_tpu.rt.dense import TMIN, _INF, _DET_EPS, LANES, _safe_inv


def _occl_multi_kernel(order_ref, sc_ref, cl_ref, o_ref, d_ref, tmax_ref,
                       wl_order, wl_tlb, wl_smask, wl_count, clb, tri_hbm,
                       # outputs
                       occ_out,
                       # scratch
                       tris, sem, gated, tlb, skey, smask, started, nlist,
                       sc_mask, btmax, btmaxg, *t_s, n_sc: int, ns: int,
                       sort: bool = True, group_gate: bool = False,
                       pregate: str = "", ablate: str = "",
                       visit: str = "near", sub_gate: bool = False):
    recheck = pregate == "recheck"
    R = d_ref.shape[-1]
    NBUF = sem.shape[0]
    K1 = tris.shape[1]
    G = R // 128                  # 128-lane ray groups per block
    if group_gate:
        # per-(set, group) gate bits must fit the per-cluster smask word
        assert ns * G <= 32, (ns, G)

    # per-set origin scalars + direction rows + inverse dirs
    oxs = [o_ref[s, 0] for s in range(ns)]
    oys = [o_ref[s, 1] for s in range(ns)]
    ozs = [o_ref[s, 2] for s in range(ns)]
    dxs = [d_ref[s * 3 + 0, 0] for s in range(ns)]
    dys = [d_ref[s * 3 + 1, 0] for s in range(ns)]
    dzs = [d_ref[s * 3 + 2, 0] for s in range(ns)]
    ixs = [_safe_inv(d) for d in dxs]
    iys = [_safe_inv(d) for d in dys]
    izs = [_safe_inv(d) for d in dzs]

    for s in range(ns):
        t_s[s][:] = tmax_ref[s, 0]                 # [1,R]
        btmax[s] = jnp.max(tmax_ref[s, 0])
        if group_gate:
            for g in range(G):
                btmaxg[s * G + g] = jnp.max(
                    tmax_ref[s, 0, :, g * 128:(g + 1) * 128])
        # blocked is tracked EXPLICITLY (occ_out written at hit-commit
        # time), not inferred from t_s afterwards: a live ray with
        # 0 < tmax <= TMIN (light within ~2*RAY_TMIN of the surface)
        # starts with t_s <= TMIN and would otherwise be reported
        # blocked without any intersection test — diverging from the
        # single-segment kernel and ReferenceBackend (advisor finding,
        # round 2)
        occ_out[s, 0] = jnp.zeros((1, R), jnp.int32)
    nlist[0] = 0

    def slab_entry(s, bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z):
        """Set-s slab test: boxes [L,1] x rays [1,R]; see dense.py."""
        t0x = (bmin_x - oxs[s]) * ixs[s]
        t1x = (bmax_x - oxs[s]) * ixs[s]
        t0y = (bmin_y - oys[s]) * iys[s]
        t1y = (bmax_y - oys[s]) * iys[s]
        t0z = (bmin_z - ozs[s]) * izs[s]
        t1z = (bmax_z - ozs[s]) * izs[s]
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        ts = t_s[s][:]
        hit = (tn <= tf) & (tf >= TMIN) & (tn <= ts) & (ts > TMIN)
        entry = jnp.min(jnp.where(hit, tn, _INF), axis=1, keepdims=True)
        return jnp.any(hit, axis=1, keepdims=True), entry, hit

    def tri_block(slot, s, g=None, run=None):
        """Division-free any-hit MT of set s vs pipeline buffer `slot`.
        With group_gate, g selects ONE 128-lane ray group; per-group
        operands are FRESH tile-aligned ref loads (a lane slice of an
        already-loaded [1,R] value carries a lane-offset layout Mosaic
        cannot broadcast against [K1,1] operands — see rt/dense.py).
        With sub_gate, `run` (static) selects ONE 16-tri sub-run."""
        sl = slice(None) if g is None else slice(g * 128, (g + 1) * 128)
        rsub = K1 // SUBRUNS
        rs = slice(None) if run is None else slice(run * rsub,
                                                   (run + 1) * rsub)
        chunk = tris[slot]
        v0x, v0y, v0z = chunk[rs, 0:1], chunk[rs, 1:2], chunk[rs, 2:3]
        e1x, e1y, e1z = chunk[rs, 3:4], chunk[rs, 4:5], chunk[rs, 5:6]
        e2x, e2y, e2z = chunk[rs, 6:7], chunk[rs, 7:8], chunk[rs, 8:9]
        if g is None:
            dx, dy, dz = dxs[s], dys[s], dzs[s]
        else:
            dx = d_ref[s * 3 + 0, 0, :, sl]
            dy = d_ref[s * 3 + 1, 0, :, sl]
            dz = d_ref[s * 3 + 2, 0, :, sl]
        tsg = t_s[s][:, sl]

        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        sx, sy, sz = oxs[s] - v0x, oys[s] - v0y, ozs[s] - v0z   # [K1,1]
        up = sx * hx + sy * hy + sz * hz
        qx = sy * e1z - sz * e1y                                # [K1,1]
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        vp = dx * qx + dy * qy + dz * qz
        tp = e2x * qx + e2y * qy + e2z * qz                     # [K1,1]
        adet = jnp.abs(det)
        sgn = jnp.where(det < 0, -1.0, 1.0)
        su, sv, st = up * sgn, vp * sgn, tp * sgn
        ok = ((adet > _DET_EPS) & (su >= 0) & (sv >= 0)
              & (su + sv <= adet) & (st > TMIN * adet)
              & (st < tsg * adet))
        anyhit = jnp.any(ok, axis=0, keepdims=True)             # [1,Rg]

        @pl.when(jnp.any(anyhit))
        def _():
            occ_out[s, 0, :, sl] = jnp.where(anyhit, 1, occ_out[s, 0, :, sl])
            # t_s pinned to TMIN culls the blocked rays from later gating
            t_s[s][:, sl] = jnp.where(anyhit, TMIN, t_s[s][:, sl])
            btmax[s] = jnp.max(t_s[s][:])
            if group_gate and g is not None:
                btmaxg[s * G + g] = jnp.max(t_s[s][:, sl])

    def sweep_cluster(slot, s, g=None):
        """Set-s triangle work for one cluster. With sub_gate, slab-test
        the SUBRUNS 16-tri sub-run AABBs riding the slab's pad columns
        (accel/clusters._assemble) and run only the hitting sub-sweeps
        (see rt/dense.py sweep_cluster)."""
        if not sub_gate:
            tri_block(slot, s, g)
            return
        sl = slice(None) if g is None else slice(g * 128, (g + 1) * 128)
        if g is None:
            ixg, iyg, izg = ixs[s], iys[s], izs[s]
        else:
            ixg = _safe_inv(d_ref[s * 3 + 0, 0, :, sl])
            iyg = _safe_inv(d_ref[s * 3 + 1, 0, :, sl])
            izg = _safe_inv(d_ref[s * 3 + 2, 0, :, sl])
        chunk = tris[slot]
        bnx = chunk[0:SUBRUNS, SUB_COL + 0:SUB_COL + 1]      # [8,1]
        bny = chunk[0:SUBRUNS, SUB_COL + 1:SUB_COL + 2]
        bnz = chunk[0:SUBRUNS, SUB_COL + 2:SUB_COL + 3]
        bxx = chunk[0:SUBRUNS, SUB_COL + 3:SUB_COL + 4]
        bxy = chunk[0:SUBRUNS, SUB_COL + 4:SUB_COL + 5]
        bxz = chunk[0:SUBRUNS, SUB_COL + 5:SUB_COL + 6]
        tsg = t_s[s][:, sl]
        t0x = (bnx - oxs[s]) * ixg
        t1x = (bxx - oxs[s]) * ixg
        t0y = (bny - oys[s]) * iyg
        t1y = (bxy - oys[s]) * iyg
        t0z = (bnz - ozs[s]) * izg
        t1z = (bxz - ozs[s]) * izg
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
                tri_block(slot, s, g, run=r_)

    # supercluster bitmask: union over segment sets
    if not pregate:
        scb = jnp.swapaxes(sc_ref[:], 0, 1)        # [C2p, 8]
        sc_any = None
        for s in range(ns):
            h, _, _ = slab_entry(s, scb[:, 0:1], scb[:, 1:2], scb[:, 2:3],
                                 scb[:, 3:4], scb[:, 4:5], scb[:, 5:6])
            sc_any = h if sc_any is None else (sc_any | h)
        sc_sub = jax.lax.broadcasted_iota(jnp.int32, sc_any.shape, 0)
        sc_w = jnp.left_shift(jnp.int32(1), sc_sub & 31)
        n_words = sc_mask.shape[0]
        for w in range(n_words):
            in_word = (sc_sub >= w * 32) & (sc_sub < (w + 1) * 32)
            sc_mask[w] = jnp.sum(jnp.where(sc_any & in_word, sc_w, 0))

    def test_sc(s):
        word = sc_mask[jax.lax.shift_right_logical(s, 5)]
        return (jax.lax.shift_right_logical(word, s & 31) & 1) == 1

    def ctz32(low):
        c = jnp.int32(0)
        for shift in (16, 8, 4, 2, 1):
            mask = (jnp.int32(1) << shift) - 1
            z = (low & mask) == 0
            c = c + jnp.where(z, shift, 0)
            low = jnp.where(z, jax.lax.shift_right_logical(low, shift), low)
        return c

    cl_sub = jax.lax.broadcasted_iota(jnp.int32, (K2, 1), 0)

    def pre_body(k, _):
        sidx = order_ref[0, 0, k]

        @pl.when((sidx >= 0) & test_sc(sidx))
        def _():
            cb = jnp.swapaxes(cl_ref[sidx], 0, 1)  # [K2, 8]
            good = None
            entry_min = None
            setbits = None
            key_min = None
            for s in range(ns):
                h, entry, hits = slab_entry(
                    s, cb[:, 0:1], cb[:, 1:2], cb[:, 2:3],
                    cb[:, 3:4], cb[:, 4:5], cb[:, 5:6])
                e = jnp.where(h, entry, _INF)
                if visit == "mid":
                    # any-hit visit-order key: distance of the cluster's
                    # entry from the segment midpoint (0.5*btmax) — a
                    # likely-occluder-first heuristic (ROADMAP lever).
                    # tlb stays the correctness prune either way.
                    k_s = jnp.abs(e - 0.5 * btmax[s])
                    key_min = (k_s if key_min is None
                               else jnp.minimum(key_min, k_s))
                if group_gate:
                    # bit (s*G+g) set iff any ray of 128-lane group g
                    # gates this cluster for set s (the sweep loop then
                    # skips non-gating groups — tools/rowgate_sim.py:
                    # only ~57% of gated-cluster rows gate at depth 1);
                    # lane-slice reduces, NOT masked-iota (see dense.py)
                    b = jnp.zeros_like(cl_sub)
                    for g in range(G):
                        any_g = jnp.any(hits[:, g * 128:(g + 1) * 128],
                                        axis=1, keepdims=True)
                        b = b | jnp.where(
                            any_g,
                            jnp.left_shift(jnp.int32(1),
                                           jnp.int32(s * G + g)), 0)
                else:
                    b = jnp.where(h, jnp.int32(1 << s), 0)
                good = h if good is None else (good | h)
                entry_min = e if entry_min is None else jnp.minimum(
                    entry_min, e)
                setbits = b if setbits is None else (setbits | b)
            w_bits = jnp.left_shift(jnp.int32(1), cl_sub & 31)
            cl_lo = jnp.sum(jnp.where(good & (cl_sub < 32), w_bits, 0))
            cl_hi = jnp.sum(jnp.where(good & (cl_sub >= 32), w_bits, 0))

            def word_emit(word_base, mask0):
                def body(m):
                    c = ctz32(m & (-m)) + word_base
                    cnt = nlist[0]
                    gated[cnt] = sidx * K2 + c
                    tval = 0.9999 * jnp.sum(
                        jnp.where(cl_sub == c, entry_min, 0.0))
                    tlb[cnt] = tval
                    if visit == "far":
                        skey[cnt] = -tval
                    elif visit == "mid":
                        skey[cnt] = jnp.sum(
                            jnp.where(cl_sub == c, key_min, 0.0))
                    # which segment sets gated this cluster (sweep skip)
                    smask[cnt] = jnp.sum(
                        jnp.where(cl_sub == c, setbits, 0))
                    nlist[0] = cnt + 1
                    return m & (m - 1)

                jax.lax.while_loop(lambda m: m != 0, body, mask0)

            if ablate == "noemit":
                # probe-only (see dense.py): consume every prepass
                # product without the scalar emission loops
                started[0] = started[0] ^ cl_lo ^ cl_hi
                tlb[0] = jnp.sum(entry_min)
                gated[0] = jnp.sum(setbits)
            else:
                word_emit(0, cl_lo)
                word_emit(32, cl_hi)
        return 0

    # ablate: probe-only phase decomposition (see rt/dense.py)
    if pregate:
        # XLA prologue gated the work list (rt/dense.py machinery) —
        # read it from SMEM inputs. "recheck" refines the bound and the
        # per-(set,group) bits per-ray at DMA-issue time (scratch).
        count = wl_count[0, 0, 0]

        if recheck and sort:
            # coherent-dispatch flavor (see rt/dense.py): scratch copy +
            # nearest-first insertion sort by the interval bound.
            # visit="near" only — the alternate visit keys are emitted
            # by the in-kernel prepass this mode replaces.
            def cp_body(i, _):
                gated[i] = wl_order[0, 0, i]
                tlb[i] = wl_tlb[0, 0, i]
                smask[i] = wl_smask[0, 0, i]
                return 0

            jax.lax.fori_loop(0, count, cp_body, 0)

            def rd_gated(i):
                return gated[i]
        else:
            def rd_gated(i):
                return wl_order[0, 0, i]

        if recheck:
            def rd_tlb(i):
                return tlb[i]

            def rd_smask(i):
                return smask[i]
        else:
            def rd_tlb(i):
                return wl_tlb[0, 0, i]

            def rd_smask(i):
                return wl_smask[0, 0, i]
    else:
        if ablate == "onlysc":
            nlist[0] = 0
        else:
            jax.lax.fori_loop(0, n_sc, pre_body, 0)
        count = nlist[0]

        def rd_gated(i):
            return gated[i]

        def rd_tlb(i):
            return tlb[i]

        def rd_smask(i):
            return smask[i]

    # visit != "near" sorts by the alternate skey (any-hit visit-order
    # experiment); tlb is carried through the sort regardless because the
    # DMA gate and per-set sweep skip prune on it.
    kref = tlb if visit == "near" else skey

    def ins_body(i, _):
        key = kref[i]
        key_t = tlb[i]
        key_g = gated[i]
        key_m = smask[i]

        def shift_cond(j):
            return jnp.logical_and(j > 0, kref[j - 1] > key)

        def shift_body(j):
            tlb[j] = tlb[j - 1]
            gated[j] = gated[j - 1]
            smask[j] = smask[j - 1]
            if visit != "near":
                skey[j] = skey[j - 1]
            return j - 1

        j = jax.lax.while_loop(shift_cond, shift_body, i)
        tlb[j] = key_t
        gated[j] = key_g
        smask[j] = key_m
        if visit != "near":
            skey[j] = key
        return 0

    # sort=(depth==0): see rt/dense.py — nearest-first pays only for
    # coherent dispatches (occl_d1 271→252 ms with the sort skipped)
    if (sort and (not pregate or recheck)
            and ablate not in ("nodma_nosort", "nosort")):
        jax.lax.fori_loop(1, count, ins_body, 0)

    def any_live():
        m = btmax[0]
        for s in range(1, ns):
            m = jnp.maximum(m, btmax[s])
        return m

    def recheck_issue(j):
        """pregate="recheck" (see rt/dense.py): per-set per-ray [1,R]
        slab tests of entry j's cluster box against the CURRENT per-set
        t states decide its DMA + sweeps, refine the entry bound
        (tlb[j]) and rebuild the per-(set[,group]) bits (smask[j]) —
        the interval prologue over-gates shadow cones ~2-5x because it
        lacks the per-ray `tn <= t(ray)` clause that prunes clusters
        beyond each segment's own surface."""
        c = wl_order[0, 0, j]
        bits = jnp.int32(0)
        entmin = jnp.float32(_INF)
        for s in range(ns):
            t0x = (clb[0, c] - oxs[s]) * ixs[s]
            t1x = (clb[3, c] - oxs[s]) * ixs[s]
            t0y = (clb[1, c] - oys[s]) * iys[s]
            t1y = (clb[4, c] - oys[s]) * iys[s]
            t0z = (clb[2, c] - ozs[s]) * izs[s]
            t1z = (clb[5, c] - ozs[s]) * izs[s]
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            ts = t_s[s][:]
            hit = ((tn <= tf) & (tf >= TMIN) & (0.9999 * tn <= ts)
                   & (ts > TMIN))
            if group_gate:
                lane_g = jax.lax.broadcasted_iota(jnp.int32, hit.shape,
                                                  1) // 128
                for g in range(G):
                    any_g = jnp.any(hit & (lane_g == g))
                    # left_shift, not jnp.int32(1 << k): bit 31 (ns*G=32,
                    # e.g. 4 sets x 1024-ray blocks) overflows a Python
                    # int32 literal
                    bits = bits | jnp.where(
                        any_g,
                        jnp.left_shift(jnp.int32(1), jnp.int32(s * G + g)),
                        0)
            else:
                bits = bits | jnp.where(jnp.any(hit), jnp.int32(1 << s), 0)
            entmin = jnp.minimum(entmin,
                                 jnp.min(jnp.where(hit, tn, _INF)))
        started[j] = (bits != 0).astype(jnp.int32)
        smask[j] = bits
        tlb[j] = 0.9999 * entmin

    def cluster_dma(i, slot):
        return pltpu.make_async_copy(tri_hbm.at[rd_gated(i)], tris.at[slot],
                                     sem.at[slot])

    if ablate in ("nodma", "nodma_nosort"):
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
                    cluster_dma(j, j % NBUF).start()

        def cl_body(i, _):
            j = i + NBUF - 1

            @pl.when(j < count)
            def _():
                if recheck:
                    recheck_issue(j)
                else:
                    go = rd_tlb(j) < any_live()
                    started[j] = go.astype(jnp.int32)

                @pl.when(started[j] == 1)
                def _():
                    cluster_dma(j, jax.lax.rem(j, NBUF)).start()

            @pl.when(started[i] == 1)
            def _():
                slot = jax.lax.rem(i, NBUF)
                cluster_dma(i, slot).wait()

                @pl.when(rd_tlb(i) < any_live())
                def _():
                    if ablate != "nosweep":
                        for s in range(ns):
                            if group_gate:
                                # set-level skip, then per-(set,group)
                                # gate bit + per-group btmax prune
                                set_bits = (jax.lax.shift_right_logical(
                                    rd_smask(i), s * G) & ((1 << G) - 1))

                                @pl.when((set_bits != 0)
                                         & (rd_tlb(i) < btmax[s]))
                                def _(s=s, set_bits=set_bits):
                                    for g in range(G):
                                        @pl.when(((jax.lax.
                                                   shift_right_logical(
                                                       set_bits, g) & 1)
                                                  == 1)
                                                 & (rd_tlb(i)
                                                    < btmaxg[s * G + g]))
                                        def _(s=s, g=g):
                                            sweep_cluster(slot, s, g)
                            else:
                                @pl.when(((jax.lax.shift_right_logical(
                                           rd_smask(i), s) & 1) == 1)
                                         & (rd_tlb(i) < btmax[s]))
                                def _(s=s):
                                    sweep_cluster(slot, s)
            return 0

        jax.lax.fori_loop(0, count, cl_body, 0)


def _sc_order_multi(tree, light_pts, dirs, ns, nblocks, block, n_sc,
                    order_w):
    """Front-to-back supercluster order keyed by the MIN entry over
    segment sets along each set's mean ray."""
    db = dirs.reshape(ns, 3, nblocks, block).mean(axis=3)
    key = None
    for s in range(ns):
        ob = light_pts[s][:, None]                           # [3,1]
        d_s = db[s]                                          # [3,nblocks]
        nrm = jnp.sqrt(jnp.maximum(
            d_s[0] ** 2 + d_s[1] ** 2 + d_s[2] ** 2, 1e-24))
        d_s = d_s / nrm[None]
        inv = 1.0 / jnp.where(jnp.abs(d_s) < 1e-12,
                              jnp.where(d_s < 0, -1e-12, 1e-12), d_s)
        tn = None
        tf = None
        for a in range(3):
            lo = tree.sc_boxes[a, :n_sc]
            hi = tree.sc_boxes[a + 3, :n_sc]
            t0 = (lo[None, :] - ob[a][:, None]) * inv[a][:, None]
            t1 = (hi[None, :] - ob[a][:, None]) * inv[a][:, None]
            lo_t = jnp.minimum(t0, t1)
            hi_t = jnp.maximum(t0, t1)
            tn = lo_t if tn is None else jnp.maximum(tn, lo_t)
            tf = hi_t if tf is None else jnp.minimum(tf, hi_t)
        k_s = jnp.where(tn <= tf, jnp.maximum(tn, 0.0), jnp.inf)
        key = k_s if key is None else jnp.minimum(key, k_s)
    sc_order = jnp.argsort(key, axis=1).astype(jnp.int32)
    return jnp.concatenate(
        [sc_order, jnp.full((nblocks, order_w - n_sc), -1, jnp.int32)],
        axis=1).reshape(nblocks, 1, order_w)


@functools.partial(jax.jit, static_argnames=("block", "interpret", "sort",
                                             "group_gate", "pregate",
                                             "ablate", "visit", "sub_gate"))
def occluded_multi(tree: ClusterTree, light_pts, dirs, tmax, *,
                   block: int = 512, interpret: bool = False,
                   sort: bool = True, group_gate: bool = False,
                   pregate=False, ablate: str = "",
                   visit: str = "near", sub_gate: bool = False):
    """NS-segment-set occlusion trace.

    light_pts: f32[NS, 3] — one origin point per segment set (shared by
    every block). dirs: f32[NS, 3, Nb, 128] — per-set directions over the
    SAME surface-tile wavefront. tmax: f32[NS, Nb, 128] (0 = parked).
    Returns blocked bool[NS, Nb, 128].

    group_gate / pregate: same semantics as rt/dense.py trace_dense
    (per-(set,group) gate bits / XLA-prologue work lists); BOTH are
    default-off here — group gating regressed 2x on hardware with the
    iota prepass (slice-prepass retest queued) and interval pregate
    over-gates shadow cones 3x (tools/pregate_sim.py). Kept
    bit-identical (CI) for the retests.

    pregate="recheck": two-level gate — interval prologue nominates
    candidates (cumsum partition, no argsort), the kernel re-tests each
    per-ray per-set at DMA-issue time against the CURRENT t states and
    rebuilds the set(/group) bits and the entry bound (see rt/dense.py).
    Composes with group_gate. Any-hit outputs stay bit-identical.

    visit: insertion-sort key for the cluster visit order (only matters
    with sort=True). "near" = nearest-first slab entry from the light
    (tlb, the closest-hit-optimal order); "mid" = entry closest to the
    segment midpoint 0.5*btmax; "far" = farthest-first (surface-side
    occluders first). Any-hit outputs are visit-order independent (the
    tlb prunes are per-entry) — CI asserts bit-equality; which order
    terminates the sweep soonest is a hardware timing question
    (ROADMAP "shadow visit order" lever).
    """
    ns = int(light_pts.shape[0])
    nb = dirs.shape[2]
    N = nb * LANES
    assert N % block == 0
    assert not (pregate == "recheck" and sort and visit != "near"), \
        "recheck+sort orders by the interval bound (visit='near' only)"
    n_sc = tree.num_superclusters
    c2p = tree.sc_boxes.shape[1]
    k1 = tree.tri_data.shape[1]
    NBUF = 4
    maxc = tree.tri_data.shape[0]
    nblocks = N // block

    # pregate: XLA-prologue per-(block, cluster, set) interval gating —
    # the kernel skips its whole per-ray prepass and the scalar
    # emission/sort (see rt/dense.py _pregate_worklists; coherent
    # point-origin shadow cones only)
    order_w = -(-n_sc // 64) * 64
    if pregate:
        from vkrt_tpu.rt.dense import (_cluster_bounds_smem, _interval_gate,
                                       _pack_worklists, _partition_worklists)
        gate_any, tlb_min, sbits = None, None, None
        for s in range(ns):
            o_pts = jnp.broadcast_to(light_pts[s][None, :], (nblocks, 3))
            g, t, _ = _interval_gate(tree, o_pts, dirs[s], tmax[s],
                                     block=block, point_origin=True)
            b = jnp.where(g, jnp.int32(1 << s), 0)
            gate_any = g if gate_any is None else (gate_any | g)
            tlb_min = (jnp.where(g, t, _INF) if tlb_min is None
                       else jnp.minimum(tlb_min, jnp.where(g, t, _INF)))
            sbits = b if sbits is None else (sbits | b)
        pack = (_partition_worklists if pregate == "recheck"
                else _pack_worklists)
        wl_order, wl_tlb, wl_count, wl_smask = pack(
            gate_any, jnp.where(gate_any, tlb_min, 0.0), extra=sbits)
        clb = (_cluster_bounds_smem(tree) if pregate == "recheck"
               else jnp.zeros((6, 8), jnp.float32))
        cp = wl_order.shape[-1]
        sc_order = jnp.zeros((nblocks, 1, order_w), jnp.int32)
    else:
        cp = 64
        wl_order = jnp.zeros((nblocks, 1, cp), jnp.int32)
        wl_tlb = jnp.zeros((nblocks, 1, cp), jnp.float32)
        wl_smask = jnp.zeros((nblocks, 1, cp), jnp.int32)
        wl_count = jnp.zeros((nblocks, 1, 8), jnp.int32)
        clb = jnp.zeros((6, 8), jnp.float32)
        # prologue: front-to-back supercluster order keyed by the MIN
        # entry over segment sets along each set's mean ray
        sc_order = _sc_order_multi(tree, light_pts, dirs, ns, nblocks,
                                   block, n_sc, order_w)

    kernel = functools.partial(_occl_multi_kernel, n_sc=n_sc, ns=ns,
                               sort=sort, group_gate=group_gate,
                               pregate=pregate, ablate=ablate, visit=visit,
                               sub_gate=sub_gate)
    d_k = dirs.reshape(ns * 3, nblocks, 1, block)
    tmax_k = tmax.reshape(ns, nblocks, 1, block)
    out_shape = jax.ShapeDtypeStruct((ns, nblocks, 1, block), jnp.int32)
    occ = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1, order_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, c2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sc, 8, K2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ns * 3, 1, 1, block), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 1, 1, block), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tuple(clb.shape), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),   # cluster bounds (recheck)
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((ns, 1, 1, block), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NBUF, k1, ROWS), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SMEM((maxc,), jnp.int32),
            pltpu.SMEM((maxc,), jnp.float32),
            pltpu.SMEM((maxc,), jnp.float32),    # alt visit-order sort key
            pltpu.SMEM((maxc,), jnp.int32),      # per-entry segment-set bits
            pltpu.SMEM((maxc,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((order_w // 32,), jnp.int32),
            pltpu.SMEM((ns,), jnp.float32),
            pltpu.SMEM((ns * (block // 128),), jnp.float32),  # per-grp max-t
        ] + [pltpu.VMEM((1, block), jnp.float32) for _ in range(ns)],
        interpret=interpret,
    )(sc_order, tree.sc_boxes, tree.cl_boxes, light_pts, d_k, tmax_k,
      wl_order, wl_tlb, wl_smask, wl_count, clb, tree.tri_data)

    return occ.reshape(ns, nb, LANES) > 0
