"""Simulate per-ROW (128-lane group) cluster gating on real wavefront state.

Round 2 rejected group gating at 0.83x sweep-vreg ratio — measured on
COHERENT depth-0 camera rays (tools/group_gate_eval.py). Depth-1 work is
different: a live 512-ray block mixes converged/parked rows with live
rows whose directions span a wide cone, so a whole-block sweep may pay
for rows that never gate the cluster. This measures, per (live block,
gated cluster), how many of the block's 128-lane rows actually gate it:

  ratio = sum_over_clusters(gated_rows) / (rows_per_block * gated_any)

A per-row-sweeping kernel's MT cost scales with the numerator (each
row sweep is [K1,128] = 16 vregs); the current kernel pays the
denominator. Control overhead (~1 scalar branch per (cluster,row)) is
NOT modeled — treat ratios > ~0.7 as dead.

Uses the cached real wavefront state from tools/subgroup_sim.py
(/tmp/sgs_state.npz). Pure numpy, run with JAX_PLATFORMS=cpu.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from vkrt_tpu.rt.dense import TMIN

_INF = 3.0e38
RNG = np.random.default_rng(0)
NSAMP = 200


def cluster_boxes_from_tree(tree):
    td = np.array(tree.tri_data[:, :, 0:9])
    v0, e1, e2 = td[..., 0:3], td[..., 3:6], td[..., 6:9]
    p1, p2 = v0 + e1, v0 + e2
    valid = np.abs(v0).sum(axis=2) + np.abs(e1).sum(axis=2) > 0
    tmin = np.minimum(np.minimum(v0, p1), p2)
    tmax = np.maximum(np.maximum(v0, p1), p2)
    tmin = np.where(valid[..., None], tmin, _INF)
    tmax = np.where(valid[..., None], tmax, -_INF)
    return tmin.min(axis=1), tmax.max(axis=1)       # [C1,3] lo/hi


def slab_rows(lo, hi, o, inv, tmax):
    """Per-row gating: lo/hi [C,3]; o/inv [R,3]; tmax [R] -> [C, G] bool
    where G = R//128 (any live ray in the row hits the box)."""
    t0 = (lo[:, None, :] - o[None, :, :]) * inv[None, :, :]
    t1 = (hi[:, None, :] - o[None, :, :]) * inv[None, :, :]
    tn = np.minimum(t0, t1).max(axis=2)             # [C,R]
    tf = np.maximum(t0, t1).min(axis=2)
    live = tmax > TMIN
    hit = (tn <= tf) & (tf >= TMIN) & (tn <= tmax[None, :]) & live[None, :]
    C, R = hit.shape
    return hit.reshape(C, R // 128, 128).any(axis=2)  # [C,G]


def simulate(name, o, d, tm, cl_lo, cl_hi, block):
    o = np.asarray(o).reshape(3, -1, block)
    d = np.asarray(d).reshape(3, -1, block)
    tm = np.asarray(tm).reshape(-1, block)
    G = block // 128
    liveb = (tm > TMIN).any(axis=1)
    idx = np.flatnonzero(liveb)
    if len(idx) == 0:
        print(json.dumps({"sim": name, "note": "no live blocks"}), flush=True)
        return
    idx = RNG.choice(idx, size=min(NSAMP, len(idx)), replace=False)
    pair_rows, gated_cl, row_hist = 0, 0, np.zeros(G + 1, np.int64)
    for b in idx:
        ob, db, tb = o[:, b].T, d[:, b].T, tm[b]
        inv = 1.0 / np.where(np.abs(db) < 1e-20,
                             np.where(db < 0, -1e-20, 1e-20), db)
        rows = slab_rows(cl_lo, cl_hi, ob, inv, tb)   # [C,G]
        nrows = rows.sum(axis=1)                       # [C]
        g = nrows > 0
        gated_cl += int(g.sum())
        pair_rows += int(nrows.sum())
        for k in range(1, G + 1):
            row_hist[k] += int((nrows == k).sum())
    out = {"sim": name, "block": block, "blocks_sampled": len(idx),
           "gated_clusters_per_block": round(gated_cl / len(idx), 1),
           "rows_per_gated_cluster": round(pair_rows / max(gated_cl, 1), 2),
           "sweep_vreg_ratio": round(pair_rows / max(G * gated_cl, 1), 3),
           "row_hist": [int(x) for x in row_hist[1:]]}
    print(json.dumps(out), flush=True)


def main():
    st = dict(np.load("/tmp/sgs_state.npz"))
    from vkrt_tpu.wavefront.engine import cached_backend
    _, _, backend = cached_backend(
        "/root/reference/models/sponza/Sponza.gltf", 512, "dense")
    cl_lo, cl_hi = cluster_boxes_from_tree(backend.tree)
    names = sorted({k.rsplit(".", 1)[0] for k in st})
    for n in names:
        # production block sizes: closest d0 1024 / d1 512; occl 1024
        blocks = (512, 1024) if "closest" in n else (1024,)
        for blk in blocks:
            simulate(n, st[f"{n}.o"], st[f"{n}.d"], st[f"{n}.tm"],
                     cl_lo, cl_hi, blk)


if __name__ == "__main__":
    main()
