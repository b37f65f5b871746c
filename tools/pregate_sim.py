"""Over-gating of interval pregate vs per-ray union gating (CPU sim).

pregate replaces the kernel's per-ray prepass with one interval slab
test per (block, cluster) — a conservative superset. The prepass it
removes costs ~140 ms/frame at depth 0, but every extra gated cluster
costs a sweep (~2/3 of dispatch time), so the break-even is an
over-gating ratio of roughly +30% of the sweep budget. This measures
the ratio on the cached REAL depth-0 wavefront state.

Run: JAX_PLATFORMS=cpu python -u tools/pregate_sim.py
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from vkrt_tpu.rt.dense import TMIN

_INF = 3.0e38
RNG = np.random.default_rng(0)
NSAMP = 150


def cluster_boxes(tree):
    td = np.array(tree.tri_data[:, :, 0:9])
    v0, e1, e2 = td[..., 0:3], td[..., 3:6], td[..., 6:9]
    p1, p2 = v0 + e1, v0 + e2
    valid = np.abs(v0).sum(axis=2) + np.abs(e1).sum(axis=2) > 0
    tmin = np.where(valid[..., None],
                    np.minimum(np.minimum(v0, p1), p2), _INF)
    tmax = np.where(valid[..., None],
                    np.maximum(np.maximum(v0, p1), p2), -_INF)
    return tmin.min(axis=1), tmax.max(axis=1)


def per_ray_gate(lo, hi, o, d, tm):
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    t0 = (lo[:, None, :] - o[None]) * inv[None]
    t1 = (hi[:, None, :] - o[None]) * inv[None]
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    live = tm > TMIN
    hit = (tn <= tf) & (tf >= TMIN) & (tn <= tm[None]) & live[None]
    return hit.any(axis=1)


def interval_gate(lo, hi, o, d, tm):
    live = tm > TMIN
    if not live.any():
        return np.zeros(lo.shape[0], bool)
    ol, oh = o[live].min(axis=0), o[live].max(axis=0)
    dl, dh = d[live].min(axis=0), d[live].max(axis=0)
    tmax_max = tm[live].max()
    tn_low = np.full(lo.shape[0], -_INF)
    tf_high = np.full(lo.shape[0], _INF)
    for a in range(3):
        if dl[a] > 1e-20 or dh[a] < -1e-20:
            i_lo, i_hi = 1.0 / dh[a], 1.0 / dl[a]
        else:
            continue
        cands_n = [(lo[:, a] - oh[a]), (lo[:, a] - ol[a])]
        cands_f = [(hi[:, a] - oh[a]), (hi[:, a] - ol[a])]
        t_all = [n * i for n in cands_n + cands_f for i in (i_lo, i_hi)]
        t_all = np.stack(t_all)
        tn_low = np.maximum(tn_low, t_all.min(axis=0))
        tf_high = np.minimum(tf_high, t_all.max(axis=0))
    return (tn_low <= tf_high) & (tf_high >= TMIN) & (tn_low <= tmax_max)


def simulate(name, o, d, tm, lo, hi, block):
    o = np.asarray(o).reshape(3, -1, block)
    d = np.asarray(d).reshape(3, -1, block)
    tm = np.asarray(tm).reshape(-1, block)
    liveb = (tm > TMIN).any(axis=1)
    idx = np.flatnonzero(liveb)
    idx = RNG.choice(idx, size=min(NSAMP, len(idx)), replace=False)
    exact, conserv = 0, 0
    for b in idx:
        ob, db, tb = o[:, b].T, d[:, b].T, tm[b]
        g1 = per_ray_gate(lo, hi, ob, db, tb)
        g2 = interval_gate(lo, hi, ob, db, tb)
        assert (g1 <= g2).all(), "pregate missed a gated cluster!"
        exact += int(g1.sum())
        conserv += int(g2.sum())
    print(json.dumps({"sim": name, "block": block,
                      "per_ray_clusters_per_block": round(exact / len(idx), 1),
                      "interval_clusters_per_block":
                          round(conserv / len(idx), 1),
                      "overgate": round(conserv / max(exact, 1), 3)}),
          flush=True)


def main():
    st = dict(np.load("/tmp/sgs_state.npz"))
    from vkrt_tpu.wavefront.engine import cached_backend
    _, _, backend = cached_backend(
        "/root/reference/models/sponza/Sponza.gltf", 512, "dense")
    lo, hi = cluster_boxes(backend.tree)
    for n in ("closest_d0", "shadow_d0_l0", "shadow_d0_l1", "closest_d1"):
        simulate(n, st[f"{n}.o"], st[f"{n}.d"], st[f"{n}.tm"], lo, hi, 1024)


if __name__ == "__main__":
    main()
