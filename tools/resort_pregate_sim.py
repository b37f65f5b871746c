"""Does the resort make interval pregate viable for SECONDARY dispatches?

tools/pregate_sim.py measured interval-slab over-gate on the UNSORTED
wavefront: +8.8% for coherent camera tiles but 3.1-3.4x for shadow
cones and depth-1 reflections — the per-ray `tn <= tmax(ray)` clause
prunes clusters beyond each segment's own surface, which one
block-level interval cannot. But that was measured on camera-tile
blocks whose live rays span wide cones. With cfg.resort_secondary the
production engine re-tiles secondaries into octant-coherent (closest)
/ Morton-cell-coherent (shadow) blocks BEFORE dispatch — inside a
resorted block, directions share an octant and origins share a scene
cell, exactly the coherence the interval test needs.

This sim applies the PRODUCTION resort keys (wavefront/resort.py:
octant_key for closest_d1, cell_key cell3 for shadows — stable sort ==
radix partition) to the cached real wavefront state, then re-measures
block-level AND per-group (128-ray) interval over-gate on the resorted
blocks. If the resorted over-gate ratio is small (~1.1-1.3x), the
in-kernel per-ray prepass + scalar emission + sort (~165 ms/frame
across dispatches) can be replaced by XLA-prologue interval work lists
for secondaries too, not just (pending hardware) closest_d0.

Run: JAX_PLATFORMS=cpu python -u tools/resort_pregate_sim.py
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from vkrt_tpu.rt.dense import TMIN
from tools.pregate_sim import cluster_boxes, interval_gate, per_ray_gate

BLOCK = 1024
GROUP = 128
NSAMP = 240
RNG = np.random.default_rng(3)


def production_key(name, o, d, tm):
    """The exact resort.py key, in numpy, on [N,3]/[N] state."""
    live = tm > TMIN
    if name.startswith("closest"):
        k = ((d[:, 0] < 0).astype(np.int64)
             | ((d[:, 1] < 0).astype(np.int64) << 1)
             | ((d[:, 2] < 0).astype(np.int64) << 2))
        return np.where(live, k, 8)
    # shadows: Morton cell (3 bits/axis over the scene AABB) of the
    # segment end point o + tm*d (== the shared surface point)
    p = o + tm[:, None] * d
    from vkrt_tpu.wavefront.engine import cached_backend
    _, _, backend = cached_backend(
        "/root/reference/models/sponza/Sponza.gltf", 512, "dense")
    aabb = np.asarray(backend.scene_aabb)
    lo, span = aabb[0], np.maximum(aabb[1] - aabb[0], 1e-6)
    q = np.clip((p - lo) / span * 8.0, 0.0, 7.0).astype(np.int64)
    k = np.zeros(len(tm), np.int64)
    for a in range(3):
        for b in range(3):
            k |= ((q[:, a] >> b) & 1) << (3 * b + a)
    return np.where(live, k, 1 << 9)


def measure(name, o, d, tm, lo, hi, resorted):
    if resorted:
        key = production_key(name, o, d, tm)
        order = np.argsort(key, kind="stable")
        o, d, tm = o[order], d[order], tm[order]
    ob = o.reshape(-1, BLOCK, 3)
    db = d.reshape(-1, BLOCK, 3)
    tb = tm.reshape(-1, BLOCK)
    liveb = (tb > TMIN).any(axis=1)
    idx = np.flatnonzero(liveb)
    samp = (idx if len(idx) <= NSAMP
            else RNG.choice(idx, size=NSAMP, replace=False))
    exact = blk = grp = 0
    for b in samp:
        g1 = per_ray_gate(lo, hi, ob[b], db[b], tb[b])
        g2 = interval_gate(lo, hi, ob[b], db[b], tb[b])
        g3 = np.zeros_like(g2)
        for g in range(BLOCK // GROUP):
            sl = slice(g * GROUP, (g + 1) * GROUP)
            g3 |= interval_gate(lo, hi, ob[b][sl], db[b][sl], tb[b][sl])
        assert (g1 <= g2).all() and (g1 <= g3).all()
        exact += int(g1.sum())
        blk += int(g2.sum())
        grp += int(g3.sum())
    scale = len(idx) / max(len(samp), 1)
    print(json.dumps({
        "sim": name, "resorted": resorted, "live_blocks": int(len(idx)),
        "per_ray_mean": round(exact / max(len(samp), 1), 1),
        "interval_block_mean": round(blk / max(len(samp), 1), 1),
        "interval_group_mean": round(grp / max(len(samp), 1), 1),
        "overgate_block": round(blk / max(exact, 1), 3),
        "overgate_group": round(grp / max(exact, 1), 3),
        "total_per_ray_sweeps": int(round(exact * scale)),
        "total_interval_block_sweeps": int(round(blk * scale)),
        "total_interval_group_sweeps": int(round(grp * scale)),
    }), flush=True)


def main():
    st = dict(np.load("/tmp/sgs_state.npz"))
    from vkrt_tpu.wavefront.engine import cached_backend
    _, _, backend = cached_backend(
        "/root/reference/models/sponza/Sponza.gltf", 512, "dense")
    lo, hi = cluster_boxes(backend.tree)
    for n in ("closest_d1", "shadow_d0_l0", "shadow_d0_l1",
              "shadow_d1_l0", "shadow_d1_l1"):
        o = np.asarray(st[f"{n}.o"]).reshape(3, -1).T
        d = np.asarray(st[f"{n}.d"]).reshape(3, -1).T
        tm = np.asarray(st[f"{n}.tm"]).reshape(-1)
        for resorted in (False, True):
            measure(n, o, d, tm, lo, hi, resorted)


if __name__ == "__main__":
    main()
