"""Simulate direction-sorted re-tiling of depth-1 dispatches (round 3).

Depth-1 closest (~125 ms) and depth-1 shadows (~252 ms) sweep ~42
clusters per live block because reflected/shadow-segment rays within a
camera-tile block span a wide cone. Block- and row-granular compaction
are measured dead ends (the cost is intrinsic to the wide cone, not to
dead-ray overhead — tools/block_compact_probe.py), but neither RESORTS
rays: this sim asks how much the per-block gated-cluster count drops if
live depth-1 rays are globally sorted into spatially coherent blocks
before dispatch (then inverse-scattered after, like the depth>=1
sampler's live-row packing).

Sort keys tried per workload:
  * dir      — octahedral-map Morton of the unit direction
  * origin   — 3D Morton of the ray origin (closest_d1 only; shadow
               origins are all the light point)
  * dir+org  — direction octant (3 bits) major, origin Morton minor
  * org+dir  — origin Morton major (6 bits/axis), dir Morton minor

Estimated total sweep work = mean gated clusters per block x number of
blocks; compare against the live-block baseline. Pure numpy on the
cached one-TPU-trace state (/tmp/sgs_state.npz, tools/subgroup_sim.py).

Run: python -u tools/dirsort_sim.py > /tmp/dss.out 2>&1
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from vkrt_tpu.rt.dense import TMIN
from tools.subgroup_sim import BLOCK, boxes_from_tree, fetch_state, slab

RNG = np.random.default_rng(7)
NSAMP = 240


def morton3(x, bits=10):
    """Interleave 3 integer arrays of `bits` bits each."""
    out = np.zeros(x.shape[1], np.uint64)
    for b in range(bits):
        for a in range(3):
            out |= ((x[a].astype(np.uint64) >> b) & 1) << np.uint64(
                3 * b + a)
    return out


def morton2(x, bits=16):
    out = np.zeros(x.shape[1], np.uint64)
    for b in range(bits):
        for a in range(2):
            out |= ((x[a].astype(np.uint64) >> b) & 1) << np.uint64(
                2 * b + a)
    return out


def octahedral_uv(d):
    """Unit dirs [N,3] -> octahedral map uv in [0,1]^2."""
    n = np.abs(d).sum(axis=1, keepdims=True)
    p = d[:, :2] / np.maximum(n, 1e-20)
    neg = d[:, 2] < 0
    flip = (1.0 - np.abs(p[:, ::-1])) * np.where(p >= 0, 1.0, -1.0)
    p = np.where(neg[:, None], flip, p)
    return np.clip(p * 0.5 + 0.5, 0.0, 1.0)


def keys_for(o, d, kind, tm=None):
    if kind == "point":
        # shadow segments: sort by the segment END point (the depth-1
        # surface point, o + tm*d) — IDENTICAL across the 4 lights, so
        # one permutation keeps all segment sets row-aligned and the
        # multi-segment kernel intact
        p = o + tm[:, None] * d
        lo, hi = p.min(axis=0), p.max(axis=0)
        q = ((p - lo) / np.maximum(hi - lo, 1e-9) * 1023).astype(np.uint64)
        return morton3(q.T, bits=10)
    if kind == "dir":
        uv = octahedral_uv(d)
        q = np.minimum((uv.T * 65535).astype(np.uint64), 65535)
        return morton2(q, bits=16)
    if kind == "origin":
        lo, hi = o.min(axis=0), o.max(axis=0)
        q = ((o - lo) / np.maximum(hi - lo, 1e-9) * 1023).astype(np.uint64)
        return morton3(q.T, bits=10)
    if kind == "dir+org":
        oct_ = ((d[:, 0] < 0).astype(np.uint64)
                | ((d[:, 1] < 0).astype(np.uint64) << np.uint64(1))
                | ((d[:, 2] < 0).astype(np.uint64) << np.uint64(2)))
        return (oct_ << np.uint64(30)) | keys_for(o, d, "origin")
    if kind == "org+dir":
        lo, hi = o.min(axis=0), o.max(axis=0)
        q = ((o - lo) / np.maximum(hi - lo, 1e-9) * 63).astype(np.uint64)
        ok = morton3(q.T, bits=6)
        uv = octahedral_uv(d)
        qd = np.minimum((uv.T * 255).astype(np.uint64), 255)
        return (ok << np.uint64(16)) | morton2(qd, bits=8)
    raise ValueError(kind)


def gated_total(name, o, d, tm, cl):
    """Mean gated clusters over sampled live blocks x live-block count."""
    ob = o.reshape(-1, BLOCK, 3)
    db = d.reshape(-1, BLOCK, 3)
    tb = tm.reshape(-1, BLOCK)
    liveb = (tb > TMIN).any(axis=1)
    idx = np.flatnonzero(liveb)
    if len(idx) == 0:
        return 0, 0.0, 0
    samp = RNG.choice(idx, size=min(NSAMP, len(idx)), replace=False)
    counts = []
    for b in samp:
        dbb = db[b]
        inv = 1.0 / np.where(np.abs(dbb) < 1e-20,
                             np.where(dbb < 0, -1e-20, 1e-20), dbb)
        ghit = slab(cl[0], cl[1], ob[b], inv, tb[b]).any(axis=1)
        counts.append(int(ghit.sum()))
    mean_g = float(np.mean(counts))
    return len(idx), mean_g, int(round(mean_g * len(idx)))


def main():
    st = fetch_state()
    from vkrt_tpu.wavefront.engine import cached_backend
    _, _, backend = cached_backend(
        "/root/reference/models/sponza/Sponza.gltf", 512, "dense")
    cl, _ = boxes_from_tree(backend.tree)

    for name in ("closest_d1", "shadow_d1_l0", "shadow_d1_l1",
                 "shadow_d0_l0"):
        o = np.asarray(st[f"{name}.o"]).reshape(3, -1).T      # [N,3]
        d = np.asarray(st[f"{name}.d"]).reshape(3, -1).T
        tm = np.asarray(st[f"{name}.tm"]).reshape(-1)
        nb, mg, tot = gated_total(name, o, d, tm, cl)
        print(json.dumps({"sim": name, "variant": "baseline",
                          "live_blocks": nb, "gated_mean": round(mg, 1),
                          "total_sweeps": tot}), flush=True)

        live = np.flatnonzero(tm > TMIN)
        kinds = (("dir", "origin", "dir+org", "org+dir")
                 if name == "closest_d1" else ("dir", "point"))
        for kind in kinds:
            key = keys_for(o[live], d[live], kind, tm=tm[live])
            order = live[np.argsort(key, kind="stable")]
            npad = -(-len(order) // BLOCK) * BLOCK
            op = np.zeros((npad, 3), np.float32)
            dp = np.zeros((npad, 3), np.float32)
            dp[:, 2] = 1.0
            tp = np.zeros(npad, np.float32)
            op[:len(order)] = o[order]
            dp[:len(order)] = d[order]
            tp[:len(order)] = tm[order]
            nb2, mg2, tot2 = gated_total(name, op, dp, tp, cl)
            print(json.dumps({
                "sim": name, "variant": f"sorted_{kind}",
                "live_blocks": nb2, "gated_mean": round(mg2, 1),
                "total_sweeps": tot2,
                "vs_baseline": round(tot2 / max(tot, 1), 3)}), flush=True)


if __name__ == "__main__":
    main()
