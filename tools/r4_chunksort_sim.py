"""Round-4: GROUP(128-lane)-granularity secondary resort — quality sim.

Round 3 measured the ray-granular resort DEAD on hardware: the
cumsum+scatter radix permutations cost ~420 ms/frame at 1080p (XLA
scatter ~30M rows/s x 14 bit-passes over 2M rays), more than every
dispatch they accelerate (ROADMAP.md). But the permutation cost is
per-ROW, not per-byte: permuting at the 128-lane GROUP granularity is
128x fewer rows (~16k at 1080p) — jnp.take of [*, Nb, 128] along Nb is
~1 ms/array. The groups are already spatially tight 8x16-pixel subtiles
(engine.tile docstring), so a group's rays keep their internal
coherence; what sorting adds is that the 8 groups sharing a 1024-ray
dispatch block have SIMILAR keys (tight block cone) instead of being
8 adjacent screen subtiles whose surface points span foreground +
background.

This sim asks how much of the ray-level sort's win (0.40x shadow_d0,
0.13-0.28x shadow_d1, 0.51x closest_d1 — tools/dirsort_sim*.py)
survives at group granularity. Pure numpy on the cached one-TPU-trace
state (/tmp/sgs_state.npz, tools/subgroup_sim.py fetch_state).

Keys (per group, from live rays only):
  shadow_*   — Morton cell of the mean live segment END point
               (o + tm*d = the shared surface point; identical across
               the 4 lights, so one permutation re-tiles all sets)
  closest_d1 — mean-direction octant (3 bits major) + mean-origin
               Morton (minor); all-dead groups sort to the tail

Run: python -u tools/r4_chunksort_sim.py > /tmp/r4cs.out 2>&1
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from vkrt_tpu.rt.dense import TMIN
from tools.subgroup_sim import boxes_from_tree, fetch_state, slab
from tools.dirsort_sim import keys_for, morton3

RNG = np.random.default_rng(7)
NSAMP = 240
LANES = 128


def gated_total(o, d, tm, cl, block):
    """Mean gated clusters over sampled live blocks x live-block count."""
    ob = o.reshape(-1, block, 3)
    db = d.reshape(-1, block, 3)
    tb = tm.reshape(-1, block)
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


def group_perm_point(o, d, tm, bits=4):
    """Group permutation by Morton cell of mean live endpoint."""
    live = tm > TMIN
    p = o + tm[:, None] * d
    ng = len(tm) // LANES
    pl_ = p.reshape(ng, LANES, 3)
    lv = live.reshape(ng, LANES)
    cnt = np.maximum(lv.sum(axis=1), 1)[:, None]
    mean = (pl_ * lv[:, :, None]).sum(axis=1) / cnt          # [Ng,3]
    lo = mean[lv.any(axis=1)].min(axis=0)
    hi = mean[lv.any(axis=1)].max(axis=0)
    q = ((mean - lo) / np.maximum(hi - lo, 1e-9)
         * ((1 << bits) - 1)).clip(0, (1 << bits) - 1).astype(np.uint64)
    key = morton3(q.T, bits=bits)
    key = np.where(lv.any(axis=1), key, np.uint64(1) << np.uint64(3 * bits))
    return np.argsort(key, kind="stable")


def group_perm_dir(o, d, tm, bits=6):
    """Group permutation by mean-dir octant major, mean-origin cell minor."""
    live = tm > TMIN
    ng = len(tm) // LANES
    lv = live.reshape(ng, LANES)
    cnt = np.maximum(lv.sum(axis=1), 1)[:, None]
    md = (d.reshape(ng, LANES, 3) * lv[:, :, None]).sum(axis=1) / cnt
    mo = (o.reshape(ng, LANES, 3) * lv[:, :, None]).sum(axis=1) / cnt
    oct_ = ((md[:, 0] < 0).astype(np.uint64)
            | ((md[:, 1] < 0).astype(np.uint64) << np.uint64(1))
            | ((md[:, 2] < 0).astype(np.uint64) << np.uint64(2)))
    any_ = lv.any(axis=1)
    lo = mo[any_].min(axis=0)
    hi = mo[any_].max(axis=0)
    q = ((mo - lo) / np.maximum(hi - lo, 1e-9)
         * ((1 << bits) - 1)).clip(0, (1 << bits) - 1).astype(np.uint64)
    key = (oct_ << np.uint64(3 * bits)) | morton3(q.T, bits=bits)
    key = np.where(any_, key, np.uint64(1) << np.uint64(3 * bits + 3))
    return np.argsort(key, kind="stable")


def apply_group_perm(x, perm):
    ng = x.shape[0] // LANES
    return x.reshape((ng, LANES) + x.shape[1:])[perm].reshape(x.shape)


def main():
    st = fetch_state()
    from vkrt_tpu.wavefront.engine import cached_backend
    _, _, backend = cached_backend(
        "/root/reference/models/sponza/Sponza.gltf", 512, "dense")
    cl, _ = boxes_from_tree(backend.tree)

    # production block sizes: shadows 1024, closest_d1 1024 (group-gated)
    for name, block in (("shadow_d0_l0", 1024), ("shadow_d0_l1", 1024),
                        ("shadow_d1_l0", 1024), ("closest_d1", 1024)):
        if f"{name}.o" not in st:
            continue
        o = np.asarray(st[f"{name}.o"]).reshape(3, -1).T      # [N,3]
        d = np.asarray(st[f"{name}.d"]).reshape(3, -1).T
        tm = np.asarray(st[f"{name}.tm"]).reshape(-1)
        nb, mg, tot = gated_total(o, d, tm, cl, block)
        print(json.dumps({"sim": name, "variant": "baseline", "block": block,
                          "live_blocks": nb, "gated_mean": round(mg, 1),
                          "total_sweeps": tot}), flush=True)

        variants = []
        if name.startswith("shadow"):
            for bits in (3, 4, 5):
                variants.append((f"group_point_b{bits}",
                                 group_perm_point(o, d, tm, bits=bits)))
        else:
            for bits in (4, 6):
                variants.append((f"group_dir+org_b{bits}",
                                 group_perm_dir(o, d, tm, bits=bits)))

        # ray-level reference (dirsort recipe) for the same block size
        live = np.flatnonzero(tm > TMIN)
        kind = "point" if name.startswith("shadow") else "dir+org"
        key = keys_for(o[live], d[live], kind, tm=tm[live])
        order = live[np.argsort(key, kind="stable")]
        npad = -(-len(order) // block) * block
        op = np.zeros((npad, 3), np.float32)
        dp = np.zeros((npad, 3), np.float32)
        dp[:, 2] = 1.0
        tp = np.zeros(npad, np.float32)
        op[:len(order)] = o[order]
        dp[:len(order)] = d[order]
        tp[:len(order)] = tm[order]
        nb2, mg2, tot2 = gated_total(op, dp, tp, cl, block)
        print(json.dumps({"sim": name, "variant": f"ray_{kind}",
                          "block": block, "live_blocks": nb2,
                          "gated_mean": round(mg2, 1), "total_sweeps": tot2,
                          "vs_baseline": round(tot2 / max(tot, 1), 3)}),
              flush=True)

        for vname, perm in variants:
            og = apply_group_perm(o, perm)
            dg = apply_group_perm(d, perm)
            tg = apply_group_perm(tm, perm)
            nb3, mg3, tot3 = gated_total(og, dg, tg, cl, block)
            print(json.dumps({"sim": name, "variant": vname, "block": block,
                              "live_blocks": nb3, "gated_mean": round(mg3, 1),
                              "total_sweeps": tot3,
                              "vs_baseline": round(tot3 / max(tot, 1), 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
