"""Implementable variants of the depth-1 re-tiling sim (round 3).

tools/dirsort_sim.py showed full Morton sorts cut depth-1 total sweep
work to 0.51x (closest) and 0.13-0.24x (shadows) — but jnp.argsort
fused into the frame jit is a measured ~400s-compile landmine
(CLAUDE.md). The implementable alternative is a cumsum-based stable
radix partition on a SMALL key (k passes of cumsum+scatter for a k-bit
key). This sim scores those keys:

  * closest_d1 oct        — 3-bit direction octant, stable (the stable
    order within a bucket is the camera-tile order, so this inherits
    origin coherence for free — approximating dir+org)
  * closest_d1 oct+org2/org3 — octant + 2-3 origin Morton bits/axis
    (9-bit / 12-bit keys)
  * shadow_d1 inherit     — shadow arrays under the closest_d1 oct
    permutation (no second sort: the shadow wavefront reuses the
    round's reflection-ray order)
  * shadow_d1 cell3/cell4 — second in-round partition by 3-4 bit/axis
    Morton cell of the shared depth-1 surface point (9/12-bit key, one
    permutation for all 4 lights)

Run: python -u tools/dirsort_sim2.py > /tmp/dss3.out 2>&1
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from vkrt_tpu.rt.dense import TMIN
from tools.dirsort_sim import gated_total, morton3
from tools.subgroup_sim import boxes_from_tree, fetch_state


def stable_perm(key):
    return np.argsort(key, kind="stable")


def apply_perm(o, d, tm, perm):
    return o[perm], d[perm], tm[perm]


def report(name, variant, o, d, tm, cl, base_tot):
    nb, mg, tot = gated_total(name, o, d, tm, cl)
    print(json.dumps({"sim": name, "variant": variant, "live_blocks": nb,
                      "gated_mean": round(mg, 1), "total_sweeps": tot,
                      "vs_baseline": round(tot / max(base_tot, 1), 3)}),
          flush=True)


def octant(d):
    return ((d[:, 0] < 0).astype(np.int64)
            | ((d[:, 1] < 0).astype(np.int64) << 1)
            | ((d[:, 2] < 0).astype(np.int64) << 2))


def org_bits(o, bits):
    lo, hi = o.min(axis=0), o.max(axis=0)
    q = ((o - lo) / np.maximum(hi - lo, 1e-9)
         * (2 ** bits - 1)).astype(np.uint64)
    return morton3(q.T, bits=bits).astype(np.int64)


def main():
    st = fetch_state()
    from vkrt_tpu.wavefront.engine import cached_backend
    _, _, backend = cached_backend(
        "/root/reference/models/sponza/Sponza.gltf", 512, "dense")
    cl, _ = boxes_from_tree(backend.tree)

    name = "closest_d1"
    o = np.asarray(st[f"{name}.o"]).reshape(3, -1).T
    d = np.asarray(st[f"{name}.d"]).reshape(3, -1).T
    tm = np.asarray(st[f"{name}.tm"]).reshape(-1)
    live = tm > TMIN
    _, _, base_tot = gated_total(name, o, d, tm, cl)
    print(json.dumps({"sim": name, "variant": "baseline",
                      "total_sweeps": base_tot}), flush=True)

    perms = {}
    key = np.where(live, octant(d), 8)
    perms["oct"] = stable_perm(key)
    for ob in (2, 3):
        k2 = np.where(live, (octant(d) << (3 * ob)) | org_bits(o, ob),
                      1 << 62)
        perms[f"oct+org{ob}"] = stable_perm(k2)
    for vn, p in perms.items():
        report(name, vn, *apply_perm(o, d, tm, p), cl, base_tot)

    oct_perm = perms["oct"]
    for sname in ("shadow_d1_l0", "shadow_d1_l1"):
        so = np.asarray(st[f"{sname}.o"]).reshape(3, -1).T
        sd = np.asarray(st[f"{sname}.d"]).reshape(3, -1).T
        stm = np.asarray(st[f"{sname}.tm"]).reshape(-1)
        _, _, sbase = gated_total(sname, so, sd, stm, cl)
        print(json.dumps({"sim": sname, "variant": "baseline",
                          "total_sweeps": sbase}), flush=True)
        report(sname, "inherit_oct", *apply_perm(so, sd, stm, oct_perm),
               cl, sbase)
        # second in-round partition by the shared d1 surface point
        p1 = so + stm[:, None] * sd
        slive = stm > TMIN
        for cb in (3, 4):
            k = np.where(slive, org_bits(p1, cb), 1 << 62)
            report(sname, f"cell{cb}", *apply_perm(so, sd, stm,
                                                   stable_perm(k)),
                   cl, sbase)
        # cell partition UNDER the inherited order (stable): what the
        # engine would actually do — inherit, then re-partition
        oi, di, ti = apply_perm(so, sd, stm, oct_perm)
        pi = oi + ti[:, None] * di
        k = np.where(ti > TMIN, org_bits(pi, 3), 1 << 62)
        report(sname, "inherit_then_cell3",
               *apply_perm(oi, di, ti, stable_perm(k)), cl, sbase)


if __name__ == "__main__":
    main()
