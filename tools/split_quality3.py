"""Round-3 tree-quality experiment: cluster-pair re-split refinement.

The variable-cut SAH splitter (production) is greedy top-down: once a
cut separates two 128-tri runs, their boxes never change. This probe
adds a POST-PASS: for every pair of clusters inside one supercluster
whose AABBs overlap (overlap = gating slop: rays in the overlap gate
both), re-split the union of their 256 triangles by the best-of-3-axes
centroid median cut and keep the result iff it reduces area(A)+area(B).
Supercluster membership (and hence SC boxes and the tree layout
contract) is preserved exactly; only the 128-tri partition inside one
SC changes. Iterate to a fixed point (few passes).

Also scored: a cross-SC variant (pairs from overlapping superclusters,
re-splitting 256 tris across SC boundaries — changes SC boxes, scored
with SC area included) to see whether the big slop is intra- or
inter-SC.

Score = the split_quality.py harness (camera-ray per-ray cluster hits +
block-union at 512/1024) — CPU only.

Usage: JAX_PLATFORMS=cpu python -u tools/split_quality3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from split_quality import score, split_permutation_v2

SCENE = "/root/reference/models/sponza/Sponza.gltf"
K1, K2 = 128, 64


def _boxes(order, tmin, tmax, k1=K1):
    T = len(order)
    assert T % k1 == 0 or True
    Tp = -(-T // k1) * k1
    mn, mx = tmin[order], tmax[order]
    if Tp != T:
        mn = np.concatenate([mn, np.full((Tp - T, 3), 3e38)])
        mx = np.concatenate([mx, np.full((Tp - T, 3), -3e38)])
    return (mn.reshape(-1, k1, 3).min(axis=1),
            mx.reshape(-1, k1, 3).max(axis=1))


def _area(mn, mx):
    e = np.maximum(mx - mn, 0)
    return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0]


def refine_pairs(order, c, tmin, tmax, cross_sc: bool, passes: int = 8):
    """Greedy cluster-pair re-splits. Returns refined order (copy)."""
    order = order.astype(np.int64).copy()
    T = len(order)
    C1 = T // K1           # full clusters only; the ragged tail is skipped
    t0 = time.time()
    total_gain, n_swaps = 0.0, 0
    for p in range(passes):
        cmin, cmax = _boxes(order, tmin, tmax)
        areas = _area(cmin, cmax)
        # candidate pairs: boxes overlap
        improved = 0
        # overlap matrix per SC (64x64) or across all (C1 x C1 chunked)
        if cross_sc:
            groups = [(0, C1)]
        else:
            groups = [(s * K2, min((s + 1) * K2, C1))
                      for s in range(-(-C1 // K2))]
        busy = np.zeros(C1, bool)   # a cluster takes part in ≤1 swap/pass
        for glo, ghi in groups:
            mn, mx = cmin[glo:ghi], cmax[glo:ghi]
            ov = ((mn[:, None] <= mx[None]) & (mx[:, None] >= mn[None])
                  ).all(axis=2)
            iu = np.triu_indices(ghi - glo, 1)
            cand = np.argwhere(ov[iu[0], iu[1]]).ravel()
            # visit highest joint-area pairs first
            ii, jj = iu[0][cand] + glo, iu[1][cand] + glo
            if len(ii) == 0:
                continue
            joint = areas[ii] + areas[jj]
            for k in np.argsort(-joint):
                a, b = int(ii[k]), int(jj[k])
                if busy[a] or busy[b]:
                    continue
                sl_a = slice(a * K1, (a + 1) * K1)
                sl_b = slice(b * K1, (b + 1) * K1)
                un = np.concatenate([order[sl_a], order[sl_b]])
                best_cost, best_perm = areas[a] + areas[b], None
                for ax in range(3):
                    srt = np.argsort(c[un, ax], kind="stable")
                    s = un[srt]
                    mnl = tmin[s[:K1]].min(0)
                    mxl = tmax[s[:K1]].max(0)
                    mnr = tmin[s[K1:]].min(0)
                    mxr = tmax[s[K1:]].max(0)
                    cost = float(_area(mnl, mxl) + _area(mnr, mxr))
                    if cost < best_cost - 1e-12:
                        best_cost, best_perm = cost, s
                if best_perm is not None:
                    gain = float(areas[a] + areas[b]) - best_cost
                    total_gain += gain
                    n_swaps += 1
                    improved += 1
                    order[sl_a] = best_perm[:K1]
                    order[sl_b] = best_perm[K1:]
                    busy[a] = busy[b] = True
        print({"pass": p, "cross_sc": cross_sc, "repartitions": improved,
               "cum_area_gain": round(total_gain, 1),
               "s": round(time.time() - t0, 1)}, flush=True)
        if improved == 0:
            break
    return order.astype(np.int32)


def main():
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from vkrt_tpu import config as C
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.utils import layout as L
    from vkrt_tpu.wavefront.engine import camera_ray_blocks, load_scene_assets

    flat, _, _ = load_scene_assets(SCENE, 64)
    idx = np.asarray(flat.indices, np.int64)
    p = np.asarray(flat.positions)
    v0 = p[idx[:, 0]]
    e1 = p[idx[:, 1]] - v0
    e2 = p[idx[:, 2]] - v0
    c = (v0 + (v0 + e1) + (v0 + e2)) / 3.0
    tmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    tmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)

    cfg = dataclasses.replace(C.config4_flythrough(), width=640, height=384)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    op, d0, act0 = jax.jit(functools.partial(
        camera_ray_blocks, cfg=cfg))(jnp.asarray(cam.proj_inverse),
                                     jnp.asarray(cam.view_inverse))
    d0f = np.asarray(L.from_cvec(d0))
    o0f = np.broadcast_to(np.asarray(op)[None, :], d0f.shape)
    tm0 = np.where(np.asarray(L.from_lanes(act0)), 1e3, 0.0).astype(np.float32)
    states = [("cam", o0f, d0f, tm0)]

    t0 = time.time()
    base = split_permutation_v2(v0, e1, e2)
    print({"build": "varcut_sah", "s": round(time.time() - t0, 1)}, flush=True)
    score("varcut_sah", base, v0, e1, e2, states)

    r1 = refine_pairs(base, c, tmin, tmax, cross_sc=False)
    score("varcut+intra_sc_refine", r1, v0, e1, e2, states)

    r2 = refine_pairs(base, c, tmin, tmax, cross_sc=True)
    score("varcut+cross_sc_refine", r2, v0, e1, e2, states)

    # cross-SC refinement changes SC boxes — report SC area too
    for name, o in (("base", base), ("intra", r1), ("cross", r2)):
        cmin, cmax = _boxes(o, tmin, tmax)
        C1 = len(o) // K1
        C1f = (C1 // K2) * K2
        smn = cmin[:C1f].reshape(-1, K2, 3).min(axis=1)
        smx = cmax[:C1f].reshape(-1, K2, 3).max(axis=1)
        print({"order": name,
               "sc_area_sum": round(float(_area(smn, smx).sum()), 1),
               "cl_area_sum": round(float(_area(cmin, cmax).sum()), 1)},
              flush=True)


if __name__ == "__main__":
    main()
