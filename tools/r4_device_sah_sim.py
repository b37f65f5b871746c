"""Round-4: device-side variable-cut SAH build — quality simulation.

The round-3 verdict's config-5 gap: the on-device Morton rebuild
produces a lower-quality clustering than the host variable-cut SAH
build (accel/clusters.split_permutation), costing ~1.2s of extra
sweeps per 4-bounce frame. A faithful device port of the host
recursion is jit-hostile (data-dependent ranges, one argsort per node).

Device-friendly reformulation simulated here ("atom SAH"):
  1. ONE device Morton argsort over triangles (existing rebuild path).
  2. Group consecutive runs of A sorted triangles into ATOMS; all
     further work is on Na = T/A atoms (8k-scale arrays: gathers,
     lexsorts and scans are ~30x cheaper than triangle-granular).
  3. Top-down variable-cut SAH over atoms, one LEVEL at a time, every
     level a fixed-shape pass: lexsort atoms by (segment, centroid[ax])
     per axis, chunk-granular (chunk = K1 tris = K1/A atoms) segmented
     prefix/suffix AABBs, SAH cost at every aligned cut, per-segment
     best (axis, cut), apply permutation + split.
  4. Final atom order -> triangle permutation (one small gather).

Quality loss vs the host build comes only from atom granularity (32/16/8
triangles tied together in Morton order). This sim scores that loss with
the order_eval metrics (per-ray cluster hits on camera rays + total
cluster AABB area) and reports the level count needed so the device
build can fix its loop trip count.

Usage: JAX_PLATFORMS=cpu python tools/r4_device_sah_sim.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENE = "/root/reference/models/sponza/Sponza.gltf"
K1, K2 = 128, 64


def atom_sah_order(v0, e1, e2, A=32, max_levels=40, passes=1,
                   verbose=False):
    """numpy twin of the planned device build. Returns (tri_order,
    levels_used). passes>1 re-forms atoms from the previous pass's
    output order (consecutive triangles are then within-cluster, i.e.
    spatially tight — global-Morton atoms are NOT: pair merge ratio
    3.61x vs the ideal 1.26x, measured) and re-runs the hierarchy."""
    from vkrt_tpu.accel.clusters import _morton_host

    T = v0.shape[0]
    c = (v0 + (e1 + e2) / 3.0).astype(np.float32)
    lo, hi = c.min(axis=0), c.max(axis=0)
    codes = _morton_host(v0.astype(np.float32), e1.astype(np.float32),
                         e2.astype(np.float32), lo, hi)
    morton = np.argsort(codes, kind="stable").astype(np.int32)
    total_levels = 0
    for _p in range(passes):
        morton, lv = _atom_sah_pass(v0, e1, e2, morton, A, max_levels)
        total_levels += lv
    return morton, total_levels


def _atom_sah_pass(v0, e1, e2, morton, A, max_levels):
    T = v0.shape[0]
    # --- atoms ------------------------------------------------------------
    leaf_atoms = K1 // A                  # atoms per cluster
    Tp = -(-T // K1) * K1                 # pad to cluster multiple
    Na = Tp // A
    tmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)[morton]
    tmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)[morton]
    pad = Tp - T
    if pad:
        tmin = np.concatenate([tmin, np.full((pad, 3), 3e38)])
        tmax = np.concatenate([tmax, np.full((pad, 3), -3e38)])
    amin = tmin.reshape(Na, A, 3).min(axis=1).astype(np.float32)
    amax = tmax.reshape(Na, A, 3).max(axis=1).astype(np.float32)
    acnt = np.minimum(np.maximum(T - np.arange(Na) * A, 0), A).astype(np.float32)
    acen = ((amin + amax) * 0.5).astype(np.float32)
    # pad atoms: neutral boxes, centroid pushed to +inf so they sort last
    dead = acnt == 0
    acen[dead] = 3e38

    CH = leaf_atoms                       # atoms per chunk (= per cluster)
    Nc = Na // CH
    big_chunks = K2                       # supercluster alignment in chunks

    ordr = np.arange(Na, dtype=np.int32)  # position -> atom
    # segment boundaries at chunk granularity: boundary[k] == True iff a
    # segment starts at chunk k
    cb = np.zeros(Nc, dtype=bool)
    cb[0] = True

    def seg_ids(cb):
        return np.cumsum(cb) - 1

    levels = 0
    for lvl in range(max_levels):
        sid_c = seg_ids(cb)                          # [Nc]
        sid_a = np.repeat(sid_c, CH)                 # [Na]
        nseg = sid_c[-1] + 1
        seg_start_c = np.zeros(nseg, np.int64)
        np.add.at(seg_start_c, sid_c, 0)
        seg_start_c = np.flatnonzero(cb)
        seg_len_c = np.diff(np.append(seg_start_c, Nc))
        if seg_len_c.max() <= 1:
            break
        levels += 1

        best_cost = np.full(nseg, np.inf)
        best_ax = np.zeros(nseg, np.int32)
        best_cut = np.zeros(nseg, np.int64)          # chunk index of cut
        perms = []
        for ax in range(3):
            key = acen[ordr, ax]
            perm = np.lexsort((key, sid_a))          # stable by (seg, coord)
            perms.append(perm)
            o2 = ordr[perm]
            cmin = amin[o2].reshape(Nc, CH, 3).min(axis=1)
            cmax = amax[o2].reshape(Nc, CH, 3).max(axis=1)
            ccnt = acnt[o2].reshape(Nc, CH).sum(axis=1)
            # segmented prefix (inclusive) and suffix (inclusive) scans
            pmin, pmax, pcnt = cmin.copy(), cmax.copy(), ccnt.copy()
            smin, smax, scnt = cmin.copy(), cmax.copy(), ccnt.copy()
            for k in range(1, Nc):
                if not cb[k]:
                    pmin[k] = np.minimum(pmin[k], pmin[k - 1])
                    pmax[k] = np.maximum(pmax[k], pmax[k - 1])
                    pcnt[k] += pcnt[k - 1]
            for k in range(Nc - 2, -1, -1):
                if not cb[k + 1]:
                    smin[k] = np.minimum(smin[k], smin[k + 1])
                    smax[k] = np.maximum(smax[k], smax[k + 1])
                    scnt[k] += scnt[k + 1]

            def area(mn, mx):
                ext = np.maximum(mx - mn, 0.0)
                return (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
                        + ext[:, 2] * ext[:, 0])

            # cut BEFORE chunk k (k in 1..len-1 within segment, aligned)
            off_c = np.arange(Nc) - seg_start_c[sid_c]   # chunk offset in seg
            slen = seg_len_c[sid_c]
            align = np.where(slen > big_chunks, big_chunks, 1)
            valid = (off_c > 0) & (off_c % align == 0)
            costL = area(pmin, pmax) * pcnt              # at k-1 (shift)
            costR = area(smin, smax) * scnt              # at k
            cost = np.where(valid,
                            np.concatenate([[np.inf], costL[:-1]]) + costR,
                            np.inf)
            # per-segment argmin
            for s in range(nseg):
                ks = seg_start_c[s]
                ke = ks + seg_len_c[s]
                if seg_len_c[s] <= 1:
                    continue
                j = ks + int(np.argmin(cost[ks:ke]))
                if cost[j] < best_cost[s]:
                    best_cost[s] = cost[j]
                    best_ax[s] = ax
                    best_cut[s] = j
        # apply winning permutation per segment + split
        new_ordr = ordr.copy()
        for s in range(nseg):
            if seg_len_c[s] <= 1:
                continue
            a0 = seg_start_c[s] * CH
            a1 = a0 + seg_len_c[s] * CH
            p = perms[best_ax[s]]
            new_ordr[a0:a1] = ordr[p[a0:a1]]
            cb[best_cut[s]] = True
        ordr = new_ordr

    # atom order -> triangle order (padding atoms contribute pad slots)
    tri = (ordr[:, None] * A + np.arange(A)[None, :]).reshape(-1)
    tri = tri[tri < T]
    return morton[tri].astype(np.int32), levels


def main():
    from vkrt_tpu.accel.clusters import _morton_host, split_permutation
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu import config as C
    from vkrt_tpu.wavefront.engine import generate_rays, load_scene_assets
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from order_eval import cluster_boxes, ray_counts

    flat, _, _ = load_scene_assets(SCENE, 64)
    idx = np.asarray(flat.indices, np.int64)
    v0 = flat.positions[idx[:, 0]].astype(np.float64)
    e1 = flat.positions[idx[:, 1]].astype(np.float64) - v0
    e2 = flat.positions[idx[:, 2]].astype(np.float64) - v0

    c = v0 + (e1 + e2) / 3.0
    codes = _morton_host(v0.astype(np.float32), e1.astype(np.float32),
                         e2.astype(np.float32),
                         c.min(axis=0).astype(np.float32),
                         c.max(axis=0).astype(np.float32))
    morton = np.argsort(codes, kind="stable")

    t0 = time.perf_counter()
    host_sah = split_permutation(v0, e1, e2, sah=True)
    print(f"host varcut SAH build: {time.perf_counter()-t0:.2f}s")

    orders = [("morton", morton, None), ("host_sah", host_sah, None)]
    for A, passes in ((32, 1), (8, 1), (8, 2), (8, 3), (16, 2), (32, 2)):
        t0 = time.perf_counter()
        o, lv = atom_sah_order(v0, e1, e2, A=A, passes=passes)
        print(f"atom SAH A={A} p={passes}: {time.perf_counter()-t0:.2f}s, "
              f"{lv} levels")
        orders.append((f"atom_A{A}_p{passes}", o, lv))

    import jax.numpy as jnp
    cam = Camera(1280, 704)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    o_, d_ = generate_rays(jnp.asarray(cam.proj_inverse),
                           jnp.asarray(cam.view_inverse), 1280, 704)
    o_ = np.stack([np.asarray(x)[::8, ::8].ravel() for x in o_], axis=1)
    d_ = np.stack([np.asarray(x)[::8, ::8].ravel() for x in d_], axis=1)
    d_ /= np.linalg.norm(d_, axis=1, keepdims=True)

    for name, order, lv in orders:
        cmin, cmax = cluster_boxes(order, v0, e1, e2)
        n = ray_counts(cmin, cmax, o_, d_)
        ext = np.maximum(cmax - cmin, 0)
        sa = (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
              + ext[:, 2] * ext[:, 0]).sum()
        print(f"{name:14s} clusters/ray mean {n.mean():6.2f}  "
              f"p95 {np.percentile(n, 95):6.1f}  max {n.max():4d}  "
              f"total box SA {sa:9.0f}"
              + (f"  levels {lv}" if lv else ""))


if __name__ == "__main__":
    main()
