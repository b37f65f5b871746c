"""Cluster-build quality: fixed-median SAH split (production until
round 3) vs the variable-cut SAH splitter (any k1-aligned cut position,
axis AND cut chosen by true prefix/suffix surface-area cost — ADOPTED
as accel/clusters.split_permutation(sah=True) on these numbers:
per-ray 14.57 -> 10.40, block-union -20..23%, build 1.2 -> 2.3 s).
Both variants are kept self-contained here for provenance (the
median variant no longer exists in production).

Cluster AABB slop is pure gating waste in the dense kernel: every extra
cluster a block's rays slab-hit is one extra 64KB DMA + [K1,R] MT sweep.
This probe scores orderings by (a) mean clusters slab-hit per camera
ray and (b) mean gated-cluster UNION per 512/1024-ray block — the
quantity the kernel actually pays (tools/order_eval.py methodology,
CPU numpy, no TPU).

Usage: JAX_PLATFORMS=cpu python tools/split_quality.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENE = "/root/reference/models/sponza/Sponza.gltf"


def split_permutation_median(v0, e1, e2, k1=128, k2=64):
    """The pre-round-3 production splitter: fixed median-half cut, SAH
    chooses only the axis (kept for provenance)."""
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    c = v0 + (e1 + e2) / 3.0
    tmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    tmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    T = c.shape[0]
    order = np.arange(T, dtype=np.int64)
    big = k1 * k2
    stack = [(0, T)]
    while stack:
        lo, hi = stack.pop()
        n = hi - lo
        if n <= k1:
            continue
        align = big if n > big else k1
        half = (n // 2 // align) * align
        if half == 0:
            half = align
        sub = order[lo:hi]
        cc = c[sub]
        best_cost, best_sel = None, None
        for ax in range(3):
            sel = np.argpartition(cc[:, ax], half)
            li, ri = sub[sel[:half]], sub[sel[half:]]
            cost = 0.0
            for side, cnt in ((li, half), (ri, n - half)):
                ext = tmax[side].max(axis=0) - tmin[side].min(axis=0)
                cost += (ext[0] * ext[1] + ext[1] * ext[2]
                         + ext[2] * ext[0]) * cnt
            if best_cost is None or cost < best_cost:
                best_cost, best_sel = cost, sel
        order[lo:hi] = sub[best_sel]
        stack.append((lo + half, hi))
        stack.append((lo, lo + half))
    return order.astype(np.int32)


def split_permutation_v2(v0, e1, e2, k1=128, k2=64):
    """Top-down SAH split with VARIABLE aligned cut positions.

    Like accel/clusters.split_permutation, but instead of a fixed
    median-half cut with SAH choosing only the axis, every k1-aligned
    (k1*k2-aligned while nodes exceed one supercluster) cut position is
    scored by the true SAH sum area_L*n_L + area_R*n_R using prefix/
    suffix accumulated AABBs of the centroid-sorted range.
    """
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    c = v0 + (e1 + e2) / 3.0
    tmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    tmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    T = c.shape[0]
    order = np.arange(T, dtype=np.int64)
    big = k1 * k2

    def area(ext):
        return (ext[..., 0] * ext[..., 1] + ext[..., 1] * ext[..., 2]
                + ext[..., 2] * ext[..., 0])

    stack = [(0, T)]
    while stack:
        lo, hi = stack.pop()
        n = hi - lo
        if n <= k1:
            continue
        align = big if n > big else k1
        ncuts = (n - 1) // align          # cuts at align, 2*align, ...
        if ncuts == 0:
            continue
        sub = order[lo:hi]
        best_cost, best_perm, best_cut = None, None, None
        for ax in range(3):
            srt = np.argsort(c[sub, ax], kind="stable")
            s = sub[srt]
            pmin = np.minimum.accumulate(tmin[s], axis=0)
            pmax = np.maximum.accumulate(tmax[s], axis=0)
            smin = np.minimum.accumulate(tmin[s][::-1], axis=0)[::-1]
            smax = np.maximum.accumulate(tmax[s][::-1], axis=0)[::-1]
            cuts = (np.arange(ncuts) + 1) * align
            aL = area(pmax[cuts - 1] - pmin[cuts - 1])
            aR = area(smax[cuts] - smin[cuts])
            cost = aL * cuts + aR * (n - cuts)
            j = int(np.argmin(cost))
            if best_cost is None or cost[j] < best_cost:
                best_cost, best_perm, best_cut = cost[j], s, int(cuts[j])
        order[lo:hi] = best_perm
        stack.append((lo + best_cut, hi))
        stack.append((lo, lo + best_cut))
    return order.astype(np.int32)


def cluster_boxes(order, v0, e1, e2, k1=128):
    T = len(order)
    Tp = -(-T // k1) * k1
    tmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)[order]
    tmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)[order]
    pad = Tp - T
    if pad:
        tmin = np.concatenate([tmin, np.full((pad, 3), 3e38)])
        tmax = np.concatenate([tmax, np.full((pad, 3), -3e38)])
    return (tmin.reshape(-1, k1, 3).min(axis=1),
            tmax.reshape(-1, k1, 3).max(axis=1))


def hits_matrix(cmin, cmax, o, d, tmax):
    """[R, C] slab-hit booleans (chunked over rays)."""
    out = []
    for s in range(0, o.shape[0], 8192):
        oo, dd = o[s:s + 8192], d[s:s + 8192]
        tm = tmax[s:s + 8192]
        inv = 1.0 / np.where(np.abs(dd) < 1e-12, 1e-12, dd)
        t0 = (cmin[None] - oo[:, None]) * inv[:, None]
        t1 = (cmax[None] - oo[:, None]) * inv[:, None]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        out.append((tn <= tf) & (tf >= 1e-3) & (tn <= tm[:, None])
                   & (tm > 1e-3)[:, None])
    return np.concatenate(out)


def score(name, order, v0, e1, e2, states):
    cmin, cmax = cluster_boxes(order, v0, e1, e2)
    ext = np.maximum(cmax - cmin, 0)
    tot_area = float((ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
                      + ext[:, 2] * ext[:, 0]).sum())
    row = {"order": name, "cluster_area_sum": round(tot_area, 1)}
    for sname, o, d, tm in states:
        h = hits_matrix(cmin, cmax, o, d, tm)
        live = tm > 1e-3
        per_ray = h.sum(axis=1)[live].mean()
        for blk in (512, 1024):
            nb = h.shape[0] // blk
            union = h[:nb * blk].reshape(nb, blk, -1).any(axis=1).sum(axis=1)
            row[f"{sname}_b{blk}_union"] = round(float(union.mean()), 2)
        row[f"{sname}_per_ray"] = round(float(per_ray), 2)
    print(row, flush=True)
    return row


def main():
    import jax.numpy as jnp

    from vkrt_tpu import config as C
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.utils import layout as L
    from vkrt_tpu.wavefront.engine import (camera_ray_blocks, make_backend,
                                           render_frame, texture_arrays,
                                           load_scene_assets)

    flat, tex, backend = None, None, None
    flat, tex, _ = load_scene_assets(SCENE, 64)
    idx = np.asarray(flat.indices, np.int64)
    p = np.asarray(flat.positions)
    v0 = p[idx[:, 0]]
    e1 = p[idx[:, 1]] - v0
    e2 = p[idx[:, 2]] - v0

    # camera-ray state at 640x384 (depth-0 proxy)
    import dataclasses
    cfg = dataclasses.replace(C.config4_flythrough(), width=640, height=384)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    import functools

    import jax
    op, d0, act0 = jax.jit(functools.partial(
        camera_ray_blocks, cfg=cfg))(jnp.asarray(cam.proj_inverse),
                                     jnp.asarray(cam.view_inverse))
    d0f = np.asarray(L.from_cvec(d0))
    o0f = np.broadcast_to(np.asarray(op)[None, :], d0f.shape)
    tm0 = np.where(np.asarray(L.from_lanes(act0)), 1e3, 0.0).astype(np.float32)

    states = [("cam", o0f, d0f, tm0)]

    t0 = time.time()
    base = split_permutation_median(v0, e1, e2)
    print({"build": "median-SAH (pre-round-3)", "s": round(time.time() - t0, 1)})
    t0 = time.time()
    v2 = split_permutation_v2(v0, e1, e2)
    print({"build": "variable-cut SAH", "s": round(time.time() - t0, 1)})

    score("median_sah", base, v0, e1, e2, states)
    score("varcut_sah", v2, v0, e1, e2, states)


if __name__ == "__main__":
    main()
