"""Round-4 device-build design, part 2: isolate the quality levers.

(a) Atom-granularity curve with TIGHT atoms (formed from the host
    varcut order): A=2/4/8 full atom hierarchies — how fine must atoms
    be for varcut-SAH parity?
(b) Uniform MEDIAN-split hierarchy at triangle granularity (the
    device-friendly scheme: fixed halves = uniform segment sizes =
    batched fixed-shape sorts, ONE lax.sort per level), with three
    axis-choice policies: widest-centroid, true-SAH-of-median-cut, and
    PCA (principal axis of segment centroids — batched power
    iteration on device).

Usage: JAX_PLATFORMS=cpu python tools/r4_sah_sim2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SCENE = "/root/reference/models/sponza/Sponza.gltf"
K1, K2 = 128, 64


def median_order(cen, tmin, tmax, axis_mode="sah", leaf=K1):
    """Uniform median-split hierarchy, batched semantics (numpy twin of
    the planned device build). Pads T to a power-of-two multiple of
    `leaf` with +inf-centroid dead entries (they stick to the global
    end: every row sort pushes them last and median cuts at fixed
    positions keep suffix runs suffix)."""
    T = len(cen)
    n_leaf = -(-T // leaf)
    n_leaf_p2 = 1 << (n_leaf - 1).bit_length()
    Tp = n_leaf_p2 * leaf
    pad = Tp - T
    c = np.concatenate([cen, np.full((pad, 3), 3e38, np.float32)])
    mn = np.concatenate([tmin, np.full((pad, 3), 3e38, np.float32)])
    mx = np.concatenate([tmax, np.full((pad, 3), -3e38, np.float32)])
    order = np.arange(Tp, dtype=np.int64)
    levels = int(np.log2(n_leaf_p2))
    for lvl in range(levels):
        rows = 1 << lvl
        n = Tp // rows
        oc = order.reshape(rows, n)
        cc = c[oc]                                   # [rows, n, 3]
        if axis_mode == "widest":
            live = cc[..., 0] < 1e38
            span = (np.where(live[..., None], cc, -3e38).max(1)
                    - np.where(live[..., None], cc, 3e38).min(1))
            ax = np.argmax(span, axis=1)             # [rows]
            key = np.take_along_axis(
                cc, ax[:, None, None], axis=2)[..., 0]
            perm = np.argsort(key, axis=1, kind="stable")
            order = np.take_along_axis(oc, perm, axis=1).reshape(-1)
        elif axis_mode == "sah":
            best_cost, best_perm = None, None
            for a in range(3):
                perm = np.argsort(cc[..., a], axis=1, kind="stable")
                o2 = np.take_along_axis(oc, perm, axis=1)
                m0 = mn[o2]
                m1 = mx[o2]
                h = n // 2

                def area(lo, hi):
                    e = np.maximum(hi - lo, 0)
                    e = np.where(e > 1e37, 0, e)     # dead-only halves
                    return (e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2]
                            + e[:, 2] * e[:, 0])

                cost = (area(m0[:, :h].min(1), m1[:, :h].max(1))
                        + area(m0[:, h:].min(1), m1[:, h:].max(1)))
                if best_cost is None:
                    best_cost, best_perm = cost, perm
                else:
                    upd = cost < best_cost
                    best_cost = np.where(upd, cost, best_cost)
                    best_perm = np.where(upd[:, None], perm, best_perm)
            order = np.take_along_axis(oc, best_perm, axis=1).reshape(-1)
        else:  # pca
            live = cc[..., 0] < 1e38
            w = live.astype(np.float64)[..., None]
            cnt = np.maximum(w.sum(1), 1)
            cd = np.where(live[..., None], cc, 0).astype(np.float64)
            mean = cd.sum(1) / cnt
            d = np.where(live[..., None], cd - mean[:, None], 0)
            cov = np.einsum("rni,rnj->rij", d, d) / cnt[..., None]
            v = np.ones((rows, 3))
            for _ in range(8):
                v = np.einsum("rij,rj->ri", cov, v)
                v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                                1e-30)
            key = np.einsum("rni,ri->rn", cd, v)
            key = np.where(live, key, 1e30)          # dead last
            perm = np.argsort(key, axis=1, kind="stable")
            order = np.take_along_axis(oc, perm, axis=1).reshape(-1)
    return order[order < T].astype(np.int32)


def main():
    from r4_device_sah_sim import _atom_sah_pass
    from order_eval import cluster_boxes, ray_counts
    from vkrt_tpu.accel.clusters import split_permutation
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu import config as C
    from vkrt_tpu.wavefront.engine import generate_rays, load_scene_assets
    import jax.numpy as jnp

    flat, _, _ = load_scene_assets(SCENE, 64)
    idx = np.asarray(flat.indices, np.int64)
    v0 = flat.positions[idx[:, 0]].astype(np.float64)
    e1 = flat.positions[idx[:, 1]].astype(np.float64) - v0
    e2 = flat.positions[idx[:, 2]].astype(np.float64) - v0
    tmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2).astype(np.float32)
    tmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2).astype(np.float32)
    cen = (v0 + (e1 + e2) / 3.0).astype(np.float32)

    cam = Camera(1280, 704)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    o_, d_ = generate_rays(jnp.asarray(cam.proj_inverse),
                           jnp.asarray(cam.view_inverse), 1280, 704)
    o_ = np.stack([np.asarray(x)[::8, ::8].ravel() for x in o_], axis=1)
    d_ = np.stack([np.asarray(x)[::8, ::8].ravel() for x in d_], axis=1)
    d_ /= np.linalg.norm(d_, axis=1, keepdims=True)

    def score(name, order, dt=None):
        cmin, cmax = cluster_boxes(order, v0, e1, e2)
        n = ray_counts(cmin, cmax, o_, d_)
        ext = np.maximum(cmax - cmin, 0)
        sa = (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
              + ext[:, 2] * ext[:, 0]).sum()
        print(f"{name:26s} clusters/ray {n.mean():6.2f}  SA {sa:9.0f}"
              + (f"  ({dt:.2f}s)" if dt else ""))

    host = split_permutation(v0, e1, e2, sah=True).astype(np.int32)
    score("host_varcut", host)

    for A in (2, 4, 8):
        t0 = time.perf_counter()
        o2, lv = _atom_sah_pass(v0, e1, e2, host, A, 40)
        score(f"atoms-from-host A={A}", o2, time.perf_counter() - t0)

    for mode in ("widest", "sah", "pca"):
        t0 = time.perf_counter()
        o = median_order(cen, tmin, tmax, axis_mode=mode)
        score(f"median[{mode}]", o, time.perf_counter() - t0)

    # median + atom varcut pass on top (atoms now tight)
    for mode in ("sah", "pca"):
        o = median_order(cen, tmin, tmax, axis_mode=mode)
        for A in (4, 8):
            t0 = time.perf_counter()
            o2, lv = _atom_sah_pass(v0, e1, e2, o, A, 40)
            score(f"median[{mode}]+atoms A={A}", o2,
                  time.perf_counter() - t0)


if __name__ == "__main__":
    main()
