"""CPU proxy evaluation of cluster orderings: per-ray cluster-AABB
intersection counts on camera rays (the quantity the dense kernel's
sweep count tracks). No TPU needed.

Usage: JAX_PLATFORMS=cpu python tools/order_eval.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENE = "/root/reference/models/sponza/Sponza.gltf"


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


def ray_counts(cmin, cmax, o, d, tmax=1000.0):
    """Mean clusters intersected per ray (numpy slab, [R,C])."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t0 = (cmin[None] - o[:, None]) * inv[:, None]
    t1 = (cmax[None] - o[:, None]) * inv[:, None]
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    hit = (tn <= tf) & (tf >= 1e-3) & (tn <= tmax)
    return hit.sum(axis=1)


def main():
    from vkrt_tpu import config as C
    from vkrt_tpu.accel.clusters import (_morton_host, split_permutation)
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.wavefront.engine import generate_rays, load_scene_assets

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
    split_sah = split_permutation(v0, e1, e2, sah=True)
    t_sah = time.perf_counter() - t0
    t0 = time.perf_counter()
    split_wide = split_permutation(v0, e1, e2, sah=False)
    t_wide = time.perf_counter() - t0
    print(f"build: sah {t_sah:.2f}s, widest {t_wide:.2f}s")

    # sample camera rays (every 8th pixel of 1280x704)
    import jax.numpy as jnp
    cam = Camera(1280, 704)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    o, d = generate_rays(jnp.asarray(cam.proj_inverse),
                         jnp.asarray(cam.view_inverse), 1280, 704)
    o = np.stack([np.asarray(x)[::8, ::8].ravel() for x in o], axis=1)
    d = np.stack([np.asarray(x)[::8, ::8].ravel() for x in d], axis=1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    for name, order in (("morton", morton), ("split_sah", split_sah),
                        ("split_widest", split_wide)):
        cmin, cmax = cluster_boxes(order, v0, e1, e2)
        n = ray_counts(cmin, cmax, o, d)
        ext = np.maximum(cmax - cmin, 0)
        sa = (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
              + ext[:, 2] * ext[:, 0]).sum()
        print(f"{name:14s} clusters/ray mean {n.mean():6.1f}  "
              f"p95 {np.percentile(n, 95):6.1f}  max {n.max():4d}  "
              f"total box SA {sa:9.0f}")


if __name__ == "__main__":
    main()
