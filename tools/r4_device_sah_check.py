"""Round-4: device variable-cut SAH build — quality + runtime check.

Compares accel/device_sah.device_sah_order against the host
split_permutation and the device Morton order with the order_eval
metrics (camera clusters/ray + total cluster-AABB area), plus a
max_levels convergence curve. CPU run (quality is device-independent);
the TPU timing row lives in tools/r4_hw_queue2.py.

Usage: JAX_PLATFORMS=cpu python tools/r4_device_sah_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SCENE = "/root/reference/models/sponza/Sponza.gltf"


def main():
    import jax.numpy as jnp

    from order_eval import cluster_boxes, ray_counts
    from vkrt_tpu import config as C
    from vkrt_tpu.accel.clusters import _morton_host, split_permutation
    from vkrt_tpu.accel.device_sah import device_sah_order
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
    host = split_permutation(v0, e1, e2, sah=True)
    print(f"host varcut: {time.perf_counter()-t0:.2f}s")

    v0j = jnp.asarray(v0, jnp.float32)
    e1j = jnp.asarray(e1, jnp.float32)
    e2j = jnp.asarray(e2, jnp.float32)

    orders = [("morton", morton), ("host_sah", host)]
    for lv in (12, 16, 20, 24):
        t0 = time.perf_counter()
        o = np.asarray(device_sah_order(v0j, e1j, e2j, max_levels=lv))
        dt = time.perf_counter() - t0
        assert len(np.unique(o)) == len(o) == v0.shape[0], "not a permutation"
        print(f"device_sah L={lv}: {dt:.2f}s (CPU, incl. compile on first)")
        orders.append((f"device_sah_L{lv}", o))

    cam = Camera(1280, 704)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    o_, d_ = generate_rays(jnp.asarray(cam.proj_inverse),
                           jnp.asarray(cam.view_inverse), 1280, 704)
    o_ = np.stack([np.asarray(x)[::8, ::8].ravel() for x in o_], axis=1)
    d_ = np.stack([np.asarray(x)[::8, ::8].ravel() for x in d_], axis=1)
    d_ /= np.linalg.norm(d_, axis=1, keepdims=True)

    for name, order in orders:
        cmin, cmax = cluster_boxes(order, v0, e1, e2)
        n = ray_counts(cmin, cmax, o_, d_)
        ext = np.maximum(cmax - cmin, 0)
        sa = (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
              + ext[:, 2] * ext[:, 0]).sum()
        print(f"{name:16s} clusters/ray mean {n.mean():6.2f}  "
              f"p95 {np.percentile(n, 95):6.1f}  max {n.max():4d}  "
              f"total box SA {sa:9.0f}")


if __name__ == "__main__":
    main()
