"""Round-4: batched cluster-pair refinement after the device atom-SAH
build — triangle-granularity quality recovery with fixed-shape ops.

The atom-SAH build (r4_device_sah_sim.py) is device-fast but caps at
~26 clusters/ray from global-Morton atom looseness (host varcut build:
~10). This sweep refines CLUSTER BOUNDARIES at triangle granularity
with TPU-shaped work: sweep s pairs adjacent clusters ((2i+s%2, +1)),
concatenates their 256 triangles, sorts the pair by centroid along the
best SAH axis (a batched [P,256] argsort — ONE fixed-shape op), and
re-cuts at 128. Repeated sweeps with alternating parity diffuse
triangles across segment boundaries. This is the device analogue of
tools/split_quality3.py's intra-SC pair re-split (which gained ~1% on
the already-optimal HOST build — here the starting point has ~2.6x
slack).

Usage: JAX_PLATFORMS=cpu python tools/r4_pair_refine_sim.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SCENE = "/root/reference/models/sponza/Sponza.gltf"
K1 = 128


def pair_refine(order, tmin, tmax, cen, sweeps=8, sah=True):
    """order: [Tp] slot->tri (may contain -1 padding at the END).
    Returns refined order. numpy twin of the planned device op."""
    Tp = len(order)
    C = Tp // K1
    order = order.copy()
    for s in range(sweeps):
        par = s % 2
        first = np.arange(par, C - 1, 2)
        if len(first) == 0:
            continue
        pairs = order[(first[:, None] * K1
                       + np.arange(2 * K1)[None, :])]     # [P, 256]
        valid = pairs >= 0
        safe = np.maximum(pairs, 0)
        pc = np.where(valid[..., None], cen[safe], 3e38)   # pads sort last
        pmn = np.where(valid[..., None], tmin[safe], 3e38)
        pmx = np.where(valid[..., None], tmax[safe], -3e38)
        best_cost = None
        best_perm = None
        for ax in range(3):
            perm = np.argsort(pc[:, :, ax], axis=1, kind="stable")
            if not sah:
                if best_perm is None:
                    ext = (pmx.max(1) - pmn.min(1))
                    wax = np.argmax(ext, axis=1)
                    best_perm = np.take_along_axis(
                        np.stack([np.argsort(pc[:, :, a], axis=1,
                                             kind="stable")
                                  for a in range(3)]),
                        wax[None, :, None], axis=0)[0]
                continue
            smn = np.take_along_axis(pmn, perm[..., None], axis=1)
            smx = np.take_along_axis(pmx, perm[..., None], axis=1)
            lmn = smn[:, :K1].min(1)
            lmx = smx[:, :K1].max(1)
            rmn = smn[:, K1:].min(1)
            rmx = smx[:, K1:].max(1)

            def area(mn, mx):
                e = np.maximum(mx - mn, 0)
                return e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0]

            cost = area(lmn, lmx) + area(rmn, rmx)
            if best_cost is None:
                best_cost, best_perm = cost, perm
            else:
                upd = cost < best_cost
                best_cost = np.where(upd, cost, best_cost)
                best_perm = np.where(upd[:, None], perm, best_perm)
        new_pairs = np.take_along_axis(pairs, best_perm, axis=1)
        order[(first[:, None] * K1 + np.arange(2 * K1)[None, :])] = new_pairs
    return order


def main():
    from r4_device_sah_sim import atom_sah_order
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
    T = len(v0)
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

    def score(name, order):
        o = order[order >= 0]
        cmin, cmax = cluster_boxes(o, v0, e1, e2)
        n = ray_counts(cmin, cmax, o_, d_)
        ext = np.maximum(cmax - cmin, 0)
        sa = (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
              + ext[:, 2] * ext[:, 0]).sum()
        print(f"{name:24s} clusters/ray {n.mean():6.2f}  SA {sa:9.0f}")

    host = split_permutation(v0, e1, e2, sah=True).astype(np.int32)
    score("host_sah", host)

    base, lv = atom_sah_order(v0, e1, e2, A=8)
    Tp = -(-T // K1) * K1
    basep = np.concatenate([base, np.full(Tp - T, -1, np.int32)])
    score(f"atom_A8 ({lv} lv)", basep)
    cur = basep
    t0 = time.perf_counter()
    done = 0
    for sweeps in (2, 2, 4, 8, 16):
        cur = pair_refine(cur, tmin, tmax, cen, sweeps=sweeps)
        done += sweeps
        score(f"atom_A8 + refine x{done}", cur)
    print(f"refine time {time.perf_counter()-t0:.2f}s for {done} sweeps")


if __name__ == "__main__":
    main()
