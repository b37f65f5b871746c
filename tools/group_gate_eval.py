"""CPU proxy: block-level vs group-level cluster gating cost.

A dense-kernel block is 512 rays = 4 groups of 128 (8x16-pixel subtiles).
Block gating sweeps [512,128] (64 vregs) per cluster in the union of all
groups' gated sets; group gating sweeps [128,128] (16 vregs) per
(cluster, group) pair. This estimates the vreg-op ratio on camera rays.

Usage: JAX_PLATFORMS=cpu python tools/group_gate_eval.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.order_eval import SCENE, cluster_boxes


def main():
    from vkrt_tpu import config as C
    from vkrt_tpu.accel.clusters import split_permutation
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.utils import layout as L
    from vkrt_tpu.wavefront.engine import (generate_rays, load_scene_assets,
                                           tile)
    import jax.numpy as jnp

    flat, _, _ = load_scene_assets(SCENE, 64)
    idx = np.asarray(flat.indices, np.int64)
    v0 = flat.positions[idx[:, 0]].astype(np.float64)
    e1 = flat.positions[idx[:, 1]].astype(np.float64) - v0
    e2 = flat.positions[idx[:, 2]].astype(np.float64) - v0
    order = split_permutation(v0, e1, e2, sah=True)
    cmin, cmax = cluster_boxes(order, v0, e1, e2)

    w, h = 1280, 704
    cam = Camera(w, h)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    o, d = generate_rays(jnp.asarray(cam.proj_inverse),
                         jnp.asarray(cam.view_inverse), w, h)
    o = np.stack([np.asarray(tile(x)) for x in o])       # [3,Nb,128]
    d = np.stack([np.asarray(tile(x)) for x in d])
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    nb = o.shape[1]

    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    # subsample blocks for speed: every 4th block of 4 groups
    rng = np.random.default_rng(0)
    blocks = np.arange(0, nb // 4) * 4
    blocks = blocks[:: max(1, len(blocks) // 200)]
    tot_block, tot_group = 0, 0
    for b in blocks:
        hits_g = []
        for g in range(4):
            og, dg, ig = o[:, b + g], d[:, b + g], inv[:, b + g]  # [3,128]
            t0 = (cmin[:, :, None] - og[None]) * ig[None]   # [C,3,128]
            t1 = (cmax[:, :, None] - og[None]) * ig[None]
            tn = np.minimum(t0, t1).max(axis=1)             # [C,128]
            tf = np.maximum(t0, t1).min(axis=1)
            hit = ((tn <= tf) & (tf >= 1e-3) & (tn <= 1000.0)).any(axis=1)
            hits_g.append(hit)
        hits = np.stack(hits_g)                              # [4,C]
        tot_group += hits.sum() * 16
        tot_block += hits.any(axis=0).sum() * 64
    print(f"blocks sampled: {len(blocks)}")
    print(f"block gating:  {tot_block / len(blocks):8.0f} sweep-vregs/block")
    print(f"group gating:  {tot_group / len(blocks):8.0f} sweep-vregs/block "
          f"({tot_group / tot_block:.2f}x)")


if __name__ == "__main__":
    main()
