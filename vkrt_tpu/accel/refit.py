"""Per-frame acceleration-structure update (BASELINE config 5).

The reference builds its BLAS/TLAS once at startup (driver build,
ref: src/Raytracer.cpp:1027-1283); the stress benchmark config instead
demands a per-frame update. Two device paths:

  * refit_clusters — topology (Morton order, cluster assignment) is kept;
    an affine instance transform (the TLAS-instance analogue,
    ref: src/Raytracer.cpp:1165-1177) is applied to the packed geometry
    rows and all AABBs are recomputed with dense reshaped reductions.
    No gathers, fully jitted — the fast per-frame path.
  * build_clusters(device=True) — full rebuild including the on-device
    Morton re-sort, for when geometry deforms enough that the cached
    topology degrades.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vkrt_tpu.accel.clusters import (K1, K2, ROWS, SUBRUNS, SUB_COL,
                                     ClusterTree)
from vkrt_tpu.utils import layout as L

_INF = 3.0e38


@jax.jit
def refit_clusters(tree: ClusterTree, matrix: jnp.ndarray) -> ClusterTree:
    """Apply a 4x4 affine transform to the tree geometry and refit AABBs."""
    a = matrix[:3, :3]
    b = matrix[:3, 3]

    td = tree.tri_data                       # [C1p, K1, ROWS]
    c1p = td.shape[0]

    def cols3(r):
        return td[:, :, r:r + 3]             # [C1p, K1, 3]

    def xform(x, translate):
        # explicit f32 contraction: einsum with a 3-wide contraction
        # lowers to a bf16-default MXU matmul on TPU and would truncate
        # the refit geometry (hardware-only error; utils.layout.mat_rows3)
        y = L.mat_rows3(x, a)
        if translate:
            y = y + b[None, None, :]
        return y

    v0 = xform(cols3(0), True)
    e1 = xform(cols3(3), False)
    e2 = xform(cols3(6), False)

    # leaf AABBs (padding slots neutralized via leaf_tri < 0)
    p0 = v0
    p1 = v0 + e1
    p2 = v0 + e2
    lmin = jnp.minimum(jnp.minimum(p0, p1), p2)   # [C1p,K1,3]
    lmax = jnp.maximum(jnp.maximum(p0, p1), p2)
    valid = (tree.leaf_tri >= 0).reshape(-1, K1)  # [C1,K1] over real clusters
    c1 = valid.shape[0]
    validp = jnp.pad(valid, ((0, c1p - c1), (0, 0)))[:, :, None]
    lmin = jnp.where(validp, lmin, _INF)
    lmax = jnp.where(validp, lmax, -_INF)

    cl_min = lmin.min(axis=1)                 # [C1p,3]
    cl_max = lmax.max(axis=1)

    c2 = tree.cl_boxes.shape[0]
    cl_boxes = jnp.zeros((c2, 8, K2), jnp.float32)
    cl_boxes = cl_boxes.at[:, 0:3, :].set(
        cl_min.reshape(c2, K2, 3).transpose(0, 2, 1))
    cl_boxes = cl_boxes.at[:, 3:6, :].set(
        cl_max.reshape(c2, K2, 3).transpose(0, 2, 1))

    sc_min = cl_min.reshape(c2, K2, 3).min(axis=1)
    sc_max = cl_max.reshape(c2, K2, 3).max(axis=1)
    c2p = tree.sc_boxes.shape[1]
    sc_boxes = jnp.full((8, c2p), _INF, jnp.float32)
    sc_boxes = sc_boxes.at[3:6, :].set(-_INF)
    sc_boxes = sc_boxes.at[0:3, :c2].set(sc_min.T)
    sc_boxes = sc_boxes.at[3:6, :c2].set(sc_max.T)

    # shading attribute directions must follow the transform: vertex
    # normals (cols 9-17) and tangents (24-32) rotate with A (uniform
    # scale is normalized away in shading); uvs/material ids unchanged.
    # (For non-uniform scale a true inverse-transpose would be needed —
    # the reference's TLAS transform is uniform, ref: Raytracer.cpp:1165.)
    def rot(r):
        return L.mat_rows3(td[:, :, r:r + 3], a)

    attrs_mid = jnp.concatenate(
        [rot(9), rot(12), rot(15),            # n0 n1 n2
         td[:, :, 18:24],                     # uvs
         rot(24), rot(27), rot(30),           # t0 t1 t2
         td[:, :, 33:36]], axis=2)            # material ids
    td = jnp.concatenate([v0, e1, e2, attrs_mid], axis=2)
    if td.shape[2] < ROWS:
        td = jnp.concatenate(
            [td, jnp.zeros((c1p, K1, ROWS - td.shape[2]), jnp.float32)],
            axis=2)
    # sub_gate run boxes (see clusters._assemble) must follow the
    # transform — recompute from the already-refit leaf AABBs
    rmin = lmin.reshape(c1p, SUBRUNS, K1 // SUBRUNS, 3).min(axis=2)
    rmax = lmax.reshape(c1p, SUBRUNS, K1 // SUBRUNS, 3).max(axis=2)
    td = td.at[:, 0:SUBRUNS, SUB_COL:SUB_COL + 3].set(rmin)
    td = td.at[:, 0:SUBRUNS, SUB_COL + 3:SUB_COL + 6].set(rmax)

    return ClusterTree(sc_boxes=sc_boxes, cl_boxes=cl_boxes,
                       tri_data=td, leaf_tri=tree.leaf_tri)
