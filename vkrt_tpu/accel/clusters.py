"""Cluster tree — the dense-streaming acceleration structure.

Replaces the pointer-chasing LBVH for the production TPU path. Measured on
TPU v5e (see rt/dense.py): XLA/TPU random gathers run at ~30M rows/s while
dense vector tests stream at 17-100+ Gtests/s — 3 orders of magnitude
apart. A classic per-ray BVH walk is therefore the wrong shape for this
hardware; what the VPU wants is *fixed-shape dense sweeps with block-level
skipping*. The cluster tree provides exactly that:

  * triangles Morton-sorted (spatial locality), grouped into contiguous
    clusters of K1=128 (= one VPU lane row),
  * clusters grouped into contiguous superclusters of K2=64,
  * AABBs per cluster and supercluster, small enough to sit whole in VMEM,
  * triangle data packed per cluster as [rows, 128] slabs (lane-major) so
    one DMA delivers a cluster in compute-ready layout.

This plays the role of the reference's driver-built BLAS
(ref: src/Raytracer.cpp:1027-1157) — and is cheap enough to rebuild per
frame (argsort + reshaped min/max only), which the driver build was not;
the stress config (BASELINE config 5) relies on this.

Build is fully jittable. Geometry columns in `tri_data` (f32[C1, 128, ROWS]
— triangles on sublanes, attributes on lanes; the trace kernel sweeps
[K1, R] with rays on lanes):
  0-2  v0.xyz        3-5  e1.xyz        6-8  e2.xyz
  9-11  n0.xyz      12-14 n1.xyz       15-17 n2.xyz      (vertex normals)
 18-19  uv0         20-21 uv1          22-23 uv2
 24-26  t0.xyz      27-29 t1.xyz       30-32 t2.xyz      (vertex tangents)
 33     base-color image id            34 metallic-roughness image id
 35     normal image id                36-39 pad (lane alignment)
 40-45  (sublanes 0-7 only) 16-tri sub-run AABB min/max.xyz (sub_gate)
Attribute columns let the trace kernel select shading inputs with one MXU
matmul instead of post-trace gathers (gathers are the enemy, above).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vkrt_tpu.accel.lbvh import morton30

K1 = 128   # triangles per cluster (== VPU lane width)
K2 = 64    # clusters per supercluster
SUBRUNS = 8   # 16-tri sub-run AABBs per cluster (sub_gate; cols 40:46)
SUB_COL = 40  # first tri_data column holding the sub-run boxes
ROWS = 128  # attribute columns: 36 attr + pad to the HBM lane tile (DMA
            # slices must be 128-aligned on the lane dim; XLA pads the
            # buffer to 128 lanes regardless, so this costs no extra HBM)

_INF = 3.0e38


class ClusterTree(NamedTuple):
    sc_boxes: jax.Array   # f32[8, C2p]   rows 0-2 min.xyz, 3-5 max.xyz (lane-major)
    cl_boxes: jax.Array   # f32[C2, 8, K2] per-supercluster cluster AABBs
    tri_data: jax.Array   # f32[C1p, K1, ROWS] packed geometry+attribute slabs
    leaf_tri: jax.Array   # i32[Tp] slot → original triangle id (-1 = padding)

    @property
    def num_clusters(self) -> int:
        return int(self.tri_data.shape[0])

    @property
    def num_superclusters(self) -> int:
        return int(self.cl_boxes.shape[0])


def _pad_rows(x: jnp.ndarray, n: int, fill: float = 0.0) -> jnp.ndarray:
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)


# lo/hi come in as arguments: a reduction to a [3]-shaped output takes
# ~150s to compile on the v5e toolchain (measured), so the scene AABB is
# computed on the host once and transformed analytically for rebuilds.
@jax.jit
def _morton_keys(v0, e1, e2, lo, hi):
    centroid = v0 + (e1 + e2) / 3.0
    return morton30(centroid, lo, hi)


# Standalone: XLA's TPU sort compile blows up (~400s) when the key
# computation is fused into the sort; with keys as a jit INPUT it's ~13s.
@jax.jit
def _argsort(codes):
    return jnp.argsort(codes)


def build_clusters(v0, e1, e2, attrs=None, with_attributes: bool = False,
                   device: bool = True, aabb=None,
                   method: str = "split", k1: int = K1,
                   sah_opts: dict | None = None) -> ClusterTree:
    """Build the cluster tree. `attrs` (optional dict of per-triangle arrays:
    n0..n2 [T,3], uv0..uv2 [T,2], t0..t2 [T,3], mat [T,3]) fills the
    attribute rows when with_attributes=True.

    device=True keeps sorting on device (the per-frame rebuild path,
    BASELINE config 5): method="morton" (one argsort — fastest) or
    method="sah"/"split" (the round-4 device variable-cut SAH build,
    accel/device_sah.py — one lax.sort + segmented scans per level;
    quality parity with the host build: 9.70 vs 9.96 camera
    clusters/ray on Sponza, tools/r4_device_sah_check.py, vs the
    Morton order's 31.2). device=False builds on the host (zero
    compile cost at startup) with `method`: "split" (default — the
    variable-cut SAH recursion) or "morton" (same order as the device
    morton path). `aabb=(lo, hi)` bounds the Morton quantization
    range; if omitted it is computed on the host (conservative bounds
    are fine — rebuilds under a transform should pass the transformed
    cached AABB).
    """
    import numpy as np
    if aabb is None:
        c = np.asarray(v0) + (np.asarray(e1) + np.asarray(e2)) / 3.0
        aabb = (c.min(axis=0), c.max(axis=0))
    if device:
        assert k1 == K1, "device rebuild path is fixed at K1=128"
        if method in ("sah", "split"):
            from vkrt_tpu.accel.device_sah import device_sah_order
            # sah_opts forwards to device_sah_order (max_levels /
            # stable / nbins / axis_mode) — the per-frame rebuild's
            # speed-quality point, defaults chosen by the round-5
            # hardware rows (tools/r5_hw_queue3.py)
            order = device_sah_order(v0, e1, e2, **(sah_opts or {}))
        else:
            lo = jnp.asarray(aabb[0], jnp.float32)
            hi = jnp.asarray(aabb[1], jnp.float32)
            order = _argsort(_morton_keys(v0, e1, e2, lo, hi))
        return _assemble(v0, e1, e2, order, attrs, with_attributes)
    # host path: zero compile cost — numpy order/assembly, one
    # device_put of the finished tree
    if method == "split":
        order = split_permutation(v0, e1, e2, k1=k1)
    else:
        codes = _morton_host(np.asarray(v0), np.asarray(e1), np.asarray(e2),
                             np.asarray(aabb[0]), np.asarray(aabb[1]))
        order = np.argsort(codes, kind="stable").astype(np.int32)
    return _assemble_host(np.asarray(v0), np.asarray(e1), np.asarray(e2),
                          order, attrs, with_attributes, k1=k1)



@partial(jax.jit, static_argnames=("with_attributes",))
def _assemble(v0, e1, e2, order, attrs=None, with_attributes: bool = False) -> ClusterTree:
    T = v0.shape[0]
    Tp = -(-T // K1) * K1
    C1 = Tp // K1
    C1p = -(-C1 // K2) * K2
    C2 = C1p // K2

    sv0 = _pad_rows(v0[order], Tp)
    se1 = _pad_rows(e1[order], Tp)
    se2 = _pad_rows(e2[order], Tp)
    leaf_tri = _pad_rows(order.astype(jnp.int32), Tp, fill=-1)

    # per-leaf AABBs; padding neutral (+inf / -inf)
    valid = (jnp.arange(Tp) < T)[:, None]
    lmin = jnp.where(valid,
                     jnp.minimum(jnp.minimum(sv0, sv0 + se1), sv0 + se2), _INF)
    lmax = jnp.where(valid,
                     jnp.maximum(jnp.maximum(sv0, sv0 + se1), sv0 + se2), -_INF)

    cl_min = lmin.reshape(C1, K1, 3).min(axis=1)       # [C1,3]
    cl_max = lmax.reshape(C1, K1, 3).max(axis=1)
    cl_min = _pad_rows(cl_min, C1p, fill=float(_INF))
    cl_max = _pad_rows(cl_max, C1p, fill=float(-_INF))

    sc_min = cl_min.reshape(C2, K2, 3).min(axis=1)     # [C2,3]
    sc_max = cl_max.reshape(C2, K2, 3).max(axis=1)

    # lane-major packing ----------------------------------------------------
    C2p = max(128, -(-C2 // 128) * 128)
    sc_boxes = jnp.full((8, C2p), _INF, jnp.float32)
    sc_boxes = sc_boxes.at[3:6, :].set(-_INF)   # padding lanes: inverted box
    sc_boxes = sc_boxes.at[0:3, :C2].set(sc_min.T)
    sc_boxes = sc_boxes.at[3:6, :C2].set(sc_max.T)

    cl_boxes = jnp.zeros((C2, 8, K2), jnp.float32)
    cl_boxes = cl_boxes.at[:, 0:3, :].set(
        cl_min.reshape(C2, K2, 3).transpose(0, 2, 1))
    cl_boxes = cl_boxes.at[:, 3:6, :].set(
        cl_max.reshape(C2, K2, 3).transpose(0, 2, 1))

    def cols(x):   # [Tp, k] → [C1, K1, k] (tris on sublanes, attrs on lanes)
        return x.reshape(C1, K1, -1)

    rows = [cols(sv0), cols(se1), cols(se2)]           # cols 0-8
    if with_attributes:
        a = attrs
        rows += [cols(_pad_rows(a["n0"][order], Tp)),
                 cols(_pad_rows(a["n1"][order], Tp)),
                 cols(_pad_rows(a["n2"][order], Tp)),
                 cols(_pad_rows(a["uv0"][order], Tp)),
                 cols(_pad_rows(a["uv1"][order], Tp)),
                 cols(_pad_rows(a["uv2"][order], Tp)),
                 cols(_pad_rows(a["t0"][order], Tp)),
                 cols(_pad_rows(a["t1"][order], Tp)),
                 cols(_pad_rows(a["t2"][order], Tp)),
                 cols(_pad_rows(a["mat"][order].astype(jnp.float32), Tp))]
    else:
        rows += [jnp.zeros((C1, K1, 27), jnp.float32)]
    tri_data = jnp.concatenate(rows, axis=2)           # [C1, K1, used]
    if tri_data.shape[2] < ROWS:
        tri_data = jnp.concatenate(
            [tri_data, jnp.zeros((C1, K1, ROWS - tri_data.shape[2]),
                                 jnp.float32)], axis=2)
    # 16-tri sub-run AABBs ride the free pad columns (SUB_COL..SUB_COL+5)
    # of the first SUBRUNS sublanes — zero extra DMA; the trace kernels'
    # optional sub_gate (rt/dense.py / rt/occl_multi.py) slab-tests them
    # to skip 16-tri sub-sweeps inside a gated cluster. Empty runs get
    # inverted boxes, which the slab test treats as (harmless) always-hit
    # on zeroed triangle rows (det=0, no commits).
    rmin = lmin.reshape(C1, SUBRUNS, K1 // SUBRUNS, 3).min(axis=2)
    rmax = lmax.reshape(C1, SUBRUNS, K1 // SUBRUNS, 3).max(axis=2)
    tri_data = tri_data.at[:, 0:SUBRUNS, SUB_COL:SUB_COL + 3].set(rmin)
    tri_data = tri_data.at[:, 0:SUBRUNS, SUB_COL + 3:SUB_COL + 6].set(rmax)
    tri_data = _pad_rows(tri_data, C1p)

    return ClusterTree(sc_boxes=sc_boxes, cl_boxes=cl_boxes,
                       tri_data=tri_data, leaf_tri=leaf_tri)


def split_permutation(v0, e1, e2, k1: int = K1, k2: int = K2,
                      sah: bool = True):
    """Top-down aligned SAH-split triangle ordering (host, numpy).

    Returns a permutation whose consecutive K1-runs are the clusters:
    the recursion splits node triangle ranges at multiples of K1 (and of
    K1*K2 while nodes are still larger, so superclusters are subtrees
    too). sah=True (production) scores EVERY aligned cut position on
    every axis by the true SAH sum area_L*n_L + area_R*n_R over
    prefix/suffix accumulated child AABBs of the centroid-sorted range
    and takes the global best — the round-3 upgrade from the fixed
    median-half cut with SAH axis choice, measured on Sponza camera
    rays: per-ray cluster intersections 14.6 -> 10.4 (-29%), per-block
    gated-cluster union -20..23% (tools/split_quality.py). sah=False
    keeps the cheap widest-centroid-axis median split. This replaces
    the Morton-run ordering for static builds: Morton runs of 128 cross
    space-filling-curve seams and give loose cluster AABBs, which is
    pure slop in the dense kernel's per-block gating. Plays the role of
    the driver's BLAS builder quality (ref: src/Raytracer.cpp:1027-1157);
    the on-device per-frame rebuild path keeps the Morton order
    (jit-friendly).
    """
    import numpy as np

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
        if sah:
            ncuts = (n - 1) // align      # cuts at align, 2*align, ...
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
                a_l = area(pmax[cuts - 1] - pmin[cuts - 1])
                a_r = area(smax[cuts] - smin[cuts])
                cost = a_l * cuts + a_r * (n - cuts)
                j = int(np.argmin(cost))
                if best_cost is None or cost[j] < best_cost:
                    best_cost, best_perm, best_cut = cost[j], s, int(cuts[j])
            order[lo:hi] = best_perm
            stack.append((lo + best_cut, hi))
            stack.append((lo, lo + best_cut))
        else:
            half = (n // 2 // align) * align
            if half == 0:
                half = align
            sub = order[lo:hi]
            cc = c[sub]
            ax = int(np.argmax(cc.max(axis=0) - cc.min(axis=0)))
            sel = np.argpartition(cc[:, ax], half)
            order[lo:hi] = sub[sel]
            stack.append((lo + half, hi))
            stack.append((lo, lo + half))
    return order.astype(np.int32)


def _morton_host(v0, e1, e2, lo, hi):
    """numpy twin of _morton_keys (identical quantization/interleave)."""
    import numpy as np

    def expand(v):
        v = v.astype(np.int32)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    centroid = v0 + (e1 + e2) / np.float32(3.0)
    extent = np.maximum(hi - lo, 1e-12).astype(np.float32)
    q = np.clip((centroid - lo) / extent * 1024.0, 0.0, 1023.0).astype(np.int32)
    return (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(q[:, 2])


def _assemble_host(v0, e1, e2, order, attrs=None,
                   with_attributes: bool = False, k1: int = K1) -> ClusterTree:
    """numpy twin of _assemble (bit-identical layout, no XLA compile).
    `k1` = triangles per cluster (the kernel reads it off tri_data)."""
    import numpy as np

    K1 = k1
    T = v0.shape[0]
    Tp = -(-T // K1) * K1
    C1 = Tp // K1
    C1p = -(-C1 // K2) * K2
    C2 = C1p // K2

    def pad(x, n, fill=0.0):
        if n <= x.shape[0]:
            return x
        return np.concatenate(
            [x, np.full((n - x.shape[0],) + x.shape[1:], fill, x.dtype)])

    sv0 = pad(v0[order], Tp)
    se1 = pad(e1[order], Tp)
    se2 = pad(e2[order], Tp)
    leaf_tri = pad(order.astype(np.int32), Tp, fill=-1)

    valid = (np.arange(Tp) < T)[:, None]
    lmin = np.where(valid, np.minimum(np.minimum(sv0, sv0 + se1), sv0 + se2), _INF)
    lmax = np.where(valid, np.maximum(np.maximum(sv0, sv0 + se1), sv0 + se2), -_INF)

    cl_min = pad(lmin.reshape(C1, K1, 3).min(axis=1).astype(np.float32), C1p, _INF)
    cl_max = pad(lmax.reshape(C1, K1, 3).max(axis=1).astype(np.float32), C1p, -_INF)
    sc_min = cl_min.reshape(C2, K2, 3).min(axis=1)
    sc_max = cl_max.reshape(C2, K2, 3).max(axis=1)

    C2p = max(128, -(-C2 // 128) * 128)
    sc_boxes = np.full((8, C2p), _INF, np.float32)
    sc_boxes[3:6, :] = -_INF
    sc_boxes[0:3, :C2] = sc_min.T
    sc_boxes[3:6, :C2] = sc_max.T

    cl_boxes = np.zeros((C2, 8, K2), np.float32)
    cl_boxes[:, 0:3, :] = cl_min.reshape(C2, K2, 3).transpose(0, 2, 1)
    cl_boxes[:, 3:6, :] = cl_max.reshape(C2, K2, 3).transpose(0, 2, 1)

    def cols(x):
        return x.reshape(C1, K1, -1).astype(np.float32)

    rows = [cols(sv0), cols(se1), cols(se2)]
    if with_attributes:
        a = {k: np.asarray(x) for k, x in attrs.items()}
        for key in ("n0", "n1", "n2", "uv0", "uv1", "uv2", "t0", "t1", "t2"):
            rows.append(cols(pad(a[key][order], Tp)))
        rows.append(cols(pad(a["mat"][order].astype(np.float32), Tp)))
    else:
        rows.append(np.zeros((C1, K1, 27), np.float32))
    tri_data = np.concatenate(rows, axis=2)
    if tri_data.shape[2] < ROWS:
        tri_data = np.concatenate(
            [tri_data, np.zeros((C1, K1, ROWS - tri_data.shape[2]),
                                np.float32)], axis=2)
    # sub_gate run boxes (see _assemble)
    rmin = lmin.reshape(C1, SUBRUNS, K1 // SUBRUNS, 3).min(axis=2)
    rmax = lmax.reshape(C1, SUBRUNS, K1 // SUBRUNS, 3).max(axis=2)
    tri_data[:, 0:SUBRUNS, SUB_COL:SUB_COL + 3] = rmin
    tri_data[:, 0:SUBRUNS, SUB_COL + 3:SUB_COL + 6] = rmax
    tri_data = pad(tri_data, C1p)

    return ClusterTree(sc_boxes=jnp.asarray(sc_boxes),
                       cl_boxes=jnp.asarray(cl_boxes),
                       tri_data=jnp.asarray(tri_data),
                       leaf_tri=jnp.asarray(leaf_tri))


def scene_attrs(flat) -> dict:
    """Per-triangle attribute arrays from a FlatScene (host, numpy)."""
    import numpy as np
    idx = np.asarray(flat.indices, dtype=np.int64)
    out = {}
    for k, (i,) in {"n0": (0,), "n1": (1,), "n2": (2,)}.items():
        out[k] = jnp.asarray(flat.normals[idx[:, i]])
    for k, (i,) in {"uv0": (0,), "uv1": (1,), "uv2": (2,)}.items():
        out[k] = jnp.asarray(flat.uvs[idx[:, i]])
    for k, (i,) in {"t0": (0,), "t1": (1,), "t2": (2,)}.items():
        out[k] = jnp.asarray(flat.tangents[idx[:, i], :3])
    # material SLOT id (packed triple heap, scene/textures.material_slots)
    # in col 33; the raw metallic-roughness / normal image ids ride along
    # in 34-35 for debugging — the engine samples via the slot only
    from vkrt_tpu.scene.textures import material_slots
    _, tri_slot = material_slots(flat)
    out["mat"] = jnp.asarray(
        np.stack([tri_slot, flat.tri_metallic_roughness,
                  flat.tri_normal], axis=1).astype(np.float32))
    return out
