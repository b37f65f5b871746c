"""Dense-streaming trace kernel (Pallas) — the production TPU hot loop.

This is the TPU-shaped replacement for `vkCmdTraceRaysKHR`
(ref: src/Raytracer.cpp:157). Design rationale (measured on v5e):

  * XLA random gathers: ~30M rows/s — a per-ray BVH walk needs ~100
    gathers/ray → hard-capped at ~0.3 Mrays/s. Dead end.
  * dense vector tests: 17 Gtests/s in plain XLA, more in Pallas where
    operands stay in VMEM/registers.

So rays never chase pointers. Instead, a grid of coherent ray blocks
(one Pallas program per block of R rays) streams the scene through VMEM:

  phase 1  all supercluster AABBs (VMEM-resident) tested densely against
           the block [R, C2]; OR-reduced over rays → per-supercluster
           block gate (scalar).
  phase 2  for each gated supercluster: DMA its 64 packed cluster slabs
           HBM→VMEM (~1.3MB, double-buffered across gates), dense-test its
           cluster AABBs [R, 64], OR-reduce → per-cluster gates.
  phase 3  for each gated cluster: Möller–Trumbore of all R rays against
           its 128 triangles [R, 128] in one shot on the VPU; the best
           hit per ray is committed with masked lane reductions (min-t,
           tie-broken by lane) — no gather anywhere.

Skipping happens at BLOCK granularity (a supercluster/cluster is skipped
iff no ray in the block can hit it), so the engine feeds spatially
coherent blocks: primary rays come tiled, secondary rays pixel-ordered.

Closest-hit and occlusion variants mirror the reference's two trace
flavors (shader.rgen:51-62 vs shader.rchit:113-116). The occlusion
variant adds an any-ray-alive gate so fully blocked blocks stop streaming.

With `with_attributes=True` the kernel also emits interpolated shading
inputs (normal/uv/tangent/material ids, rows 9-35 of the cluster slab,
see accel/clusters.py) selected by the same lane reductions — this fuses
what the reference does at the top of the closest-hit shader
(shader.rchit:88-108) into the trace, eliminating post-trace attribute
gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkrt_tpu.accel.clusters import K1, K2, ROWS, ClusterTree

TMIN = 0.001          # ref: shaders/shader.rgen:59
_INF = 3.0e38
_DET_EPS = 1e-12


def _safe_inv(x):
    tiny = 1e-20
    return 1.0 / jnp.where(jnp.abs(x) < tiny, jnp.where(x < 0, -tiny, tiny), x)


def _trace_kernel(order_ref, sc_ref, cl_ref, o_ref, d_ref, tmax_ref, tri_hbm,
                  # outputs
                  t_out, slot_out, u_out, v_out, attr_out, stats_out,
                  # scratch
                  tris, sem, counters,
                  *, n_sc: int, occlusion: bool, with_attributes: bool,
                  stats: bool):
    R = o_ref.shape[0]

    ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]   # [R,1]
    dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    tmax = tmax_ref[:, 0:1]

    t_out[:] = tmax
    slot_out[:] = jnp.full((R, 1), -1, jnp.int32)
    u_out[:] = jnp.zeros((R, 1), jnp.float32)
    v_out[:] = jnp.zeros((R, 1), jnp.float32)
    if with_attributes:
        attr_out[:] = jnp.zeros_like(attr_out)
    if stats:
        counters[0] = 0
        counters[1] = 0

    def slab_any(bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z):
        """Dense slab test rays x boxes ([R,1] vs [1,L]) → any-hit per box [1,L]."""
        t0x = (bmin_x - ox) * ix
        t1x = (bmax_x - ox) * ix
        t0y = (bmin_y - oy) * iy
        t1y = (bmax_y - oy) * iy
        t0z = (bmin_z - oz) * iz
        t1z = (bmax_z - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        hit = (tn <= tf) & (tf >= TMIN) & (tn <= t_out[:])
        return jnp.any(hit, axis=0, keepdims=True)

    def hit_bitmask(hits):
        """Pack an any-hit row [1,L] (L<=128) into two scalar i32 bitmasks,
        so per-element gating in the loops below is pure scalar work
        (one vector reduce here instead of one per loop iteration)."""
        lane = jax.lax.broadcasted_iota(jnp.int32, hits.shape, 1)
        w = jnp.left_shift(jnp.int32(1), lane & 31)
        lo = jnp.sum(jnp.where(hits & (lane < 32), w, 0))
        hi = jnp.sum(jnp.where(hits & (lane >= 32) & (lane < 64), w, 0))
        return lo, hi

    def test_bit(lo, hi, i):
        word = jnp.where(i < 32, lo, hi)
        return (jax.lax.shift_right_logical(word, i & 31) & 1) == 1

    sc_iota = jax.lax.broadcasted_iota(jnp.int32, (1, sc_ref.shape[1]), 1)

    def sc_gate(s):
        """Recompute the supercluster-s gate against the CURRENT t_out.

        Mosaic cannot scalar-read VMEM at a dynamic lane, so the 6 box
        components are extracted with iota-compare masked reductions.
        """
        def comp(row):
            return jnp.sum(jnp.where(sc_iota == s, sc_ref[row:row + 1, :], 0.0))
        t0x = (comp(0) - ox) * ix
        t1x = (comp(3) - ox) * ix
        t0y = (comp(1) - oy) * iy
        t1y = (comp(4) - oy) * iy
        t0z = (comp(2) - oz) * iz
        t1z = (comp(5) - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        return jnp.any((tn <= tf) & (tf >= TMIN) & (tn <= t_out[:]))

    def tri_block(c, base_slot):
        """Möller–Trumbore: all R rays vs the 128 tris of VMEM cluster c."""
        chunk = tris[c]                       # [ROWS, K1]
        v0x, v0y, v0z = chunk[0:1, :], chunk[1:2, :], chunk[2:3, :]
        e1x, e1y, e1z = chunk[3:4, :], chunk[4:5, :], chunk[5:6, :]
        e2x, e2y, e2z = chunk[6:7, :], chunk[7:8, :], chunk[8:9, :]

        hx = dy * e2z - dz * e2y              # [R,K1]
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        inv_det = jnp.where(jnp.abs(det) > _DET_EPS,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        uu = (sx * hx + sy * hy + sz * hz) * inv_det
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        vv = (dx * qx + dy * qy + dz * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ((jnp.abs(det) > _DET_EPS) & (uu >= 0) & (vv >= 0)
              & (uu + vv <= 1) & (tt > TMIN) & (tt < t_out[:]))

        tm = jnp.min(jnp.where(ok, tt, _INF), axis=1, keepdims=True)  # [R,1]
        better = tm < t_out[:]

        @pl.when(jnp.any(better))
        def _():
            lanes = jax.lax.broadcasted_iota(jnp.int32, (R, K1), 1)
            eq = ok & (tt == tm)
            lane_sel = jnp.min(jnp.where(eq, lanes, K1), axis=1, keepdims=True)
            onehot = lanes == lane_sel        # [R,K1], exactly one lane where better
            u_sel = jnp.sum(jnp.where(onehot, uu, 0.0), axis=1, keepdims=True)
            v_sel = jnp.sum(jnp.where(onehot, vv, 0.0), axis=1, keepdims=True)
            t_out[:] = jnp.where(better, tm, t_out[:])
            slot_out[:] = jnp.where(better, base_slot * K1 + lane_sel, slot_out[:])
            u_out[:] = jnp.where(better, u_sel, u_out[:])
            v_out[:] = jnp.where(better, v_sel, v_out[:])
            if with_attributes:
                for r in range(0, 36):
                    a_sel = jnp.sum(jnp.where(onehot, chunk[r:r + 1, :], 0.0),
                                    axis=1, keepdims=True)
                    attr_out[:, r:r + 1] = jnp.where(
                        better, a_sel, attr_out[:, r:r + 1])

    # One dense pass over ALL supercluster boxes → scalar bitmask. This is
    # the coarse (t-unaware) cull; the per-supercluster recheck in sc_body
    # is what implements early termination as t_out shrinks.
    sc_lo, sc_hi = hit_bitmask(
        slab_any(sc_ref[0:1, :], sc_ref[1:2, :], sc_ref[2:3, :],
                 sc_ref[3:4, :], sc_ref[4:5, :], sc_ref[5:6, :]))

    def sc_body(k, _):
        # Per-block front-to-back visit order (order_ref in SMEM) — with the
        # t-culled recheck this gives block-level early termination: once
        # every ray's best hit is nearer than a supercluster's entry, its
        # gate fails and the tail is skipped.
        s = order_ref[0, 0, k]
        coarse = (s >= 0) & test_bit(sc_lo, sc_hi, s)
        if occlusion:
            coarse = coarse & jnp.any(slot_out[:] < 0)

        @pl.when(coarse)
        def _():
            # t-aware recheck only for coarsely-hit superclusters
            @pl.when(sc_gate(s))
            def _():
                if stats:
                    counters[0] = counters[0] + 1
                dma = pltpu.make_async_copy(tri_hbm.at[pl.ds(s * K2, K2)], tris, sem)
                dma.start()

                cb = cl_ref[s]                    # [8, K2]
                cl_any = slab_any(cb[0:1, :], cb[1:2, :], cb[2:3, :],
                                  cb[3:4, :], cb[4:5, :], cb[5:6, :])
                cl_lo, cl_hi = hit_bitmask(cl_any)
                dma.wait()

                def cl_body(c, _):
                    cgate = test_bit(cl_lo, cl_hi, c)

                    @pl.when(cgate)
                    def _():
                        if stats:
                            counters[1] = counters[1] + 1
                        tri_block(c, s * K2 + c)
                    return 0

                jax.lax.fori_loop(0, K2, cl_body, 0)
        return 0

    jax.lax.fori_loop(0, n_sc, sc_body, 0)
    if stats:
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        stats_out[:] = jnp.where(lane128 == 0, counters[0],
                                 jnp.where(lane128 == 1, counters[1], 0))


@functools.partial(jax.jit, static_argnames=("block", "occlusion",
                                             "with_attributes", "interpret",
                                             "stats"))
def trace_dense(tree: ClusterTree, origins, dirs, tmax, *,
                block: int = 512, occlusion: bool = False,
                with_attributes: bool = False, interpret: bool = False,
                stats: bool = False):
    """Trace rays against the cluster tree.

    origins/dirs: f32[N,3] (N must be a multiple of `block`; the wavefront
    engine pads + orders rays into coherent blocks). tmax: f32[N].
    Returns (t, slot, u, v[, attrs f32[N,36]]); slot = -1 on miss, else an
    index into leaf order (tree.leaf_tri maps to original triangle ids).
    """
    N = origins.shape[0]
    assert N % block == 0, f"ray count {N} not a multiple of block {block}"
    n_sc = tree.num_superclusters
    assert n_sc <= 64, "bitmask gating supports at most 64 superclusters"
    c2p = tree.sc_boxes.shape[1]
    nblocks = N // block

    # Per-block front-to-back supercluster visit order: entry distance of
    # each supercluster box along the block's mean ray. Cheap XLA prologue
    # ([nblocks, n_sc] slab test + argsort) that unlocks early termination
    # inside the kernel.
    ob = origins.reshape(nblocks, block, 3).mean(axis=1)     # [nb,3]
    db = dirs.reshape(nblocks, block, 3).mean(axis=1)
    db = db / jnp.maximum(jnp.linalg.norm(db, axis=1, keepdims=True), 1e-12)
    inv = 1.0 / jnp.where(jnp.abs(db) < 1e-12,
                          jnp.where(db < 0, -1e-12, 1e-12), db)
    sc_min = tree.sc_boxes[0:3, :n_sc].T                     # [n_sc,3]
    sc_max = tree.sc_boxes[3:6, :n_sc].T
    t0 = (sc_min[None] - ob[:, None]) * inv[:, None]         # [nb,n_sc,3]
    t1 = (sc_max[None] - ob[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    key = jnp.where(tn <= tf, jnp.maximum(tn, 0.0), jnp.inf)
    sc_order = jnp.argsort(key, axis=1).astype(jnp.int32)    # [nb,n_sc]
    order_w = -(-n_sc // 64) * 64
    sc_order = jnp.concatenate(
        [sc_order, jnp.full((nblocks, order_w - n_sc), -1, jnp.int32)], axis=1)
    sc_order = sc_order.reshape(nblocks, 1, order_w)  # SMEM block-shape rule

    kernel = functools.partial(_trace_kernel, n_sc=n_sc, occlusion=occlusion,
                               with_attributes=with_attributes, stats=stats)
    grid = (nblocks,)
    out_shape = [
        jax.ShapeDtypeStruct((N, 1), jnp.float32),   # t
        jax.ShapeDtypeStruct((N, 1), jnp.int32),     # slot
        jax.ShapeDtypeStruct((N, 1), jnp.float32),   # u
        jax.ShapeDtypeStruct((N, 1), jnp.float32),   # v
        jax.ShapeDtypeStruct((N, 36 if with_attributes else 1), jnp.float32),
        jax.ShapeDtypeStruct((nblocks, 1, 128), jnp.int32),   # stats
    ]
    attr_cols = 36 if with_attributes else 1
    out_specs = [
        pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, attr_cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    in_specs = [
        pl.BlockSpec((1, 1, order_w), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((8, c2p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_sc, 8, K2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),        # tri_data stays in HBM
    ]
    t, slot, u, v, attrs, stat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((K2, ROWS, K1), jnp.float32),      # supercluster tri slab
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((2,), jnp.int32),                 # visit counters
        ],
        interpret=interpret,
    )(sc_order, tree.sc_boxes, tree.cl_boxes, origins, dirs,
      tmax.reshape(N, 1), tree.tri_data)

    t = t[:, 0]
    slot = slot[:, 0]
    miss = slot < 0
    t = jnp.where(miss, jnp.inf, t)
    out = [t, slot, u[:, 0], v[:, 0]]
    if with_attributes:
        out.append(attrs)
    if stats:
        out.append(stat[:, 0, :2])
    return tuple(out)
