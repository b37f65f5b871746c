"""Edge-function rasterizer (Pallas) — true raster machinery on TPU.

The reference's raster path is a classic hardware pipeline: vertex
transform (shader.vert:18-23), fixed-function triangle setup +
edge-function coverage + depth test (the GPU rasterizer invoked by
vkCmdDrawIndexed, ref: src/Rasterizer.cpp:140-146), then an unlit
textured fragment shader with alpha `discard` (shader.frag:13-22).
raster/pipeline.py's wavefront path reproduces the *image* by ray
casting; THIS module reproduces the *machinery*: screen-space
edge-function coverage with depth-min selection, no rays anywhere.

TPU-first design:

  * Vertex stage: one jitted XLA pass transforms every triangle of the
    cluster tree to clip space and emits a per-triangle SETUP slab
    (below) — the analogue of the vertex shader + fixed-function setup.
  * 2D homogeneous rasterization (no near-plane clipping stage): the
    per-pixel barycentrics come from the adjugate of the clip-space
    matrix M = [[X0,X1,X2],[Y0,Y1,Y2],[w0,w1,w2]] where X = (0.5*x_c +
    0.5*w)*width, Y likewise (screen = X/w). lambda(p) = adj(M) @
    (px,py,1) satisfies sum_i lambda_i * V_i = det(M) * p, so
    sum_i lambda_i * w_i = det — a per-triangle CONSTANT. Folding
    1/det into the coefficients at setup time gives beta_i with
    sum beta_i w_i = 1: coverage is beta_i >= 0 (both windings —
    two-sided, matching the ray oracle), depth is z = sum beta_i Z_i
    with NO per-pixel division, and affine attrs interpolate as
    sum(beta_i A_i) / sum(beta_i). Triangles crossing w=0 rasterize
    their visible sheet correctly — no clipper needed.
  * Pixel blocks × streamed triangle clusters: the same dense-streaming
    architecture as the trace kernel (rt/dense.py — bitmask supercluster
    cull, nearest-first SMEM work list, NBUF-deep cluster DMA pipeline),
    with the ray slab test replaced by 2D screen-box overlap and the
    ray-t prune replaced by depth: committed z only shrinks, so a
    cluster whose screen zmin exceeds the block's max committed depth
    (bzmax) is skipped before its DMA is issued — streamed front-to-back
    this is hierarchical early-z.

Setup slab lane layout (f32[C1p, K1, ROWS], mirrors tri_data's cluster
order so `supercluster*K2 + c` indexes both):
  0-8   A0,A1,A2 = per-vertex barycentric coeff rows (a,b,c)/det:
        beta_i = a_i*px + b_i*py + c_i
  9-11  Z0,Z1,Z2 (clip z; sum beta_i Z_i = NDC depth in [0,1])
  12-17 u0,v0,u1,v1,u2,v2 (texture uvs)
  18    material slot id
Degenerate/padded triangles carry all-zero rows: beta = (0,0,0) fails
the strict sum(beta) > 0 coverage clause.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkrt_tpu.accel.clusters import K2, ROWS, ClusterTree
from vkrt_tpu.utils import layout as L

_INF = 3.0e38
_ZFAR_PARK = 1.0e9     # z_s sentinel: live init / parked init is -_ZFAR_PARK
_W_EPS = 1e-9
_DET_EPS = 1e-30


def build_raster_setup(tree: ClusterTree, view, proj, width: int,
                       height: int):
    """Vertex + triangle-setup stage (jitted XLA, runs per camera pose).

    Returns (setup f32[C1p,K1,ROWS], scb f32[8,C2p], clb f32[n_sc,8,K2]):
    the setup slabs plus screen-space supercluster/cluster bound boxes in
    the trace kernel's box layout (rows 0-2 lo xyz→(x,y,zmin), 3-5 hi).
    Clusters containing any triangle that crosses or touches w=0 get a
    full-screen box (their triangles still rasterize correctly — only
    the cull is conservative).
    """
    return _build_raster_setup(tree, jnp.asarray(view, jnp.float32),
                               jnp.asarray(proj, jnp.float32),
                               width=width, height=height)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _build_raster_setup(tree: ClusterTree, view, proj, *, width, height):
    td = tree.tri_data                           # [C1p, K1, ROWS]
    # explicit f32 contractions (utils.layout.mat_rows3): `proj @ view`
    # and the vertex einsum lower to bf16-default MXU matmuls on TPU,
    # which truncated vertex positions and flipped 75% of full-scene
    # pixels vs the ray oracle (hardware-only; tools/r3_hw_queue2.py)
    wvp = (proj[:, :, None] * view[None, :, :]).sum(axis=1)   # [4,4]
    v0 = td[..., 0:3]
    p = [v0, v0 + td[..., 3:6], v0 + td[..., 6:9]]     # corners [C1p,K1,3]
    valid = (jnp.abs(v0).sum(-1) + jnp.abs(td[..., 3:6]).sum(-1)) > 0

    X, Y, W_, Z = [], [], [], []
    for pi in p:
        clip = L.mat_rows3(pi, wvp[:, :3]) + wvp[:, 3]
        X.append((0.5 * clip[..., 0] + 0.5 * clip[..., 3]) * width)
        Y.append((0.5 * clip[..., 1] + 0.5 * clip[..., 3]) * height)
        Z.append(clip[..., 2])
        W_.append(clip[..., 3])

    # adjugate rows: lambda_i(p) = a_i*px + b_i*py + c_i (Cramer columns)
    a0 = Y[1] * W_[2] - Y[2] * W_[1]
    b0 = X[2] * W_[1] - X[1] * W_[2]
    c0 = X[1] * Y[2] - X[2] * Y[1]
    a1 = Y[2] * W_[0] - Y[0] * W_[2]
    b1 = X[0] * W_[2] - X[2] * W_[0]
    c1 = X[2] * Y[0] - X[0] * Y[2]
    a2 = Y[0] * W_[1] - Y[1] * W_[0]
    b2 = X[1] * W_[0] - X[0] * W_[1]
    c2 = X[0] * Y[1] - X[1] * Y[0]
    det = X[0] * a0 + X[1] * a1 + X[2] * a2
    # RELATIVE degeneracy cull, scaled by the cofactors' TERM magnitudes
    # (|Y1 w2| + |Y2 w1|, not |a0|): a collapsed triangle's cofactors are
    # pure FMA-contraction residue (y*w - y*w fused to fma(y, w, -(y*w))
    # is the exact product minus the rounded one — NONZERO), so a scale
    # built from the cancelled cofactors tracks the residue and passes.
    # Measured: one collapsed synth-geometry triangle phantom-covered 12%
    # of a 64x48 frame. 2e-6 ≈ 32 f32 ulp of the term scale — culls only
    # sub-sub-pixel slivers.
    det_scale = (
        jnp.abs(X[0]) * (jnp.abs(Y[1] * W_[2]) + jnp.abs(Y[2] * W_[1]))
        + jnp.abs(X[1]) * (jnp.abs(Y[2] * W_[0]) + jnp.abs(Y[0] * W_[2]))
        + jnp.abs(X[2]) * (jnp.abs(Y[0] * W_[1]) + jnp.abs(Y[1] * W_[0])))
    inv = jnp.where((jnp.abs(det) > 2e-6 * det_scale) & (det_scale > 0)
                    & valid, 1.0 / det, 0.0)

    cols = [a0 * inv, b0 * inv, c0 * inv,
            a1 * inv, b1 * inv, c1 * inv,
            a2 * inv, b2 * inv, c2 * inv,
            Z[0], Z[1], Z[2],
            td[..., 18], td[..., 19], td[..., 20],
            td[..., 21], td[..., 22], td[..., 23],
            td[..., 33]]
    setup = jnp.stack(cols, axis=-1)
    setup = jnp.where(valid[..., None] & (inv[..., None] != 0), setup, 0.0)
    setup = jnp.concatenate(
        [setup, jnp.zeros(td.shape[:2] + (ROWS - len(cols),), jnp.float32)],
        axis=-1)

    # screen bound boxes. A triangle is screen-boundable iff all three
    # corners have w comfortably > 0; otherwise its projection is
    # unbounded -> the owning cluster gets a full-screen box.
    bounded = valid
    for w in W_:
        bounded = bounded & (w > _W_EPS)
    unbnd_tri = valid & ~bounded
    big = jnp.float32(1.0e8)

    def tri_minmax(vals_over_corners, lo):
        # vals: list of [C1p,K1]; per-cluster reduce with masks
        m = None
        for v in vals_over_corners:
            vv = jnp.where(bounded, v, big if lo else -big)
            m = vv if m is None else (jnp.minimum(m, vv) if lo
                                      else jnp.maximum(m, vv))
        return (jnp.min(m, axis=1) if lo else jnp.max(m, axis=1))  # [C1p]

    sx = [X[i] / jnp.maximum(W_[i], _W_EPS) for i in range(3)]
    sy = [Y[i] / jnp.maximum(W_[i], _W_EPS) for i in range(3)]
    sz = [Z[i] / jnp.maximum(W_[i], _W_EPS) for i in range(3)]
    lo_x, hi_x = tri_minmax(sx, True), tri_minmax(sx, False)
    lo_y, hi_y = tri_minmax(sy, True), tri_minmax(sy, False)
    lo_z, hi_z = tri_minmax(sz, True), tri_minmax(sz, False)
    any_unbnd = jnp.any(unbnd_tri, axis=1)                     # [C1p]
    any_tri = jnp.any(valid, axis=1)
    lo_x = jnp.where(any_unbnd, -big, lo_x)
    lo_y = jnp.where(any_unbnd, -big, lo_y)
    lo_z = jnp.where(any_unbnd, 0.0, jnp.maximum(lo_z, 0.0))
    hi_x = jnp.where(any_unbnd, big, hi_x)
    hi_y = jnp.where(any_unbnd, big, hi_y)
    hi_z = jnp.where(any_unbnd, big, hi_z)
    empty = ~any_tri
    lo_x = jnp.where(empty, big, lo_x)     # empty boxes never overlap
    lo_y = jnp.where(empty, big, lo_y)
    lo_z = jnp.where(empty, big, lo_z)
    hi_x = jnp.where(empty, -big, hi_x)
    hi_y = jnp.where(empty, -big, hi_y)
    hi_z = jnp.where(empty, -big, hi_z)

    n_sc = tree.num_superclusters
    c2p = tree.sc_boxes.shape[1]

    def to_clb(v):
        return v.reshape(n_sc, K2)

    clb = jnp.stack([to_clb(lo_x), to_clb(lo_y), to_clb(lo_z),
                     to_clb(hi_x), to_clb(hi_y), to_clb(hi_z),
                     jnp.zeros((n_sc, K2), jnp.float32),
                     jnp.zeros((n_sc, K2), jnp.float32)], axis=1)
    sc_lo = [jnp.min(to_clb(v), axis=1) for v in (lo_x, lo_y, lo_z)]
    sc_hi = [jnp.max(to_clb(v), axis=1) for v in (hi_x, hi_y, hi_z)]
    pad = c2p - n_sc
    scb = jnp.stack(
        [jnp.concatenate([v, jnp.full((pad,), big, jnp.float32)])
         for v in sc_lo]
        + [jnp.concatenate([v, jnp.full((pad,), -big, jnp.float32)])
           for v in sc_hi]
        + [jnp.zeros((c2p,), jnp.float32)] * 2, axis=0)
    return setup, scb, clb


def _raster_kernel(order_ref, sc_ref, cl_ref, px_ref, py_ref, zfl_ref,
                   setup_hbm,
                   # outputs
                   z_out, slot_out, u_out, v_out, m_out,
                   # scratch
                   tris, sem, gated, tlb, started, nlist, sc_mask, bzmax,
                   z_s, slot_s, u_s, v_s, m_s,
                   *, n_sc: int, ablate: str = ""):
    R = px_ref.shape[-1]
    NBUF = sem.shape[0]
    K1 = tris.shape[1]

    px = px_ref[0]                      # [1,R] pixel-center x (screen)
    py = py_ref[0]
    zfl = zfl_ref[0]                    # per-pixel z floor; +1e9 = parked

    live0 = zfl < _ZFAR_PARK
    z_s[:] = jnp.where(live0, _ZFAR_PARK, -_ZFAR_PARK)
    slot_s[:] = jnp.full((1, R), -1, jnp.int32)
    u_s[:] = jnp.zeros((1, R), jnp.float32)
    v_s[:] = jnp.zeros((1, R), jnp.float32)
    m_s[:] = jnp.zeros((1, R), jnp.float32)
    bzmax[0] = jnp.max(z_s[:])
    nlist[0] = 0

    # block screen bounds (pixel-center extremes)
    bxmin, bxmax = jnp.min(px), jnp.max(px)
    bymin, bymax = jnp.min(py), jnp.max(py)

    def box_overlap(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z):
        """[L,1] screen boxes vs the block rectangle + depth prune."""
        ov = ((lo_x <= bxmax) & (hi_x >= bxmin)
              & (lo_y <= bymax) & (hi_y >= bymin)
              & (lo_z < bzmax[0]))
        return ov, lo_z

    def tri_block(slot, base_slot):
        """Edge-function coverage + depth-min commit of pipeline buffer
        `slot` against the block's pixels (tris on sublanes, pixels on
        lanes — [K1,R], same sweep orientation as the trace kernel)."""
        chunk = tris[slot]
        b0 = chunk[:, 0:1] * px + chunk[:, 1:2] * py + chunk[:, 2:3]
        b1 = chunk[:, 3:4] * px + chunk[:, 4:5] * py + chunk[:, 5:6]
        b2 = chunk[:, 6:7] * px + chunk[:, 7:8] * py + chunk[:, 8:9]
        sumb = b0 + b1 + b2          # = 1/w_pixel scaled; > 0 in front
        zz = (b0 * chunk[:, 9:10] + b1 * chunk[:, 10:11]
              + b2 * chunk[:, 11:12])
        cover = ((b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (sumb > 0)
                 & (zz >= 0.0) & (zz <= 1.0) & (zz > zfl))
        zm = jnp.min(jnp.where(cover, zz, _INF), axis=0, keepdims=True)
        better = zm < z_s[:]

        @pl.when(jnp.any(better))
        def _():
            subl = jax.lax.broadcasted_iota(jnp.int32, (K1, R), 0)
            eq = cover & (zz == zm)
            tri_sel = jnp.min(jnp.where(eq, subl, K1), axis=0, keepdims=True)
            onehot = subl == tri_sel
            uw = (b0 * chunk[:, 12:13] + b1 * chunk[:, 14:15]
                  + b2 * chunk[:, 16:17])
            vw = (b0 * chunk[:, 13:14] + b1 * chunk[:, 15:16]
                  + b2 * chunk[:, 17:18])
            u_sel = jnp.sum(jnp.where(onehot, uw, 0.0), axis=0, keepdims=True)
            v_sel = jnp.sum(jnp.where(onehot, vw, 0.0), axis=0, keepdims=True)
            s_sel = jnp.sum(jnp.where(onehot, sumb, 0.0), axis=0,
                            keepdims=True)
            m_sel = jnp.sum(jnp.where(onehot, chunk[:, 18:19], 0.0),
                            axis=0, keepdims=True)
            s_safe = jnp.where(s_sel > 0, s_sel, 1.0)
            z_s[:] = jnp.where(better, zm, z_s[:])
            bzmax[0] = jnp.max(z_s[:])
            slot_s[:] = jnp.where(better, base_slot * K1 + tri_sel,
                                  slot_s[:])
            u_s[:] = jnp.where(better, u_sel / s_safe, u_s[:])
            v_s[:] = jnp.where(better, v_sel / s_safe, v_s[:])
            m_s[:] = jnp.where(better, m_sel, m_s[:])

    # supercluster screen-overlap bitmask (SMEM words, any scene size)
    scb = jnp.swapaxes(sc_ref[:], 0, 1)          # [C2p, 8]
    sc_hits, _ = box_overlap(scb[:, 0:1], scb[:, 1:2], scb[:, 2:3],
                             scb[:, 3:4], scb[:, 4:5], scb[:, 5:6])
    sc_sub = jax.lax.broadcasted_iota(jnp.int32, sc_hits.shape, 0)
    sc_w = jnp.left_shift(jnp.int32(1), sc_sub & 31)
    for w in range(sc_mask.shape[0]):
        in_word = (sc_sub >= w * 32) & (sc_sub < (w + 1) * 32)
        sc_mask[w] = jnp.sum(jnp.where(sc_hits & in_word, sc_w, 0))

    def test_sc(s):
        word = sc_mask[jax.lax.shift_right_logical(s, 5)]
        return (jax.lax.shift_right_logical(word, s & 31) & 1) == 1

    def ctz32(low):
        # branchless scalar ctz of a power of two (see rt/dense.py)
        c = jnp.int32(0)
        for shift in (16, 8, 4, 2, 1):
            mask = (jnp.int32(1) << shift) - 1
            z = (low & mask) == 0
            c = c + jnp.where(z, shift, 0)
            low = jnp.where(z, jax.lax.shift_right_logical(low, shift), low)
        return c

    cl_sub = jax.lax.broadcasted_iota(jnp.int32, (K2, 1), 0)

    def pre_body(k, _):
        s = order_ref[0, 0, k]

        @pl.when((s >= 0) & test_sc(s))
        def _():
            cb = jnp.swapaxes(cl_ref[s], 0, 1)   # [K2, 8]
            good, entry = box_overlap(cb[:, 0:1], cb[:, 1:2], cb[:, 2:3],
                                      cb[:, 3:4], cb[:, 4:5], cb[:, 5:6])
            w_bits = jnp.left_shift(jnp.int32(1), cl_sub & 31)
            cl_lo = jnp.sum(jnp.where(good & (cl_sub < 32), w_bits, 0))
            cl_hi = jnp.sum(jnp.where(good & (cl_sub >= 32), w_bits, 0))

            def word_emit(word_base, mask0):
                def body(m):
                    c = ctz32(m & (-m)) + word_base
                    cnt = nlist[0]
                    gated[cnt] = s * K2 + c
                    tlb[cnt] = jnp.sum(jnp.where(cl_sub == c, entry, 0.0))
                    nlist[0] = cnt + 1
                    return m & (m - 1)

                jax.lax.while_loop(lambda m: m != 0, body, mask0)

            word_emit(0, cl_lo)
            word_emit(32, cl_hi)
        return 0

    jax.lax.fori_loop(0, n_sc, pre_body, 0)
    count = nlist[0]

    # nearest-first (smallest screen zmin) — streamed front-to-back this
    # is the hierarchical early-z: opaque near surfaces shrink bzmax and
    # prune far clusters before their DMA is issued
    def ins_body(i, _):
        key_t = tlb[i]
        key_g = gated[i]

        def shift_cond(j):
            return jnp.logical_and(j > 0, tlb[j - 1] > key_t)

        def shift_body(j):
            tlb[j] = tlb[j - 1]
            gated[j] = gated[j - 1]
            return j - 1

        j = jax.lax.while_loop(shift_cond, shift_body, i)
        tlb[j] = key_t
        gated[j] = key_g
        return 0

    jax.lax.fori_loop(1, count, ins_body, 0)

    def cluster_dma(i, slot):
        return pltpu.make_async_copy(setup_hbm.at[gated[i]], tris.at[slot],
                                     sem.at[slot])

    for j in range(NBUF - 1):
        @pl.when(j < count)
        def _(j=j):
            started[j] = 1
            cluster_dma(j, j % NBUF).start()

    def cl_body(i, _):
        j = i + NBUF - 1

        @pl.when(j < count)
        def _():
            go = tlb[j] < bzmax[0]
            started[j] = go.astype(jnp.int32)

            @pl.when(go)
            def _():
                cluster_dma(j, jax.lax.rem(j, NBUF)).start()

        @pl.when(started[i] == 1)
        def _():
            slot = jax.lax.rem(i, NBUF)
            cluster_dma(i, slot).wait()

            @pl.when(tlb[i] < bzmax[0])
            def _():
                if ablate != "nosweep":
                    tri_block(slot, gated[i])
        return 0

    jax.lax.fori_loop(0, count, cl_body, 0)

    z_out[0] = z_s[:]
    slot_out[0] = slot_s[:]
    u_out[0] = u_s[:]
    v_out[0] = v_s[:]
    m_out[0] = m_s[:]


@functools.partial(jax.jit, static_argnames=("block", "interpret", "ablate"))
def raster_edge(setup, scb, clb, px, py, zfloor, *, block: int = 512,
                interpret: bool = False, ablate: str = ""):
    """Rasterize the setup slabs over lane-major pixel blocks.

    px/py: f32[Nb,128] pixel-center screen coords (the engine's tiled
    layout); zfloor: f32[Nb,128] per-pixel NDC depth floor — fragments
    must be strictly beyond it (0 for the first pass; the committed
    depth of a discarded fragment on alpha-kill continuation rounds;
    >= 1e9 parks the pixel). Returns (z, slot, u, v, mat) all [Nb,128];
    slot = -1 where nothing covered (background), else a global triangle
    slot (tree.leaf_tri maps to original ids). u/v are perspective-
    correct texture coordinates, mat the material slot id.
    """
    nb = px.shape[0]
    LANES = 128
    N = nb * LANES
    assert N % block == 0
    n_sc = clb.shape[0]
    c2p = scb.shape[1]
    k1 = setup.shape[1]
    NBUF = 4
    maxc = setup.shape[0]
    nblocks = N // block

    # global front-to-back supercluster order by screen zmin (cheap XLA
    # prologue; view-dependent but not block-dependent)
    key = jnp.where(scb[2, :n_sc] < scb[5, :n_sc], scb[2, :n_sc], jnp.inf)
    sc_order = jnp.argsort(key).astype(jnp.int32)
    order_w = -(-n_sc // 64) * 64
    sc_order = jnp.concatenate(
        [sc_order, jnp.full((order_w - n_sc,), -1, jnp.int32)]
    ).reshape(1, 1, order_w)

    kernel = functools.partial(_raster_kernel, n_sc=n_sc, ablate=ablate)
    px_k = px.reshape(nblocks, 1, block)
    py_k = py.reshape(nblocks, 1, block)
    zf_k = zfloor.reshape(nblocks, 1, block)
    out_shape = [
        jax.ShapeDtypeStruct((nblocks, 1, block), jnp.float32),   # z
        jax.ShapeDtypeStruct((nblocks, 1, block), jnp.int32),     # slot
        jax.ShapeDtypeStruct((nblocks, 1, block), jnp.float32),   # u
        jax.ShapeDtypeStruct((nblocks, 1, block), jnp.float32),   # v
        jax.ShapeDtypeStruct((nblocks, 1, block), jnp.float32),   # mat
    ]
    blockspec = pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    z, slot, u, v, m = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1, order_w), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, c2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sc, 8, K2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            blockspec, blockspec, blockspec,
            pl.BlockSpec(memory_space=pl.ANY),      # setup stays in HBM
        ],
        out_specs=[blockspec] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NBUF, k1, ROWS), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SMEM((maxc,), jnp.int32),
            pltpu.SMEM((maxc,), jnp.float32),
            pltpu.SMEM((maxc,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((order_w // 32,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.int32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.float32),
        ],
        interpret=interpret,
    )(sc_order, scb, clb, px_k, py_k, zf_k, setup)

    z = z.reshape(nb, LANES)
    slot = slot.reshape(nb, LANES)
    miss = slot < 0
    return (jnp.where(miss, jnp.inf, z), slot,
            u.reshape(nb, LANES), v.reshape(nb, LANES),
            m.reshape(nb, LANES).astype(jnp.int32))
