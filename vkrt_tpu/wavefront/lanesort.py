"""Block-local per-ray partition (Pallas) — the lane half of the
two-level wavefront repartition.

Why this shape (every alternative is a measured post-mortem):

  * A GLOBAL ray-granular sort is what the dirsort sims want (0.40x
    shadow_d0 / 0.13-0.28x shadow_d1 / 0.51x closest_d1 total sweeps),
    but XLA permutations cost ~420 ms/frame at 1080p (~30M scatter- or
    gather-rows/s ceiling — ROADMAP.md resort post-mortem), and a
    cross-block Pallas permutation cannot DMA the variable-length
    bucket segments a stable partition produces: HBM DMA slices must be
    128-aligned on the lane dim (CLAUDE.md), and reading whole source
    slabs per destination block multiplies traffic by the bucket count
    (16x the pack kernel's measured ~12GB/s round trip — hundreds of
    ms). So the exact global partition is hardware-blocked, not merely
    unbuilt.
  * The GROUP (128-lane) resort moves whole lanes-rows cheaply
    (~1 ms/array jnp.take) but round-4 hardware showed a group-level
    key cannot see intra-group spread: raw 8x16 camera subtiles mix
    foreground+background surface points, so group means are mush
    (shadow_d0 146.1 -> 167.1 LOSES; only the already-packed shadow_d1
    won, +7 ms).

This module supplies the missing granularity WITHOUT cross-block data
movement: a stable in-block sort of each trace block's rays by an
arbitrary integer key. After it, every 128-lane group is a
key-contiguous run — foreground and background rays land in different
groups — so the group-level partition's key is finally meaningful, and
the composition (lane sort -> group partition) approximates the global
sort at group granularity: final blocks hold 8 coherent sub-cones drawn
from anywhere in the frame instead of 1024 arbitrary rays. Dead rays
carry the max key, sort to each block's lane-tail, and form all-dead
groups the group stage parks at the wavefront's tail — occupancy
compaction and coherence sorting in one mechanism.

Kernel construction (only hardware-proven primitives, wavefront/pack.py
lineage):

  rank_j = #{j' in block : k_j' < k_j}
         + #{j' <= j     : k_j' == k_j} - 1          (stable, unique)

  computed per 128-lane group as [R,128] compare matrices against the
  block's key column ([R,1], built from the Mosaic-legal per-group
  (1,128)->(128,1) transposes stored segment-wise), reduced over
  sublanes. The permutation applies as one-hot MXU matmuls at
  precision=HIGHEST (exact for f32 payloads — the pack.py argument,
  verified bit-exact on hardware): acc[c, :] += x[c, src_g] · P_g with
  P_g[src, dst] = (rank[src] == dst). The inverse kernel mirrors it
  with M_g[dst, src] = (dst == rank[src]) — no transposes at all.

No scatters, no dynamic DMA, standard BlockSpec I/O; cost is one HBM
round trip of the channel slab + ~6 GVPU-ops + ~17 GMAC per 1080p
wavefront (hardware rows: tools/r5_hw_queue.py).

Replaces the ray-coherence scheduling the reference's GPU performs
implicitly in hardware (warp regrouping inside vkCmdTraceRaysKHR,
ref: src/Raytracer.cpp:157; SBT dispatch ref: src/Raytracer.cpp:
1469-1529); the north-star contract "rays sorted by material/direction
between rounds" (SURVEY.md §7 layer 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_HIGH = jax.lax.Precision.HIGHEST


def _sl(g):
    return slice(g * LANES, (g + 1) * LANES)


def _lane_sort_kernel(in_ref, out_ref, kt_ref, *, cp: int, R: int):
    """One block: stable-sort lanes by the key channel (cp-1).

    out channels 0..cp-2: permuted payload; channel cp-1: the RANK of
    each lane in ORIGINAL order (the inverse kernel's input)."""
    G = R // LANES

    # key column [R,1] from per-group (1,128)->(128,1) transposes,
    # stored segment-wise (vector concat across sublane offsets is a
    # Mosaic error — CLAUDE.md)
    for g in range(G):
        kg = in_ref[0, cp - 1:cp, _sl(g)]              # [1,128] fresh
        kt_ref[_sl(g), :] = jnp.transpose(kg)
    ktall = kt_ref[...]                                 # [R,1]

    # stable ranks per group: [R,128] compares reduced over sublanes
    ranks = []
    for g in range(G):
        kg = in_ref[0, cp - 1:cp, _sl(g)]              # [1,128] fresh
        lt = jnp.where(ktall < kg, 1.0, 0.0)           # [R,128]
        src = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        dst = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1) \
            + jnp.int32(g * LANES)
        eqle = jnp.where((ktall == kg) & (src <= dst), 1.0, 0.0)
        rank_g = jnp.sum(lt + eqle, axis=0, keepdims=True) - 1.0
        ranks.append(rank_g)                            # [1,128]
    # kt_ref reused as the rank column [R,1] (ktall was materialized
    # as a value above, so overwriting the ref is safe)
    for g in range(G):
        kt_ref[_sl(g), :] = jnp.transpose(ranks[g])

    # apply the permutation: one-hot MXU, exact at HIGHEST for f32
    acc = jnp.zeros((1, cp, R), jnp.float32)
    for g in range(G):
        rt = kt_ref[_sl(g), :].astype(jnp.int32)        # [128,1] fresh
        p_g = jnp.where(
            rt == jax.lax.broadcasted_iota(jnp.int32, (LANES, R), 1),
            1.0, 0.0)                                   # [128 src, R dst]
        xg = in_ref[0, :, _sl(g)]                       # [cp,128] fresh
        acc = acc + jax.lax.dot_general(
            xg, p_g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HIGH)[None]
    out_ref[...] = acc
    # rank channel in ORIGINAL lane order (overwrites permuted key)
    for g in range(G):
        out_ref[0, cp - 1:cp, _sl(g)] = ranks[g]


def lane_sort(channels, key, *, block: int, interpret: bool = False):
    """Stable in-block sort of lane-major channels by an integer key.

    channels: list of f32[Nb,128]; key i32/f32 [Nb,128], values exact in
    f32 (< 2**24); larger keys sort later — give dead rays the max key.
    Returns (sorted channel list, rank f32[Nb,128] in ORIGINAL order —
    feed to lane_unsort to invert)."""
    nb, lanes = key.shape
    n = nb * lanes
    nbk = n // block
    C = len(channels)
    cp = -(-(C + 1) // 8) * 8
    state = jnp.stack(list(channels)
                      + [jnp.zeros_like(key, dtype=jnp.float32)]
                      * (cp - 1 - C)
                      + [key.astype(jnp.float32)], axis=0)
    state = state.reshape(cp, nbk, block).transpose(1, 0, 2)

    out = pl.pallas_call(
        functools.partial(_lane_sort_kernel, cp=cp, R=block),
        grid=(nbk,),
        in_specs=[pl.BlockSpec((1, cp, block), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, cp, block), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbk, cp, block), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, 1), jnp.float32)],
        interpret=interpret,
    )(state)
    chans = [out[:, c, :].reshape(nb, lanes) for c in range(C)]
    rank = out[:, cp - 1, :].reshape(nb, lanes)
    return chans, rank


def _lane_unsort_kernel(rank_ref, res_ref, out_ref, *, ns: int, R: int):
    """Inverse in-block permutation of per-ray results.

    out[:, j] = res[:, rank[j]] — M_g[dst, src128] = (dst == rank[src]),
    contracted on the MXU; rank broadcasts over sublanes, no transposes."""
    G = R // LANES
    res = res_ref[0]                                    # [ns, R]
    for g in range(G):
        rg = rank_ref[0, 0, 0:1, _sl(g)].astype(jnp.int32)  # [1,128] fresh
        m_g = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) == rg,
            1.0, 0.0)                                   # [R dst, 128 src]
        out_ref[0, :, _sl(g)] = jax.lax.dot_general(
            res, m_g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGH)


def lane_unsort(results, rank, *, block: int, interpret: bool = False):
    """Invert lane_sort on per-ray RESULTS of the sorted dispatch.

    results f32[ns, Nb, 128] in sorted order, rank from lane_sort →
    f32[ns, Nb, 128] in original order."""
    ns, nb, lanes = results.shape
    n = nb * lanes
    nbk = n // block
    res = results.reshape(ns, nbk, block).transpose(1, 0, 2)
    rk = rank.reshape(1, nbk, 1, block).transpose(1, 0, 2, 3)
    nsp = -(-ns // 8) * 8
    if nsp != ns:
        res = jnp.concatenate(
            [res, jnp.zeros((nbk, nsp - ns, block), jnp.float32)], axis=1)

    out = pl.pallas_call(
        functools.partial(_lane_unsort_kernel, ns=nsp, R=block),
        grid=(nbk,),
        in_specs=[
            pl.BlockSpec((1, 1, 1, block), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsp, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nsp, block), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbk, nsp, block), jnp.float32),
        interpret=interpret,
    )(rk, res)
    return jnp.stack([out[:, s, :].reshape(nb, lanes) for s in range(ns)])


def cell_key_fine(p, live, scene_aabb, bits: int = 6):
    """Per-ray Morton cell key of a surface point at `bits` bits/axis
    (the lane sort has no bucket-count limit — compares, not
    histograms — so the key can be much finer than the radix resort's
    3 bits/axis). Dead rays get the max key (sorted to lane-tails →
    all-dead groups → the group stage parks them at the wavefront
    tail). p [3,Nb,128], live bool[Nb,128], scene_aabb f32[2,3] →
    i32[Nb,128], values < 2**(3*bits)+1 (exact in f32 for bits <= 7)."""
    nbins = (1 << bits) - 1
    lo = scene_aabb[0]
    span = jnp.maximum(scene_aabb[1] - scene_aabb[0], 1e-6)
    key = jnp.zeros(p.shape[1:], jnp.int32)
    for a in range(3):
        q = jnp.clip((p[a] - lo[a]) / span[a] * (nbins + 1),
                     0.0, float(nbins)).astype(jnp.int32)
        for b in range(bits):
            key = key | (((q >> b) & 1) << (3 * b + a))
    return jnp.where(live, key, 1 << (3 * bits))


def dir_cell_key_fine(d, o, live, scene_aabb, bits: int = 5):
    """Direction-octant (major) + origin Morton cell (minor) per-ray key
    for reflection wavefronts — the ray-granular form of
    resort.group_dir_key. i32[Nb,128] < 2**(3*bits+3)+1 (bits <= 6 stays
    f32-exact)."""
    oct_ = ((d[0] < 0).astype(jnp.int32)
            | ((d[1] < 0).astype(jnp.int32) << 1)
            | ((d[2] < 0).astype(jnp.int32) << 2))
    nbins = (1 << bits) - 1
    lo = scene_aabb[0]
    span = jnp.maximum(scene_aabb[1] - scene_aabb[0], 1e-6)
    cell = jnp.zeros(d.shape[1:], jnp.int32)
    for a in range(3):
        q = jnp.clip((o[a] - lo[a]) / span[a] * (nbins + 1),
                     0.0, float(nbins)).astype(jnp.int32)
        for b in range(bits):
            cell = cell | (((q >> b) & 1) << (3 * b + a))
    key = (oct_ << (3 * bits)) | cell
    return jnp.where(live, key, 1 << (3 * bits + 3))
