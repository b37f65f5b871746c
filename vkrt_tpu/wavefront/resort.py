"""Depth>=1 wavefront re-tiling: stable radix-partition permutations.

Secondary dispatches (reflection closest, depth-1 shadows) run at ~25%
occupancy with wide per-block ray cones — each live block sweeps ~42
clusters vs ~8 for coherent camera tiles. Block- and row-granular
compaction are measured dead ends (the cost is the cone, not dead-ray
overhead — tools/block_compact_probe.py); re-SORTING live rays into
spatially coherent blocks attacks the cone itself. Simulated on real
wavefront state (tools/dirsort_sim.py / dirsort_sim2.py): full Morton
sorts cut total gated-cluster sweeps to 0.51x (closest_d1) and
0.13-0.24x (shadow_d1).

The permutation is built WITHOUT lax.sort: jnp.argsort fused into the
frame jit is a measured ~400s-remote-compile landmine (CLAUDE.md), and
the keys here are tiny (4-10 bits). A stable LSD radix partition needs
one cumsum + one scatter per key bit — compile-friendly and O(N) —
and stability matters: within a bucket the pre-sort order is the
camera-tile order, so octant-only keys inherit origin coherence for
free (the sim's dir+org result).

Used LOCALLY around a dispatch: permute the inputs, trace, apply the
inverse permutation to the outputs. Occlusion is a per-ray ANY —
blocked masks are exactly visit-order independent (CI-pinned
bit-equal). Closest hit is a per-ray MIN, order-independent up to
NEAR-TIE commits: when two triangles intersect within the commit
comparison's float rounding (shared edges, coincident surfaces), the
cluster visit order — which depends on block composition — picks the
winner, so t can differ by ~1 ulp and the attribute winner can flip
between equally valid intersections (measured: ≤4.2e-7 frame diff on
a rotated rebuild with coincident synthetic geometry; 0 on the static
scene). Frames with reflections are therefore asserted allclose
(atol 1e-5), shadow-only frames bit-equal.

Replaces the ray-sorting stage the reference's GPU scheduler performs
implicitly in hardware (warp coherence of vkCmdTraceRaysKHR,
ref: src/Raytracer.cpp:157); the north-star contract ("rays sorted by
material/direction between rounds", SURVEY.md §7 layer 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def radix_partition_perm(key: jax.Array, nbits: int) -> jax.Array:
    """Stable ascending permutation of small integer keys.

    key: i32[N] in [0, 2**nbits). Returns perm i32[N] with key[perm]
    stably sorted — nbits passes of cumsum + unique-index scatter.
    """
    n = key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    perm = iota
    key = key.astype(jnp.int32)
    k = key
    for b in range(nbits):
        bit = jax.lax.shift_right_logical(k, b) & 1
        ones = jnp.cumsum(bit)                     # inclusive 1-count
        total0 = n - ones[-1]
        zeros = iota + 1 - ones                    # inclusive 0-count
        pos = jnp.where(bit == 0, zeros - 1, total0 + ones - 1)
        perm = jnp.zeros_like(perm).at[pos].set(perm, unique_indices=True)
        # current-order keys by GATHER from the original array (gathers
        # are the fast path on TPU; one scatter per pass, not two)
        k = key[perm]
    return perm


def inverse_permutation(perm: jax.Array) -> jax.Array:
    n = perm.shape[0]
    return jnp.zeros_like(perm).at[perm].set(
        jnp.arange(n, dtype=perm.dtype), unique_indices=True)


def permute_rays(arr: jax.Array, perm: jax.Array) -> jax.Array:
    """Apply a ray permutation to a lane-major array [..., Nb, 128]."""
    flat = arr.reshape(arr.shape[:-2] + (-1,))
    return jnp.take(flat, perm, axis=-1).reshape(arr.shape)


def octant_key(d: jax.Array, live: jax.Array) -> jax.Array:
    """Direction-octant key (live rays 0-7, dead 8 → sorted to the
    tail where all-dead blocks park at one box sweep). d [3,Nb,128],
    live bool[Nb,128] → i32[N]. 4-bit radix."""
    dx = (d[0] < 0).astype(jnp.int32)
    dy = (d[1] < 0).astype(jnp.int32)
    dz = (d[2] < 0).astype(jnp.int32)
    k = dx | (dy << 1) | (dz << 2)
    return jnp.where(live, k, 8).reshape(-1)


OCTANT_BITS = 4

CELL_BITS_PER_AXIS = 3
CELL_KEY_BITS = 3 * CELL_BITS_PER_AXIS + 1        # + dead-tail bit


def cell_key(p: jax.Array, live: jax.Array, scene_aabb: jax.Array
             ) -> jax.Array:
    """Morton cell key of a surface point (3 bits/axis within the scene
    AABB; dead rays → 512, the tail bucket). p [3,Nb,128], live
    bool[Nb,128], scene_aabb f32[2,3] (a backend field — passed in, not
    reduced in-jit: tiny-output reductions are a measured ~150s-compile
    landmine). 10-bit radix."""
    nbins = (1 << CELL_BITS_PER_AXIS) - 1
    lo = scene_aabb[0]
    span = jnp.maximum(scene_aabb[1] - scene_aabb[0], 1e-6)
    key = jnp.zeros(p.shape[1] * p.shape[2], jnp.int32)
    for a in range(3):
        q = jnp.clip((p[a].reshape(-1) - lo[a]) / span[a] * (nbins + 1),
                     0.0, float(nbins)).astype(jnp.int32)
        for b in range(CELL_BITS_PER_AXIS):
            key = key | (((q >> b) & 1) << (3 * b + a))
    return jnp.where(live.reshape(-1), key, 1 << (3 * CELL_BITS_PER_AXIS))


# ---------------------------------------------------------------------------
# GROUP (128-lane) granularity resort — round 4.
#
# The ray-granular resort above is hardware-dead: its permutations move
# 2M rows through XLA's ~30M scatter-rows/s ceiling (~420 ms/frame,
# ROADMAP.md). Permutation cost is per-ROW, not per-byte — so permuting
# whole 128-lane GROUPS (the engine's 8x16-pixel subtiles) is 128x fewer
# rows: one jnp.take of [..., Nb, 128] along Nb (~16k rows at 1080p)
# costs ~1 ms/array. Groups keep their internal camera-tile coherence;
# sorting makes the 8 groups sharing a 1024-ray dispatch block have
# SIMILAR keys (a tight block cone) instead of being adjacent screen
# subtiles whose surface points span foreground + background.
# Sim (tools/r4_chunksort_sim.py, real wavefront state) quantifies how
# much of the ray-level win survives; hardware rows in tools/r4_hw_queue.
# ---------------------------------------------------------------------------

GROUP_CELL_BITS_PER_AXIS = 4
GROUP_CELL_KEY_BITS = 3 * GROUP_CELL_BITS_PER_AXIS + 1   # + dead-tail bit
GROUP_DIR_KEY_BITS = 3 + 3 * GROUP_CELL_BITS_PER_AXIS + 1


def group_live_mean3(p: jax.Array, live: jax.Array):
    """Per-group live-ray mean of a lane-major vector.

    p [3,Nb,128], live bool[Nb,128] → (mean f32[3,Nb], any bool[Nb]).
    [Nb]-sized reduction outputs are compile-safe (the ~150s landmine is
    reductions to TINY outputs like [3] — CLAUDE.md)."""
    cnt = jnp.maximum(jnp.sum(live.astype(jnp.float32), axis=-1), 1.0)
    s = jnp.sum(jnp.where(live[None], p, 0.0), axis=-1)      # [3, Nb]
    return s / cnt[None], jnp.any(live, axis=-1)


def _quant_cell(mean: jax.Array, scene_aabb: jax.Array, bits: int):
    """Morton-interleave a [3,Nb] point into 3*bits-bit cells."""
    nbins = (1 << bits) - 1
    lo = scene_aabb[0]
    span = jnp.maximum(scene_aabb[1] - scene_aabb[0], 1e-6)
    key = jnp.zeros(mean.shape[1], jnp.int32)
    for a in range(3):
        q = jnp.clip((mean[a] - lo[a]) / span[a] * (nbins + 1),
                     0.0, float(nbins)).astype(jnp.int32)
        for b in range(bits):
            key = key | (((q >> b) & 1) << (3 * b + a))
    return key


def group_cell_key(p: jax.Array, live: jax.Array, scene_aabb: jax.Array
                   ) -> jax.Array:
    """Per-group Morton cell of the mean live surface point; all-dead
    groups → the tail bucket. p [3,Nb,128], live bool[Nb,128] → i32[Nb].
    GROUP_CELL_KEY_BITS-bit radix."""
    mean, anyl = group_live_mean3(p, live)
    key = _quant_cell(mean, scene_aabb, GROUP_CELL_BITS_PER_AXIS)
    return jnp.where(anyl, key, 1 << (3 * GROUP_CELL_BITS_PER_AXIS))


def group_dir_key(d: jax.Array, o: jax.Array, live: jax.Array,
                  scene_aabb: jax.Array) -> jax.Array:
    """Per-group mean-direction octant (major) + mean-origin Morton cell
    (minor); all-dead groups → the tail bucket. GROUP_DIR_KEY_BITS-bit
    radix. Stability of the radix partition keeps camera-tile order
    within a bucket (the dirsort sims' dir+org result)."""
    md, anyl = group_live_mean3(d, live)
    mo, _ = group_live_mean3(o, live)
    oct_ = ((md[0] < 0).astype(jnp.int32)
            | ((md[1] < 0).astype(jnp.int32) << 1)
            | ((md[2] < 0).astype(jnp.int32) << 2))
    cell = _quant_cell(mo, scene_aabb, GROUP_CELL_BITS_PER_AXIS)
    key = (oct_ << (3 * GROUP_CELL_BITS_PER_AXIS)) | cell
    return jnp.where(anyl, key, 1 << (3 * GROUP_CELL_BITS_PER_AXIS + 3))


def permute_groups(arr: jax.Array, perm: jax.Array) -> jax.Array:
    """Apply a GROUP permutation to a lane-major array [..., Nb, 128]
    (whole 128-lane rows move; lane order inside a group is untouched)."""
    return jnp.take(arr, perm, axis=-2)
