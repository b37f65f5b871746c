"""Wavefront frame engine — replaces rgen recursion + SBT dispatch.

The reference's per-pixel bounce loop with nested shadow traces
(shaders/shader.rgen:49-74, shader.rchit:119-152) becomes flat wavefront
rounds over the whole frame:

  ray gen → closest-hit trace (+fused attribute select) → shade →
  shadow occlusion traces (one batch per light) → reflection carry →
  repeat up to max_depth → framebuffer

Shader-binding-table dispatch (ref: src/Raytracer.cpp:1469-1529) reduces
to the trace-mode flag: closest-hit vs occlusion — the miss "shaders"
(sky / not-shadowed) are where-selects on the miss mask.

All per-ray state is LANE-MAJOR (utils/layout.py: [Nb,128] scalars,
[3,Nb,128] vectors): narrow [N,1]/[N,3] arrays pad 42-128x under TPU
(8,128) tiling — measured as gigabytes of padding and the dominant
bandwidth cost of a frame before this layout.

Rays are reordered into spatially coherent tiles (ty×tx pixels = one
trace block) before tracing — the dense kernel's block-level skipping
depends on it — and scattered back at the end. Dead rays park at a far
sentinel origin so their blocks gate off cheaply.

Two trace backends share the engine:
  'dense'     — Pallas cluster-streaming kernel (production TPU path)
  'reference' — XLA gather-based LBVH traversal (runs anywhere; the
                on-device correctness reference and CPU test path)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.shade import shading
from vkrt_tpu.wavefront import lanesort, pack, resort
from vkrt_tpu.shade.sampling import (sample_material,
                                     sample_material_compact)
from vkrt_tpu.utils import layout as L

FAR_SENTINEL = 1.0e7
TILE_Y, TILE_X = 16, 32           # 512 pixels = one dense-kernel block


class TextureArrays(NamedTuple):
    """Packed per-material-slot triple heap (scene/textures.py
    build_material_heap): one 48-byte row per texel holds the bilinear
    quads of base/metallic-roughness/normal — one gather per hit fetches
    all three maps' footprints."""
    texels_tri: jax.Array    # u8[N,48]
    level_offset: jax.Array  # i32[M,L]
    level_width: jax.Array   # i32[M,L]
    level_height: jax.Array  # i32[M,L]


def texture_arrays(images, flat) -> TextureArrays:
    """Build device TextureArrays from model images + a FlatScene (the
    material-slot mapping is derived from the FlatScene so it agrees
    with accel/clusters.scene_attrs by construction)."""
    from vkrt_tpu.scene.textures import build_material_heap, material_slots

    triples, _ = material_slots(flat)
    heap = build_material_heap(images, triples)
    return TextureArrays(
        texels_tri=jnp.asarray(heap.texels_tri),
        level_offset=jnp.asarray(heap.level_offset),
        level_width=jnp.asarray(heap.level_width),
        level_height=jnp.asarray(heap.level_height))


def generate_rays(proj_inverse, view_inverse, width: int, height: int,
                  off=(0.5, 0.5)):
    """Camera rays (ref: shaders/shader.rgen:30-38) as [H,W] component
    grids: ((ox,oy,oz), (dx,dy,dz))."""
    xs = (jnp.arange(width, dtype=jnp.float32) + off[0]) / width * 2.0 - 1.0
    ys = (jnp.arange(height, dtype=jnp.float32) + off[1]) / height * 2.0 - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    tgt = [proj_inverse[k, 0] * gx + proj_inverse[k, 1] * gy
           + proj_inverse[k, 2] + proj_inverse[k, 3] for k in range(3)]
    n = jnp.sqrt(jnp.maximum(tgt[0] ** 2 + tgt[1] ** 2 + tgt[2] ** 2, 1e-24))
    dv = [t / n for t in tgt]
    d = [view_inverse[k, 0] * dv[0] + view_inverse[k, 1] * dv[1]
         + view_inverse[k, 2] * dv[2] for k in range(3)]
    o = [jnp.broadcast_to(view_inverse[k, 3], d[0].shape) for k in range(3)]
    return o, d


def tile(img, ty: int = TILE_Y, tx: int = TILE_X):
    """[H,W] scalar grid → [Nb,128] lane-major, tile-major ray order.

    Each 128-lane GROUP is a compact 8x16 pixel subtile (2x2 of them per
    16x32 tile = one 512-ray trace block): the dense kernel gates and
    sweeps per group, so groups must be spatially tight, not thin
    4-row strips."""
    h, w = img.shape
    x = img.reshape(h // ty, 2, ty // 2, w // tx, 2, tx // 2)
    flat = x.transpose(0, 3, 1, 4, 2, 5).reshape(-1)
    return flat.reshape(-1, L.LANES)


def untile(lanes, height: int, width: int, ty: int = TILE_Y, tx: int = TILE_X):
    """[Nb,128] → [H,W] (inverse of tile)."""
    flat = lanes.reshape(-1)
    x = flat.reshape(height // ty, width // tx, 2, 2, ty // 2, tx // 2)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(height, width)


def _pad_dims(width, height):
    return -(-width // TILE_X) * TILE_X, -(-height // TILE_Y) * TILE_Y


def _pad_grid(g, wp, hp, value):
    h, w = g.shape
    return jnp.pad(g, ((0, hp - h), (0, wp - w)), constant_values=value)


# ---------------------------------------------------------------------------
# Trace backends (lane-major I/O: o/d [3,Nb,128], tmax [Nb,128])
# ---------------------------------------------------------------------------

BLOCK = 512                       # rays per dense-kernel block (= TILE_Y*TILE_X)
# Occlusion dispatches prefer 1024-ray blocks: no per-hit state to keep,
# and halving the per-block fixed costs (prepass, work list, prologue
# row) measured 294 -> 215 ms on the 1080p 4-light shadow pass (2048
# regressed: cone too wide). Falls back to 512 when the per-light
# wavefront doesn't divide.
OCCL_BLOCK = 1024


def _occl_block(n_rays_per_section: int) -> int:
    return OCCL_BLOCK if n_rays_per_section % OCCL_BLOCK == 0 else BLOCK


def _broadcast_points(o_pts, d, block: int = BLOCK):
    """[NB,3] per-block origin points → full [3,Nb,128] origins (for
    backends without a native point-origin path)."""
    rows = block // L.LANES
    o = jnp.repeat(o_pts, rows, axis=0).T[:, :, None]      # [3, Nb, 1]
    return jnp.broadcast_to(o, d.shape)


class DenseBackend(NamedTuple):
    """Pallas cluster kernel; attributes selected inside the trace."""
    tree: object  # ClusterTree
    # f32[2,3] scene AABB (host-computed at build — in-jit reductions to
    # tiny outputs are a ~150s-compile landmine). Consumed by the
    # depth>=1 resort cell keys (wavefront/resort.py); None on backends
    # built before the field existed.
    scene_aabb: object = None

    def closest(self, o, d, tmax, interpret=False, block=BLOCK, sort=True,
                group_gate=False, pregate=False, sub_gate=False):
        from vkrt_tpu.rt.dense import trace_dense
        t, slot, u, v, attrs = trace_dense(
            self.tree, o, d, tmax, with_attributes=True, interpret=interpret,
            block=block, sort=sort, group_gate=group_gate, pregate=pregate,
            sub_gate=sub_gate)
        return t, u, v, attrs, slot >= 0

    def occluded(self, o, d, tmax, interpret=False):
        from vkrt_tpu.rt.dense import trace_dense
        _, slot, _, _ = trace_dense(self.tree, o, d, tmax, occlusion=True,
                                    interpret=interpret)
        return slot >= 0

    # point-origin occlusion: all rays of a 512-ray block share one origin
    # (shadow rays traced from the light) — o_pts is [NB, 3], consumed as
    # SMEM scalars by the kernel, so the [3,L*Nb,128] origin broadcast is
    # never materialized. (A closest-hit point variant measured 7% SLOWER
    # than broadcast — [K1,1] operands cost lane-broadcasts per use — so
    # only occlusion uses the point path.)
    def occluded_point(self, o_pts, d, tmax, interpret=False,
                       block=BLOCK):
        from vkrt_tpu.rt.dense import trace_dense
        _, slot, _, _ = trace_dense(self.tree, o_pts, d, tmax, occlusion=True,
                                    interpret=interpret, point_origin=True,
                                    block=block)
        return slot >= 0

    # all NS lights' shadow segments of a surface tile in ONE kernel
    # block: gating/work-list/DMA shared across lights, sweeps skipped
    # per (cluster, light) via a segment-set bitmask. Measured 197 vs
    # 215 ms (4-light 1080p shadow pass) over per-light dispatches.
    def occluded_multi(self, light_pts, sd, st, interpret=False,
                       block=BLOCK, sort=True, pregate=False,
                       group_gate=False, sub_gate=False):
        import os
        if os.environ.get("VKRT_NO_MULTI_OCCL"):   # bisect escape hatch
            outs = []
            for s in range(light_pts.shape[0]):
                nob = sd.shape[2] * 128 // block
                pts = jnp.broadcast_to(light_pts[s][None, :], (nob, 3))
                outs.append(self.occluded_point(pts, sd[s], st[s],
                                                interpret, block))
            return jnp.stack(outs)
        from vkrt_tpu.rt.occl_multi import occluded_multi
        return occluded_multi(self.tree, light_pts, sd, st, block=block,
                              interpret=interpret, sort=sort,
                              pregate=pregate, group_gate=group_gate,
                              sub_gate=sub_gate)


class ReferenceBackend(NamedTuple):
    """XLA LBVH traversal + post-trace attribute gather (CPU-friendly)."""
    bvh: object            # BVH2
    attr_table: jax.Array  # f32[T,36] per-triangle corner attrs (original order)
    scene_aabb: object = None  # f32[2,3]; see DenseBackend.scene_aabb

    def closest(self, o, d, tmax, interpret=False, block=BLOCK, sort=True,
                group_gate=False, pregate=False, sub_gate=False):
        from vkrt_tpu.rt.traverse import trace_closest
        of, df = L.from_cvec(o), L.from_cvec(d)
        t, tri, u, v = trace_closest(self.bvh, of, df, C.RAY_TMIN,
                                     L.from_lanes(tmax))
        attrs = self.attr_table[jnp.maximum(tri, 0)]        # [N,36]
        attrs = jnp.moveaxis(attrs.reshape(-1, L.LANES, 36), -1, 0)
        return (L.to_lanes(t), L.to_lanes(u), L.to_lanes(v), attrs,
                L.to_lanes(tri >= 0))

    def occluded(self, o, d, tmax, interpret=False):
        from vkrt_tpu.rt.traverse import trace_occluded
        occ = trace_occluded(self.bvh, L.from_cvec(o), L.from_cvec(d),
                             C.RAY_TMIN, L.from_lanes(tmax))
        return L.to_lanes(occ)

    # point-origin API parity with DenseBackend (broadcast + normal path)
    def occluded_point(self, o_pts, d, tmax, interpret=False,
                       block=BLOCK):
        return self.occluded(_broadcast_points(o_pts, d, block), d, tmax,
                             interpret)

    def occluded_multi(self, light_pts, sd, st, interpret=False,
                       block=BLOCK, sort=True, pregate=False,
                       group_gate=False, sub_gate=False):
        outs = []
        for s in range(light_pts.shape[0]):
            o = jnp.broadcast_to(light_pts[s][:, None, None], sd[s].shape)
            outs.append(self.occluded(o, sd[s], st[s], interpret))
        return jnp.stack(outs)


# ---------------------------------------------------------------------------
# The frame function (jitted once per config)
# ---------------------------------------------------------------------------

def render_frame(backend, tex: TextureArrays, proj_inverse, view_inverse,
                 lights, cfg: C.RenderConfig, interpret: bool = False):
    """Render one frame. Returns (framebuffer f32[H,W,3], rays i32[Nb,128]
    traced per pixel — summed on host for the Mrays metric)."""
    wp, hp = _pad_dims(cfg.width, cfg.height)
    origin_pt, dirs, valid = camera_ray_blocks(proj_inverse, view_inverse, cfg)
    accum, ray_count = wavefront_rounds(backend, tex, origin_pt, dirs, lights,
                                        cfg, valid=valid, interpret=interpret)
    fb = jnp.stack([untile(accum[k], hp, wp)[: cfg.height, : cfg.width]
                    for k in range(3)], axis=-1)
    return fb, ray_count


def render_frame_u8(backend, tex: TextureArrays, proj_inverse, view_inverse,
                    lights, cfg: C.RenderConfig, interpret: bool = False):
    """render_frame + ON-DEVICE UNORM8 quantization and ray-count sum.

    The production frame op: the host fetch shrinks from a 25MB f32
    image + a 2MB counter grid to 6MB u8 + one scalar — the axon tunnel
    moves ~25MB/s, so at 1080p this is ~1.1 s/frame of transfer
    (measured round 2). Quantization matches the reference's UNORM
    storage→swapchain copy (ref: src/Raytracer.cpp:159-193)."""
    fb, ray_count = render_frame(backend, tex, proj_inverse, view_inverse,
                                 lights, cfg, interpret=interpret)
    fb8 = jnp.clip(fb * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    return fb8, jnp.sum(ray_count)


def camera_ray_blocks(proj_inverse, view_inverse, cfg: C.RenderConfig):
    """Camera rays padded to tile multiples, lane-major coherent blocks.

    Returns (origin_pt f32[3] — the camera position, shared by EVERY
    primary ray, which unlocks the kernel's point-origin fast path;
    dirs f32[3,Nb,128]; valid bool[Nb,128] — False on tile-padding rays,
    which must neither trace nor count toward the Mrays metric)."""
    wp, hp = _pad_dims(cfg.width, cfg.height)
    _, d = generate_rays(proj_inverse, view_inverse, cfg.width, cfg.height)
    origin_pt = view_inverse[:3, 3]
    d = jnp.stack([tile(_pad_grid(c, wp, hp, 1.0)) for c in d])
    ones = jnp.ones((cfg.height, cfg.width), jnp.bool_)
    valid = tile(_pad_grid(ones, wp, hp, False))
    return origin_pt, L.normalize3(d), valid


def wavefront_rounds(backend, tex: TextureArrays, origin_pt, dirs, lights,
                     cfg: C.RenderConfig, valid=None,
                     interpret: bool = False):
    """The trace→shade rounds over a lane-major wavefront ([3,Nb,128]).
    Pure map over rays (scene replicated) — the unit that shards across
    chips. `origin_pt` is the camera position f32[3] (every primary ray
    shares it — the kernel's point-origin fast path); `valid` masks
    tile-padding rays, which must neither trace nor count toward the
    Mrays/s metric. Returns (accum [3,Nb,128], ray_count [Nb,128])."""
    nb = dirs.shape[1]
    shape = (nb, L.LANES)
    accum = jnp.zeros((3,) + shape, jnp.float32)
    attenuation = jnp.ones(shape, jnp.float32)
    active = (jnp.ones(shape, jnp.bool_) if valid is None else valid)
    ray_count = jnp.zeros(shape, jnp.int32)
    lights = lights[:cfg.num_lights]
    origins = jnp.broadcast_to(origin_pt[:, None, None], (3,) + shape)

    # (Deferred all-depth shadows were pruned in round 5: measured
    # slower — merged dispatch 371 vs 343 ms, frame 629 vs 605,
    # tools/r3_hw_queue4.py; machinery in git history.)

    for _depth in range(cfg.max_depth):
        # named scopes surface as ranges in jax.profiler traces — the
        # DebugMarker beginLabel/endLabel analogue (ref: DebugMarker.cpp)
        # dead rays park with tmax=0: they can't hit, can't gate any
        # cluster (dense kernel's t_s > TMIN clause) — all-dead blocks
        # cost one box sweep
        with jax.named_scope(f"trace_closest_d{_depth}"):
            tmax = jnp.where(active, C.RAY_TMAX, 0.0)
            # 1024-ray blocks at every depth: depth 0 (coherent camera
            # tiles) from halved per-block fixed costs (92.9 → 81.3 ms,
            # round 3); depth>=1 only WITH per-group sweep gating, which
            # removes the wide-reflection-cone penalty that made plain
            # 1024 regress (149 → 178) — gated: 158.5 → 109.2 ms vs
            # 123.3 at BLOCK (tools/groupgate_probe.py, outputs
            # bit-identical). Gating pays only where rows diverge:
            # coherent depth-0 rows gate 95% of clusters anyway
            # (tools/rowgate_sim.py), so depth 0 stays ungated.
            cblk = 1024 if (nb * L.LANES) % 1024 == 0 else BLOCK
            # depth>=1 resort: stable octant partition packs live
            # reflection rays into coherent blocks (dead rays to the
            # tail, where all-dead blocks park at one box sweep);
            # within a bucket the camera-tile order survives (stable),
            # so origins stay coherent too. Outputs inverse-permuted —
            # equal to the unsorted dispatch up to ~1-ulp near-tie
            # commits (wavefront/resort.py docstring).
            # Sim: 0.51x total gated-cluster sweeps (tools/dirsort_sim*).
            rs_closest = cfg.resort_secondary and _depth >= 1
            if rs_closest:
                perm = resort.radix_partition_perm(
                    resort.octant_key(dirs, active), resort.OCTANT_BITS)
                inv = resort.inverse_permutation(perm)
                o_t = resort.permute_rays(origins, perm)
                d_t = resort.permute_rays(dirs, perm)
                tm_t = resort.permute_rays(tmax, perm)
            else:
                o_t, d_t, tm_t = origins, dirs, tmax
            # (group_sort_closest pruned round 5: group resort of the
            # reflection dispatch measured 94.5 -> 101.8 ms,
            # tools/r4_hw_queue.py; machinery in git history.)
            # two-level per-ray repartition (round 5, wavefront/
            # lanesort.py): a Pallas stable in-block sort by
            # direction-octant + origin-cell makes every 128-lane group
            # key-contiguous, then the cheap group radix partition
            # re-tiles coherent groups into coherent blocks — the
            # ray-granular coherence the sims wanted (0.51x closest_d1
            # sweeps) without the ~420 ms XLA permutation.
            pt_closest = (cfg.partition_closest and _depth >= 1
                          and not rs_closest
                          and isinstance(backend, DenseBackend)
                          and getattr(backend, "scene_aabb", None)
                          is not None)
            if pt_closest:
                # SORTED-DEPTH pipeline (round 5b): the whole depth>=1
                # iteration — closest trace, shading, sampling, shadow
                # dispatch, accumulation — runs in the repartitioned
                # order; only the per-depth CONTRIBUTIONS (+ the
                # reflection carry when more depths remain) return
                # through one small inverse pass at the iteration's
                # end. The first variant inverse-permuted all 40
                # closest outputs and LOST (110.2 vs 95.0 ms) even
                # though the re-tiled dispatch itself ran at ~0.56x —
                # tools/r5_hw_queue.py. Attenuation rides the sort as
                # where(active, att, 0): active attenuation is always
                # > 0 (products of 0.5*metallic, metallic > 0.1), so
                # one combo channel encodes liveness AND the value
                # (7 payload + key = 8 sublanes, no pad).
                combo = jnp.where(active, attenuation, 0.0)
                lkey = lanesort.dir_cell_key_fine(
                    d_t, o_t, tm_t > 0, backend.scene_aabb, bits=5)
                (c0, c1, c2, c3, c4, c5, c6), rank_c = lanesort.lane_sort(
                    [o_t[0], o_t[1], o_t[2], d_t[0], d_t[1], d_t[2],
                     combo], lkey, block=cblk, interpret=interpret)
                o_t = jnp.stack([c0, c1, c2])
                d_t = jnp.stack([c3, c4, c5])
                gperm_c = resort.radix_partition_perm(
                    resort.group_dir_key(d_t, o_t, c6 > 0,
                                         backend.scene_aabb),
                    resort.GROUP_DIR_KEY_BITS)
                ginv_c = resort.inverse_permutation(gperm_c)
                o_t = resort.permute_groups(o_t, gperm_c)
                d_t = resort.permute_groups(d_t, gperm_c)
                combo = resort.permute_groups(c6, gperm_c)
                # the iteration now lives in sorted space
                attenuation = combo
                active = combo > 0
                tm_t = jnp.where(active, C.RAY_TMAX, 0.0)
                origins, dirs = o_t, d_t
            # two-level pregate (cfg.recheck_secondary): the interval
            # prologue nominates candidate clusters and the kernel
            # re-tests each per-ray at DMA-issue time — replaces the
            # in-kernel per-ray prepass + scalar emission for scattered
            # depth>=1 dispatches (rt/dense.py pregate="recheck")
            rc = "recheck" if (cfg.recheck_secondary and _depth >= 1) \
                else False
            # group_gate at depth>=1 only (95.3 vs 138.8 ms; depth-0
            # gating pruned round 5 — 62.9 -> 72.2, coherent camera
            # tiles gate ~95% of clusters for every group anyway)
            t, u, v, attrs, hitm = backend.closest(
                o_t, d_t, tm_t, interpret=interpret, block=cblk,
                sort=_depth == 0, group_gate=_depth >= 1, pregate=rc,
                sub_gate=cfg.sub_gate_closest)
            if rs_closest:
                t = resort.permute_rays(t, inv)
                u = resort.permute_rays(u, inv)
                v = resort.permute_rays(v, inv)
                hitm = resort.permute_rays(hitm, inv)
                attrs = resort.permute_rays(attrs, inv)
        # per-depth contribution accumulators: in sorted mode they are
        # inverse-permuted once at the iteration's end; otherwise they
        # fold straight into accum/ray_count
        dacc = jnp.zeros_like(accum)
        dcount = active.astype(jnp.float32)
        hit = hitm & active
        miss = active & ~hitm

        # miss shader: sky, unattenuated (ref: shader.rmiss:17 — the miss
        # shader overwrites hitValue; rgen adds it as-is)
        sky = jnp.asarray(C.SKY_COLOR)
        dacc = dacc + jnp.where(miss[None], sky[:, None, None], 0.0)

        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        # ONE gather fetches base + metallic-roughness + normal-map quads
        # (packed material heap; the three per-map gathers were ~2/3 of
        # frame sampling cost — measured round 2). Depth>=1 wavefronts
        # are sparse (~25% live rows) — the compacted sampler gathers
        # only live rows (3.4x faster there, exact; measured round 2).
        if _depth == 0:
            if cfg.mip_lod:
                # beyond-parity trilinear mip filtering (config.mip_lod;
                # lane-neighbor differentials ≡ fragment derivatives)
                from vkrt_tpu.shade.sampling import (ray_diff_lod,
                                                     sample_material_trilinear)
                lod = ray_diff_lod(uv, hit, mat_ids[0], tex.level_width,
                                   tex.level_height, mat_ids[0])
                base4, mr4, nmap4 = sample_material_trilinear(
                    tex.texels_tri, tex.level_offset, tex.level_width,
                    tex.level_height, mat_ids[0], uv, lod)
            else:
                base4, mr4, nmap4 = sample_material(
                    tex.texels_tri, tex.level_offset, tex.level_width,
                    tex.level_height, mat_ids[0], uv)
        else:
            cap = min(nb, max(8, -(-nb // 4) // 8 * 8))
            base4, mr4, nmap4 = sample_material_compact(
                tex.texels_tri, tex.level_offset, tex.level_width,
                tex.level_height, mat_ids[0], uv, hit, cap)
        base = base4[:3]

        if cfg.flat_albedo:
            # depth-0 only in practice (config 1) — apply inline since
            # the break skips the end-of-iteration fold
            accum = accum + dacc + jnp.where(hit[None], base, 0.0)
            ray_count = ray_count + dcount.astype(jnp.int32)
            active = jnp.zeros_like(active)
            break

        map_n = nmap4[:3]
        metallic = mr4[2]
        pn = shading.perturbed_normal(normal, tangent, map_n)

        total_light = jnp.zeros(shape, jnp.float32)
        nl = cfg.num_lights
        geo = [shading.light_geometry(pos, lights[li]) for li in range(nl)]
        ndotls = [L.dot3(pn, g[0]) for g in geo]
        occs = [None] * nl
        if cfg.enable_shadows and nl > 0:
            # ALL lights' shadow rays in ONE occlusion dispatch (concat
            # along the block axis — each light's rays keep their tile
            # coherence): one kernel launch + one trace prologue instead
            # of num_lights of each. Rays a hit doesn't cast (N·L<=0 or
            # miss) park with tmax=0. Ref contract: shader.rchit:119-152.
            casts = [hit & (nd > 0) for nd in ndotls]
            # shadow rays are traced FROM THE LIGHT toward the surface
            # (same segment, same occlusion answer, epsilon mirrored
            # to the surface end): every ray in a block then shares
            # one origin POINT — the kernel's point-origin fast path
            # with exact origin-box entry bounds; a subtile's rays
            # form a tight cone.
            sd = jnp.stack([-g[0] for g in geo])           # [L,3,Nb,128]
            st = jnp.stack(                                # [L,Nb,128]
                [jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                 for c, g in zip(casts, geo)])
            with jax.named_scope(f"trace_shadow_d{_depth}"):
                # Occlusion keeps no per-hit state, so it runs at the
                # larger OCCL_BLOCK (measured -27%).
                oblk = _occl_block(nb * L.LANES)
                # shadow resort (every depth — shadows are secondary
                # rays even at depth 0): one Morton-cell partition of
                # the SHARED depth-k surface points re-tiles all NS
                # lights' segments with a single permutation (segment
                # sets stay row-aligned — the multi-segment kernel is
                # preserved). Sim: 0.40x total sweeps at depth 0,
                # 0.13-0.25x at depth 1 (tools/dirsort_sim*).
                rs_shadow = (cfg.resort_secondary
                             and getattr(backend, "scene_aabb", None)
                             is not None)
                if rs_shadow:
                    sperm = resort.radix_partition_perm(
                        resort.cell_key(pos, hit, backend.scene_aabb),
                        resort.CELL_KEY_BITS)
                    sinv = resort.inverse_permutation(sperm)
                    sd = resort.permute_rays(sd, sperm)
                    st = resort.permute_rays(st, sperm)
                # GROUP (128-lane) shadow resort (round 4): sort
                # groups by the Morton cell of their mean live
                # surface point — the point is SHARED by all NS
                # lights' segments, so one group permutation
                # re-tiles every set and the multi-segment kernel
                # stays intact. ~16k-row jnp.take, not the 420 ms
                # ray-granular scatter. Masks are exactly
                # permutation-independent (any-hit).
                # depth>=1 only: hardware A/B (tools/r4_hw_queue.py)
                # — d0 group-sort LOSES (146.1 -> 167.1 ms: camera
                # tiles' intra-group depth spread survives any
                # group-level key), d1-on-pack WINS (149.7 -> 142.3)
                rcs = "recheck" if cfg.recheck_secondary else False
                # two-level per-ray repartition (round 5): in-block
                # Pallas lane sort by fine surface-point Morton cell
                # (the SHARED point keeps all NS light sets
                # row-aligned under ONE permutation — the
                # multi-segment kernel is preserved), then the group
                # radix partition over the now key-pure groups.
                # Composes with the depth>=1 pack (packed prefix is
                # what gets sorted). Only pos + a cast bitmask move
                # (4 channels); sd/st are recomputed bit-identically
                # from the moved point. Masks bit-identical.
                # depth>=1 only: the round-5 hardware A/B
                # (tools/r5_hw_queue.py, /tmp/r5q1b.out) — depth-0
                # camera tiles LOSE (146.6 -> 152.4 ms: the ~20 ms
                # lane-sort roundtrip exceeds the re-tiling win on
                # already-coherent tiles), packed depth-1 WINS
                # (142.3 -> 130.1 ms, masks bit-equal).
                pt_shadow = (cfg.partition_shadows and _depth >= 1
                             and not rs_shadow and not rcs
                             and isinstance(backend, DenseBackend)
                             and getattr(backend, "scene_aabb", None)
                             is not None)
                gs_shadow = (cfg.group_sort_shadows and _depth >= 1
                             and not rs_shadow and not pt_shadow
                             and getattr(backend, "scene_aabb", None)
                             is not None)
                if gs_shadow:
                    slive = st[0] > 0
                    for s in range(1, nl):
                        slive = slive | (st[s] > 0)
                    gperm = resort.radix_partition_perm(
                        resort.group_cell_key(pos, slive,
                                              backend.scene_aabb),
                        resort.GROUP_CELL_KEY_BITS)
                    ginv_s = resort.inverse_permutation(gperm)
                    sd = resort.permute_groups(sd, gperm)
                    st = resort.permute_groups(st, gperm)
                # shadows are secondary at every depth: the per-ray
                # `tn <= t(ray)` clause the re-check restores prunes
                # clusters beyond each segment's own surface (interval
                # over-gates shadow cones 2-5x, tools/pregate_sim.py)
                # (rcs/pt_shadow resolved above, before gs_shadow)
                # depth>=1 live-ray consolidation (wavefront/pack.py):
                # ~10% live rays pack into the leading blocks (stable
                # rank order keeps them tile-coherent), masks scatter
                # back bit-identically. 199.4 -> 151.1 ms measured
                # (tools/r3_hw_queue6.py).
                # dense backend only: the pack is a Pallas kernel
                # (the XLA ReferenceBackend gains nothing from
                # occupancy and must stay runnable uninterpreted on
                # CPU)
                cons = (cfg.consolidate_secondary and _depth >= 1
                        and not rs_shadow and not rcs
                        and not pt_shadow
                        and isinstance(backend, DenseBackend))
                if pt_shadow:
                    castmask = casts[0].astype(jnp.float32)
                    for s in range(1, nl):
                        castmask = (castmask
                                    + casts[s].astype(jnp.float32)
                                    * float(1 << s))
                    pt_cons = (cfg.consolidate_secondary
                               and _depth >= 1)
                    if pt_cons:
                        plan_p = pack.consolidate_plan(castmask > 0,
                                                       oblk)
                        pk = pack.consolidate(
                            [pos[0], pos[1], pos[2], castmask],
                            plan_p["grank"], plan_p["src_lo"],
                            plan_p["src_hi"], block=oblk,
                            interpret=interpret)
                        pos_k = jnp.stack(pk[:3])
                        cm_k = pk[3]
                    else:
                        pos_k, cm_k = pos, castmask
                    # the pack left every live ray in the leading
                    # blocks, so the lane sort only needs the first
                    # quarter of rows (live fraction ~10% at d1,
                    # measured) — the tail is identity. Exactness
                    # is unaffected if live rays ever exceed the
                    # cap; only their coherence is.
                    nb2 = cm_k.shape[0]
                    rpb = oblk // L.LANES
                    capr = nb2
                    if pt_cons and nb2 // rpb >= 8:
                        capr = -(-(nb2 // rpb) // 4) * rpb
                    lkey = lanesort.cell_key_fine(
                        pos_k[:, :capr], cm_k[:capr] > 0,
                        backend.scene_aabb, bits=6)
                    (p0, p1, p2, cmv), rank_s = lanesort.lane_sort(
                        [pos_k[0][:capr], pos_k[1][:capr],
                         pos_k[2][:capr], cm_k[:capr]], lkey,
                        block=oblk, interpret=interpret)
                    if capr < nb2:
                        p0 = jnp.concatenate([p0, pos_k[0][capr:]])
                        p1 = jnp.concatenate([p1, pos_k[1][capr:]])
                        p2 = jnp.concatenate([p2, pos_k[2][capr:]])
                        cmv = jnp.concatenate([cmv, cm_k[capr:]])
                    pos_p = jnp.stack([p0, p1, p2])
                    gperm_s = resort.radix_partition_perm(
                        resort.group_cell_key(pos_p, cmv > 0,
                                              backend.scene_aabb),
                        resort.GROUP_CELL_KEY_BITS)
                    ginv_ps = resort.inverse_permutation(gperm_s)
                    pos_p = resort.permute_groups(pos_p, gperm_s)
                    cmi = resort.permute_groups(
                        cmv, gperm_s).astype(jnp.int32)
                    # sd/st recomputed from the moved point —
                    # light_geometry is elementwise on identical f32
                    # inputs, so values are bit-identical to
                    # permuting the precomputed arrays
                    sd_l, st_l = [], []
                    for li in range(nl):
                        ldir, ldist, _ = shading.light_geometry(
                            pos_p, lights[li])
                        cast_p = ((cmi >> li) & 1) > 0
                        sd_l.append(-ldir)
                        st_l.append(jnp.where(
                            cast_p, ldist - C.RAY_TMIN, 0.0))
                    sd = jnp.stack(sd_l)
                    st = jnp.stack(st_l)
                if cons:
                    live = st[0] > 0
                    for s in range(1, nl):
                        live = live | (st[s] > 0)
                    plan = pack.consolidate_plan(live, oblk)
                    chans = [sd[s][a] for s in range(nl)
                             for a in range(3)] \
                        + [st[s] for s in range(nl)]
                    pk = pack.consolidate(
                        chans, plan["grank"], plan["src_lo"],
                        plan["src_hi"], block=oblk,
                        interpret=interpret)
                    sd = jnp.stack([jnp.stack(pk[s * 3:s * 3 + 3])
                                    for s in range(nl)])
                    st = jnp.stack(pk[3 * nl:])
                # (shadow_group_gate pruned round 5: per-(set,group)
                # occlusion gating measured 147->334 ms even with the
                # slice-reduce prepass — tools/r3_hw_queue2.py)
                occ_all = backend.occluded_multi(lights, sd, st,
                                                 interpret=interpret,
                                                 block=oblk,
                                                 sort=_depth == 0
                                                 and not rcs
                                                 and not pt_shadow,
                                                 pregate=rcs,
                                                 sub_gate=cfg.sub_gate_shadows)
                if cons:
                    occ_all = pack.scatter_back(
                        occ_all.astype(jnp.float32), plan["grank"],
                        block=oblk, interpret=interpret) > 0.5
                if pt_shadow:
                    occ_f = resort.permute_groups(
                        occ_all.astype(jnp.float32), ginv_ps)
                    occ_inv = lanesort.lane_unsort(
                        occ_f[:, :capr], rank_s, block=oblk,
                        interpret=interpret)
                    occ_f = (occ_inv if capr == nb2 else
                             jnp.concatenate(
                                 [occ_inv, occ_f[:, capr:]], axis=1))
                    if pt_cons:
                        occ_f = pack.scatter_back(
                            occ_f, plan_p["grank"], block=oblk,
                            interpret=interpret)
                    occ_all = occ_f > 0.5
                if gs_shadow:
                    occ_all = resort.permute_groups(occ_all, ginv_s)
                if rs_shadow:
                    occ_all = resort.permute_rays(occ_all, sinv)
            occs = list(occ_all)
            for c in casts:
                dcount = dcount + c.astype(jnp.float32)

        if cfg.enable_reflections:
            reflective = hit & (metallic > C.METALLIC_THRESHOLD)
            # attenuation updates BEFORE the (1 - attenuation) scale —
            # order quirk preserved (ref: shader.rchit:165-167)
            new_att = attenuation * (C.REFLECT_SCALE * metallic)
            att_updated = jnp.where(reflective, new_att, attenuation)
        else:
            reflective = jnp.zeros_like(hit)
            att_updated = attenuation

        for li in range(nl):
            diffuse = jnp.clip(ndotls[li], 0.0, 1.0)
            mult = jnp.ones(shape, jnp.float32)
            if cfg.enable_shadows:
                cast = hit & (ndotls[li] > 0)
                mult = jnp.where(cast & occs[li], C.SHADOW_MULTIPLIER,
                                 1.0)
            total_light = total_light + diffuse * geo[li][2] * mult

        hit_value = (base * (total_light * attenuation)[None]
                     + base * C.AMBIENT)
        if cfg.enable_reflections:
            hit_value = jnp.where(reflective[None],
                                  hit_value * (1.0 - att_updated)[None],
                                  hit_value)
        dacc = dacc + jnp.where(hit[None], hit_value, 0.0)

        attenuation = att_updated
        origins = L.where3(reflective, pos, origins)
        dirs = L.where3(reflective, shading.reflect(dirs, pn), dirs)
        active = reflective

        if pt_closest:
            # ONE small inverse pass returns the depth's contributions
            # (and the reflection carry only when more depths remain)
            # to the original ray order — 4 channels at the last depth
            # vs the 40-channel output inverse that killed variant 1
            more = _depth + 1 < cfg.max_depth
            chans = [dacc[0], dacc[1], dacc[2], dcount]
            if more:
                chans += [origins[0], origins[1], origins[2],
                          dirs[0], dirs[1], dirs[2],
                          jnp.where(active, attenuation, 0.0),
                          active.astype(jnp.float32)]
            stk = jnp.stack(chans)
            stk = resort.permute_groups(stk, ginv_c)
            stk = lanesort.lane_unsort(stk, rank_c, block=cblk,
                                       interpret=interpret)
            accum = accum + stk[:3]
            ray_count = ray_count + stk[3].astype(jnp.int32)
            if more:
                origins = stk[4:7]
                dirs = stk[7:10]
                attenuation = stk[10]
                active = stk[11] > 0.5
        else:
            accum = accum + dacc
            ray_count = ray_count + dcount.astype(jnp.int32)

    return accum, ray_count


# In-process cache: scene arrays + device texture heap + backends are
# shared across Renderer/Rasterizer instances (the axon tunnel moves
# ~11MB/s — re-uploading the texture heap per instance is minutes).
_SCENE_CACHE: dict = {}
_MODEL_CACHE: dict = {}


def load_scene_assets(model_path: str, max_texture_dim: int = 0):
    """(FlatScene, TextureArrays) — cached per (path, texture dim)."""
    key = (model_path, max_texture_dim)
    if key not in _SCENE_CACHE:
        from vkrt_tpu.scene import flatten_model, load_model
        model = load_model(model_path, max_texture_dim=max_texture_dim)
        flat = flatten_model(model)
        tex = texture_arrays(model.images, flat)
        _SCENE_CACHE[key] = (flat, tex, {})
        _MODEL_CACHE[key] = model
    return _SCENE_CACHE[key]


def cached_model(model_path: str, max_texture_dim: int = 0):
    """The loaded Model behind load_scene_assets (same cache key) — for
    consumers that need raw images (e.g. the bench golden-RMSE gate
    builds the independent oracle's per-image TextureHeap)."""
    key = (model_path, max_texture_dim)
    load_scene_assets(model_path, max_texture_dim)
    return _MODEL_CACHE[key]


def cached_backend(model_path: str, max_texture_dim: int, kind: str):
    flat, tex, backends = load_scene_assets(model_path, max_texture_dim)
    if kind not in backends:
        backends[kind] = make_backend(flat, kind)
    return flat, tex, backends[kind]


class Renderer:
    """High-level renderer: scene in, frames out (the Raytracer analogue —
    ctor does all setup, render() produces a frame; ref: src/Raytracer.hpp:11-17).
    """

    def __init__(self, model_path: str, cfg: C.RenderConfig,
                 backend: str = "dense", max_texture_dim: int = 0,
                 interpret: bool = False, rebuild: str = "refit",
                 quantize: bool = False, sah_opts: dict | None = None):
        self.cfg = cfg
        self.interpret = interpret
        self.rebuild = rebuild      # "refit" | "full" (device SAH) | "full_morton"
        self.sah_opts = sah_opts    # device_sah_order overrides (rebuild="full")
        self.quantize = quantize    # u8 fb + scalar rays on device (prod path)
        self.flat, self.tex, self.backend = cached_backend(
            model_path, max_texture_dim, backend)
        self.lights = jnp.asarray(C.LIGHT_POSITIONS)
        self._frame = jax.jit(functools.partial(
            render_frame_u8 if quantize else render_frame,
            cfg=cfg, interpret=interpret))
        if rebuild.startswith("full"):
            idx = np.asarray(self.flat.indices, dtype=np.int64)
            p = self.flat.positions
            self._v0 = jnp.asarray(p[idx[:, 0]])
            self._e1 = jnp.asarray(p[idx[:, 1]] - p[idx[:, 0]])
            self._e2 = jnp.asarray(p[idx[:, 2]] - p[idx[:, 0]])
            from vkrt_tpu.accel.clusters import scene_attrs
            self._attrs = scene_attrs(self.flat)
            c = (np.asarray(self._v0)
                 + (np.asarray(self._e1) + np.asarray(self._e2)) / 3.0)
            lo, hi = c.min(axis=0), c.max(axis=0)
            self._aabb_corners = np.array(
                [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
                 for z in (lo[2], hi[2])], np.float32)

    def render_async(self, camera, transform=None):
        """Enqueue a frame; returns DEVICE arrays (fb, ray_count) without
        forcing completion — JAX async dispatch makes this the
        frames-in-flight submit (pair with runtime.FrameScheduler; the
        reference overlaps CPU record with GPU execute the same way via
        3 swapchain images + fences, ref: src/Context.cpp:141-180).

        `transform` (4x4, TLAS-instance analogue) — or
        cfg.rebuild_per_frame — triggers the per-frame accel update
        (BASELINE config 5; ref driver rebuild at src/Raytracer.cpp:
        1146-1280): dense AABB refit by default, or a full on-device
        Morton re-sort with rebuild="full"."""
        backend = self.backend
        if (self.cfg.rebuild_per_frame or transform is not None) and \
                isinstance(backend, DenseBackend):
            m = jnp.eye(4) if transform is None else jnp.asarray(transform, jnp.float32)
            if self.rebuild.startswith("full"):
                backend = backend._replace(tree=self._full_rebuild(m))
            else:
                from vkrt_tpu.accel.refit import refit_clusters
                backend = backend._replace(
                    tree=refit_clusters(backend.tree, m))
        return self._frame(backend, self.tex,
                           jnp.asarray(camera.proj_inverse),
                           jnp.asarray(camera.view_inverse),
                           self.lights)

    def render(self, camera, transform=None):
        """Synchronous render: enqueue + materialize on host."""
        fb, rays = self.render_async(camera, transform)
        return np.asarray(fb), int(np.asarray(rays).sum())

    def _full_rebuild(self, m):
        """Per-frame FULL accel rebuild: transform geometry + attribute
        directions on device, re-order, assemble. rebuild="full" runs
        the device variable-cut SAH build (accel/device_sah.py —
        tree-quality parity with the host build, the driver-BLAS
        analogue; ref: src/Raytracer.cpp:1027-1157); rebuild
        "full_morton" keeps the round-3 Morton re-sort (faster build,
        ~3x looser clusters — tools/r4_device_sah_check.py)."""
        from vkrt_tpu.accel.clusters import build_clusters
        v0, e1, e2, attrs = _transform_geometry(self._v0, self._e1,
                                                self._e2, self._attrs, m)
        mc = np.asarray(m)
        corners = self._aabb_corners @ mc[:3, :3].T + mc[:3, 3]
        aabb = (corners.min(axis=0), corners.max(axis=0))
        method = "morton" if self.rebuild == "full_morton" else "sah"
        return build_clusters(v0, e1, e2, attrs=attrs, with_attributes=True,
                              device=True, aabb=aabb, method=method,
                              sah_opts=self.sah_opts)


@jax.jit
def _transform_geometry(v0, e1, e2, attrs, m):
    """Affine transform of triangle geometry + directional attributes."""
    a = m[:3, :3]
    b = m[:3, 3]
    # explicit f32 contraction — `x @ a.T` is a bf16-default MXU matmul
    # on TPU (utils.layout.mat_rows3 docstring has the incident list)
    rot = lambda x: L.mat_rows3(x, a)
    v0t = rot(v0) + b
    out = dict(attrs)
    for k in ("n0", "n1", "n2", "t0", "t1", "t2"):
        out[k] = rot(attrs[k])
    return v0t, rot(e1), rot(e2), out


def make_backend(flat, kind: str):
    """Build a trace backend from a FlatScene."""
    import numpy as np

    idx = np.asarray(flat.indices, dtype=np.int64)
    v0 = jnp.asarray(flat.positions[idx[:, 0]])
    v1 = jnp.asarray(flat.positions[idx[:, 1]])
    v2 = jnp.asarray(flat.positions[idx[:, 2]])
    e1, e2 = v1 - v0, v2 - v0
    pos_np = np.asarray(flat.positions, dtype=np.float32)
    scene_aabb = jnp.asarray(
        np.stack([pos_np.min(axis=0), pos_np.max(axis=0)]))

    if kind == "dense":
        from vkrt_tpu.accel.clusters import build_clusters, scene_attrs
        tree = build_clusters(v0, e1, e2, attrs=scene_attrs(flat),
                              with_attributes=True, device=False)
        return DenseBackend(tree=tree, scene_aabb=scene_aabb)
    if kind == "reference":
        from vkrt_tpu.accel import build_lbvh
        from vkrt_tpu.accel.clusters import scene_attrs
        bvh = build_lbvh(v0, e1, e2)
        a = scene_attrs(flat)
        attr_table = jnp.concatenate(
            [v0, e1, e2, a["n0"], a["n1"], a["n2"], a["uv0"], a["uv1"],
             a["uv2"], a["t0"], a["t1"], a["t2"], a["mat"]], axis=1)
        return ReferenceBackend(bvh=bvh, attr_table=attr_table,
                                scene_aabb=scene_aabb)
    raise ValueError(f"unknown backend {kind!r}")
