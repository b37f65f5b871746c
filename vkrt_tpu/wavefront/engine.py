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
from vkrt_tpu.shade.sampling import sample_bilinear
from vkrt_tpu.shade import shading

FAR_SENTINEL = 1.0e7
TILE_Y, TILE_X = 16, 32           # 512 pixels = one dense-kernel block


class TextureArrays(NamedTuple):
    texels: jax.Array        # u8[N,4]
    level_offset: jax.Array  # i32[I,L]
    level_width: jax.Array   # i32[I,L]
    level_height: jax.Array  # i32[I,L]


def generate_rays(proj_inverse, view_inverse, width: int, height: int):
    """Camera ray generation (ref: shaders/shader.rgen:30-38)."""
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    target = (proj_inverse[:3, 0][None, None] * gx[..., None]
              + proj_inverse[:3, 1][None, None] * gy[..., None]
              + proj_inverse[:3, 2][None, None]
              + proj_inverse[:3, 3][None, None])
    d_view = shading.safe_normalize(target)
    dirs = d_view @ view_inverse[:3, :3].T
    origin = view_inverse[:3, 3]
    origins = jnp.broadcast_to(origin, dirs.shape)
    return origins, dirs          # [H,W,3] each


def tile(img, ty: int = TILE_Y, tx: int = TILE_X):
    """[H,W,C] → [H*W,C] in tile-major order (H, W multiples of ty, tx)."""
    h, w, c = img.shape
    return (img.reshape(h // ty, ty, w // tx, tx, c)
            .transpose(0, 2, 1, 3, 4).reshape(-1, c))


def untile(flat, height: int, width: int, ty: int = TILE_Y, tx: int = TILE_X):
    c = flat.shape[-1]
    return (flat.reshape(height // ty, width // tx, ty, tx, c)
            .transpose(0, 2, 1, 3, 4).reshape(height, width, c))


def _pad_dims(width, height):
    return -(-width // TILE_X) * TILE_X, -(-height // TILE_Y) * TILE_Y


# ---------------------------------------------------------------------------
# Trace backends
# ---------------------------------------------------------------------------

class DenseBackend(NamedTuple):
    """Pallas cluster kernel; attributes selected inside the trace."""
    tree: object  # ClusterTree

    def closest(self, o, d, tmax, interpret=False):
        from vkrt_tpu.rt.dense import trace_dense
        t, slot, u, v, attrs = trace_dense(
            self.tree, o, d, tmax, with_attributes=True, interpret=interpret)
        return t, u, v, attrs, slot >= 0

    def occluded(self, o, d, tmax, interpret=False):
        from vkrt_tpu.rt.dense import trace_dense
        _, slot, _, _ = trace_dense(self.tree, o, d, tmax, occlusion=True,
                                    interpret=interpret)
        return slot >= 0


class ReferenceBackend(NamedTuple):
    """XLA LBVH traversal + post-trace attribute gather (CPU-friendly)."""
    bvh: object            # BVH2
    attr_table: jax.Array  # f32[T,27] per-triangle corner attrs (original order)

    def closest(self, o, d, tmax, interpret=False):
        from vkrt_tpu.rt.traverse import trace_closest
        t, tri, u, v = trace_closest(self.bvh, o, d, C.RAY_TMIN, tmax)
        attrs = self.attr_table[jnp.maximum(tri, 0)]
        return t, u, v, attrs, tri >= 0

    def occluded(self, o, d, tmax, interpret=False):
        from vkrt_tpu.rt.traverse import trace_occluded
        return trace_occluded(self.bvh, o, d, C.RAY_TMIN, tmax)


# ---------------------------------------------------------------------------
# The frame function (jitted once per config)
# ---------------------------------------------------------------------------

def render_frame(backend, tex: TextureArrays, proj_inverse, view_inverse,
                 lights, cfg: C.RenderConfig, interpret: bool = False):
    """Render one frame. Returns (framebuffer f32[H,W,3], rays i32[N] traced
    per pixel — summed on host for the Mrays metric)."""
    wp, hp = _pad_dims(cfg.width, cfg.height)
    origins, dirs = camera_ray_blocks(proj_inverse, view_inverse, cfg)
    accum, ray_count = wavefront_rounds(backend, tex, origins, dirs, lights,
                                        cfg, interpret=interpret)
    fb = untile(accum, hp, wp)[: cfg.height, : cfg.width]
    return fb, ray_count


def camera_ray_blocks(proj_inverse, view_inverse, cfg: C.RenderConfig):
    """Camera rays padded to tile multiples and reordered into coherent
    blocks (tile-major). Padding rays park at the far sentinel."""
    wp, hp = _pad_dims(cfg.width, cfg.height)
    o_img, d_img = generate_rays(proj_inverse, view_inverse, cfg.width, cfg.height)
    o_img = jnp.pad(o_img, ((0, hp - cfg.height), (0, wp - cfg.width), (0, 0)),
                    constant_values=FAR_SENTINEL)
    d_img = jnp.pad(d_img, ((0, hp - cfg.height), (0, wp - cfg.width), (0, 0)),
                    constant_values=1.0)
    return tile(o_img), shading.safe_normalize(tile(d_img))


def wavefront_rounds(backend, tex: TextureArrays, origins, dirs, lights,
                     cfg: C.RenderConfig, interpret: bool = False):
    """The trace→shade rounds over a flat ray wavefront [N,3]. Pure map
    over rays (scene replicated) — the unit that shards across chips."""
    n = origins.shape[0]
    accum = jnp.zeros((n, 3), jnp.float32)
    attenuation = jnp.ones((n, 1), jnp.float32)
    active = jnp.ones(n, dtype=bool)
    ray_count = jnp.zeros(n, jnp.int32)
    lights = lights[:cfg.num_lights]

    for _depth in range(cfg.max_depth):
        to = jnp.where(active[:, None], origins, FAR_SENTINEL)
        tmax = jnp.full(n, C.RAY_TMAX, jnp.float32)
        t, u, v, attrs, hitm = backend.closest(to, dirs, tmax, interpret=interpret)
        ray_count = ray_count + active.astype(jnp.int32)
        hit = hitm & active
        miss = active & ~hitm

        # miss shader: sky, unattenuated (ref: shader.rmiss:17 — the miss
        # shader overwrites hitValue; rgen adds it as-is)
        accum = accum + jnp.where(miss[:, None], jnp.asarray(C.SKY_COLOR), 0.0)

        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        base = sample_bilinear(tex.texels, tex.level_offset, tex.level_width,
                               tex.level_height, mat_ids[:, 0], uv)[:, :3]

        if cfg.flat_albedo:
            accum = accum + jnp.where(hit[:, None], base, 0.0)
            active = jnp.zeros_like(active)
            break
        map_n = sample_bilinear(tex.texels, tex.level_offset, tex.level_width,
                                tex.level_height, mat_ids[:, 2], uv)[:, :3]
        metallic = sample_bilinear(tex.texels, tex.level_offset, tex.level_width,
                                   tex.level_height, mat_ids[:, 1], uv)[:, 2]
        pn = shading.perturbed_normal(normal, tangent, map_n)

        total_light = jnp.zeros(n, jnp.float32)
        for li in range(cfg.num_lights):
            ldir, ldist, power = shading.light_geometry(pos, lights[li])
            ndotl = jnp.sum(pn * ldir, axis=1)
            diffuse = jnp.clip(ndotl, 0.0, 1.0)
            mult = jnp.ones(n, jnp.float32)
            if cfg.enable_shadows:
                cast = hit & (ndotl > 0)
                so = jnp.where(cast[:, None], pos, FAR_SENTINEL)
                occ = backend.occluded(so, ldir, ldist, interpret=interpret)
                ray_count = ray_count + cast.astype(jnp.int32)
                mult = jnp.where(cast & occ, C.SHADOW_MULTIPLIER, 1.0)
            total_light = total_light + diffuse * power * mult

        hit_value = (base * total_light[:, None] * attenuation
                     + base * C.AMBIENT)

        if cfg.enable_reflections:
            reflective = hit & (metallic > C.METALLIC_THRESHOLD)
            # attenuation updates BEFORE the (1 - attenuation) scale —
            # order quirk preserved (ref: shader.rchit:165-167)
            new_att = attenuation * (C.REFLECT_SCALE * metallic[:, None])
            attenuation = jnp.where(reflective[:, None], new_att, attenuation)
            hit_value = jnp.where(reflective[:, None],
                                  hit_value * (1.0 - attenuation), hit_value)
        else:
            reflective = jnp.zeros_like(hit)

        accum = accum + jnp.where(hit[:, None], hit_value, 0.0)

        origins = jnp.where(reflective[:, None], pos, origins)
        dirs = jnp.where(reflective[:, None], shading.reflect(dirs, pn), dirs)
        active = reflective

    return accum, ray_count


class Renderer:
    """High-level renderer: scene in, frames out (the Raytracer analogue —
    ctor does all setup, render() produces a frame; ref: src/Raytracer.hpp:11-17).
    """

    def __init__(self, model_path: str, cfg: C.RenderConfig,
                 backend: str = "dense", max_texture_dim: int = 0,
                 interpret: bool = False):
        from vkrt_tpu.scene import (build_texture_heap, flatten_model,
                                    load_model)
        self.cfg = cfg
        self.interpret = interpret
        model = load_model(model_path, max_texture_dim=max_texture_dim)
        self.flat = flatten_model(model)
        heap = build_texture_heap(model.images)
        self.tex = TextureArrays(
            texels=jnp.asarray(heap.texels),
            level_offset=jnp.asarray(heap.level_offset),
            level_width=jnp.asarray(heap.level_width),
            level_height=jnp.asarray(heap.level_height),
        )
        self.backend = make_backend(self.flat, backend)
        self.lights = jnp.asarray(C.LIGHT_POSITIONS)
        self._frame = jax.jit(functools.partial(
            render_frame, cfg=cfg, interpret=interpret))

    def render(self, camera, transform=None):
        """Render a frame. `transform` (4x4, TLAS-instance analogue) —
        or cfg.rebuild_per_frame — triggers the per-frame accel update
        (BASELINE config 5: dense refit, ref driver rebuild at
        src/Raytracer.cpp:1146-1280)."""
        backend = self.backend
        if (self.cfg.rebuild_per_frame or transform is not None) and \
                isinstance(backend, DenseBackend):
            from vkrt_tpu.accel.refit import refit_clusters
            m = jnp.eye(4) if transform is None else jnp.asarray(transform, jnp.float32)
            backend = DenseBackend(tree=refit_clusters(backend.tree, m))
        fb, rays = self._frame(backend, self.tex,
                               jnp.asarray(camera.proj_inverse),
                               jnp.asarray(camera.view_inverse),
                               self.lights)
        return np.asarray(fb), int(np.asarray(rays).sum())


def make_backend(flat, kind: str):
    """Build a trace backend from a FlatScene."""
    import numpy as np

    idx = np.asarray(flat.indices, dtype=np.int64)
    v0 = jnp.asarray(flat.positions[idx[:, 0]])
    v1 = jnp.asarray(flat.positions[idx[:, 1]])
    v2 = jnp.asarray(flat.positions[idx[:, 2]])
    e1, e2 = v1 - v0, v2 - v0

    if kind == "dense":
        from vkrt_tpu.accel.clusters import build_clusters, scene_attrs
        tree = build_clusters(v0, e1, e2, attrs=scene_attrs(flat),
                              with_attributes=True, device=False)
        return DenseBackend(tree=tree)
    if kind == "reference":
        from vkrt_tpu.accel import build_lbvh
        from vkrt_tpu.accel.clusters import scene_attrs
        bvh = build_lbvh(v0, e1, e2)
        a = scene_attrs(flat)
        attr_table = jnp.concatenate(
            [v0, e1, e2, a["n0"], a["n1"], a["n2"], a["uv0"], a["uv1"],
             a["uv2"], a["t0"], a["t1"], a["t2"], a["mat"]], axis=1)
        return ReferenceBackend(bvh=bvh, attr_table=attr_table)
    raise ValueError(f"unknown backend {kind!r}")
