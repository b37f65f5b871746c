"""Raster pipeline — the reference's classic forward path, TPU-native.

The reference's alternative renderer (ref: src/Rasterizer.{hpp,cpp})
draws the same scene with: one WVP matrix (P·V·scale(0.01), per-frame
UBO, ref: Rasterizer.cpp:172-195), 8xMSAA color + depth + resolve
(ref: Rasterizer.cpp:17,266-338), per-submesh textured draws, an unlit
fragment shader with `discard` below alpha 0.1 (ref: shaders/shader.frag:
13-22), clear color (0, 0, 0.2) (ref: Rasterizer.cpp:119), and an ImGui
FPS overlay (ref: Rasterizer.cpp:151-161).

TPU-first design: the TPU has no raster hardware, and on this machine a
software edge-function rasterizer and a primary-visibility wavefront pass
lower to the *same* dense cluster math (tiles of pixels × streamed
triangle clusters with depth-min selection). So the raster pipeline is
implemented as a specialized single-bounce wavefront pass over the tuned
trace kernel, adding the raster-specific contract:

  * 8xMSAA: the standard Vulkan/D3D 8-sample pixel pattern, one
    visibility pass per sample, averaged resolve
  * alpha `discard`: hits with baseColor.a < 0.1 continue behind the
    surface (bounded continuation rounds), exactly the fragment-kill
    semantics
  * unlit textured shading + (0, 0, 0.2) background

Perspective/camera math is shared with the RT path (identical P·V), so
both paths see the same geometry — as in the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.shade import shading
from vkrt_tpu.shade.sampling import sample_material
from vkrt_tpu.wavefront import engine

CLEAR_COLOR = np.array([0.0, 0.0, 0.2], dtype=np.float32)  # ref: Rasterizer.cpp:119
ALPHA_DISCARD = 0.1        # ref: shaders/shader.frag:16-20
MAX_DISCARD_ROUNDS = 4

# Standard 8x MSAA sample positions (pixel space, Vulkan/D3D pattern;
# ref MSAA config: VK_SAMPLE_COUNT_8_BIT at Rasterizer.cpp:17)
MSAA8 = np.array([
    [0.5625, 0.3125], [0.4375, 0.6875], [0.8125, 0.5625], [0.3125, 0.1875],
    [0.1875, 0.8125], [0.0625, 0.4375], [0.6875, 0.9375], [0.9375, 0.0625],
], dtype=np.float32)


def _visibility_sample(backend, tex, proj_inverse, view_inverse,
                       cfg: C.RenderConfig, off, interpret: bool):
    """One MSAA sample pass: unlit color with alpha-discard continuation."""
    from vkrt_tpu.utils import layout as L

    wp, hp = engine._pad_dims(cfg.width, cfg.height)
    o, d = engine.generate_rays(proj_inverse, view_inverse,
                                cfg.width, cfg.height, off=tuple(off))
    origins = jnp.stack([engine.tile(engine._pad_grid(c, wp, hp,
                                                      engine.FAR_SENTINEL))
                         for c in o])
    dirs = L.normalize3(jnp.stack(
        [engine.tile(engine._pad_grid(c, wp, hp, 1.0)) for c in d]))
    shape = origins.shape[1:]

    color = jnp.broadcast_to(jnp.asarray(CLEAR_COLOR)[:, None, None],
                             (3,) + shape)
    # still needs a surface; padded rays (FAR origin) never become live
    live = origins[0] != engine.FAR_SENTINEL
    for _round in range(MAX_DISCARD_ROUNDS):
        # dead rays park with tmax=0 (see wavefront.engine.wavefront_rounds)
        tmax = jnp.where(live, C.RAY_TMAX, 0.0)
        t, u, v, attrs, hitm = backend.closest(origins, dirs, tmax,
                                               interpret=interpret)
        hit = hitm & live
        pos, _, uv, _, mat_ids = shading.interpolate(attrs, u, v)
        texel, _, _ = sample_material(tex.texels_tri, tex.level_offset,
                                      tex.level_width, tex.level_height,
                                      mat_ids[0], uv)
        opaque = hit & (texel[3] >= ALPHA_DISCARD)
        discarded = hit & ~opaque
        color = L.where3(opaque, texel[:3], color)
        # discarded fragments: continue behind the surface (fragment kill)
        origins = L.where3(discarded, pos + dirs * 1e-4, origins)
        live = discarded

    return jnp.stack([engine.untile(color[k], hp, wp)[: cfg.height, : cfg.width]
                      for k in range(3)], axis=-1)


def render_raster_frame(backend, tex, proj_inverse, view_inverse,
                        cfg: C.RenderConfig, msaa: int = 8,
                        interpret: bool = False):
    """Full raster frame: msaa in {1, 8} sample passes, averaged resolve."""
    offsets = MSAA8 if msaa == 8 else np.array([[0.5, 0.5]], np.float32)
    acc = None
    for off in offsets:
        s = _visibility_sample(backend, tex, proj_inverse, view_inverse, cfg,
                               off, interpret)
        acc = s if acc is None else acc + s
    return acc / len(offsets)


def edge_color_lanes(tex, setup, scb, clb, px, py, inside,
                     interpret: bool = False):
    """Lane-space body of one edge-rasterizer MSAA sample pass:
    screen-space coverage + depth test, alpha-kill as depth-floor
    continuation rounds — no rays anywhere. px/py/inside are lane-major
    [Nb,128]; returns unlit color [3,Nb,128]. Pixel blocks are
    independent, so this is the unit `parallel.mesh` shards across
    chips (setup/scene replicated, pixels split)."""
    from vkrt_tpu.raster.edge import raster_edge
    from vkrt_tpu.utils import layout as L

    shape = px.shape
    color = jnp.broadcast_to(jnp.asarray(CLEAR_COLOR)[:, None, None],
                             (3,) + shape)
    zfloor = jnp.where(inside, 0.0, 1.0e9)       # pads park
    for _round in range(MAX_DISCARD_ROUNDS):
        z, slot, u, v, mat = raster_edge(setup, scb, clb, px, py, zfloor,
                                         interpret=interpret)
        hit = slot >= 0
        texel, _, _ = sample_material(tex.texels_tri, tex.level_offset,
                                      tex.level_width, tex.level_height,
                                      jnp.where(hit, mat, 0),
                                      jnp.where(hit[None], jnp.stack([u, v]),
                                                0.0))
        opaque = hit & (texel[3] >= ALPHA_DISCARD)
        discarded = hit & ~opaque
        color = L.where3(opaque, texel[:3], color)
        # fragment kill: next round only accepts strictly deeper fragments
        zfloor = jnp.where(discarded, z, 1.0e9)
    return color


def sample_pixel_lanes(cfg: C.RenderConfig, off):
    """Tiled lane-major pixel-center coords + inside mask for one MSAA
    sample offset."""
    wp, hp = engine._pad_dims(cfg.width, cfg.height)
    gx = (jnp.arange(wp, dtype=jnp.float32) + off[0])[None, :]
    gy = (jnp.arange(hp, dtype=jnp.float32) + off[1])[:, None]
    px = engine.tile(jnp.broadcast_to(gx, (hp, wp)))
    py = engine.tile(jnp.broadcast_to(gy, (hp, wp)))
    inside = engine.tile(jnp.broadcast_to(
        (gx < cfg.width) & (gy < cfg.height), (hp, wp)))
    return px, py, inside


def _edge_sample(tree, tex, view, proj, cfg: C.RenderConfig, off,
                 interpret: bool, setup, scb, clb):
    """One MSAA sample pass through the edge-function rasterizer."""
    wp, hp = engine._pad_dims(cfg.width, cfg.height)
    px, py, inside = sample_pixel_lanes(cfg, off)
    color = edge_color_lanes(tex, setup, scb, clb, px, py, inside,
                             interpret)
    return jnp.stack([engine.untile(color[k], hp, wp)[: cfg.height,
                                                      : cfg.width]
                      for k in range(3)], axis=-1)


def render_raster_frame_edge(tree, tex, view, proj, cfg: C.RenderConfig,
                             msaa: int = 8, interpret: bool = False):
    """Full raster frame through the edge-function rasterizer: the
    vertex/setup stage runs once per camera pose, the per-sample
    coverage passes share it. Needs the FORWARD view/projection
    matrices (the vertex-stage analogue of the reference's WVP UBO,
    ref: Rasterizer.cpp:172-195)."""
    from vkrt_tpu.raster.edge import build_raster_setup

    setup, scb, clb = build_raster_setup(tree, view, proj,
                                         cfg.width, cfg.height)
    offsets = MSAA8 if msaa == 8 else np.array([[0.5, 0.5]], np.float32)
    acc = None
    for off in offsets:
        s = _edge_sample(tree, tex, view, proj, cfg, off, interpret,
                         setup, scb, clb)
        acc = s if acc is None else acc + s
    return acc / len(offsets)


class Rasterizer:
    """ctor + render() — same shape as the reference Rasterizer
    (ref: src/Rasterizer.hpp:12-18), with the FPS overlay of the raster
    path (ref: Rasterizer.cpp:151-161) burned in by app/overlay.py.

    method="edge" (default on the dense backend) runs the true
    edge-function rasterizer (raster/edge.py: vertex stage + screen-space
    coverage + depth test); method="wavefront" runs the ray-cast
    equivalent (bit-exact against the ray oracle — the two differ only
    in sub-pixel edge-tie resolution)."""

    def __init__(self, model_path: str, cfg: C.RenderConfig,
                 backend: str = "dense", max_texture_dim: int = 0,
                 msaa: int = 8, interpret: bool = False,
                 method: str = "auto"):
        self.cfg = cfg
        self.msaa = msaa
        self.interpret = interpret
        self.flat, self.tex, self.backend = engine.cached_backend(
            model_path, max_texture_dim, backend)
        if method == "auto":
            method = "edge" if hasattr(self.backend, "tree") else "wavefront"
        if method == "edge" and not hasattr(self.backend, "tree"):
            raise ValueError("edge rasterizer needs the dense backend "
                             "(cluster tree)")
        self.method = method
        if method == "edge":
            self._frame = jax.jit(functools.partial(
                render_raster_frame_edge, cfg=cfg, msaa=msaa,
                interpret=interpret))
        else:
            self._frame = jax.jit(functools.partial(
                render_raster_frame, cfg=cfg, msaa=msaa,
                interpret=interpret))
        self._timer = None

    def render(self, camera, show_fps: bool = True):
        import time

        from vkrt_tpu.app.overlay import draw_text

        t0 = time.perf_counter()
        if self.method == "edge":
            fb = np.asarray(self._frame(self.backend.tree, self.tex,
                                        jnp.asarray(camera.view_matrix),
                                        jnp.asarray(camera.projection_matrix)))
        else:
            fb = np.asarray(self._frame(self.backend, self.tex,
                                        jnp.asarray(camera.proj_inverse),
                                        jnp.asarray(camera.view_inverse)))
        dt = time.perf_counter() - t0
        if show_fps:
            fb = draw_text(fb, f"FPS {1.0 / max(dt, 1e-9):.1f}", 8, 8)
        return fb
