"""Multi-chip scaling — rays sharded over a device mesh, scene replicated.

The reference is strictly single-GPU (SURVEY.md §2: one VkDevice, one
queue, no collectives). The TPU design scales the way the hardware wants:
the ray wavefront is embarrassingly parallel, so frames shard over a 1-D
`rays` mesh axis with `shard_map`; the scene (cluster tree + texture
heap, ~0.5GB) is replicated per chip, and the only cross-chip traffic is
the framebuffer gather on the host fetch — riding ICI, no DCN (the v5e-8
target from BASELINE.json).

No NCCL/MPI analogue exists or is needed: XLA inserts the collective for
the sharded→replicated output transition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vkrt_tpu import config as C
from vkrt_tpu.wavefront import engine


def make_mesh(devices=None, axis: str = "rays") -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _shard_map(fn, mesh, in_specs, out_specs):
    # check_vma off: the per-device body initializes loop carries from
    # replicated zeros, which trips the varying-axes checker even though
    # no cross-device communication exists inside the body.
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):  # older jax spellings
        from jax.experimental.shard_map import shard_map
        try:
            return shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
        except TypeError:
            return shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)


def render_frame_sharded(backend, tex, proj_inverse, view_inverse, lights,
                         cfg: C.RenderConfig, mesh: Mesh,
                         interpret: bool = False):
    """Distributed render_frame: identical output, rays split across chips.

    Lane-major wavefront [3, Nb, 128] shards along the block axis Nb."""
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    wp, hp = engine._pad_dims(cfg.width, cfg.height)

    origin_pt, dirs, valid = engine.camera_ray_blocks(proj_inverse,
                                                      view_inverse, cfg)
    nb = dirs.shape[1]
    # pad so each device gets a whole number of 512-ray trace blocks
    per_dev = -(-nb // (n_dev * 4)) * 4            # 4 groups of 128 = 512
    pad = per_dev * n_dev - nb
    dirs = jnp.pad(dirs, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)
    dirs = engine.L.normalize3(dirs)
    valid = jnp.pad(valid, ((0, pad), (0, 0)), constant_values=False)

    rounds = functools.partial(engine.wavefront_rounds, cfg=cfg,
                               interpret=interpret)
    fn = _shard_map(
        lambda be, tx, op, d, li, va: rounds(be, tx, op, d, li, valid=va),
        mesh,
        in_specs=(P(), P(), P(), P(None, axis, None), P(), P(axis, None)),
        out_specs=(P(None, axis, None), P(axis, None)),
    )
    accum, ray_count = fn(backend, tex, origin_pt, dirs, lights, valid)
    accum = accum[:, :nb]
    fb = jnp.stack([engine.untile(accum[k], hp, wp)[: cfg.height, : cfg.width]
                    for k in range(3)], axis=-1)
    return fb, ray_count[:nb]


def render_raster_frame_sharded(tree, tex, view, proj, cfg: C.RenderConfig,
                                mesh: Mesh, msaa: int = 1,
                                interpret: bool = False):
    """Distributed edge-function raster frame: identical output, pixel
    blocks split across chips. The triangle SETUP slabs (the vertex
    stage's output) replicate like the scene — the same policy as the
    trace path — so the only cross-chip traffic is the framebuffer
    gather. MSAA sample passes share one setup."""
    import numpy as np

    from vkrt_tpu.raster.edge import build_raster_setup
    from vkrt_tpu.raster.pipeline import (MSAA8, edge_color_lanes,
                                          sample_pixel_lanes)

    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    wp, hp = engine._pad_dims(cfg.width, cfg.height)
    setup, scb, clb = build_raster_setup(tree, view, proj,
                                         cfg.width, cfg.height)

    offsets = MSAA8 if msaa == 8 else np.array([[0.5, 0.5]], np.float32)
    acc = None
    for off in offsets:
        px, py, inside = sample_pixel_lanes(cfg, tuple(off))
        nb = px.shape[0]
        # pad so each device gets a whole number of 512-pixel blocks
        per_dev = -(-nb // (n_dev * 4)) * 4
        pad = per_dev * n_dev - nb
        px_p = jnp.pad(px, ((0, pad), (0, 0)))
        py_p = jnp.pad(py, ((0, pad), (0, 0)))
        in_p = jnp.pad(inside, ((0, pad), (0, 0)), constant_values=False)

        fn = _shard_map(
            functools.partial(edge_color_lanes, interpret=interpret),
            mesh,
            in_specs=(P(), P(), P(), P(), P(axis, None), P(axis, None),
                      P(axis, None)),
            out_specs=P(None, axis, None),
        )
        color = fn(tex, setup, scb, clb, px_p, py_p, in_p)[:, :nb]
        s = jnp.stack([engine.untile(color[k], hp, wp)[: cfg.height,
                                                       : cfg.width]
                       for k in range(3)], axis=-1)
        acc = s if acc is None else acc + s
    return acc / len(offsets)
