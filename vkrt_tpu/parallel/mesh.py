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
