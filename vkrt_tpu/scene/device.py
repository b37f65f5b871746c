"""Device-resident scene: the HBM analogue of the reference's GPU buffers.

One-time `jax.device_put` of the flattened scene + texture heap replaces the
reference's ~75 staging-buffer uploads (ref: src/VulkanUtils.cpp:232-285,
src/Raytracer.cpp:460-742). The scene is replicated per chip under multi-chip
sharding (rays are sharded, scene is not — SURVEY.md §2 parallelism notes).

Triangle geometry is additionally pre-expanded to (v0, e1, e2) form so the
Möller–Trumbore inner loop needs a single [T,9]-style gather per candidate
instead of three vertex gathers through the index buffer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu.config import LIGHT_POSITIONS
from vkrt_tpu.scene.flatten import FlatScene
from vkrt_tpu.scene.textures import TextureHeap


class DeviceScene(NamedTuple):
    # vertex attributes (world space)
    positions: jax.Array        # f32[V,3]
    normals: jax.Array          # f32[V,3]
    uvs: jax.Array              # f32[V,2]
    tangents: jax.Array         # f32[V,4]
    indices: jax.Array          # i32[T,3]
    # pre-expanded intersection geometry
    tri_v0: jax.Array           # f32[T,3]
    tri_e1: jax.Array           # f32[T,3]  (v1 - v0)
    tri_e2: jax.Array           # f32[T,3]  (v2 - v0)
    # per-triangle material image indices
    tri_base_color: jax.Array   # i32[T]
    tri_metallic_roughness: jax.Array  # i32[T]
    tri_normal: jax.Array       # i32[T]
    # texture heap
    tex_texels: jax.Array       # u8[N,4]
    tex_level_offset: jax.Array  # i32[I,L]
    tex_level_width: jax.Array   # i32[I,L]
    tex_level_height: jax.Array  # i32[I,L]
    # lighting
    light_positions: jax.Array  # f32[4,3]

    @property
    def num_triangles(self) -> int:
        return int(self.indices.shape[0])


def scene_to_device(flat: FlatScene, heap: TextureHeap,
                    light_positions: np.ndarray | None = None) -> DeviceScene:
    if light_positions is None:
        light_positions = LIGHT_POSITIONS
    idx = flat.indices.astype(np.int32)
    v0 = flat.positions[idx[:, 0]]
    v1 = flat.positions[idx[:, 1]]
    v2 = flat.positions[idx[:, 2]]
    return DeviceScene(
        positions=jnp.asarray(flat.positions),
        normals=jnp.asarray(flat.normals),
        uvs=jnp.asarray(flat.uvs),
        tangents=jnp.asarray(flat.tangents),
        indices=jnp.asarray(idx),
        tri_v0=jnp.asarray(v0),
        tri_e1=jnp.asarray(v1 - v0),
        tri_e2=jnp.asarray(v2 - v0),
        tri_base_color=jnp.asarray(flat.tri_base_color),
        tri_metallic_roughness=jnp.asarray(flat.tri_metallic_roughness),
        tri_normal=jnp.asarray(flat.tri_normal),
        tex_texels=jnp.asarray(heap.texels),
        tex_level_offset=jnp.asarray(heap.level_offset),
        tex_level_width=jnp.asarray(heap.level_width),
        tex_level_height=jnp.asarray(heap.level_height),
        light_positions=jnp.asarray(light_positions),
    )
