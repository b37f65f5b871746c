"""Texture heap: mip-chain generation + flat gather-friendly storage.

Replaces the reference's 69 sampled Vulkan images with full blit-generated
mip chains (ref: src/Raytracer.cpp:460-640) and the bindless
`sampler2D textures[]` array (ref: shaders/shader.rchit:76).

TPU-first design: all images and all mip levels live in ONE flat u8[N,4]
texel heap in HBM, addressed through small (image, level) → offset/width/
height tables. Sampling is then a pure gather: texel(i, l, x, y) =
heap[offset[i,l] + y*width[i,l] + x]. Arbitrary per-image sizes, no padding
waste, single gather source for XLA.

Mip generation matches the reference's successive linear blit:
dims halve (floor, min 1) per level until 1x1
(ref: src/Raytracer.cpp:572-640, vkCmdBlitImage VK_FILTER_LINEAR); for the
even dimensions used here that is an exact 2x2 box average.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from vkrt_tpu.scene.model import Image


def mip_levels_for(width: int, height: int) -> int:
    # ref: src/Raytracer.cpp:481 — floor(log2(max(w,h))) + 1
    return int(np.floor(np.log2(max(width, height)))) + 1


def downsample_box(img: np.ndarray) -> np.ndarray:
    """One mip step: halve both dims (floor, min 1) with a box filter."""
    h, w = img.shape[:2]
    nh, nw = max(1, h // 2), max(1, w // 2)
    x = img[: nh * 2 if h > 1 else 1, : nw * 2 if w > 1 else 1].astype(np.float32)
    if h > 1:
        x = (x[0::2] + x[1::2]) * 0.5
    if w > 1:
        x = (x[:, 0::2] + x[:, 1::2]) * 0.5
    return np.clip(x + 0.5, 0, 255).astype(np.uint8)  # round-half-up like GPU blit


def build_mip_chain(img: np.ndarray) -> List[np.ndarray]:
    levels = [img]
    while levels[-1].shape[0] > 1 or levels[-1].shape[1] > 1:
        levels.append(downsample_box(levels[-1]))
    return levels


@dataclasses.dataclass
class TextureHeap:
    texels: np.ndarray        # u8[N,4] — all images, all mips, row-major
    level_offset: np.ndarray  # i32[I,L] — start index into texels
    level_width: np.ndarray   # i32[I,L]
    level_height: np.ndarray  # i32[I,L]
    num_levels: np.ndarray    # i32[I]

    @property
    def num_images(self) -> int:
        return int(self.level_offset.shape[0])

    def quad_texels(self) -> np.ndarray:
        """u8[N,16]: for every texel (x,y), its bilinear 2x2 quad
        [(x,y),(x+1,y),(x,y+1),(x+1,y+1)] with repeat wrap pre-applied.

        One TPU gather fetches a whole bilinear footprint — measured
        gathers cost ~34ns/row regardless of row width, so this turns 4
        gathers per sample into 1 at 4x texel memory.
        """
        n = self.texels.shape[0]
        idx = np.empty((n, 4), np.int32)
        # group real levels by shape → one vectorized pass per distinct size
        levels = {}
        for i in range(self.level_offset.shape[0]):
            for l in range(int(self.num_levels[i])):
                off = int(self.level_offset[i, l])
                w = int(self.level_width[i, l])
                h = int(self.level_height[i, l])
                levels.setdefault((w, h), []).append(off)
        for (w, h), offs in levels.items():
            yy, xx = np.divmod(np.arange(w * h, dtype=np.int32), w)
            x1 = np.where(xx + 1 == w, 0, xx + 1)
            y1 = np.where(yy + 1 == h, 0, yy + 1)
            pat = np.stack([yy * w + xx, yy * w + x1,
                            y1 * w + xx, y1 * w + x1], axis=1)   # [w*h,4]
            offs_arr = np.asarray(offs, np.int32)[:, None, None]
            block = (offs_arr + pat[None]).reshape(-1, 4)
            dst = (offs_arr[:, 0, 0][:, None]
                   + np.arange(w * h, dtype=np.int32)[None]).reshape(-1)
            idx[dst] = block
        return self.texels[idx].reshape(n, 16)


def build_texture_heap(images: List[Image]) -> TextureHeap:
    if not images:
        # 1-texel white fallback so gathers are always valid
        images = [Image(width=1, height=1,
                        data=np.full((1, 1, 4), 255, dtype=np.uint8))]

    chains = [build_mip_chain(im.data) for im in images]
    max_levels = max(len(c) for c in chains)
    n_img = len(chains)

    level_offset = np.zeros((n_img, max_levels), dtype=np.int32)
    level_width = np.ones((n_img, max_levels), dtype=np.int32)
    level_height = np.ones((n_img, max_levels), dtype=np.int32)
    num_levels = np.zeros(n_img, dtype=np.int32)

    parts = []
    offset = 0
    for i, chain in enumerate(chains):
        num_levels[i] = len(chain)
        for l, lvl in enumerate(chain):
            h, w = lvl.shape[:2]
            level_offset[i, l] = offset
            level_width[i, l] = w
            level_height[i, l] = h
            parts.append(lvl.reshape(-1, 4))
            offset += h * w
        # clamp absent trailing levels to the last real one (sampler
        # maxLod=VK_LOD_CLAMP_NONE clamps to the image's top mip)
        for l in range(len(chain), max_levels):
            level_offset[i, l] = level_offset[i, len(chain) - 1]
            level_width[i, l] = level_width[i, len(chain) - 1]
            level_height[i, l] = level_height[i, len(chain) - 1]

    return TextureHeap(
        texels=np.concatenate(parts, axis=0),
        level_offset=level_offset,
        level_width=level_width,
        level_height=level_height,
        num_levels=num_levels,
    )
