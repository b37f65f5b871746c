"""Headless framebuffer output — replaces swapchain present.

The reference copies its rgba32f storage image into a B8G8R8A8_UNORM
swapchain image and presents via GLFW (ref: src/Raytracer.cpp:159-193,
src/Context.cpp:154-180). Headless equivalent: clamp linear values to [0,1]
and write PNG/npy (UNORM semantics — no gamma anywhere in the reference).
"""

from __future__ import annotations

import numpy as np


def to_unorm8(img: np.ndarray) -> np.ndarray:
    """f32[H,W,3] linear → u8[H,W,3], matching UNORM store+copy semantics.
    u8 input (already quantized on device) passes through unchanged."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray(to_unorm8(img), mode="RGB").save(path)


def write_npy(path: str, img: np.ndarray) -> None:
    np.save(path, np.asarray(img, dtype=np.float32))


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Golden-image metric (BASELINE.json: ≤1e-3 RMSE, on clamped UNORM scale)."""
    ca = np.clip(np.asarray(a, dtype=np.float64), 0.0, 1.0)
    cb = np.clip(np.asarray(b, dtype=np.float64), 0.0, 1.0)
    return float(np.sqrt(np.mean((ca - cb) ** 2)))
