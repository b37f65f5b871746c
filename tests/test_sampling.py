"""Device sampler vs the oracle sampler — bilinear/repeat semantics parity."""

import jax.numpy as jnp
import numpy as np

from vkrt_tpu.golden.cpu_tracer import sample_texture
from vkrt_tpu.scene.model import Image
from vkrt_tpu.scene.textures import build_texture_heap
from vkrt_tpu.shade.sampling import sample_bilinear
from vkrt_tpu.utils import layout as L


def make_heap(rng):
    imgs = [Image(width=16, height=8,
                  data=rng.integers(0, 256, (8, 16, 4)).astype(np.uint8)),
            Image(width=4, height=4,
                  data=rng.integers(0, 256, (4, 4, 4)).astype(np.uint8))]
    return build_texture_heap(imgs)


def test_sampler_matches_oracle(rng):
    heap = make_heap(rng)
    n = 256
    tex_ids = rng.integers(0, 2, n).astype(np.int32)
    uv = rng.uniform(-2.0, 3.0, (n, 2)).astype(np.float32)  # exercises wrap

    got = sample_bilinear(jnp.asarray(heap.quad_texels()),
                          jnp.asarray(heap.level_offset),
                          jnp.asarray(heap.level_width),
                          jnp.asarray(heap.level_height),
                          L.to_lanes(jnp.asarray(tex_ids)),
                          jnp.stack([L.to_lanes(jnp.asarray(uv[:, 0])),
                                     L.to_lanes(jnp.asarray(uv[:, 1]))]))
    got = np.stack([L.from_lanes(got[c]) for c in range(4)], axis=1)
    want = sample_texture(heap, tex_ids.astype(np.int64), uv)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quad_heap_consistency(rng):
    heap = make_heap(rng)
    q = heap.quad_texels()
    # quad[:, 0:4] is the texel itself
    np.testing.assert_array_equal(q[:, 0:4], heap.texels)
    # wrap: last column's right neighbor is column 0 (image 0, level 0)
    w = int(heap.level_width[0, 0])
    np.testing.assert_array_equal(q[w - 1, 4:8], heap.texels[0])


def test_layout_roundtrips(rng):
    x = rng.normal(size=(512,)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(L.from_lanes(L.to_lanes(jnp.asarray(x)))), x)
    v = rng.normal(size=(512, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(L.from_cvec(L.to_cvec(jnp.asarray(v)))), v)
    a = L.to_cvec(jnp.asarray(v))
    b = L.to_cvec(jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32)))
    np.testing.assert_allclose(
        np.asarray(L.dot3(a, b)).reshape(-1),
        (v * np.asarray(L.from_cvec(b))).sum(axis=1), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(L.from_cvec(L.cross3(a, b))),
        np.cross(v, np.asarray(L.from_cvec(b))), rtol=2e-5, atol=1e-5)
