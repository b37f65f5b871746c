"""wavefront/lanesort.py — block-local stable per-ray partition.

The kernel's contract: within every trace block, lanes re-order by a
stable sort of the key channel (numpy argsort kind='stable' is the
oracle); the rank output inverts it exactly via lane_unsort. All data
movement is one-hot MXU matmuls at precision=HIGHEST — value-exact for
f32 payloads (the wavefront/pack.py argument, hardware-verified there)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vkrt_tpu.wavefront import lanesort


@pytest.mark.parametrize("block", [512, 1024])
def test_lane_sort_matches_numpy_stable(block):
    rng = np.random.default_rng(7)
    nb, lanes = 16, 128
    n = nb * lanes
    nbk = n // block
    key = rng.integers(0, 600, (nb, lanes)).astype(np.int32)
    ch = [rng.normal(size=(nb, lanes)).astype(np.float32) for _ in range(5)]

    out, rank = lanesort.lane_sort([jnp.asarray(c) for c in ch],
                                   jnp.asarray(key), block=block,
                                   interpret=True)
    out = [np.asarray(o) for o in out]
    rank = np.asarray(rank)

    kf = key.reshape(nbk, block)
    for b in range(nbk):
        perm = np.argsort(kf[b], kind="stable")
        for c in range(5):
            cf = ch[c].reshape(nbk, block)
            of = out[c].reshape(nbk, block)
            np.testing.assert_array_equal(of[b], cf[b][perm])
        inv = np.empty(block, np.int64)
        inv[perm] = np.arange(block)
        np.testing.assert_array_equal(
            rank.reshape(nbk, block)[b].astype(np.int64), inv)


def test_lane_unsort_inverts(block=512):
    rng = np.random.default_rng(11)
    nb, lanes, ns = 8, 128, 3
    n = nb * lanes
    nbk = n // block
    key = rng.integers(0, 40, (nb, lanes)).astype(np.int32)  # many ties
    res = rng.normal(size=(ns, nb, lanes)).astype(np.float32)

    # sort the results with numpy, unsort with the kernel
    kf = key.reshape(nbk, block)
    sorted_np = np.stack([
        np.stack([res[s].reshape(nbk, block)[b][
            np.argsort(kf[b], kind="stable")] for b in range(nbk)])
        for s in range(ns)]).reshape(ns, nb, lanes)
    _, rank = lanesort.lane_sort([jnp.asarray(res[0])], jnp.asarray(key),
                                 block=block, interpret=True)
    back = np.asarray(lanesort.lane_unsort(
        jnp.asarray(sorted_np), rank, block=block, interpret=True))
    np.testing.assert_array_equal(back, res)


def test_keys_send_dead_rays_to_tail():
    rng = np.random.default_rng(3)
    nb, lanes = 8, 128
    aabb = jnp.asarray(np.array([[-1., -1, -1], [1, 1, 1]], np.float32))
    p = jnp.asarray(rng.uniform(-1, 1, (3, nb, lanes)).astype(np.float32))
    live_np = rng.random((nb, lanes)) < 0.7
    live = jnp.asarray(live_np)
    k = np.asarray(lanesort.cell_key_fine(p, live, aabb, bits=6))
    assert k[~live_np].min() == 1 << 18
    assert k[live_np].max() < 1 << 18
    d = jnp.asarray(rng.normal(size=(3, nb, lanes)).astype(np.float32))
    k2 = np.asarray(lanesort.dir_cell_key_fine(d, p, live, aabb, bits=5))
    assert k2[~live_np].min() == 1 << 18
    assert k2[live_np].max() < 1 << 18
