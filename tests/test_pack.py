"""wavefront/pack.py — live-ray consolidation unit tests (interpret).

The engine-level frame bit-equality lives in
tests/test_backends.py::test_consolidate_secondary_bit_exact; these pin
the primitive's contract directly: stable rank order, value exactness
(the one-hot HIGHEST matmul argument), zero dead-tail, scatter-back
inversion, and edge cases (empty / full / single-block wavefronts).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vkrt_tpu.wavefront.pack import (consolidate, consolidate_plan,
                                     scatter_back)


def _roundtrip(live, block, n_ch=5, seed=0):
    rng = np.random.default_rng(seed)
    nb = live.shape[0]
    ch = [rng.normal(size=(nb, 128)).astype(np.float32) for _ in range(n_ch)]
    plan = consolidate_plan(jnp.asarray(live), block)
    packed = consolidate([jnp.asarray(c) for c in ch], plan["grank"],
                         plan["src_lo"], plan["src_hi"], block=block,
                         interpret=True)
    order = np.argsort(~live.reshape(-1), kind="stable")
    nlive = int(live.sum())
    for c, p in zip(ch, packed):
        got = np.asarray(p).reshape(-1)
        np.testing.assert_array_equal(got[:nlive],
                                      c.reshape(-1)[order][:nlive])
        assert (got[nlive:] == 0).all()

    res = rng.normal(size=(3, nb * 128)).astype(np.float32)
    res[:, nlive:] = 777.0           # beyond-live garbage must not leak
    back = np.asarray(scatter_back(
        jnp.asarray(res.reshape(3, nb, 128)), plan["grank"], block=block,
        interpret=True)).reshape(3, -1)
    inv = np.empty_like(order)
    inv[order] = np.arange(order.size)
    want = np.where(live.reshape(-1)[None],
                    res[np.arange(3)[:, None], inv[None, :]], 0.0)
    np.testing.assert_array_equal(back, want)


@pytest.mark.parametrize("frac", [0.1, 0.27, 0.9])
def test_roundtrip_random(frac):
    rng = np.random.default_rng(42)
    _roundtrip(rng.random((64, 128)) < frac, 512)


def test_roundtrip_block_1024():
    rng = np.random.default_rng(7)
    _roundtrip(rng.random((64, 128)) < 0.2, 1024)


def test_all_dead_and_all_live():
    _roundtrip(np.zeros((32, 128), bool), 512)
    _roundtrip(np.ones((32, 128), bool), 512)


def test_single_block():
    rng = np.random.default_rng(3)
    _roundtrip(rng.random((4, 128)) < 0.5, 512)


def test_clustered_liveness():
    """Liveness concentrated in a few source blocks (reflection blobs):
    destination ranges span long dead gaps."""
    live = np.zeros((64, 128), bool)
    live[5:9] = True
    live[50:54] = True
    _roundtrip(live, 512)


def test_plan_ranges_cover_sources():
    """Every source block with a live ray must fall inside the [lo, hi]
    range of the destination block(s) its ranks map to."""
    rng = np.random.default_rng(11)
    live = rng.random((64, 128)) < 0.3
    block = 512
    plan = consolidate_plan(jnp.asarray(live), block)
    grank = np.asarray(plan["grank"]).reshape(-1)
    lo = np.asarray(plan["src_lo"])
    hi = np.asarray(plan["src_hi"])
    for i in np.nonzero(grank >= 0)[0]:
        s = i // block
        d = int(grank[i]) // block
        assert lo[d] <= s <= hi[d], (i, s, d, lo[d], hi[d])
