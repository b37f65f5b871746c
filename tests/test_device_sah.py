"""Device variable-cut SAH build (accel/device_sah.py, round 4)."""

import numpy as np

from vkrt_tpu.scene import flatten_model
from vkrt_tpu.scene.model import Model


def _cluster_sa(order, v0, e1, e2, k1=128):
    """Total cluster-AABB surface-area-proxy of a triangle ordering."""
    T = len(order)
    Tp = -(-T // k1) * k1
    tmin = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)[order]
    tmax = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)[order]
    pad = Tp - T
    if pad:
        tmin = np.concatenate([tmin, np.full((pad, 3), 3e38)])
        tmax = np.concatenate([tmax, np.full((pad, 3), -3e38)])
    cmin = tmin.reshape(-1, k1, 3).min(axis=1)
    cmax = tmax.reshape(-1, k1, 3).max(axis=1)
    ext = np.maximum(cmax - cmin, 0)
    return (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
            + ext[:, 2] * ext[:, 0]).sum()


def test_device_sah_order_quality(sponza_model):
    """The device build must (a) emit a true permutation and (b) land
    within 15% of the HOST variable-cut build's total cluster-AABB area
    (full-scene check: 8855 vs 8617 = +2.8%, vs the Morton order's
    19112 — tools/r4_device_sah_check.py)."""
    import jax.numpy as jnp

    from vkrt_tpu.accel.clusters import (_morton_host, split_permutation)
    from vkrt_tpu.accel.device_sah import device_sah_order

    model = Model(submeshes=sponza_model.submeshes[:8],
                  materials=sponza_model.materials,
                  images=sponza_model.images)
    flat = flatten_model(model)
    idx = np.asarray(flat.indices, np.int64)
    v0 = flat.positions[idx[:, 0]].astype(np.float64)
    e1 = flat.positions[idx[:, 1]].astype(np.float64) - v0
    e2 = flat.positions[idx[:, 2]].astype(np.float64) - v0

    order = np.asarray(device_sah_order(
        jnp.asarray(v0, jnp.float32), jnp.asarray(e1, jnp.float32),
        jnp.asarray(e2, jnp.float32), max_levels=16))
    assert len(order) == v0.shape[0]
    assert len(np.unique(order)) == len(order)          # true permutation

    host = split_permutation(v0, e1, e2, sah=True)
    sa_dev = _cluster_sa(order, v0, e1, e2)
    sa_host = _cluster_sa(host, v0, e1, e2)
    c = v0 + (e1 + e2) / 3.0
    codes = _morton_host(v0.astype(np.float32), e1.astype(np.float32),
                         e2.astype(np.float32),
                         c.min(axis=0).astype(np.float32),
                         c.max(axis=0).astype(np.float32))
    sa_mort = _cluster_sa(np.argsort(codes, kind="stable"), v0, e1, e2)
    # full-scene parity is +2.8% (tools/r4_device_sah_check.py); the
    # 8-submesh subset is harsher on the binned axis choice (small
    # segments) — bound it at 1.3x and strictly below the Morton order
    assert sa_dev <= 1.30 * sa_host, (sa_dev, sa_host)
    assert sa_dev < 0.8 * sa_mort, (sa_dev, sa_mort)
