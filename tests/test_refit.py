"""Per-frame refit (config 5 path) — transform correctness + trace parity."""

import jax.numpy as jnp
import numpy as np

from vkrt_tpu.accel import build_clusters, refit_clusters
from vkrt_tpu.rt.dense import trace_dense_rays as trace_dense


def make(rng, n=500):
    v0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    return v0, e1, e2


def test_identity_refit_is_noop(rng):
    v0, e1, e2 = make(rng)
    tree = build_clusters(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                          device=False)
    tree2 = refit_clusters(tree, jnp.eye(4))
    np.testing.assert_allclose(np.asarray(tree2.sc_boxes),
                               np.asarray(tree.sc_boxes), atol=1e-5)
    # geometry + attribute columns are exact under identity
    np.testing.assert_allclose(np.asarray(tree2.tri_data)[:, :, :36],
                               np.asarray(tree.tri_data)[:, :, :36], atol=1e-5)


def test_translated_refit_traces_correctly(rng):
    v0, e1, e2 = make(rng)
    tree = build_clusters(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                          device=False)
    shift = np.array([3.0, -2.0, 1.0], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = shift
    moved = refit_clusters(tree, jnp.asarray(m))

    o, d = np.zeros((128, 3), np.float32), np.zeros((128, 3), np.float32)
    rng2 = np.random.default_rng(3)
    o[:] = rng2.uniform(-8, 8, (128, 3))
    d[:] = rng2.normal(size=(128, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(128, 1e3, np.float32)

    # tracing the refit tree with shifted rays == tracing original tree
    t1, s1, u1, v1 = trace_dense(moved, jnp.asarray(o + shift), jnp.asarray(d),
                                 jnp.asarray(tmax), block=128, interpret=True)
    t0, s0, u0, v0_ = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(tmax), block=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(s1) >= 0, np.asarray(s0) >= 0)
    both = (np.asarray(s1) >= 0) & (np.asarray(s0) >= 0)
    np.testing.assert_allclose(np.asarray(t1)[both], np.asarray(t0)[both],
                               rtol=1e-4, atol=1e-4)


def test_scaled_refit_boxes_scale(rng):
    v0, e1, e2 = make(rng)
    tree = build_clusters(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                          device=False)
    m = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    scaled = refit_clusters(tree, jnp.asarray(m))
    sb0 = np.asarray(tree.sc_boxes)
    sb1 = np.asarray(scaled.sc_boxes)
    real = sb0[0] < 1e37
    np.testing.assert_allclose(sb1[0][real], 2 * sb0[0][real], rtol=1e-5)


def test_refit_recomputes_sub_gate_boxes(rng):
    """The 16-tri sub-run AABBs riding tri_data's pad columns
    (accel/clusters._assemble) must follow a refit transform — stale
    boxes would silently skip sub-sweeps (missed hits) under
    cfg.sub_gate_*. Trace with sub_gate on/off on a refit tree: any
    staleness shows up as a mask difference."""
    v0, e1, e2 = make(rng)
    tree = build_clusters(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                          device=False)
    m = jnp.asarray(np.array([[0.8, 0, 0, 1.5], [0, 0.8, 0, -2.0],
                              [0, 0, 0.8, 0.5], [0, 0, 0, 1.0]],
                             np.float32))
    moved = refit_clusters(tree, m)
    n = 512
    o = rng.uniform(-8, -7, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tm = np.full(n, 60.0, np.float32)
    a = trace_dense(moved, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm),
                    block=128, interpret=True)
    b = trace_dense(moved, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm),
                    block=128, interpret=True, sub_gate=True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int((np.asarray(a[1]) >= 0).sum()) > 0
