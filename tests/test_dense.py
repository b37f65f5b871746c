"""Dense-streaming cluster kernel vs brute force (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vkrt_tpu.accel.clusters import K1, K2, build_clusters
from vkrt_tpu.golden.cpu_tracer import closest_hit as brute_closest
from vkrt_tpu.golden.cpu_tracer import occluded as brute_occluded
from vkrt_tpu.rt.dense import trace_dense_rays as trace_dense


@pytest.fixture(scope="module")
def scene(rng=None):
    rng = np.random.default_rng(42)
    n = 900
    v0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    tree = build_clusters(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                          device=False)
    return v0, e1, e2, tree


def make_rays(n_rays=256, seed=5):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def test_dense_closest_matches_brute(scene):
    v0, e1, e2, tree = scene
    o, d = make_rays()
    tmax = np.full(o.shape[0], 1e3, np.float32)
    t, slot, u, v = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                                jnp.asarray(tmax), block=128, interpret=True)
    bt, btri, bu, bv = brute_closest(o, d, 0.001, 1e3, v0, e1, e2)
    tri = np.where(np.asarray(slot) >= 0,
                   np.asarray(tree.leaf_tri)[np.maximum(np.asarray(slot), 0)], -1)
    hit = tri >= 0
    np.testing.assert_array_equal(hit, btri >= 0)
    both = hit & (btri >= 0)
    np.testing.assert_allclose(np.asarray(t)[both], bt[both], rtol=1e-4, atol=1e-5)
    agree = tri[both] == btri[both]
    assert agree.mean() > 0.99
    np.testing.assert_allclose(np.asarray(u)[both][agree], bu[both][agree], atol=1e-4)


def test_dense_occlusion_matches_brute(scene):
    v0, e1, e2, tree = scene
    o, d = make_rays(seed=6)
    rng = np.random.default_rng(9)
    tmax = rng.uniform(0.5, 20.0, o.shape[0]).astype(np.float32)
    _, slot, _, _ = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                                jnp.asarray(tmax), block=128, occlusion=True,
                                interpret=True)
    bocc = brute_occluded(o, d, 0.001, tmax, v0, e1, e2)
    assert ((np.asarray(slot) >= 0) == bocc).mean() > 0.995


def test_dense_attributes_interpolate(scene):
    v0, e1, e2, tree_plain = scene
    # attach synthetic attributes: n0/n1/n2 constant per tri = tri index
    n = v0.shape[0]
    tid = np.arange(n, dtype=np.float32)[:, None]
    attrs = {
        "n0": jnp.asarray(np.tile(tid, (1, 3))),
        "n1": jnp.asarray(np.tile(tid, (1, 3))),
        "n2": jnp.asarray(np.tile(tid, (1, 3))),
        "uv0": jnp.asarray(np.zeros((n, 2), np.float32)),
        "uv1": jnp.asarray(np.tile([[1.0, 0.0]], (n, 1))),
        "uv2": jnp.asarray(np.tile([[0.0, 1.0]], (n, 1))),
        "t0": jnp.asarray(np.zeros((n, 3), np.float32)),
        "t1": jnp.asarray(np.zeros((n, 3), np.float32)),
        "t2": jnp.asarray(np.zeros((n, 3), np.float32)),
        "mat": jnp.asarray(np.tile(tid, (1, 3))),
    }
    tree = build_clusters(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                          attrs=attrs, with_attributes=True, device=False)
    o, d = make_rays(seed=11)
    tmax = np.full(o.shape[0], 1e3, np.float32)
    t, slot, u, v, a = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                                   jnp.asarray(tmax), block=128,
                                   with_attributes=True, interpret=True)
    slot = np.asarray(slot)
    hit = slot >= 0
    tri = np.asarray(tree.leaf_tri)[np.maximum(slot, 0)]
    a = np.asarray(a)
    # attr columns mirror the slab rows 0-35: 0-8 v0/e1/e2, 9-17 normals,
    # 18-23 uvs, 24-32 tangents, 33-35 material ids (see shading.interpolate)
    np.testing.assert_allclose(a[hit, 0], v0[tri[hit], 0], atol=1e-5)   # v0.x
    np.testing.assert_allclose(a[hit, 9], tri[hit].astype(np.float32), atol=1e-3)
    np.testing.assert_allclose(a[hit, 12], tri[hit].astype(np.float32), atol=1e-3)
    np.testing.assert_allclose(a[hit, 18], 0.0, atol=1e-6)   # uv0.x
    np.testing.assert_allclose(a[hit, 20], 1.0, atol=1e-6)   # uv1.x
    np.testing.assert_allclose(a[hit, 33], tri[hit].astype(np.float32), atol=1e-3)


def test_cluster_tree_shapes(scene):
    _, _, _, tree = scene
    from vkrt_tpu.accel.clusters import ROWS as _ROWS
    assert tree.tri_data.shape[1] == K1
    assert tree.tri_data.shape[2] == _ROWS
    assert tree.cl_boxes.shape[2] == K2
    # padding slots map to -1
    n_real = 900
    assert (np.asarray(tree.leaf_tri) >= 0).sum() == n_real


def test_dense_scales_past_64_superclusters():
    """Generality past the round-1 cap (64 SC = 524,288 tris): a >600k-tri
    scene must trace correctly — the driver-BVH-generality analogue
    (ref: src/Raytracer.cpp:1027-1157 handles arbitrary geometry)."""
    rng = np.random.default_rng(7)
    n = 620_000                       # > 64 * 64 * 128
    v0 = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    tree = build_clusters(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                          device=False)
    assert tree.num_superclusters > 64

    o, d = make_rays(n_rays=128, seed=13)
    o = (o * 6.0).astype(np.float32)     # origins spread across the volume
    tmax = np.full(o.shape[0], 1e3, np.float32)
    t, slot, u, v = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                                jnp.asarray(tmax), block=128, interpret=True)
    bt, btri, bu, bv = brute_closest(o, d, 0.001, 1e3, v0, e1, e2)
    tri = np.where(np.asarray(slot) >= 0,
                   np.asarray(tree.leaf_tri)[np.maximum(np.asarray(slot), 0)], -1)
    hit = tri >= 0
    np.testing.assert_array_equal(hit, btri >= 0)
    assert hit.any()
    both = hit & (btri >= 0)
    np.testing.assert_allclose(np.asarray(t)[both], bt[both], rtol=1e-4,
                               atol=1e-5)


def test_dense_block512_subgroups_match_brute(scene):
    """block=512 exercises 4-subgroup gating (per-128-ray masks + btmax);
    results must match the single-subgroup/block=128 contract."""
    v0, e1, e2, tree = scene
    o, d = make_rays(n_rays=512, seed=51)
    tmax = np.full(o.shape[0], 1e3, np.float32)
    t, slot, u, v = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                                jnp.asarray(tmax), block=512, interpret=True)
    bt, btri, bu, bv = brute_closest(o, d, 0.001, 1e3, v0, e1, e2)
    tri = np.where(np.asarray(slot) >= 0,
                   np.asarray(tree.leaf_tri)[np.maximum(np.asarray(slot), 0)], -1)
    hit = tri >= 0
    np.testing.assert_array_equal(hit, btri >= 0)
    both = hit & (btri >= 0)
    np.testing.assert_allclose(np.asarray(t)[both], bt[both], rtol=1e-4,
                               atol=1e-5)
    # occlusion flavor too
    _, oslot, _, _ = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                                 jnp.asarray(tmax * 0.02), block=512,
                                 occlusion=True, interpret=True)
    bocc = brute_occluded(o, d, 0.001, tmax * 0.02, v0, e1, e2)
    np.testing.assert_array_equal(np.asarray(oslot) >= 0, bocc)


def test_point_origin_matches_broadcast(scene):
    """point_origin=True (one shared origin per 512-ray block — the
    primary/shadow fast path) must match the broadcast path exactly,
    including parked (tmax=0) rays."""
    from vkrt_tpu.rt.dense import trace_dense as trace_lane
    from vkrt_tpu.utils import layout as L

    v0, e1, e2, tree = scene
    rng = np.random.default_rng(13)
    pts = np.array([[-7.0, 1.0, 2.0], [6.0, -2.0, 1.0]], np.float32)
    N = 1024                       # 2 blocks of 512
    o_full = np.repeat(pts, 512, axis=0)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(N, 1e3, np.float32)
    tmax[::7] = 0.0                # parked rays
    ob = L.to_cvec(jnp.asarray(o_full))
    db = L.to_cvec(jnp.asarray(d))
    tm = L.to_lanes(jnp.asarray(tmax))

    ref = trace_lane(tree, ob, db, tm, with_attributes=True, interpret=True)
    got = trace_lane(tree, jnp.asarray(pts), db, tm, with_attributes=True,
                     interpret=True, point_origin=True)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_allclose(np.asarray(ref[4]), np.asarray(got[4]),
                               rtol=1e-6)

    orf = trace_lane(tree, ob, db, tm, occlusion=True, interpret=True)
    ogt = trace_lane(tree, jnp.asarray(pts), db, tm, occlusion=True,
                     interpret=True, point_origin=True)
    np.testing.assert_array_equal(np.asarray(orf[1]), np.asarray(ogt[1]))


def test_occluded_multi_matches_per_light(scene):
    """Multi-segment occlusion (one block serves NS lights' segments,
    shared gating/DMA, per-set sweep skip) == per-light point-origin
    dispatches, including parked rays."""
    from vkrt_tpu.rt.dense import trace_dense as trace_lane
    from vkrt_tpu.rt.occl_multi import occluded_multi
    from vkrt_tpu.utils import layout as L

    v0, e1, e2, tree = scene
    rng = np.random.default_rng(21)
    NS, N = 3, 256
    lights = np.array([[6, 6, 0], [2, 5, 0], [-6, 3, 0]], np.float32)
    pts = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    dirs = np.zeros((NS, 3, N // 128, 128), np.float32)
    tm = np.zeros((NS, N // 128, 128), np.float32)
    for s in range(NS):
        dvec = pts - lights[s]
        dist = np.linalg.norm(dvec, axis=1)
        dn = dvec / dist[:, None]
        dirs[s] = np.asarray(L.to_cvec(jnp.asarray(dn)))
        tmv = (dist - 0.001).astype(np.float32)
        tmv[rng.random(N) < 0.3] = 0.0          # parked rays
        tm[s] = np.asarray(L.to_lanes(jnp.asarray(tmv)))
    occ = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                         jnp.asarray(tm), block=128, interpret=True)
    for s in range(NS):
        o_pts = np.repeat(lights[s][None, :], N // 128, axis=0)
        _, slot, _, _ = trace_lane(tree, jnp.asarray(o_pts),
                                   jnp.asarray(dirs[s]), jnp.asarray(tm[s]),
                                   occlusion=True, point_origin=True,
                                   block=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(slot) >= 0,
                                      np.asarray(occ[s]))


def test_dense_attrs_bit_exact(scene):
    """The fused attribute select must return the STORED f32 attribute
    values bit-exactly (it is a selection, not math). Guards against the
    MXU one-hot matmul's default bf16 operand truncation, which silently
    rounded uvs/normals to 8 mantissa bits (round-2 bug: bent reflection
    rays, RMSE 0.104 vs the oracle at depth 2). Pallas interpret mode
    reproduces TPU matmul precision semantics, so this catches it on CPU.
    """
    from vkrt_tpu.accel.clusters import build_clusters
    from vkrt_tpu.rt.dense import trace_dense_rays

    v0, e1, e2, _ = scene
    rng = np.random.default_rng(31)
    # attributes with many non-bf16-representable values
    T = v0.shape[0]
    attrs = {}
    for k in ("n0", "n1", "n2", "t0", "t1", "t2"):
        attrs[k] = jnp.asarray(rng.normal(size=(T, 3)).astype(np.float32))
    for k in ("uv0", "uv1", "uv2"):
        attrs[k] = jnp.asarray(rng.uniform(-4, 4, (T, 2)).astype(np.float32))
    attrs["mat"] = jnp.asarray(rng.integers(0, 60, (T, 3)).astype(np.float32))
    tree = build_clusters(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                          attrs=attrs, with_attributes=True, device=False)

    o, d = make_rays(seed=33)
    tmax = np.full(o.shape[0], 1e3, np.float32)
    t, slot, u, v, out = trace_dense_rays(tree, o, d, tmax, block=128,
                                          with_attributes=True,
                                          interpret=True)
    hit = np.asarray(slot) >= 0
    stored = np.asarray(tree.tri_data)  # [C1p, K1, ROWS]
    sl = np.asarray(slot)[hit]
    want = stored[sl // 128, sl % 128, :36]
    np.testing.assert_array_equal(np.asarray(out)[hit], want)


def test_occluded_multi_near_light_not_blocked(scene):
    """A live segment with 0 < tmax <= TMIN (light within ~2*RAY_TMIN of
    the surface) must be reported NOT blocked — the interval [TMIN, tmax]
    is empty, so no intersection test can run. Round-2 advisor finding:
    the multi kernel inferred blockage from t_s <= TMIN, which such rays
    satisfy at initialization, producing false shadows and diverging from
    the single-segment kernel and ReferenceBackend."""
    from vkrt_tpu.rt.occl_multi import occluded_multi
    from vkrt_tpu.utils import layout as L

    v0, e1, e2, tree = scene
    rng = np.random.default_rng(31)
    NS, N = 2, 128
    lights = np.array([[6, 6, 0], [-6, 3, 0]], np.float32)
    pts = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    dirs = np.zeros((NS, 3, N // 128, 128), np.float32)
    tm = np.zeros((NS, N // 128, 128), np.float32)
    for s in range(NS):
        dvec = pts - lights[s]
        dist = np.linalg.norm(dvec, axis=1)
        dn = dvec / dist[:, None]
        dirs[s] = np.asarray(L.to_cvec(jnp.asarray(dn)))
        tmv = (dist - 0.001).astype(np.float32)
        tmv[rng.random(N) < 0.3] = 0.0            # parked rays
        # near-light segments: live but with an empty [TMIN, tmax]
        tmv[:8] = 0.0009
        tm[s] = np.asarray(L.to_lanes(jnp.asarray(tmv)))
    occ = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                         jnp.asarray(tm), block=128, interpret=True)
    occ = np.asarray(occ)
    for s in range(NS):
        flat = np.asarray(L.from_lanes(jnp.asarray(occ[s])))
        assert not flat[:8].any(), "empty-interval segments reported blocked"
        # and the multi path still agrees with the single-segment kernel
        from vkrt_tpu.rt.dense import trace_dense as trace_lane
        o_pts = np.repeat(lights[s][None, :], N // 128, axis=0)
        _, slot, _, _ = trace_lane(tree, jnp.asarray(o_pts),
                                   jnp.asarray(dirs[s]), jnp.asarray(tm[s]),
                                   occlusion=True, point_origin=True,
                                   block=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(slot) >= 0, occ[s] > 0)


def test_group_gate_closest_bit_exact(scene):
    """Per-group sweep gating + per-group btmax (depth>=1 production
    path) must be a pure work-skipping optimization: outputs bit-equal
    to the ungated kernel, including parked rays and attributes."""
    v0, e1, e2, tree = scene
    rng = np.random.default_rng(33)
    o, d = make_rays(n_rays=1024, seed=33)
    tmax = np.where(rng.uniform(size=1024) < 0.4, 0.0, 1e3).astype(np.float32)
    for block in (256, 512):
        base = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(tmax), block=block, interpret=True,
                           with_attributes=True, sort=False)
        gg = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                         jnp.asarray(tmax), block=block, interpret=True,
                         with_attributes=True, sort=False, group_gate=True)
        for a, b in zip(base, gg):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_group_gate_occl_multi_bit_exact(scene):
    """Per-(set,group) gating in the multi-segment kernel (default-off;
    kept correct for retests) must not change any blocked mask."""
    from vkrt_tpu.rt.occl_multi import occluded_multi
    from vkrt_tpu.utils import layout as L

    v0, e1, e2, tree = scene
    rng = np.random.default_rng(34)
    NS, N = 4, 512
    lights = rng.uniform(-6, 6, (NS, 3)).astype(np.float32)
    pts = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    dirs = np.zeros((NS, 3, N // 128, 128), np.float32)
    tm = np.zeros((NS, N // 128, 128), np.float32)
    for s in range(NS):
        dvec = pts - lights[s]
        dist = np.linalg.norm(dvec, axis=1)
        dirs[s] = np.asarray(L.to_cvec(jnp.asarray(dvec / dist[:, None])))
        tmv = (dist - 0.001).astype(np.float32)
        tmv[rng.random(N) < 0.3] = 0.0
        tm[s] = np.asarray(L.to_lanes(jnp.asarray(tmv)))
    base = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                          jnp.asarray(tm), block=256, interpret=True,
                          sort=False)
    gg = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                        jnp.asarray(tm), block=256, interpret=True,
                        sort=False, group_gate=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(gg))


def test_visit_order_occl_multi_bit_exact(scene):
    """Any-hit blocked masks are visit-order independent (the tlb prunes
    are per-entry), so the alternate sort keys (visit='mid'/'far' — the
    likely-occluder-first experiment) must not change any output."""
    from vkrt_tpu.rt.occl_multi import occluded_multi
    from vkrt_tpu.utils import layout as L

    v0, e1, e2, tree = scene
    rng = np.random.default_rng(35)
    NS, N = 4, 512
    lights = rng.uniform(-6, 6, (NS, 3)).astype(np.float32)
    pts = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    dirs = np.zeros((NS, 3, N // 128, 128), np.float32)
    tm = np.zeros((NS, N // 128, 128), np.float32)
    for s in range(NS):
        dvec = pts - lights[s]
        dist = np.linalg.norm(dvec, axis=1)
        dirs[s] = np.asarray(L.to_cvec(jnp.asarray(dvec / dist[:, None])))
        tmv = (dist - 0.001).astype(np.float32)
        tmv[rng.random(N) < 0.3] = 0.0
        tm[s] = np.asarray(L.to_lanes(jnp.asarray(tmv)))
    base = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                          jnp.asarray(tm), block=256, interpret=True,
                          sort=True)
    for visit in ("mid", "far"):
        alt = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                             jnp.asarray(tm), block=256, interpret=True,
                             sort=True, visit=visit)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(alt))


def test_pregate_closest_bit_exact(scene):
    """XLA-prologue work lists (pregate=True: interval-gated, sorted,
    SMEM-streamed — replaces the in-kernel prepass) are a conservative
    SUPERSET of per-ray gating: outputs bit-equal for coherent AND
    scattered wavefronts, parked rays included."""
    v0, e1, e2, tree = scene
    rng = np.random.default_rng(44)
    n = 1024
    # coherent: one origin, tight cone (the depth-0 shape pregate serves)
    o = np.tile(np.array([[0, 0, -12]], np.float32), (n, 1))
    ang = rng.uniform(-0.25, 0.25, (n, 2)).astype(np.float32)
    d = np.stack([np.sin(ang[:, 0]), np.sin(ang[:, 1]),
                  np.cos(ang[:, 0]) * np.cos(ang[:, 1])], 1)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    tmax = np.where(rng.uniform(size=n) < 0.2, 0.0, 1e3).astype(np.float32)
    for o_set, d_set in ((o, d), make_rays(1024, seed=45)):
        base = trace_dense(tree, jnp.asarray(o_set), jnp.asarray(d_set),
                           jnp.asarray(tmax), block=256, interpret=True,
                           with_attributes=True)
        pg = trace_dense(tree, jnp.asarray(o_set), jnp.asarray(d_set),
                         jnp.asarray(tmax), block=256, interpret=True,
                         with_attributes=True, pregate=True)
        for a, b in zip(base, pg):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pregate_occl_multi_bit_exact(scene):
    """pregate in the multi-segment shadow kernel: per-set interval
    gates packed into the per-cluster segment-set word — blocked masks
    bit-equal to the in-kernel prepass."""
    from vkrt_tpu.rt.occl_multi import occluded_multi
    from vkrt_tpu.utils import layout as L

    v0, e1, e2, tree = scene
    rng = np.random.default_rng(46)
    NS, N = 4, 512
    lights = rng.uniform(-6, 6, (NS, 3)).astype(np.float32)
    pts = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    dirs = np.zeros((NS, 3, N // 128, 128), np.float32)
    tm = np.zeros((NS, N // 128, 128), np.float32)
    for s in range(NS):
        dvec = pts - lights[s]
        dist = np.linalg.norm(dvec, axis=1)
        dirs[s] = np.asarray(L.to_cvec(jnp.asarray(dvec / dist[:, None])))
        tmv = (dist - 0.001).astype(np.float32)
        tmv[rng.random(N) < 0.3] = 0.0
        tm[s] = np.asarray(L.to_lanes(jnp.asarray(tmv)))
    base = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                          jnp.asarray(tm), block=256, interpret=True)
    pg = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                        jnp.asarray(tm), block=256, interpret=True,
                        pregate=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(pg))


def test_recheck_closest_bit_exact(scene):
    """Two-level pregate ("recheck": interval prologue nominates, the
    kernel re-tests per-ray at DMA-issue time) must match the in-kernel
    per-ray prepass bit-for-bit on scattered wavefronts — the shape it
    exists for — with and without group_gate, attributes included."""
    v0, e1, e2, tree = scene
    rng = np.random.default_rng(47)
    o, d = make_rays(n_rays=1024, seed=47)
    tmax = np.where(rng.uniform(size=1024) < 0.4, 0.0, 1e3).astype(np.float32)
    for gg in (False, True):
        base = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(tmax), block=256, interpret=True,
                           with_attributes=True, sort=False, group_gate=gg)
        rc = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                         jnp.asarray(tmax), block=256, interpret=True,
                         with_attributes=True, sort=False, group_gate=gg,
                         pregate="recheck")
        for a, b in zip(base, rc):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # single-segment occlusion flavor (any-hit: order-independent)
    bocc = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                       jnp.asarray(tmax), block=256, interpret=True,
                       occlusion=True, sort=False)
    rocc = trace_dense(tree, jnp.asarray(o), jnp.asarray(d),
                       jnp.asarray(tmax), block=256, interpret=True,
                       occlusion=True, sort=False, pregate="recheck")
    np.testing.assert_array_equal(np.asarray(bocc[1]) >= 0,
                                  np.asarray(rocc[1]) >= 0)
    # sorted flavor (coherent depth-0 shape): scratch copy + in-kernel
    # nearest-first insertion sort by the interval bound
    o0 = np.tile(np.array([[0, 0, -12]], np.float32), (1024, 1))
    rng2 = np.random.default_rng(49)
    ang = rng2.uniform(-0.25, 0.25, (1024, 2)).astype(np.float32)
    d0 = np.stack([np.sin(ang[:, 0]), np.sin(ang[:, 1]),
                   np.cos(ang[:, 0]) * np.cos(ang[:, 1])], 1)
    d0 = (d0 / np.linalg.norm(d0, axis=1, keepdims=True)).astype(np.float32)
    base = trace_dense(tree, jnp.asarray(o0), jnp.asarray(d0),
                       jnp.asarray(tmax), block=256, interpret=True,
                       with_attributes=True, sort=True)
    rc = trace_dense(tree, jnp.asarray(o0), jnp.asarray(d0),
                     jnp.asarray(tmax), block=256, interpret=True,
                     with_attributes=True, sort=True, pregate="recheck")
    for a, b in zip(base, rc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_recheck_occl_multi_bit_exact(scene):
    """Two-level pregate in the multi-segment shadow kernel: per-ray
    per-set re-checks rebuild the segment-set (and group) bits — blocked
    masks bit-equal to the in-kernel prepass."""
    from vkrt_tpu.rt.occl_multi import occluded_multi
    from vkrt_tpu.utils import layout as L

    v0, e1, e2, tree = scene
    rng = np.random.default_rng(48)
    NS, N = 4, 1024
    lights = rng.uniform(-6, 6, (NS, 3)).astype(np.float32)
    pts = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    dirs = np.zeros((NS, 3, N // 128, 128), np.float32)
    tm = np.zeros((NS, N // 128, 128), np.float32)
    for s in range(NS):
        dvec = pts - lights[s]
        dist = np.linalg.norm(dvec, axis=1)
        dirs[s] = np.asarray(L.to_cvec(jnp.asarray(dvec / dist[:, None])))
        tmv = (dist - 0.001).astype(np.float32)
        tmv[rng.random(N) < 0.3] = 0.0
        tm[s] = np.asarray(L.to_lanes(jnp.asarray(tmv)))
    base = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                          jnp.asarray(tm), block=256, interpret=True,
                          sort=False)
    for gg in (False, True):
        rc = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                            jnp.asarray(tm), block=256, interpret=True,
                            sort=False, group_gate=gg, pregate="recheck")
        np.testing.assert_array_equal(np.asarray(base), np.asarray(rc))
    # sorted flavor (depth-0 shadow shape)
    rc = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                        jnp.asarray(tm), block=256, interpret=True,
                        sort=True, pregate="recheck")
    np.testing.assert_array_equal(np.asarray(base), np.asarray(rc))
    # block=1024 with 4 sets: ns*G = 32 gate bits — the recheck bit
    # builder must reach bit 31 without overflowing (regression for the
    # jnp.int32(1 << 31) OverflowError that killed the production-shape
    # shadow_d1_rc_gg1 row in tools/r3_hw_queue.py)
    base_b = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                            jnp.asarray(tm), block=1024, interpret=True,
                            sort=False)
    rc_b = occluded_multi(tree, jnp.asarray(lights), jnp.asarray(dirs),
                          jnp.asarray(tm), block=1024, interpret=True,
                          sort=False, group_gate=True, pregate="recheck")
    np.testing.assert_array_equal(np.asarray(base_b), np.asarray(rc_b))
