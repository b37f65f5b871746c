"""Per-frame rebuild modes: attribute rotation + full-rebuild consistency."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.accel import build_clusters, refit_clusters
from vkrt_tpu.app.camera import Camera


def rot_y(ang):
    c, s = np.cos(ang), np.sin(ang)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]],
                    np.float32)


def test_refit_rotates_normals(rng):
    n = 300
    v0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    attrs = {
        "n0": jnp.asarray(nrm), "n1": jnp.asarray(nrm), "n2": jnp.asarray(nrm),
        "uv0": jnp.zeros((n, 2)), "uv1": jnp.zeros((n, 2)),
        "uv2": jnp.zeros((n, 2)),
        "t0": jnp.asarray(nrm[:, [1, 2, 0]]), "t1": jnp.asarray(nrm),
        "t2": jnp.asarray(nrm),
        "mat": jnp.asarray(np.arange(n, dtype=np.float32)[:, None].repeat(3, 1)),
    }
    tree = build_clusters(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                          attrs=attrs, with_attributes=True, device=False)
    m = rot_y(0.7)
    moved = refit_clusters(tree, jnp.asarray(m))

    td0 = np.asarray(tree.tri_data)
    td1 = np.asarray(moved.tri_data)
    # normal cols 9-11 rotate by A; uv cols 18-19 and mat cols 33-35 unchanged
    a = m[:3, :3]
    want = np.einsum("ij,ckj->cki", a, td0[:, :, 9:12])
    np.testing.assert_allclose(td1[:, :, 9:12], want, atol=1e-5)
    np.testing.assert_allclose(td1[:, :, 18:20], td0[:, :, 18:20])
    np.testing.assert_allclose(td1[:, :, 33:36], td0[:, :, 33:36])


def test_full_rebuild_matches_refit_frame(sponza_model):
    """Renderer rebuild='full' and 'refit' produce near-identical frames
    under a rotation (different cluster topology, same geometry)."""
    from vkrt_tpu.app.framebuffer import rmse
    from vkrt_tpu.wavefront.engine import Renderer

    cfg = dataclasses.replace(C.config1_primary(), width=64, height=48)
    cfg = dataclasses.replace(cfg, rebuild_per_frame=True)
    m = rot_y(0.05)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)

    path = "/root/reference/models/sponza/Sponza.gltf"
    r_refit = Renderer(path, cfg, backend="dense", max_texture_dim=32,
                       interpret=True, rebuild="refit")
    fb1, _ = r_refit.render(cam, transform=m)
    r_full = Renderer(path, cfg, backend="dense", max_texture_dim=32,
                      interpret=True, rebuild="full")
    fb2, _ = r_full.render(cam, transform=m)
    assert rmse(fb1, fb2) <= 1e-3


def test_rebuild_with_resort(sponza_model):
    """Per-frame full rebuild composes with the secondary-dispatch
    resort: the rebuilt backend keeps scene_aabb (NamedTuple._replace).
    Guards the config-5 + resort combination. allclose, not bit-equal:
    the rotated synthetic geometry has coincident surfaces, where the
    reflection round's NEAR-TIE commits are visit-order dependent
    (~1 ulp t differences — see wavefront/resort.py); measured max
    frame diff 4.2e-7 here."""
    from vkrt_tpu.wavefront.engine import Renderer

    cfg = C.RenderConfig(width=64, height=48, max_depth=2, num_lights=2,
                         enable_shadows=True, enable_reflections=True,
                         rebuild_per_frame=True)
    m = rot_y(0.05)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    path = "/root/reference/models/sponza/Sponza.gltf"
    fbs = []
    for rs in (False, True):
        c = dataclasses.replace(cfg, resort_secondary=rs)
        r = Renderer(path, c, backend="dense", max_texture_dim=32,
                     interpret=True, rebuild="full")
        fb, _ = r.render(cam, transform=m)
        fbs.append(np.asarray(fb))
    np.testing.assert_allclose(fbs[0], fbs[1], atol=1e-5)
