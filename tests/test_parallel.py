"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.parallel import make_mesh, render_frame_sharded
from vkrt_tpu.wavefront.engine import render_frame


def test_sharded_matches_single_device():
    import __graft_entry__ as g
    backend, tex, _ = g._tiny_scene()
    cfg = C.RenderConfig(width=64, height=48, max_depth=2, num_lights=2,
                         enable_shadows=True, enable_reflections=True)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    args = (jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse),
            jnp.asarray(C.LIGHT_POSITIONS))

    single_fb, single_rays = render_frame(backend, tex, *args, cfg)

    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh()
    fb, rays = render_frame_sharded(backend, tex, *args, cfg, mesh)

    np.testing.assert_allclose(np.asarray(fb), np.asarray(single_fb),
                               atol=1e-5)
    assert int(np.asarray(rays).sum()) == int(np.asarray(single_rays).sum())


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("rays",)


def test_sharded_dense_matches_single_device_sponza_subset(sponza_model,
                                                           sponza_flat):
    """The PRODUCTION dense/Pallas backend under shard_map on real scene
    data (a Sponza subset): sharded == single-device. Round-2 gap — every
    sharded artifact ran the XLA reference backend on a synthetic scene,
    so whether pallas_call + the argsort prologue compose with a sharded
    block axis was unproven before hardware."""
    import dataclasses

    from vkrt_tpu.wavefront.engine import make_backend, texture_arrays

    T = 8192                     # 64 clusters, 1 supercluster
    flat = dataclasses.replace(
        sponza_flat,
        indices=sponza_flat.indices[:T],
        tri_base_color=sponza_flat.tri_base_color[:T],
        tri_metallic_roughness=sponza_flat.tri_metallic_roughness[:T],
        tri_normal=sponza_flat.tri_normal[:T],
        tri_submesh=sponza_flat.tri_submesh[:T])
    backend = make_backend(flat, "dense")
    tex = texture_arrays(sponza_model.images, flat)

    cfg = C.RenderConfig(width=64, height=32, max_depth=2, num_lights=2,
                         enable_shadows=True, enable_reflections=True,
                         resort_secondary=False)  # baseline pinned (A/B)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    args = (jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse),
            jnp.asarray(C.LIGHT_POSITIONS))

    single_fb, single_rays = render_frame(backend, tex, *args, cfg,
                                          interpret=True)
    mesh = make_mesh()
    fb, rays = render_frame_sharded(backend, tex, *args, cfg, mesh,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(single_fb),
                               atol=1e-5)
    assert int(np.asarray(rays).sum()) == int(np.asarray(single_rays).sum())

    # resort under shard_map: the radix partition runs per shard (each
    # device re-tiles its own rays — no collective). allclose, not
    # bit-equal: the reflection round's near-tie commits are
    # visit-order dependent at the ~1 ulp level (wavefront/resort.py).
    import dataclasses as _dc
    cfg_rs = _dc.replace(cfg, resort_secondary=True)
    fb_rs, rays_rs = render_frame_sharded(backend, tex, *args, cfg_rs,
                                          mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(fb_rs), np.asarray(fb),
                               atol=1e-5)
    assert int(np.asarray(rays_rs).sum()) == int(np.asarray(rays).sum())


def test_sharded_edge_raster_matches_single_device(sponza_model,
                                                   sponza_flat):
    """The edge-function rasterizer under shard_map (pixel blocks split,
    setup slabs replicated): sharded == single-device bit-exact on a
    Sponza subset."""
    import dataclasses

    from vkrt_tpu.parallel.mesh import render_raster_frame_sharded
    from vkrt_tpu.raster.pipeline import render_raster_frame_edge
    from vkrt_tpu.wavefront.engine import make_backend, texture_arrays

    T = 8192
    flat = dataclasses.replace(
        sponza_flat,
        indices=sponza_flat.indices[:T],
        tri_base_color=sponza_flat.tri_base_color[:T],
        tri_metallic_roughness=sponza_flat.tri_metallic_roughness[:T],
        tri_normal=sponza_flat.tri_normal[:T],
        tri_submesh=sponza_flat.tri_submesh[:T])
    backend = make_backend(flat, "dense")
    tex = texture_arrays(sponza_model.images, flat)
    cfg = C.RenderConfig(width=64, height=32)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    vm = jnp.asarray(cam.view_matrix)
    pm = jnp.asarray(cam.projection_matrix)
    single = np.asarray(render_raster_frame_edge(
        backend.tree, tex, vm, pm, cfg, msaa=1, interpret=True))
    mesh = make_mesh()
    sharded = np.asarray(render_raster_frame_sharded(
        backend.tree, tex, vm, pm, cfg, mesh, msaa=1, interpret=True))
    np.testing.assert_array_equal(sharded, single)
