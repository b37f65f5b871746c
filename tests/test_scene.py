"""Scene ingest: counts, flattening, texture heap (ref: src/Model.cpp)."""

import numpy as np

from vkrt_tpu.config import SCENE_SCALE
from vkrt_tpu.scene.textures import build_mip_chain, mip_levels_for


def test_sponza_reference_counts(sponza_model):
    # SURVEY.md §2 item 12: 103 submeshes, 25 materials, 69 images,
    # 262,267 triangles, 192,496 vertices.
    assert len(sponza_model.submeshes) == 103
    assert len(sponza_model.materials) == 25
    assert len(sponza_model.images) == 69
    assert sponza_model.num_triangles == 262267
    assert sponza_model.num_vertices == 192496


def test_flatten_rebases_indices(sponza_flat, sponza_model):
    T = sponza_flat.num_triangles
    V = sponza_flat.num_vertices
    assert T == 262267 and V == 192496
    assert sponza_flat.indices.max() < V
    # per-submesh triangle offsets are exclusive-prefix sums
    np.testing.assert_array_equal(
        sponza_flat.submesh_tri_offset,
        np.concatenate([[0], np.cumsum(sponza_flat.submesh_tri_count)[:-1]]))
    # material fallback quirk: all per-tri image indices >= 0
    assert sponza_flat.tri_normal.min() >= 0
    assert sponza_flat.tri_metallic_roughness.min() >= 0


def test_flatten_bakes_world_scale(sponza_flat):
    mn, mx = sponza_flat.aabb
    # model-space Sponza spans ~3720 units in X → world ~37.2 (scale 0.01,
    # ref: src/Raytracer.cpp:1165-1169)
    assert 30.0 < (mx[0] - mn[0]) < 45.0
    assert SCENE_SCALE == 0.01


def test_synthetic_geometry_in_accessor_aabbs(sponza_model):
    import json
    gltf = json.load(open("/root/reference/models/sponza/Sponza.gltf"))
    accs = gltf["accessors"]
    prims = gltf["meshes"][0]["primitives"]
    for i in (0, 50, 102):
        acc = accs[prims[i]["attributes"]["POSITION"]]
        sm = sponza_model.submeshes[i]
        lo = np.asarray(acc["min"], dtype=np.float32)
        hi = np.asarray(acc["max"], dtype=np.float32)
        assert (sm.positions >= lo - 1e-3).all()
        assert (sm.positions <= hi + 1e-3).all()
        # normals are unit (padded duplicates included)
        n = np.linalg.norm(sm.normals, axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-4)


def test_synth_deterministic():
    from vkrt_tpu.scene import load_model
    m1 = load_model("/root/reference/models/sponza/Sponza.gltf", load_images=False)
    m2 = load_model("/root/reference/models/sponza/Sponza.gltf", load_images=False)
    np.testing.assert_array_equal(m1.submeshes[7].positions, m2.submeshes[7].positions)
    np.testing.assert_array_equal(m1.submeshes[7].indices, m2.submeshes[7].indices)


def test_mip_chain():
    img = np.arange(8 * 8 * 4, dtype=np.uint8).reshape(8, 8, 4)
    chain = build_mip_chain(img)
    assert len(chain) == 4  # 8→4→2→1
    assert chain[-1].shape == (1, 1, 4)
    assert mip_levels_for(1024, 1024) == 11
    # box filter correctness on a known block
    flat = np.zeros((2, 2, 4), dtype=np.uint8)
    flat[0, 0] = 100
    flat[0, 1] = 200
    flat[1, 0] = 100
    flat[1, 1] = 200
    out = build_mip_chain(flat)[1]
    assert out[0, 0, 0] == 150


def test_texture_heap_addressing(sponza_heap):
    h = sponza_heap
    assert h.num_images == 69
    # every level's extent fits inside the heap
    ends = h.level_offset + h.level_width * h.level_height
    assert ends.max() <= h.texels.shape[0]
    # level 0 of image 0 starts at 0
    assert h.level_offset[0, 0] == 0
    # widths halve down the chain
    assert h.level_width[0, 1] == max(1, h.level_width[0, 0] // 2)
