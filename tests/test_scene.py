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


def _write_bin_gltf(tmp_path):
    """A tiny glTF with a REAL binary geometry buffer: primitive 0 is a
    z=0 quad with tightly-packed accessors + u16 indices (the widening
    quirk, ref: src/Model.cpp:68-77); primitive 1 is a far-away triangle
    read through an INTERLEAVED byteStride buffer view + native u32
    indices (the strided-accessor path, ref: src/Model.cpp:80-117)."""
    import json
    import struct

    # quad spanning x,y in [-500, 500] model units at z=0 (world +-5
    # after the baked 0.01 TLAS scale)
    pos0 = np.array([[-500, -500, 0], [500, -500, 0],
                     [500, 500, 0], [-500, 500, 0]], np.float32)
    nrm0 = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv0 = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tan0 = np.tile(np.array([[1, 0, 0, 1]], np.float32), (4, 1))
    idx0 = np.array([0, 1, 2, 0, 2, 3], np.uint16)

    # interleaved POSITION+NORMAL (stride 24), far below the quad
    pos1 = np.array([[-100, -100, -100000], [100, -100, -100000],
                     [0, 100, -100000]], np.float32)
    nrm1 = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    inter = np.concatenate([pos1, nrm1], axis=1).astype(np.float32)  # [3,6]
    idx1 = np.array([0, 1, 2], np.uint32)

    blobs, views, accessors = [], [], []
    offset = 0

    def add_view(data, stride=None):
        nonlocal offset
        b = data.tobytes()
        views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(b),
                      **({"byteStride": stride} if stride else {})})
        blobs.append(b)
        offset += len(b)
        return len(views) - 1

    def add_accessor(view, comp, typ, count, byte_offset=0, minmax=None):
        a = {"bufferView": view, "componentType": comp, "type": typ,
             "count": count, "byteOffset": byte_offset}
        if minmax is not None:
            a["min"], a["max"] = minmax
        accessors.append(a)
        return len(accessors) - 1

    v_pos0 = add_view(pos0)
    v_nrm0 = add_view(nrm0)
    v_uv0 = add_view(uv0)
    v_tan0 = add_view(tan0)
    v_idx0 = add_view(idx0)
    v_int = add_view(inter, stride=24)
    v_idx1 = add_view(idx1)

    a_pos0 = add_accessor(v_pos0, 5126, "VEC3", 4,
                          minmax=(pos0.min(0).tolist(), pos0.max(0).tolist()))
    a_nrm0 = add_accessor(v_nrm0, 5126, "VEC3", 4)
    a_uv0 = add_accessor(v_uv0, 5126, "VEC2", 4)
    a_tan0 = add_accessor(v_tan0, 5126, "VEC4", 4)
    a_idx0 = add_accessor(v_idx0, 5123, "SCALAR", 6)
    a_pos1 = add_accessor(v_int, 5126, "VEC3", 3,
                          minmax=(pos1.min(0).tolist(), pos1.max(0).tolist()))
    a_nrm1 = add_accessor(v_int, 5126, "VEC3", 3, byte_offset=12)
    a_idx1 = add_accessor(v_idx1, 5125, "SCALAR", 3)

    from PIL import Image as PILImage
    tex = np.zeros((4, 4, 4), np.uint8)
    tex[..., 0] = 200
    tex[..., 1] = 100
    tex[..., 3] = 255
    PILImage.fromarray(tex).save(tmp_path / "tex.png")

    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": "geom.bin", "byteLength": offset}],
        "bufferViews": views,
        "accessors": accessors,
        "images": [{"uri": "tex.png"}],
        "textures": [{"source": 0}],
        "materials": [{"pbrMetallicRoughness":
                       {"baseColorTexture": {"index": 0}}}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": a_pos0, "NORMAL": a_nrm0,
                            "TEXCOORD_0": a_uv0, "TANGENT": a_tan0},
             "indices": a_idx0, "material": 0},
            {"attributes": {"POSITION": a_pos1, "NORMAL": a_nrm1},
             "indices": a_idx1},
        ]}],
    }
    (tmp_path / "geom.bin").write_bytes(b"".join(blobs))
    (tmp_path / "scene.gltf").write_text(json.dumps(gltf))
    return tmp_path / "scene.gltf", (pos0, nrm0, uv0, tan0, idx0,
                                     pos1, nrm1, idx1)


def test_binary_gltf_loads_and_traces(tmp_path):
    """The real-.bin loader path (unused by the synthetic Sponza in this
    environment) on an actual binary glTF: exact geometry decode incl.
    the strided-view path and u16->u32 widening, then an end-to-end
    trace through the flattened scene."""
    import jax.numpy as jnp

    from vkrt_tpu.config import SCENE_SCALE
    from vkrt_tpu.scene import flatten_model, load_model
    from vkrt_tpu.utils import layout as L
    from vkrt_tpu.wavefront.engine import make_backend

    path, (pos0, nrm0, uv0, tan0, idx0, pos1, nrm1, idx1) = \
        _write_bin_gltf(tmp_path)
    model = load_model(str(path))

    sm0, sm1 = model.submeshes
    np.testing.assert_array_equal(sm0.positions, pos0)
    np.testing.assert_array_equal(sm0.normals, nrm0)
    np.testing.assert_array_equal(sm0.uvs, uv0)
    np.testing.assert_array_equal(sm0.tangents, tan0)
    assert sm0.indices.dtype == np.uint32           # u16 widened
    np.testing.assert_array_equal(sm0.indices, idx0.astype(np.uint32))
    np.testing.assert_array_equal(sm1.positions, pos1)  # strided view
    np.testing.assert_array_equal(sm1.normals, nrm1)
    np.testing.assert_array_equal(sm1.indices, idx1)
    assert sm1.material == -1                       # missing-material quirk
    assert len(model.images) == 1 and model.images[0].width == 4

    flat = flatten_model(model)
    assert flat.num_triangles == 3
    # index rebasing: submesh 1's indices offset past submesh 0's verts
    assert flat.indices[2].min() >= 4

    be = make_backend(flat, "reference")
    # one lane-block of rays straight down onto the quad from world z=5
    o = jnp.stack([jnp.zeros((1, 128)), jnp.zeros((1, 128)),
                   jnp.full((1, 128), 5.0)])
    d = jnp.stack([jnp.zeros((1, 128)), jnp.zeros((1, 128)),
                   jnp.full((1, 128), -1.0)])
    tmax = jnp.full((1, 128), 1000.0)
    t, u, v, attrs, hit = be.closest(o, d, tmax)
    assert bool(np.asarray(hit).all())
    np.testing.assert_allclose(np.asarray(t), 5.0, atol=1e-4)
    assert SCENE_SCALE == 0.01
