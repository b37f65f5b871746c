"""Depth-1 sampling compaction prototype: pack live rows to the front,
sample in CAP-row chunks inside a while_loop (trip count = ceil(live/CAP)
— correct for ANY liveness, fast when sparse), scatter back.

Measures vs the full-wavefront sampler on REAL depth-1 state at 1080p,
texdim 512.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.rt.dense import trace_dense
from vkrt_tpu.shade import shading
from vkrt_tpu.shade.sampling import sample_material
from vkrt_tpu.utils import layout as L
from vkrt_tpu.wavefront.engine import (camera_ray_blocks, load_scene_assets,
                                       make_backend)

SCENE = "/root/reference/models/sponza/Sponza.gltf"


def tmr(name, jf, *args, extra=None):
    r = jf(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            r = jf(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / 3)
    out = {"step": name, "ms": round(best * 1e3, 1)}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)
    return r


def sample_material_compact(tex, sid, uvs, live, cap_rows: int):
    """sample_material over only rows (128-lane groups) with any live
    lane, in cap_rows chunks; dead rows return zeros."""
    nb = sid.shape[0]
    glive = jnp.any(live, axis=1)                        # [Nb]
    # stable: live rows first, original order preserved within classes
    perm = jnp.argsort(~glive, stable=True)
    inv = jnp.argsort(perm, stable=True)
    cnt = jnp.sum(glive.astype(jnp.int32))
    sidP = jnp.where(live, sid, 0)[perm]
    uvP = jnp.where(live[None], uvs, 0.0)[:, perm]

    out0 = jnp.zeros((12, nb, 128), jnp.float32)

    def cond(state):
        k, _ = state
        return k * cap_rows < cnt

    def body(state):
        k, acc = state
        s_chunk = jax.lax.dynamic_slice(sidP, (k * cap_rows, 0),
                                        (cap_rows, 128))
        u_chunk = jax.lax.dynamic_slice(uvP, (0, k * cap_rows, 0),
                                        (2, cap_rows, 128))
        a, b, c = sample_material(tex.texels_tri, tex.level_offset,
                                  tex.level_width, tex.level_height,
                                  s_chunk, u_chunk)
        chunk = jnp.concatenate([a, b, c], axis=0)       # [12,cap,128]
        acc = jax.lax.dynamic_update_slice(acc, chunk, (0, k * cap_rows, 0))
        return k + 1, acc

    _, outP = jax.lax.while_loop(cond, body, (jnp.int32(0), out0))
    out = outP[:, inv]
    return out[0:4], out[4:8], out[8:12]


def main():
    flat, tex, _ = load_scene_assets(SCENE, 512)
    backend = make_backend(flat, "dense")
    tree = backend.tree
    cfg = C.config4_flythrough()
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)

    op, d, valid = jax.jit(functools.partial(camera_ray_blocks, cfg=cfg))(
        pi, vi)
    nb = d.shape[1]
    o_full = jnp.broadcast_to(op[:, None, None], (3, nb, 128))

    # real depth-1 state
    def d1_state(tree, tex, o_full, d, valid):
        tmax = jnp.where(valid, C.RAY_TMAX, 0.0)
        t, slot, u, v, attrs = trace_dense(tree, o_full, d, tmax,
                                           with_attributes=True)
        hit = (slot >= 0) & valid
        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        _, mr4, nmap4 = sample_material(tex.texels_tri, tex.level_offset,
                                        tex.level_width, tex.level_height,
                                        mat_ids[0], uv)
        pn = shading.perturbed_normal(normal, tangent, nmap4[:3])
        refl = hit & (mr4[2] > C.METALLIC_THRESHOLD)
        o2 = L.where3(refl, pos, o_full)
        d2 = L.where3(refl, shading.reflect(d, pn), d)
        tm2 = jnp.where(refl, C.RAY_TMAX, 0.0)
        t2, slot2, u2, v2, attrs2 = trace_dense(tree, o2, d2, tm2,
                                                with_attributes=True)
        hit2 = (slot2 >= 0) & refl
        _, _, uv2, _, mat2 = shading.interpolate(attrs2, u2, v2)
        return jnp.where(hit2, mat2[0], 0), \
            jnp.where(hit2[None], uv2, 0.0), hit2

    sid, uvs, live = jax.jit(d1_state)(tree, tex, o_full, d, valid)
    frac = float(jnp.mean(jnp.any(live, axis=1).astype(jnp.float32)))
    print(json.dumps({"step": "live_rows_frac", "frac": round(frac, 3)}),
          flush=True)

    def full(tex, sid, uvs):
        return sample_material(tex.texels_tri, tex.level_offset,
                               tex.level_width, tex.level_height, sid, uvs)

    ref = tmr("sample_full_d1", jax.jit(full), tex, sid, uvs)

    for capdiv in (4, 8):
        cap = -(-nb // capdiv) // 8 * 8

        def comp(tex, sid, uvs, live, c=cap):
            return sample_material_compact(tex, sid, uvs, live, c)

        got = tmr(f"sample_compact_cap{capdiv}", jax.jit(comp), tex, sid,
                  uvs, live)
    # correctness on live lanes
    m = np.asarray(live)
    err = max(float(np.abs(np.asarray(ref[k]) - np.asarray(got[k]))[
        :, m].max()) for k in range(3))
    print(json.dumps({"step": "compact_parity", "max_err_live": err}),
          flush=True)


if __name__ == "__main__":
    main()
