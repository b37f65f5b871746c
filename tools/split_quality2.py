"""split_quality.py companion: score the splitters on SECONDARY
wavefront states (depth-1 reflection rays, depth-0/1 shadow segments
from each light), generated with the CPU reference backend at 640x384.
The dense kernel's secondary dispatches are where the round-3 resort
and recheck levers live — cluster AABB quality must hold there too.

Usage: JAX_PLATFORMS=cpu python tools/split_quality2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from split_quality import (score, split_permutation_median,
                           split_permutation_v2)

SCENE = "/root/reference/models/sponza/Sponza.gltf"


def main():
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from vkrt_tpu import config as C
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.shade import shading
    from vkrt_tpu.shade.sampling import sample_material
    from vkrt_tpu.utils import layout as L
    from vkrt_tpu.wavefront.engine import (camera_ray_blocks, make_backend,
                                           load_scene_assets)

    flat, tex, _ = load_scene_assets(SCENE, 64)
    be = make_backend(flat, "reference")
    idx = np.asarray(flat.indices, np.int64)
    p = np.asarray(flat.positions)
    v0 = p[idx[:, 0]]
    e1 = p[idx[:, 1]] - v0
    e2 = p[idx[:, 2]] - v0

    cfg = dataclasses.replace(C.config4_flythrough(), width=640, height=384)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    op, d0, act0 = jax.jit(functools.partial(
        camera_ray_blocks, cfg=cfg))(jnp.asarray(cam.proj_inverse),
                                     jnp.asarray(cam.view_inverse))
    lights = jnp.asarray(C.LIGHT_POSITIONS)[:cfg.num_lights]
    nb = d0.shape[1]
    o0 = jnp.broadcast_to(op[:, None, None], (3, nb, 128))
    tm0 = jnp.where(act0, C.RAY_TMAX, 0.0)

    def state(o, d, tm):
        t, u, v, attrs, hitm = be.closest(o, d, tm)
        hit = hitm & (tm > 0)
        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        _, mr4, nmap4 = sample_material(
            tex.texels_tri, tex.level_offset, tex.level_width,
            tex.level_height, jnp.where(hit, mat_ids[0], 0),
            jnp.where(hit[None], uv, 0.0))
        pn = shading.perturbed_normal(normal, tangent, nmap4[:3])
        geo = [shading.light_geometry(pos, lights[li])
               for li in range(cfg.num_lights)]
        casts = [hit & (L.dot3(pn, g[0]) > 0) for g in geo]
        sd = [-g[0] for g in geo]
        st = [jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
              for c, g in zip(casts, geo)]
        refl = hit & (mr4[2] > C.METALLIC_THRESHOLD)
        o1 = L.where3(refl, pos, o)
        d1 = L.where3(refl, shading.reflect(d, pn), d)
        return sd, st, o1, d1, refl, pos

    sd0, st0, o1, d1, refl, pos0 = state(o0, d0, tm0)
    tm1 = jnp.where(refl, C.RAY_TMAX, 0.0)
    sd1, st1, _, _, _, pos1 = state(o1, d1, tm1)

    def flat_rows(x):
        return np.asarray(L.from_cvec(x))

    states = [
        ("refl_d1", flat_rows(o1), flat_rows(d1),
         np.asarray(L.from_lanes(tm1))),
    ]
    for li in (0, 1):
        lp = np.asarray(lights[li])
        # shadow rays traced from the light (the production point-origin
        # form): origin = light, dir = -g0 toward the surface
        dmat = flat_rows(sd0[li])
        states.append((f"shadow_d0_l{li}",
                       np.broadcast_to(lp[None, :], dmat.shape), dmat,
                       np.asarray(L.from_lanes(st0[li]))))
    dmat = flat_rows(sd1[0])
    states.append(("shadow_d1_l0",
                   np.broadcast_to(np.asarray(lights[0])[None, :],
                                   dmat.shape), dmat,
                   np.asarray(L.from_lanes(st1[0]))))

    score("median_sah", split_permutation_median(v0, e1, e2),
          v0, e1, e2, states)
    score("varcut_sah", split_permutation_v2(v0, e1, e2),
          v0, e1, e2, states)


if __name__ == "__main__":
    main()
