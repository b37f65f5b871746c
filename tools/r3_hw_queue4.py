"""Round-3 hardware queue, part 4: deferred-shadow A/B.

cfg.defer_shadows merges every depth's shadow sets into ONE
multi-segment occlusion dispatch (ns = depths*lights). Frames are
bit-identical (CI: tests/test_backends.py::test_defer_shadows_bit_exact).
Rows here decide the default and the merged dispatch's sort policy:

  1. merged 8-set dispatch (d0+d1 sets) sort=True vs sort=False, vs the
     two separate dispatches (shadow_d0 sorted + shadow_d1 unsorted)
  2. whole config-4 frames: defer off vs on (+ bit-equality)
  3. config-5 e2e (4-bounce, ns=16 merged): defer off vs on

Run: python -u tools/r3_hw_queue4.py > /tmp/r3q4.out 2>&1
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.rt.dense import trace_dense
from vkrt_tpu.rt.occl_multi import occluded_multi
from vkrt_tpu.shade import shading
from vkrt_tpu.shade.sampling import sample_material
from vkrt_tpu.utils import layout as L
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import (cached_backend, camera_ray_blocks,
                                       render_frame, _broadcast_points)

SCENE = "/root/reference/models/sponza/Sponza.gltf"
BLOCK = 512


def tmr(name, jf, *args, reps=3, extra=None):
    try:
        r = jf(*args)
        jax.block_until_ready(r)
    except Exception as e:
        print(json.dumps({"step": name, "error": repr(e)[:300]}), flush=True)
        return None, None
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = jf(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    out = {"step": name, "ms": round(best * 1e3, 1)}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)
    return r, best * 1e3


def main():
    import dataclasses

    enable_compilation_cache()
    flat, tex, backend = cached_backend(SCENE, 512, "dense")
    tree = backend.tree
    cfg = C.config4_flythrough()
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)
    lights = jnp.asarray(C.LIGHT_POSITIONS)[:cfg.num_lights]
    nl = cfg.num_lights

    op, d0, active0 = jax.jit(
        functools.partial(camera_ray_blocks, cfg=cfg))(pi, vi)

    def frame_state(tree, tex, op, d, act):
        o = _broadcast_points(
            jnp.broadcast_to(op[None, :], (d.shape[1] * 128 // BLOCK, 3)), d)
        tm = jnp.where(act, C.RAY_TMAX, 0.0)
        t, slot, u, v, attrs = trace_dense(tree, o, d, tm,
                                           with_attributes=True)
        hit = (slot >= 0) & act
        pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
        _, mr4, nmap4 = sample_material(
            tex.texels_tri, tex.level_offset, tex.level_width,
            tex.level_height, jnp.where(hit, mat_ids[0], 0),
            jnp.where(hit[None], uv, 0.0))
        pn = shading.perturbed_normal(normal, tangent, nmap4[:3])
        geo = [shading.light_geometry(pos, lights[li]) for li in range(nl)]
        casts = [hit & (L.dot3(pn, g[0]) > 0) for g in geo]
        sd = jnp.stack([-g[0] for g in geo])
        st = jnp.stack([jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                        for c, g in zip(casts, geo)])
        refl = hit & (mr4[2] > C.METALLIC_THRESHOLD)
        o1 = L.where3(refl, pos, o)
        d1 = L.where3(refl, shading.reflect(d, pn), d)
        return sd, st, o1, d1, refl

    state_j = jax.jit(frame_state)
    sd0, st0, o1, d1, refl = state_j(tree, tex, op, d0, active0)
    sd1, st1, _, _, _ = state_j(tree, tex, op, d1, refl)

    # --- 1. merged 8-set dispatch vs two separate ------------------------
    out = {}
    oj0 = jax.jit(functools.partial(occluded_multi, block=1024, sort=True))
    r, ms0 = tmr("shadow_d0_separate_sorted", oj0, tree, lights, sd0, st0)
    out["d0"] = np.asarray(r)
    oj1 = jax.jit(functools.partial(occluded_multi, block=1024, sort=False))
    r, ms1 = tmr("shadow_d1_separate_unsorted", oj1, tree, lights, sd1, st1)
    out["d1"] = np.asarray(r)
    lights8 = jnp.concatenate([lights, lights], axis=0)
    sd8 = jnp.concatenate([sd0, sd1], axis=0)
    st8 = jnp.concatenate([st0, st1], axis=0)
    for sort in (True, False):
        oj = jax.jit(functools.partial(occluded_multi, block=1024,
                                       sort=sort))
        r, ms = tmr(f"shadow_merged8_sort{int(sort)}", oj, tree, lights8,
                    sd8, st8,
                    extra={"vs_separate_ms": round(ms0 + ms1, 1)})
        if r is not None:
            m = np.asarray(r)
            print(json.dumps({
                "check": f"merged sort{int(sort)} masks identical",
                "ok": bool(np.array_equal(m[:4], out["d0"])
                           and np.array_equal(m[4:], out["d1"]))}),
                flush=True)

    # --- 2. whole config-4 frames ----------------------------------------
    fbs = {}
    for defer in (False, True):
        cfg_d = dataclasses.replace(cfg, defer_shadows=defer)
        fj = jax.jit(functools.partial(render_frame, cfg=cfg_d))
        r, _ = tmr(f"frame_config4_defer{int(defer)}", fj, backend, tex,
                   pi, vi, lights)
        if r is not None:
            fbs[defer] = np.asarray(r[0])
    if len(fbs) == 2:
        print(json.dumps({"check": "config4 defer frame bit-equal",
                          "ok": bool(np.array_equal(fbs[False],
                                                    fbs[True]))}),
              flush=True)

    # --- 3. config-5 e2e --------------------------------------------------
    from vkrt_tpu.wavefront.engine import Renderer
    for defer in (False, True):
        cfg5 = dataclasses.replace(C.config5_stress(), defer_shadows=defer)
        ren = Renderer(SCENE, cfg5, backend="dense", max_texture_dim=512,
                       quantize=True, rebuild="refit")
        cam5 = Camera(cfg5.width, cfg5.height)
        cam5.set_position(C.CAMERA_START_POSITION)
        cam5.set_rotation(C.CAMERA_START_ROTATION)
        ren.render(cam5)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            ren.render(cam5)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"step": f"config5_e2e_defer{int(defer)}",
                          "ms": round(best * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
