"""Round-3 hardware queue, part 2 — the rows r3_hw_queue.py never reached
(it crashed at the occl_multi recheck+gg bit-31 overflow, since fixed).

Part-1 results already recorded (see ROADMAP.md): resort and recheck are
hardware-DEAD (radix permutations ~420 ms alone); group-gated closest_d1
confirmed at 95.3 ms (vs 138.8 gg0); shadow baselines 147.3/200.0 ms.

Remaining, value-ordered:

  1. shadow group-gate retest with the slice-reduce prepass (+ nosweep
     ablation) — decides cfg.shadow_group_gate
  2. closest_d0 rows: group_gate / pregate vs baseline — decides
     cfg.closest_d0_group_gate and the d0 pregate
  3. shadow visit-order keys (mid/far) at depth 0
  4. whole config-4 frames: current defaults, then the best per-dispatch
     combination found above (branching happens in-process so every
     compile stays in this one process)
  5. config-5 stress e2e, rebuild=refit vs rebuild=full (BASELINE rows)
  6. edge rasterizer on hardware: full-scene agreement + 1080p pass

Run: python -u tools/r3_hw_queue2.py > /tmp/r3q2.out 2>&1
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
                                       render_frame, _broadcast_points,
                                       _pad_dims, tile)

SCENE = "/root/reference/models/sponza/Sponza.gltf"
BLOCK = 512


def tmr(name, jf, *args, reps=3, extra=None):
    r = jf(*args)
    jax.block_until_ready(r)
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
        return sd, st, o1, d1, refl, pos, hit

    state_j = jax.jit(frame_state)
    sd0, st0, o1, d1, refl, pos0, hit0 = state_j(tree, tex, op, d0, active0)
    sd1, st1, _, _, _, pos1, hit1 = state_j(tree, tex, op, d1, refl)
    tm1 = jnp.where(refl, C.RAY_TMAX, 0.0)

    # --- 1. shadow group-gate retest (slice prepass) + baselines --------
    occ_out, occ_ms = {}, {}
    for depth, sd, st in (("d0", sd0, st0), ("d1", sd1, st1)):
        for gg in (False, True):
            oj = jax.jit(functools.partial(
                occluded_multi, block=1024, sort=(depth == "d0"),
                group_gate=gg))
            r, ms = tmr(f"shadow_{depth}_b1024_gg{int(gg)}", oj, tree,
                        lights, sd, st)
            occ_out[(depth, gg)] = np.asarray(r)
            occ_ms[(depth, gg)] = ms
        print(json.dumps({"check": f"shadow_{depth} gg masks identical",
                          "ok": bool(np.array_equal(
                              occ_out[(depth, False)],
                              occ_out[(depth, True)]))}), flush=True)
    for gg in (False, True):
        oj = jax.jit(functools.partial(
            occluded_multi, block=1024, sort=False, group_gate=gg,
            ablate="nosweep"))
        tmr(f"shadow_d1_nosweep_gg{int(gg)}", oj, tree, lights, sd1, st1)
    shadow_gg_wins = (occ_ms[("d0", True)] + occ_ms[("d1", True)]
                      < occ_ms[("d0", False)] + occ_ms[("d1", False)])
    print(json.dumps({"decision": "shadow_group_gate",
                      "on": bool(shadow_gg_wins)}), flush=True)

    # --- 2. closest_d0: baseline / group_gate / pregate ------------------
    tm0 = jnp.where(active0, C.RAY_TMAX, 0.0)
    o0 = _broadcast_points(
        jnp.broadcast_to(op[None, :], (d0.shape[1] * 128 // BLOCK, 3)), d0)
    d0_out, d0_ms = {}, {}
    for name, kw in (("base", {}), ("gg1", {"group_gate": True}),
                     ("pg1", {"pregate": True})):
        cj = jax.jit(functools.partial(
            lambda tree, o, d, tm, kw=kw: trace_dense(
                tree, o, d, tm, with_attributes=True, block=1024,
                sort=True, **kw)))
        r, ms = tmr(f"closest_d0_b1024_{name}", cj, tree, o0, d0, tm0)
        d0_out[name] = [np.asarray(x) for x in r]
        d0_ms[name] = ms
    for name in ("gg1", "pg1"):
        # miss rays carry t=+inf on both sides — array_equal, not |a-b|
        print(json.dumps({
            "check": f"closest_d0 {name} outputs identical",
            "ok": bool(all(np.array_equal(a, b) for a, b in
                           zip(d0_out["base"], d0_out[name])))}),
            flush=True)
    d0_gg_wins = d0_ms["gg1"] < min(d0_ms["base"], d0_ms["pg1"])
    print(json.dumps({"decision": "closest_d0_group_gate",
                      "on": bool(d0_gg_wins)}), flush=True)

    # --- 3. shadow visit order (d0, sorted) ------------------------------
    for visit in ("mid", "far"):
        oj = jax.jit(functools.partial(
            occluded_multi, block=1024, sort=True, visit=visit))
        r, ms = tmr(f"shadow_d0_b1024_visit_{visit}", oj, tree, lights,
                    sd0, st0)
        print(json.dumps({
            "check": f"shadow_d0 visit={visit} mask identical",
            "ok": bool(np.array_equal(occ_out[("d0", False)],
                                      np.asarray(r)))}), flush=True)
        occ_ms[("d0", "visit_" + visit)] = ms

    # --- 4. whole config-4 frames: defaults, then the winning combo ------
    import dataclasses
    fj = jax.jit(functools.partial(render_frame, cfg=cfg))
    r, _ = tmr("frame_config4", fj, backend, tex, pi, vi, lights, reps=3)
    fb = np.asarray(r[0])
    rays = int(np.asarray(r[1]).sum())
    print(json.dumps({"frame_rays": rays,
                      "finite": bool(np.isfinite(fb).all())}), flush=True)

    if shadow_gg_wins or d0_gg_wins:
        cfg_best = dataclasses.replace(
            cfg, shadow_group_gate=shadow_gg_wins,
            closest_d0_group_gate=d0_gg_wins)
        fj2 = jax.jit(functools.partial(render_frame, cfg=cfg_best))
        r2, _ = tmr("frame_config4_best", fj2, backend, tex, pi, vi,
                    lights, reps=3,
                    extra={"shadow_gg": shadow_gg_wins,
                           "d0_gg": d0_gg_wins})
        print(json.dumps({"check": "best frame matches default",
                          "ok": bool(np.array_equal(
                              fb, np.asarray(r2[0])))}), flush=True)

    # --- 5. config-5 stress: refit vs full rebuild ----------------------
    from vkrt_tpu.wavefront.engine import Renderer
    for rebuild in ("refit", "full"):
        ren = Renderer(SCENE, C.config5_stress(), backend="dense",
                       max_texture_dim=512, quantize=True, rebuild=rebuild)
        cam5 = Camera(ren.cfg.width, ren.cfg.height)
        cam5.set_position(C.CAMERA_START_POSITION)
        cam5.set_rotation(C.CAMERA_START_ROTATION)
        ren.render(cam5)                       # compile + warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            ren.render(cam5)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"step": f"config5_e2e_rebuild_{rebuild}",
                          "ms": round(best * 1e3, 1)}), flush=True)

    # --- 6. edge rasterizer on hardware ---------------------------------
    from vkrt_tpu.raster.edge import build_raster_setup, raster_edge

    def px_py_zfl(Wp, Hp, Wv, Hv):
        gx = (jnp.arange(Wp, dtype=jnp.float32) + 0.5)[None, :]
        gy = (jnp.arange(Hp, dtype=jnp.float32) + 0.5)[:, None]
        px = tile(jnp.broadcast_to(gx, (Hp, Wp)))
        py = tile(jnp.broadcast_to(gy, (Hp, Wp)))
        inside = tile(jnp.broadcast_to((gx < Wv) & (gy < Hv), (Hp, Wp)))
        return px, py, jnp.where(inside, 0.0, 1.0e9)

    import dataclasses as _dc

    from vkrt_tpu.raster.pipeline import (render_raster_frame,
                                          render_raster_frame_edge)
    W, H = 128, 96
    cfg_r = _dc.replace(C.reference_config(), width=W, height=H)
    fb_e = np.asarray(jax.jit(functools.partial(
        render_raster_frame_edge, cfg=cfg_r, msaa=1))(
            tree, tex, jnp.asarray(cam.view_matrix),
            jnp.asarray(cam.projection_matrix)))
    fb_w = np.asarray(jax.jit(functools.partial(
        render_raster_frame, cfg=cfg_r, msaa=1))(
            backend, tex, pi, vi))
    dd = np.abs(fb_e - fb_w).max(axis=-1)
    print(json.dumps({"edge_hw_fullscene_flips": int((dd > 0.02).sum()),
                      "of": W * H,
                      "max_agree_diff":
                          round(float(dd[dd <= 0.02].max()), 6)}),
          flush=True)

    W, H = 1920, 1080
    setup, scb, clb = build_raster_setup(tree, jnp.asarray(cam.view_matrix),
                                         jnp.asarray(cam.projection_matrix),
                                         W, H)
    wp, hp = _pad_dims(W, H)
    px, py, zfl = px_py_zfl(wp, hp, W, H)
    rj = jax.jit(functools.partial(raster_edge, block=512))
    tmr("edge_raster_1080p_pass", rj, setup, scb, clb, px, py, zfl)
    sj = jax.jit(functools.partial(build_raster_setup, width=W, height=H))
    tmr("edge_setup_1080p", sj, tree, jnp.asarray(cam.view_matrix),
        jnp.asarray(cam.projection_matrix))


if __name__ == "__main__":
    main()
