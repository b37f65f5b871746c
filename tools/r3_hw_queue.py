"""Round-3 hardware queue — everything waiting on the axon relay, batched
into ONE process (remote compiles don't cache across processes).

Ordered by value so an early cutoff still captures the big items:

  1. closest_d1 b1024 group_gate (the landed production path) —
     regression confirm after the pregate/worklist refactor
  2. shadow d0/d1 gg0 baselines (today's production path + reference
     masks for every retest)
  3. secondary-dispatch RESORT rows (wavefront/resort.py — sims say
     0.51x/0.40x/0.147x total sweeps; the round's biggest lever)
  4. whole-frame config-4, plain + resorted
  5. shadow group-gate retest with the slice prepass (+ nosweep
     ablation); shadow visit-order keys (mid/far)
  6. closest_d0 pregate + group-gate timings
  7. config-5 stress e2e with rebuild=refit vs rebuild=full (BASELINE.md
     VERDICT item 7 rows)
  8. edge-function rasterizer on hardware: compiled kernel, 128x96
     agreement vs the wavefront raster, 1080p visibility-pass timing

Run: python -u tools/r3_hw_queue.py > /tmp/r3q.out 2>&1
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
    return r


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

    # --- 1. closest_d1 slice-prepass confirm (the landed path) ---------
    for gg in (False, True):
        cj = jax.jit(functools.partial(
            lambda tree, o, d, tm: trace_dense(
                tree, o, d, tm, with_attributes=True, block=1024,
                sort=False, group_gate=gg)))
        r = tmr(f"closest_d1_b1024_gg{int(gg)}", cj, tree, o1, d1, tm1)
        if gg:
            gg_out = [np.asarray(x) for x in r]
        else:
            base_out = [np.asarray(x) for x in r]
    print(json.dumps({"check": "closest_d1 gate outputs identical",
                      "ok": bool(all(np.array_equal(a, b) for a, b in
                                     zip(base_out, gg_out)))}), flush=True)

    # --- 2. shadow baselines (today's production path; also the
    # reference masks for every retest below) -----------------------------
    occ_out = {}
    for depth, sd, st in (("d0", sd0, st0), ("d1", sd1, st1)):
        oj = jax.jit(functools.partial(
            occluded_multi, block=1024, sort=(depth == "d0")))
        r = tmr(f"shadow_{depth}_b1024_gg0_slice", oj, tree, lights, sd, st)
        occ_out[(depth, False)] = np.asarray(r)

    # --- 2d. secondary-dispatch resort (wavefront/resort.py; sims on
    # this exact state: 0.51x closest_d1, 0.40x shadow_d0, 0.147x
    # shadow_d1 total gated-cluster sweeps — tools/dirsort_sim*.py).
    # Timings INCLUDE the radix partition + permutes + inverse (the
    # honest end-to-end comparator vs sections 1/2 above).
    from vkrt_tpu.wavefront import resort as RS
    aabb = backend.scene_aabb

    # permutation construction alone (key + radix passes + inverse +
    # one forward permute) — isolates the resort overhead from the
    # dispatch timings below; if this is large, optimize the partition
    # (counting-sort formulation: fewer scatters) before judging resort
    def perm_only(d, tm, pos, hitm):
        p1 = RS.radix_partition_perm(RS.octant_key(d, tm > 0.0),
                                     RS.OCTANT_BITS)
        p2 = RS.radix_partition_perm(RS.cell_key(pos, hitm, aabb),
                                     RS.CELL_KEY_BITS)
        return (RS.permute_rays(tm, p1), RS.inverse_permutation(p1),
                RS.permute_rays(tm, p2), RS.inverse_permutation(p2))

    tmr("resort_perm_overhead_4b_plus_10b", jax.jit(perm_only),
        d1, tm1, pos1, hit1)

    def closest_rs(tree, o, d, tm, gg, srt):
        perm = RS.radix_partition_perm(RS.octant_key(d, tm > 0.0),
                                       RS.OCTANT_BITS)
        inv = RS.inverse_permutation(perm)
        r = trace_dense(tree, RS.permute_rays(o, perm),
                        RS.permute_rays(d, perm), RS.permute_rays(tm, perm),
                        with_attributes=True, block=1024, sort=srt,
                        group_gate=gg)
        return tuple(RS.permute_rays(x, inv) for x in r)

    for gg, srt in ((True, False), (False, False), (False, True)):
        cj = jax.jit(functools.partial(closest_rs, gg=gg, srt=srt))
        r = tmr(f"closest_d1_rs_gg{int(gg)}_s{int(srt)}", cj, tree,
                o1, d1, tm1)
        if (gg, srt) == (True, False):
            # near-tie commits are visit-order dependent at ~1 ulp
            # (wavefront/resort.py) — report diff stats, gate on t only
            rs_out = [np.asarray(x) for x in r]
            tdiff = float(np.abs(gg_out[0] - rs_out[0]).max())
            sdiff = int((gg_out[1] != rs_out[1]).sum())
            print(json.dumps({
                "check": "closest_d1 resort vs gate",
                "t_max_abs_diff": tdiff, "slot_diffs": sdiff,
                "ok": bool(tdiff <= 1e-4)}), flush=True)

    def shadow_rs(tree, lights, sd, st, pos, hitm, srt):
        sperm = RS.radix_partition_perm(RS.cell_key(pos, hitm, aabb),
                                        RS.CELL_KEY_BITS)
        sinv = RS.inverse_permutation(sperm)
        occ = occluded_multi(tree, lights, RS.permute_rays(sd, sperm),
                             RS.permute_rays(st, sperm), block=1024,
                             sort=srt)
        return RS.permute_rays(occ, sinv)

    for depth, sdx, stx, posx, hitx in (("d0", sd0, st0, pos0, hit0),
                                        ("d1", sd1, st1, pos1, hit1)):
        oj = jax.jit(functools.partial(shadow_rs, srt=(depth == "d0")))
        r = tmr(f"shadow_{depth}_rs", oj, tree, lights, sdx, stx,
                posx, hitx)
        print(json.dumps({
            "check": f"shadow_{depth} resort mask identical",
            "ok": bool(np.array_equal(occ_out[(depth, False)],
                                      np.asarray(r)))}), flush=True)
    # resort changes the d1 sort=False tradeoff (packed blocks are
    # coherent now) — one timing decides whether nearest-first returns
    oj = jax.jit(functools.partial(shadow_rs, srt=True))
    tmr("shadow_d1_rs_sorted", oj, tree, lights, sd1, st1, pos1, hit1)

    # --- 2g. two-level pregate ("recheck"): interval prologue nominates
    # candidates (cumsum partition, no argsort), kernel re-tests each
    # per-ray at DMA-issue time — replaces the in-kernel per-ray prepass
    # + scalar emission (+ sort). Timings INCLUDE the prologue. Sims:
    # interval over-gates secondaries 1.7-5x, but the re-check costs
    # ~1-2% of a sweep per candidate — the prepass share (nosweep rows
    # below) bounds the win. CI: bit-exact both kernels (tests/
    # test_dense.py::test_recheck_*).
    def closest_rc(tree, o, d, tm, gg):
        return trace_dense(tree, o, d, tm, with_attributes=True,
                           block=1024, sort=False, group_gate=gg,
                           pregate="recheck")

    for gg in (True, False):
        cj = jax.jit(functools.partial(closest_rc, gg=gg))
        r = tmr(f"closest_d1_rc_gg{int(gg)}", cj, tree, o1, d1, tm1)
        if gg:
            rc_out = [np.asarray(x) for x in r]
            tdiff = float(np.abs(gg_out[0] - rc_out[0]).max())
            print(json.dumps({"check": "closest_d1 recheck vs gate",
                              "t_max_abs_diff": tdiff,
                              "ok": bool(tdiff <= 1e-4)}), flush=True)

    def closest_rs_rc(tree, o, d, tm):
        # recheck + resort composed — the candidate production point
        perm = RS.radix_partition_perm(RS.octant_key(d, tm > 0.0),
                                       RS.OCTANT_BITS)
        inv = RS.inverse_permutation(perm)
        r = trace_dense(tree, RS.permute_rays(o, perm),
                        RS.permute_rays(d, perm), RS.permute_rays(tm, perm),
                        with_attributes=True, block=1024, sort=False,
                        group_gate=True, pregate="recheck")
        return tuple(RS.permute_rays(x, inv) for x in r)

    tmr("closest_d1_rs_rc_gg1", jax.jit(closest_rs_rc), tree, o1, d1, tm1)

    def shadow_rs_rc(tree, lights, sd, st, pos, hitm, gg):
        sperm = RS.radix_partition_perm(RS.cell_key(pos, hitm, aabb),
                                        RS.CELL_KEY_BITS)
        sinv = RS.inverse_permutation(sperm)
        occ = occluded_multi(tree, lights, RS.permute_rays(sd, sperm),
                             RS.permute_rays(st, sperm), block=1024,
                             sort=False, group_gate=gg, pregate="recheck")
        return RS.permute_rays(occ, sinv)

    for depth, sdx, stx, posx, hitx in (("d0", sd0, st0, pos0, hit0),
                                        ("d1", sd1, st1, pos1, hit1)):
        oj = jax.jit(functools.partial(
            occluded_multi, block=1024, sort=False, pregate="recheck"))
        r = tmr(f"shadow_{depth}_rc", oj, tree, lights, sdx, stx)
        print(json.dumps({
            "check": f"shadow_{depth} recheck mask identical",
            "ok": bool(np.array_equal(occ_out[(depth, False)],
                                      np.asarray(r)))}), flush=True)
        oj = jax.jit(functools.partial(shadow_rs_rc, gg=False))
        r = tmr(f"shadow_{depth}_rs_rc", oj, tree, lights, sdx, stx,
                posx, hitx)
        print(json.dumps({
            "check": f"shadow_{depth} resort+recheck mask identical",
            "ok": bool(np.array_equal(occ_out[(depth, False)],
                                      np.asarray(r)))}), flush=True)
    # group-gated recheck shadow: the cheap per-(set,group) bits now
    # come from the [1,R] re-check, not a [K2,R] prepass re-read — the
    # form that made gg regress 2x is gone. One row decides.
    oj = jax.jit(functools.partial(occluded_multi, block=1024, sort=False,
                                   group_gate=True, pregate="recheck"))
    r = tmr("shadow_d1_rc_gg1", oj, tree, lights, sd1, st1)
    print(json.dumps({"check": "shadow_d1 recheck+gg mask identical",
                      "ok": bool(np.array_equal(occ_out[("d1", False)],
                                                np.asarray(r)))}),
          flush=True)
    # coherent d0 flavor: recheck + in-kernel interval sort (scratch
    # copy + nearest-first) — replaces the d0 prepass + emission too if
    # it wins over shadow_d0_b1024_gg0_slice above
    oj = jax.jit(functools.partial(occluded_multi, block=1024, sort=True,
                                   pregate="recheck"))
    r = tmr("shadow_d0_rc_sorted", oj, tree, lights, sd0, st0)
    print(json.dumps({"check": "shadow_d0 recheck-sorted mask identical",
                      "ok": bool(np.array_equal(occ_out[("d0", False)],
                                                np.asarray(r)))}),
          flush=True)

    # --- 3. whole production frame (new engine wiring); resort pinned
    # OFF here and ON below so the A/B holds whatever the config default
    import dataclasses
    cfg = dataclasses.replace(cfg, resort_secondary=False)
    fj = jax.jit(functools.partial(render_frame, cfg=cfg))
    r = tmr("frame_config4", fj, backend, tex, pi, vi, lights, reps=3)
    fb = np.asarray(r[0])
    rays = int(np.asarray(r[1]).sum())
    print(json.dumps({"frame_rays": rays,
                      "finite": bool(np.isfinite(fb).all())}), flush=True)

    # same frame with every secondary dispatch resorted (allclose: the
    # reflection round's near-tie commits are visit-order dependent at
    # ~1 ulp — tests/test_backends.py pins the contract on CPU)
    cfg_rs = dataclasses.replace(cfg, resort_secondary=True)
    fj2 = jax.jit(functools.partial(render_frame, cfg=cfg_rs))
    r2 = tmr("frame_config4_resort", fj2, backend, tex, pi, vi, lights,
             reps=3)
    fdiff = float(np.abs(fb - np.asarray(r2[0])).max())
    print(json.dumps({"check": "resort frame matches",
                      "max_abs_diff": fdiff,
                      "ok": bool(fdiff <= 1e-4)}), flush=True)

    # resort + recheck frame (both levers on — the candidate default)
    cfg_rr = dataclasses.replace(cfg, resort_secondary=True,
                                 recheck_secondary=True)
    fj3 = jax.jit(functools.partial(render_frame, cfg=cfg_rr))
    r3 = tmr("frame_config4_resort_recheck", fj3, backend, tex, pi, vi,
             lights, reps=3)
    fdiff = float(np.abs(fb - np.asarray(r3[0])).max())
    print(json.dumps({"check": "resort+recheck frame matches",
                      "max_abs_diff": fdiff,
                      "ok": bool(fdiff <= 1e-4)}), flush=True)

    # --- 2e. shadow group-gate retest with the slice prepass (+ nosweep
    # ablation isolating prepass cost) — decides whether occl_multi
    # group gating ships or stays a recorded dead end -------------------
    for depth, sd, st in (("d1", sd1, st1), ("d0", sd0, st0)):
        oj = jax.jit(functools.partial(
            occluded_multi, block=1024, sort=(depth == "d0"),
            group_gate=True))
        r = tmr(f"shadow_{depth}_b1024_gg1_slice", oj, tree, lights, sd, st)
        print(json.dumps({"check": f"shadow_{depth} masks identical",
                          "ok": bool(np.array_equal(occ_out[(depth, False)],
                                                    np.asarray(r)))}),
              flush=True)
    for gg in (False, True):
        oj = jax.jit(functools.partial(
            occluded_multi, block=1024, sort=False, group_gate=gg,
            ablate="nosweep"))
        tmr(f"shadow_d1_nosweep_gg{int(gg)}", oj, tree, lights, sd1, st1)

    # --- 2c. shadow visit order (ROADMAP lever): any-hit sort keys ------
    # d0 only (sort is off at d1 by the per-depth policy). Baseline is
    # shadow_d0_b1024_gg0_slice above (visit="near").
    for visit in ("mid", "far"):
        oj = jax.jit(functools.partial(
            occluded_multi, block=1024, sort=True, visit=visit))
        r = tmr(f"shadow_d0_b1024_visit_{visit}", oj, tree, lights,
                sd0, st0)
        print(json.dumps({
            "check": f"shadow_d0 visit={visit} mask identical",
            "ok": bool(np.array_equal(occ_out[("d0", False)],
                                      np.asarray(r)))}), flush=True)

    # --- 2b. pregate (XLA-prologue work lists) on depth-0 CLOSEST only:
    # tools/pregate_sim.py on real state — interval over-gate is +8.8%
    # for camera tiles but 3.1-3.4x for shadow cones and depth-1 (the
    # per-ray t clause prunes beyond each segment's own surface; the
    # interval can't), so only closest_d0 is worth hardware time.
    tm0 = jnp.where(active0, C.RAY_TMAX, 0.0)
    o0 = _broadcast_points(
        jnp.broadcast_to(op[None, :], (d0.shape[1] * 128 // BLOCK, 3)), d0)
    pg_out = {}
    for pg in (False, True):
        cj = jax.jit(functools.partial(
            lambda tree, o, d, tm: trace_dense(
                tree, o, d, tm, with_attributes=True, block=1024,
                sort=True, pregate=pg)))
        r = tmr(f"closest_d0_b1024_pg{int(pg)}", cj, tree, o0, d0, tm0)
        pg_out[pg] = [np.asarray(x) for x in r]
    print(json.dumps({
        "check": "pregate closest outputs identical",
        "ok": bool(all(np.array_equal(a, b) for a, b in
                       zip(pg_out[False], pg_out[True])))}), flush=True)

    # group_gate at depth 0: prepass-state rows gate 95% of clusters
    # (rowgate_sim) so gating itself is near-useless — but the per-group
    # btmax prune acts DURING the sweep as subtiles converge
    # (nearest-first order). One timing decides.
    cj = jax.jit(functools.partial(
        lambda tree, o, d, tm: trace_dense(
            tree, o, d, tm, with_attributes=True, block=1024,
            sort=True, group_gate=True)))
    tmr("closest_d0_b1024_gg1", cj, tree, o0, d0, tm0)

    # recheck at depth 0 (sorted flavor): vs both closest_d0 rows above
    cj = jax.jit(functools.partial(
        lambda tree, o, d, tm: trace_dense(
            tree, o, d, tm, with_attributes=True, block=1024,
            sort=True, pregate="recheck")))
    r = tmr("closest_d0_b1024_rc_sorted", cj, tree, o0, d0, tm0)
    print(json.dumps({
        "check": "closest_d0 recheck outputs identical",
        "ok": bool(all(np.array_equal(a, np.asarray(b)) for a, b in
                       zip(pg_out[False], r)))}), flush=True)

    # --- 4. config-5 stress: refit vs full rebuild ----------------------
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

    # --- 5. edge rasterizer on hardware ---------------------------------
    from vkrt_tpu.raster.edge import build_raster_setup, raster_edge

    def px_py_zfl(Wp, Hp, Wv, Hv):
        gx = (jnp.arange(Wp, dtype=jnp.float32) + 0.5)[None, :]
        gy = (jnp.arange(Hp, dtype=jnp.float32) + 0.5)[:, None]
        px = tile(jnp.broadcast_to(gx, (Hp, Wp)))
        py = tile(jnp.broadcast_to(gy, (Hp, Wp)))
        inside = tile(jnp.broadcast_to((gx < Wv) & (gy < Hv), (Hp, Wp)))
        return px, py, jnp.where(inside, 0.0, 1.0e9)

    # full-scene agreement vs the ray-cast wavefront raster (compiled,
    # textured, alpha-kill) — the hardware analogue of
    # tests/test_raster_edge.py's flip gate
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

    # 1080p visibility-pass timing (one msaa sample, first pass)
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
