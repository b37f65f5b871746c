"""Round-5 hardware queue, part 1: two-level per-ray repartition
(wavefront/lanesort.py — in-block Pallas lane sort + group radix
partition), the round-4 verdict's #1 item.

Rows (config-4 wavefront state, 1080p):
  1. partition overhead in isolation (lane fwd + group perm + group inv
     + lane inverse, 4ch fwd / 4ch back) + exactness check
  2. shadow_d0: sorted baseline vs lane-only vs lane+group e2e
     (pos+castmask move, sd/st recomputed, masks inverse-permuted)
  3. shadow_d1: pack+groupsort production baseline vs
     pack+lane+group e2e vs lane+group (no pack)
  4. closest_d1: group-gated baseline vs lane+group e2e (all 40 output
     channels through the inverse — the fair end-to-end)
  5. config-4 frames: defaults vs partition_shadows vs both partitions
  6. golden smoke at 320x240 (every hardware queue ends with this)

Run: python -u tools/r5_hw_queue.py > /tmp/r5q1.out 2>&1
"""
import dataclasses
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
from vkrt_tpu.wavefront import lanesort, resort
from vkrt_tpu.wavefront.engine import (cached_backend, camera_ray_blocks,
                                       render_frame, _broadcast_points)
from vkrt_tpu.wavefront.pack import (consolidate, consolidate_plan,
                                     scatter_back)

SCENE = "/root/reference/models/sponza/Sponza.gltf"
BLOCK = 512
OB = 1024
CB = 1024


def tmr(name, jf, *args, reps=3, extra=None):
    try:
        r = jf(*args)
        jax.block_until_ready(r)
    except Exception as e:
        print(json.dumps({"step": name, "error": repr(e)[:400]}), flush=True)
        import traceback
        traceback.print_exc()
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
    enable_compilation_cache()
    flat, tex, backend = cached_backend(SCENE, 512, "dense")
    tree = backend.tree
    aabb = backend.scene_aabb
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
        return sd, st, o1, d1, refl, pos

    state_j = jax.jit(frame_state)
    sd0, st0, o1, d1, refl, pos0 = state_j(tree, tex, op, d0, active0)
    sd1, st1, _, _, _, pos1 = state_j(tree, tex, op, d1, refl)
    tm1 = jnp.where(refl, C.RAY_TMAX, 0.0)

    # castmask from st (st>0 iff cast AND dist>tmin — reproduces st
    # exactly through the recompute, the engine's contract)
    def castmask_of(st):
        cm = (st[0] > 0).astype(jnp.float32)
        for s in range(1, nl):
            cm = cm + (st[s] > 0).astype(jnp.float32) * float(1 << s)
        return cm

    # --- 1. partition overhead in isolation -------------------------------
    def pt_roundtrip(pos, st):
        cm = castmask_of(st)
        lkey = lanesort.cell_key_fine(pos, cm > 0, aabb, bits=6)
        (p0, p1, p2, cmv), rank = lanesort.lane_sort(
            [pos[0], pos[1], pos[2], cm], lkey, block=OB)
        pos_p = jnp.stack([p0, p1, p2])
        gperm = resort.radix_partition_perm(
            resort.group_cell_key(pos_p, cmv > 0, aabb),
            resort.GROUP_CELL_KEY_BITS)
        ginv = resort.inverse_permutation(gperm)
        pos_p = resort.permute_groups(pos_p, gperm)
        cm_p = resort.permute_groups(cmv, gperm)
        # stand-in result: 4 channels straight back through the inverse
        res = jnp.concatenate([pos_p, cm_p[None]])
        res = resort.permute_groups(res, ginv)
        back = lanesort.lane_unsort(res, rank, block=OB)
        return back
    rt_j = jax.jit(pt_roundtrip)
    r, _ = tmr("partition_overhead_roundtrip_4ch", rt_j, pos0, st0)
    if r is not None:
        back = np.asarray(r)
        want = np.concatenate([np.asarray(pos0),
                               np.asarray(castmask_of(st0))[None]])
        print(json.dumps({"check": "partition roundtrip exact",
                          "ok": bool(np.array_equal(back, want))}),
              flush=True)

    # --- 2. shadow_d0 ------------------------------------------------------
    oj = jax.jit(functools.partial(occluded_multi, block=OB, sort=True))
    occ0_base, d0base_ms = tmr("shadow_d0_baseline_sorted", oj, tree,
                               lights, sd0, st0)

    def shadow_pt(pos, st, groups, dsort):
        cm = castmask_of(st)
        lkey = lanesort.cell_key_fine(pos, cm > 0, aabb, bits=6)
        (p0, p1, p2, cmv), rank = lanesort.lane_sort(
            [pos[0], pos[1], pos[2], cm], lkey, block=OB)
        pos_p = jnp.stack([p0, p1, p2])
        if groups:
            gperm = resort.radix_partition_perm(
                resort.group_cell_key(pos_p, cmv > 0, aabb),
                resort.GROUP_CELL_KEY_BITS)
            ginv = resort.inverse_permutation(gperm)
            pos_p = resort.permute_groups(pos_p, gperm)
            cmv = resort.permute_groups(cmv, gperm)
        cmi = cmv.astype(jnp.int32)
        sd_l, st_l = [], []
        for li in range(nl):
            ldir, ldist, _ = shading.light_geometry(pos_p, lights[li])
            cast_p = ((cmi >> li) & 1) > 0
            sd_l.append(-ldir)
            st_l.append(jnp.where(cast_p, ldist - C.RAY_TMIN, 0.0))
        occ = occluded_multi(tree, lights, jnp.stack(sd_l),
                             jnp.stack(st_l), block=OB, sort=dsort)
        occ_f = occ.astype(jnp.float32)
        if groups:
            occ_f = resort.permute_groups(occ_f, ginv)
        return lanesort.lane_unsort(occ_f, rank, block=OB) > 0.5
    for name, groups, dsort in (
            ("shadow_d0_lane_only_e2e", False, False),
            ("shadow_d0_lane_group_e2e", True, False),
            ("shadow_d0_lane_group_sorted_e2e", True, True)):
        sj = jax.jit(functools.partial(shadow_pt, groups=groups,
                                       dsort=dsort))
        r, _ = tmr(name, sj, pos0, st0, extra={"baseline_ms": d0base_ms})
        if r is not None and occ0_base is not None:
            print(json.dumps({
                "check": f"{name} masks equal",
                "ok": bool(np.array_equal(np.asarray(r),
                                          np.asarray(occ0_base)))}),
                flush=True)

    # --- 3. shadow_d1 ------------------------------------------------------
    def chan_list(sd, st):
        return [sd[s][a] for s in range(nl) for a in range(3)] \
            + [st[s] for s in range(nl)]

    def gs_pack_e2e(pos, sd, st):
        """Production baseline: group-sort + 16-channel pack."""
        slive = st[0] > 0
        for s in range(1, nl):
            slive = slive | (st[s] > 0)
        gperm = resort.radix_partition_perm(
            resort.group_cell_key(pos, slive, aabb),
            resort.GROUP_CELL_KEY_BITS)
        ginv = resort.inverse_permutation(gperm)
        sd_g = resort.permute_groups(sd, gperm)
        st_g = resort.permute_groups(st, gperm)
        live = st_g[0] > 0
        for s in range(1, nl):
            live = live | (st_g[s] > 0)
        plan = consolidate_plan(live, OB)
        packed = consolidate(chan_list(sd_g, st_g), plan["grank"],
                             plan["src_lo"], plan["src_hi"], block=OB)
        sd_p = jnp.stack([jnp.stack(packed[s * 3:s * 3 + 3])
                          for s in range(nl)])
        st_p = jnp.stack(packed[3 * nl:])
        occ = occluded_multi(tree, lights, sd_p, st_p, block=OB, sort=False)
        occ = scatter_back(occ.astype(jnp.float32), plan["grank"],
                           block=OB) > 0.5
        return resort.permute_groups(occ, ginv)
    gp_j = jax.jit(gs_pack_e2e)
    occ1_base, d1base_ms = tmr("shadow_d1_gsort_pack_baseline_e2e", gp_j,
                               pos1, sd1, st1)

    def pt_pack_e2e(pos, st, use_pack):
        """Round-5 engine path: 4-channel pack, then lane+group sort."""
        cm = castmask_of(st)
        if use_pack:
            plan = consolidate_plan(cm > 0, OB)
            pk = consolidate([pos[0], pos[1], pos[2], cm], plan["grank"],
                             plan["src_lo"], plan["src_hi"], block=OB)
            pos_k = jnp.stack(pk[:3])
            cm_k = pk[3]
        else:
            pos_k, cm_k = pos, cm
        lkey = lanesort.cell_key_fine(pos_k, cm_k > 0, aabb, bits=6)
        (p0, p1, p2, cmv), rank = lanesort.lane_sort(
            [pos_k[0], pos_k[1], pos_k[2], cm_k], lkey, block=OB)
        pos_p = jnp.stack([p0, p1, p2])
        gperm = resort.radix_partition_perm(
            resort.group_cell_key(pos_p, cmv > 0, aabb),
            resort.GROUP_CELL_KEY_BITS)
        ginv = resort.inverse_permutation(gperm)
        pos_p = resort.permute_groups(pos_p, gperm)
        cmi = resort.permute_groups(cmv, gperm).astype(jnp.int32)
        sd_l, st_l = [], []
        for li in range(nl):
            ldir, ldist, _ = shading.light_geometry(pos_p, lights[li])
            cast_p = ((cmi >> li) & 1) > 0
            sd_l.append(-ldir)
            st_l.append(jnp.where(cast_p, ldist - C.RAY_TMIN, 0.0))
        occ = occluded_multi(tree, lights, jnp.stack(sd_l),
                             jnp.stack(st_l), block=OB, sort=False)
        occ_f = resort.permute_groups(occ.astype(jnp.float32), ginv)
        occ_f = lanesort.lane_unsort(occ_f, rank, block=OB)
        if use_pack:
            occ_f = scatter_back(occ_f, plan["grank"], block=OB)
        return occ_f > 0.5
    for name, use_pack in (("shadow_d1_pack_lane_group_e2e", True),
                           ("shadow_d1_lane_group_nopack_e2e", False)):
        pj = jax.jit(functools.partial(pt_pack_e2e, use_pack=use_pack))
        r, _ = tmr(name, pj, pos1, st1, extra={"baseline_ms": d1base_ms})
        if r is not None and occ1_base is not None:
            print(json.dumps({
                "check": f"{name} masks equal",
                "ok": bool(np.array_equal(np.asarray(r),
                                          np.asarray(occ1_base)))}),
                flush=True)

    # --- 4. closest_d1 ------------------------------------------------------
    cj = jax.jit(lambda o, d, tm: trace_dense(
        tree, o, d, tm, with_attributes=True, block=CB, sort=False,
        group_gate=True))
    r_base, c1base_ms = tmr("closest_d1_gg_baseline", cj, o1, d1, tm1)

    def closest_pt(o, d, tm):
        lkey = lanesort.dir_cell_key_fine(d, o, tm > 0, aabb, bits=5)
        (c0, c1, c2, c3, c4, c5, c6), rank = lanesort.lane_sort(
            [o[0], o[1], o[2], d[0], d[1], d[2], tm], lkey, block=CB)
        o_t = jnp.stack([c0, c1, c2])
        d_t = jnp.stack([c3, c4, c5])
        tm_t = c6
        gperm = resort.radix_partition_perm(
            resort.group_dir_key(d_t, o_t, tm_t > 0, aabb),
            resort.GROUP_DIR_KEY_BITS)
        ginv = resort.inverse_permutation(gperm)
        o_t = resort.permute_groups(o_t, gperm)
        d_t = resort.permute_groups(d_t, gperm)
        tm_t = resort.permute_groups(tm_t, gperm)
        t, slot, u, v, attrs = trace_dense(
            tree, o_t, d_t, tm_t, with_attributes=True, block=CB,
            sort=False, group_gate=True)
        hitm = slot >= 0
        t_fin = jnp.where(hitm, t, 0.0)
        res = jnp.concatenate(
            [jnp.stack([t_fin, u, v, hitm.astype(jnp.float32),
                        slot.astype(jnp.float32)]), attrs])
        res = resort.permute_groups(res, ginv)
        res = lanesort.lane_unsort(res, rank, block=CB)
        return res
    cp_j = jax.jit(closest_pt)
    r, _ = tmr("closest_d1_lane_group_e2e", cp_j, o1, d1, tm1,
               extra={"baseline_ms": c1base_ms})
    if r is not None and r_base is not None:
        live = np.asarray(refl)
        res = np.asarray(r)
        hit_pt = res[3] > 0.5
        tb = np.where(live, np.asarray(r_base[0]), 0)
        tp = np.where(live & hit_pt, res[0], 0)
        tb = np.where(np.isfinite(tb), tb, 0)
        sb = np.where(live, np.asarray(r_base[1]), -1)
        sp = np.where(live, res[4].astype(np.int64), -1)
        print(json.dumps({"check": "closest_d1 live t/slot diffs",
                          "t_diffs": int((tb != tp).sum()),
                          "slot_diffs": int((sb != sp).sum()),
                          "live": int(live.sum())}), flush=True)

    # --- 5. config-4 frames -------------------------------------------------
    for name, flags in (
            ("frame_cfg4_defaults", {}),
            ("frame_cfg4_pt_shadows", {"partition_shadows": True}),
            ("frame_cfg4_pt_both", {"partition_shadows": True,
                                    "partition_closest": True})):
        fcfg = dataclasses.replace(cfg, **flags)
        fj = jax.jit(functools.partial(render_frame, cfg=fcfg))
        tmr(name, fj, backend, tex, pi, vi, lights)

    # --- 6. golden smoke -----------------------------------------------------
    golden_smoke()


def golden_smoke():
    import dataclasses as dc

    from vkrt_tpu.app.framebuffer import golden_metrics
    from vkrt_tpu.golden import render_golden
    from vkrt_tpu.scene import build_texture_heap
    from vkrt_tpu.wavefront.engine import cached_backend, cached_model, \
        render_frame

    flat, tex, backend = cached_backend(SCENE, 512, "dense")
    gcfg = dc.replace(C.reference_config(), width=320, height=240)
    cam = Camera(gcfg.width, gcfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    for name, flags in (("golden_defaults", {}),
                        ("golden_pt_both", {"partition_shadows": True,
                                            "partition_closest": True})):
        fcfg = dc.replace(gcfg, **flags)
        fb, _ = render_frame(backend, tex, jnp.asarray(cam.proj_inverse),
                             jnp.asarray(cam.view_inverse),
                             jnp.asarray(C.LIGHT_POSITIONS), fcfg)
        fb = np.asarray(fb)
        model = cached_model(SCENE, 512)
        golden, stable = render_golden(
            flat, build_texture_heap(model.images), cam.proj_inverse,
            cam.view_inverse, fcfg, accel="native", with_stable=True)
        m = golden_metrics(fb, golden, stable=stable)
        print(json.dumps({"step": name,
                          "rmse": round(m["rmse"], 6),
                          "rmse_trimmed": round(m["rmse_trimmed"], 6),
                          "flip_frac": round(m["flip_frac"], 6),
                          "rmse_stable": round(m["rmse_stable"], 6),
                          "stable_frac": round(m["stable_frac"], 6)}),
              flush=True)


if __name__ == "__main__":
    main()
