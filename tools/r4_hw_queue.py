"""Round-4 hardware queue, part 1: GROUP (128-lane) granularity resort.

The ray-granular resort died on XLA's per-row scatter cost (~420 ms,
tools/r3_hw_queue.py); this queue measures the 128x-cheaper group
permutation (wavefront/resort.py group_*, jnp.take along Nb) on the
real config-4 wavefronts:

  0. capture + save the wavefront state npz (feeds the pure-CPU sims:
     tools/r4_chunksort_sim.py, subgroup_sim-compatible keys)
  1. permutation overhead in isolation (perm + permute + inverse)
  2. shadow_d0: occluded_multi baseline vs group-sorted e2e
  3. closest_d1: group-gated baseline vs group-sorted e2e (attrs
     through the inverse permute — the fair end-to-end)
  4. shadow_d1: consolidated (pack) baseline vs group-sort + pack e2e
  5. config-4 frames: defaults vs group_sort_shadows vs both flags
  6. golden smoke at 320x240 (rmse_trimmed / flip_frac rows — every
     hardware queue ends with this; VERDICT r3 item 7)

Run: python -u tools/r4_hw_queue.py > /tmp/r4q1.out 2>&1
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
from vkrt_tpu.wavefront import resort
from vkrt_tpu.wavefront.engine import (cached_backend, camera_ray_blocks,
                                       render_frame, _broadcast_points)
from vkrt_tpu.wavefront.pack import (consolidate, consolidate_plan,
                                     scatter_back)

SCENE = "/root/reference/models/sponza/Sponza.gltf"
BLOCK = 512
STATE = "/tmp/sgs_state.npz"


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
    tm0 = jnp.where(active0, C.RAY_TMAX, 0.0)
    o0 = _broadcast_points(
        jnp.broadcast_to(op[None, :], (d0.shape[1] * 128 // BLOCK, 3)), d0)

    # --- 0. save the subgroup_sim-compatible state npz --------------------
    out = {"closest_d0.o": o0, "closest_d0.d": d0, "closest_d0.tm": tm0,
           "closest_d1.o": o1, "closest_d1.d": d1, "closest_d1.tm": tm1}
    for s in range(min(nl, 2)):
        os_ = jnp.broadcast_to(lights[s][:, None, None], o0.shape)
        for dep, sdx, stx in (("d0", sd0, st0), ("d1", sd1, st1)):
            k = f"shadow_{dep}_l{s}"
            out[f"{k}.o"] = os_
            out[f"{k}.d"] = sdx[s]
            out[f"{k}.tm"] = stx[s]
    np.savez(STATE, **{k: np.asarray(v) for k, v in out.items()})
    print(json.dumps({"step": "state_saved", "path": STATE}), flush=True)

    OB = 1024

    # --- 1. permutation overhead in isolation -----------------------------
    def perm_roundtrip(pos, st, sd):
        slive = st[0] > 0
        for s in range(1, nl):
            slive = slive | (st[s] > 0)
        gperm = resort.radix_partition_perm(
            resort.group_cell_key(pos, slive, aabb),
            resort.GROUP_CELL_KEY_BITS)
        ginv = resort.inverse_permutation(gperm)
        sd_p = resort.permute_groups(sd, gperm)
        st_p = resort.permute_groups(st, gperm)
        # stand-in result: the permuted tmax mask, straight back
        return resort.permute_groups(st_p > 0, ginv), sd_p[0, 0, 0, 0]
    pr_j = jax.jit(perm_roundtrip)
    r, _ = tmr("groupperm_overhead_roundtrip", pr_j, pos0, st0, sd0)
    if r is not None:
        back = np.asarray(r[0])
        want = np.asarray(st0) > 0
        print(json.dumps({"check": "perm roundtrip exact",
                          "ok": bool(np.array_equal(back, want))}),
              flush=True)

    # --- 2. shadow_d0 ------------------------------------------------------
    oj = jax.jit(functools.partial(occluded_multi, block=OB, sort=True))
    occ0_base, d0base_ms = tmr("shadow_d0_baseline_sorted", oj, tree,
                               lights, sd0, st0)

    def shadow_gs(pos, sd, st, sort):
        slive = st[0] > 0
        for s in range(1, nl):
            slive = slive | (st[s] > 0)
        gperm = resort.radix_partition_perm(
            resort.group_cell_key(pos, slive, aabb),
            resort.GROUP_CELL_KEY_BITS)
        ginv = resort.inverse_permutation(gperm)
        occ = occluded_multi(tree, lights,
                             resort.permute_groups(sd, gperm),
                             resort.permute_groups(st, gperm),
                             block=OB, sort=sort)
        return resort.permute_groups(occ, ginv)
    for sort in (True, False):
        gj = jax.jit(functools.partial(shadow_gs, sort=sort))
        r, _ = tmr(f"shadow_d0_groupsorted_e2e_sort{int(sort)}", gj,
                   pos0, sd0, st0, extra={"baseline_ms": d0base_ms})
        if r is not None and occ0_base is not None:
            print(json.dumps({
                "check": f"shadow_d0 masks equal (sort={sort})",
                "ok": bool(np.array_equal(np.asarray(r),
                                          np.asarray(occ0_base)))}),
                flush=True)

    # --- 3. closest_d1 ------------------------------------------------------
    CB = 1024
    cj = jax.jit(lambda o, d, tm: trace_dense(
        tree, o, d, tm, with_attributes=True, block=CB, sort=False,
        group_gate=True))
    r_base, c1base_ms = tmr("closest_d1_gg_baseline", cj, o1, d1, tm1)

    def closest_gs(o, d, tm, live):
        gperm = resort.radix_partition_perm(
            resort.group_dir_key(d, o, live, aabb),
            resort.GROUP_DIR_KEY_BITS)
        ginv = resort.inverse_permutation(gperm)
        t, slot, u, v, attrs = trace_dense(
            tree, resort.permute_groups(o, gperm),
            resort.permute_groups(d, gperm),
            resort.permute_groups(tm, gperm),
            with_attributes=True, block=CB, sort=False, group_gate=True)
        return (resort.permute_groups(t, ginv),
                resort.permute_groups(slot, ginv),
                resort.permute_groups(u, ginv),
                resort.permute_groups(v, ginv),
                resort.permute_groups(attrs, ginv))
    cg_j = jax.jit(closest_gs)
    r, _ = tmr("closest_d1_groupsorted_e2e", cg_j, o1, d1, tm1, refl,
               extra={"baseline_ms": c1base_ms})
    if r is not None and r_base is not None:
        live = np.asarray(refl)
        tb = np.where(live, np.asarray(r_base[0]), 0)
        tg = np.where(live, np.asarray(r[0]), 0)
        sb = np.where(live, np.asarray(r_base[1]), 0)
        sg = np.where(live, np.asarray(r[1]), 0)
        nd_t = int((np.where(np.isfinite(tb), tb, -1)
                    != np.where(np.isfinite(tg), tg, -1)).sum())
        nd_s = int((sb != sg).sum())
        print(json.dumps({"check": "closest_d1 live t/slot diffs",
                          "t_diffs": nd_t, "slot_diffs": nd_s,
                          "live": int(live.sum())}), flush=True)

    # --- 4. shadow_d1: pack baseline vs group-sort + pack ------------------
    def chan_list(sd, st):
        return [sd[s][a] for s in range(nl) for a in range(3)] \
            + [st[s] for s in range(nl)]

    def pack_e2e(sd, st):
        live = jnp.zeros(st.shape[1:], bool)
        for s in range(nl):
            live = live | (st[s] > 0)
        plan = consolidate_plan(live, OB)
        packed = consolidate(chan_list(sd, st), plan["grank"],
                             plan["src_lo"], plan["src_hi"], block=OB)
        sd_p = jnp.stack([jnp.stack(packed[s * 3:s * 3 + 3])
                          for s in range(nl)])
        st_p = jnp.stack(packed[3 * nl:])
        occ = occluded_multi(tree, lights, sd_p, st_p, block=OB, sort=False)
        return scatter_back(occ.astype(jnp.float32), plan["grank"],
                            block=OB) > 0.5
    pe_j = jax.jit(pack_e2e)
    occ1_base, d1base_ms = tmr("shadow_d1_pack_baseline_e2e", pe_j, sd1, st1)

    def gs_pack_e2e(pos, sd, st):
        slive = st[0] > 0
        for s in range(1, nl):
            slive = slive | (st[s] > 0)
        gperm = resort.radix_partition_perm(
            resort.group_cell_key(pos, slive, aabb),
            resort.GROUP_CELL_KEY_BITS)
        ginv = resort.inverse_permutation(gperm)
        occ = pack_e2e(resort.permute_groups(sd, gperm),
                       resort.permute_groups(st, gperm))
        return resort.permute_groups(occ, ginv)
    gp_j = jax.jit(gs_pack_e2e)
    r, _ = tmr("shadow_d1_groupsort_pack_e2e", gp_j, pos1, sd1, st1,
               extra={"baseline_ms": d1base_ms})
    if r is not None and occ1_base is not None:
        print(json.dumps({
            "check": "shadow_d1 masks equal",
            "ok": bool(np.array_equal(np.asarray(r),
                                      np.asarray(occ1_base)))}), flush=True)

    # --- 5. config-4 frames -------------------------------------------------
    for name, flags in (
            ("frame_cfg4_defaults", {}),
            ("frame_cfg4_gs_shadows", {"group_sort_shadows": True}),
            ("frame_cfg4_gs_both", {"group_sort_shadows": True,
                                    "group_sort_closest": True})):
        fcfg = dataclasses.replace(cfg, **flags)
        fj = jax.jit(functools.partial(render_frame, cfg=fcfg))
        tmr(name, fj, backend, tex, pi, vi, lights)

    # --- 6. golden smoke (every queue ends with this) -----------------------
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
                        ("golden_gs_both", {"group_sort_shadows": True,
                                            "group_sort_closest": True})):
        fcfg = dc.replace(gcfg, **flags)
        fb, _ = render_frame(backend, tex, jnp.asarray(cam.proj_inverse),
                             jnp.asarray(cam.view_inverse),
                             jnp.asarray(C.LIGHT_POSITIONS), fcfg)
        fb = np.asarray(fb)
        model = cached_model(SCENE, 512)
        golden, stable = render_golden(
            flat, build_texture_heap(model.images), cam.proj_inverse,
            cam.view_inverse, fcfg, accel="native", with_stable=True)
        np.savez(f"/tmp/hw_golden_320_{name}.npz", fb=fb, golden=golden,
                 stable=stable)
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
