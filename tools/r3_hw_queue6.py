"""Round-3 hardware queue, part 6: Pallas live-ray consolidation
(wavefront/pack.py) on the real depth-1 shadow wavefront.

Rows:
  1. consolidate + scatter_back roundtrip: Mosaic compile, timing, and
     BIT-exactness of packed state vs a numpy reference (the one-hot
     HIGHEST matmul exactness claim, on hardware)
  2. occluded_multi on the PACKED wavefront vs the unpacked baseline
     (197.4 ms) — mask equality after scatter_back
  3. end-to-end consolidated shadow_d1: pack + trace + unpack total
  4. same treatment for closest_d1 (group-gated baseline 94.8 ms)

Run: python -u tools/r3_hw_queue6.py > /tmp/r3q6.out 2>&1
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
                                       _broadcast_points)
from vkrt_tpu.wavefront.pack import (consolidate, consolidate_plan,
                                     scatter_back)

SCENE = "/root/reference/models/sponza/Sponza.gltf"
BLOCK = 512


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

    OB = 1024

    # --- 1. roundtrip: pack shadow_d1 state, verify bit-exact ------------
    def chan_list(sd, st):
        return [sd[s][a] for s in range(nl) for a in range(3)] \
            + [st[s] for s in range(nl)]

    def pack_fn(sd, st):
        live = jnp.zeros(st.shape[1:], bool)
        for s in range(nl):
            live = live | (st[s] > 0)
        plan = consolidate_plan(live, OB)
        packed = consolidate(chan_list(sd, st), plan["grank"],
                             plan["src_lo"], plan["src_hi"], block=OB)
        sd_p = jnp.stack([jnp.stack(packed[s * 3:s * 3 + 3])
                          for s in range(nl)])
        st_p = jnp.stack(packed[3 * nl:])
        return sd_p, st_p, plan["grank"], plan["nlive"]

    pk_j = jax.jit(pack_fn)
    r, pack_ms = tmr("pack_shadow_d1_state", pk_j, sd1, st1)
    if r is None:
        return
    sd_p, st_p, grank, nlive = r
    print(json.dumps({"nlive": int(nlive), "of": int(st1[0].size),
                      "live_blocks": int(np.ceil(int(nlive) / OB)),
                      "total_blocks": st1[0].size // OB}), flush=True)

    # numpy reference for bit-exactness
    live_np = np.zeros(st1.shape[1:], bool)
    st1_np = np.asarray(st1)
    sd1_np = np.asarray(sd1)
    for s in range(nl):
        live_np |= st1_np[s] > 0
    order = np.argsort(~live_np.reshape(-1), kind="stable")
    nv = int(live_np.sum())

    def check_pack(name, got, want_flat):
        g = np.asarray(got).reshape(-1)
        ok = (np.array_equal(g[:nv], want_flat[order][:nv])
              and (g[nv:] == 0).all())
        return ok

    ok = all(check_pack("sd", sd_p[s][a], sd1_np[s][a].reshape(-1))
             for s in range(nl) for a in range(3))
    ok = ok and all(check_pack("st", st_p[s], st1_np[s].reshape(-1))
                    for s in range(nl))
    print(json.dumps({"check": "packed state bit-exact on hw", "ok": ok}),
          flush=True)

    # --- 2. occl on packed vs baseline ------------------------------------
    oj = jax.jit(functools.partial(occluded_multi, block=OB, sort=False))
    occ_base, base_ms = tmr("shadow_d1_unpacked_baseline", oj, tree,
                            lights, sd1, st1)
    occ_pack, packed_ms = tmr("shadow_d1_on_packed", oj, tree, lights,
                              sd_p, st_p)
    # sorted variant: packed blocks mix tiles — does the in-kernel
    # nearest-first sort now pay again?
    oj_s = jax.jit(functools.partial(occluded_multi, block=OB, sort=True))
    tmr("shadow_d1_on_packed_sorted", oj_s, tree, lights, sd_p, st_p)

    sb_j = jax.jit(functools.partial(scatter_back, block=OB))
    occ_f32 = occ_pack.astype(jnp.float32)
    r, sb_ms = tmr("scatter_back_occ", sb_j, occ_f32, grank)
    if r is not None:
        occ_back = np.asarray(r) > 0.5
        print(json.dumps({"check": "masks equal after roundtrip",
                          "ok": bool(np.array_equal(occ_back,
                                                    np.asarray(occ_base)))}),
              flush=True)

    # --- 3. end-to-end consolidated shadow_d1 -----------------------------
    def e2e(sd, st):
        sd_p, st_p, grank, _ = pack_fn(sd, st)
        occ = occluded_multi(tree, lights, sd_p, st_p, block=OB,
                             sort=False)
        return scatter_back(occ.astype(jnp.float32), grank,
                            block=OB) > 0.5
    e2e_j = jax.jit(e2e)
    r, e2e_ms = tmr("shadow_d1_consolidated_e2e", e2e_j, sd1, st1,
                    extra={"baseline_ms": base_ms})
    if r is not None:
        print(json.dumps({"check": "e2e masks equal",
                          "ok": bool(np.array_equal(np.asarray(r),
                                                    np.asarray(occ_base)))}),
              flush=True)

    # --- 4. closest_d1 consolidated ---------------------------------------
    CB = 1024

    def pack_closest(o, d, tm):
        live = tm > 0
        plan = consolidate_plan(live, CB)
        packed = consolidate([o[a] for a in range(3)]
                             + [d[a] for a in range(3)] + [tm],
                             plan["grank"], plan["src_lo"],
                             plan["src_hi"], block=CB)
        return (jnp.stack(packed[0:3]), jnp.stack(packed[3:6]), packed[6],
                plan["grank"])

    tm1 = jnp.where(refl, C.RAY_TMAX, 0.0)
    cj = jax.jit(functools.partial(
        lambda tree, o, d, tm: trace_dense(
            tree, o, d, tm, with_attributes=True, block=CB, sort=False,
            group_gate=True)))
    r_base, cbase_ms = tmr("closest_d1_gg_baseline", cj, tree, o1, d1, tm1)

    def closest_e2e(o, d, tm):
        o_p, d_p, tm_p, grank = pack_closest(o, d, tm)
        t, slot, u, v, attrs = trace_dense(tree, o_p, d_p, tm_p, block=CB,
                                           sort=False, group_gate=True,
                                           with_attributes=True)
        outs = jnp.concatenate([t[None], u[None], v[None],
                                slot.astype(jnp.float32)[None],
                                attrs], axis=0)
        back = scatter_back(outs, grank, block=CB)
        return back
    ce_j = jax.jit(closest_e2e)
    r, ce_ms = tmr("closest_d1_consolidated_e2e", ce_j, o1, d1, tm1,
                   extra={"baseline_ms": cbase_ms})
    if r is not None and r_base is not None:
        t_b, slot_b, u_b, v_b, attrs_b = r_base
        back = np.asarray(r)
        live = np.asarray(tm1) > 0
        # compare only live rays (dead rays differ: parked t vs 0)
        tb = np.where(live, np.asarray(t_b), 0)
        tg = np.where(live, back[0], 0)
        eq_t = np.array_equal(
            np.where(np.isfinite(tb), tb, -1), np.where(np.isfinite(tg), tg, -1))
        eq_slot = np.array_equal(
            np.where(live, np.asarray(slot_b), 0).astype(np.float32),
            np.where(live, back[3], 0))
        print(json.dumps({"check": "closest consolidated live-ray equal",
                          "t": bool(eq_t), "slot": bool(eq_slot)}),
              flush=True)


if __name__ == "__main__":
    main()
