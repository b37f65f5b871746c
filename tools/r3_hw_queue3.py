"""Round-3 hardware queue, part 3.

  1. Edge-rasterizer full-scene agreement AFTER the mat_rows3 fix (part 2
     measured 9161/12288 pixels flipped vs the wavefront raster — the
     einsum vertex transform ran as a bf16 MXU matmul; layout.mat_rows3
     keeps it on the VPU at f32). Expect tie-level flips now.
  2. Refit numeric validation on hardware: the same einsum class lived in
     accel/refit.py — compare refitted tri_data against a float64 numpy
     reference (bf16 truncation would show ~1e-2 relative error).
  3. Block-size ladder: 2048-ray blocks for the four production
     dispatches (1024 beat 512 for closest_d0 & occlusion; is 2048
     better still?). Rows guarded by try/except — a Mosaic reject or
     VMEM overflow must not kill the queue.
  4. Sampling-layout experiments on the REAL depth-0 wavefront:
     current sampler vs a planar-lerp variant (transpose the gathered
     [Nb,128,48] rows to 48 lane-major planes before the math — the
     48-wide minor dim tiles badly) and a lod0-only heap (table-size
     effect on per-row gather cost; production samples lod 0 only).

Run: python -u tools/r3_hw_queue3.py > /tmp/r3q3.out 2>&1
"""
import functools
import json
import sys
import time
import traceback

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

SCENE = "/root/reference/models/sponza/Sponza.gltf"
BLOCK = 512


def tmr(name, jf, *args, reps=3, extra=None):
    try:
        r = jf(*args)
        jax.block_until_ready(r)
    except Exception as e:
        print(json.dumps({"step": name, "error": repr(e)[:300]}), flush=True)
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

    # --- 1. edge raster full-scene agreement after the fma fix ----------
    import dataclasses as _dc

    from vkrt_tpu.raster.pipeline import (render_raster_frame as rrf,
                                          render_raster_frame_edge)
    W, H = 128, 96
    cfg_r = _dc.replace(C.reference_config(), width=W, height=H)
    try:
        fb_e = np.asarray(jax.jit(functools.partial(
            render_raster_frame_edge, cfg=cfg_r, msaa=1))(
                tree, tex, jnp.asarray(cam.view_matrix),
                jnp.asarray(cam.projection_matrix)))
        fb_w = np.asarray(jax.jit(functools.partial(
            rrf, cfg=cfg_r, msaa=1))(backend, tex, pi, vi))
        dd = np.abs(fb_e - fb_w).max(axis=-1)
        agree = dd[dd <= 0.02]
        print(json.dumps({
            "edge_hw_fullscene_flips": int((dd > 0.02).sum()), "of": W * H,
            "max_agree_diff": round(float(agree.max() if agree.size else 0), 6)
        }), flush=True)
    except Exception as e:
        print(json.dumps({"step": "edge_fullscene", "error": repr(e)[:300]}),
              flush=True)

    # --- 2. refit numeric validation on hardware -------------------------
    try:
        from vkrt_tpu.accel.refit import refit_clusters
        th = 0.3
        m_np = np.array([[0.01 * np.cos(th), 0, 0.01 * np.sin(th), 0.5],
                         [0, 0.01, 0, -0.25],
                         [-0.01 * np.sin(th), 0, 0.01 * np.cos(th), 1.0],
                         [0, 0, 0, 1]], np.float32)
        t2 = refit_clusters(tree, jnp.asarray(m_np))
        td_hw = np.asarray(t2.tri_data[:, :, 0:9], np.float64)
        td0 = np.asarray(tree.tri_data[:, :, 0:9], np.float64)
        a64, b64 = m_np[:3, :3].astype(np.float64), m_np[:3, 3].astype(np.float64)
        ref = np.concatenate(
            [td0[..., 0:3] @ a64.T + b64, td0[..., 3:6] @ a64.T,
             td0[..., 6:9] @ a64.T], axis=-1)
        scale = np.abs(ref).max()
        rel = np.abs(td_hw - ref).max() / scale
        print(json.dumps({"check": "refit hw vs f64 reference",
                          "max_rel_err": float(rel),
                          "ok": bool(rel < 1e-4)}), flush=True)
    except Exception as e:
        print(json.dumps({"step": "refit_check", "error": repr(e)[:300]}),
              flush=True)

    # --- shared wavefront state ------------------------------------------
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
        return sd, st, o1, d1, refl, hit, mat_ids[0], uv

    state_j = jax.jit(frame_state)
    sd0, st0, o1, d1, refl, hit0, mid0, uv0 = state_j(tree, tex, op, d0,
                                                      active0)
    sd1, st1, _, _, _, _, _, _ = state_j(tree, tex, op, d1, refl)
    tm0 = jnp.where(active0, C.RAY_TMAX, 0.0)
    tm1 = jnp.where(refl, C.RAY_TMAX, 0.0)
    o0 = _broadcast_points(
        jnp.broadcast_to(op[None, :], (d0.shape[1] * 128 // BLOCK, 3)), d0)

    # --- 3. block-size 2048 ladder ---------------------------------------
    base_out = {}
    for name, kw, args in (
        ("closest_d0_b1024", dict(block=1024, sort=True), (o0, d0, tm0)),
        ("closest_d0_b2048", dict(block=2048, sort=True), (o0, d0, tm0)),
        ("closest_d1_b1024_gg", dict(block=1024, sort=False,
                                     group_gate=True), (o1, d1, tm1)),
        ("closest_d1_b2048_gg", dict(block=2048, sort=False,
                                     group_gate=True), (o1, d1, tm1)),
    ):
        cj = jax.jit(functools.partial(
            lambda tree, o, d, tm, kw=kw: trace_dense(
                tree, o, d, tm, with_attributes=True, **kw)))
        r, _ = tmr(name, cj, tree, *args)
        if r is not None:
            base_out[name] = [np.asarray(x) for x in r]
    for a, b in (("closest_d0_b1024", "closest_d0_b2048"),
                 ("closest_d1_b1024_gg", "closest_d1_b2048_gg")):
        if a in base_out and b in base_out:
            print(json.dumps({"check": f"{b} outputs identical",
                              "ok": bool(all(
                                  np.array_equal(x, y) for x, y in
                                  zip(base_out[a], base_out[b])))}),
                  flush=True)

    occ_out = {}
    for depth, sd, st in (("d0", sd0, st0), ("d1", sd1, st1)):
        for blk in (1024, 2048):
            oj = jax.jit(functools.partial(
                occluded_multi, block=blk, sort=(depth == "d0")))
            r, _ = tmr(f"shadow_{depth}_b{blk}", oj, tree, lights, sd, st)
            if r is not None:
                occ_out[(depth, blk)] = np.asarray(r)
        if (depth, 1024) in occ_out and (depth, 2048) in occ_out:
            print(json.dumps({
                "check": f"shadow_{depth} b2048 mask identical",
                "ok": bool(np.array_equal(occ_out[(depth, 1024)],
                                          occ_out[(depth, 2048)]))}),
                flush=True)

    # --- 4. sampling layout experiments ----------------------------------
    sid0 = jnp.where(hit0, mid0, 0)
    uvm = jnp.where(hit0[None], uv0, 0.0)

    samp_j = jax.jit(lambda tt, s, u: sample_material(
        tt, tex.level_offset, tex.level_width, tex.level_height, s, u))
    r_cur, _ = tmr("sample_d0_current", samp_j, tex.texels_tri, sid0, uvm)

    def row_idx(s, u):
        off = tex.level_offset[s, 0]
        w = tex.level_width[s, 0]
        h = tex.level_height[s, 0]
        x = u[0] * w - 0.5
        y = u[1] * h - 0.5
        xi = jnp.mod(jnp.floor(x).astype(jnp.int32), w)
        yi = jnp.mod(jnp.floor(y).astype(jnp.int32), h)
        return off + yi * w + xi, x - jnp.floor(x), y - jnp.floor(y)

    def sample_planar(tt, s, u):
        idx, fx, fy = row_idx(s, u)
        rows = tt[idx.reshape(-1)]                       # [N,48] u8
        q = rows.T.reshape((48,) + idx.shape).astype(jnp.float32) / 255.0
        w00 = (1 - fx) * (1 - fy)
        w10 = fx * (1 - fy)
        w01 = (1 - fx) * fy
        w11 = fx * fy
        outs = []
        for base in (0, 16, 32):
            outs.append(jnp.stack(
                [q[base + c] * w00 + q[base + 4 + c] * w10
                 + q[base + 8 + c] * w01 + q[base + 12 + c] * w11
                 for c in range(4)]))
        return tuple(outs)

    pl_j = jax.jit(sample_planar)
    r_pl, _ = tmr("sample_d0_planar", pl_j, tex.texels_tri, sid0, uvm)
    if r_cur is not None and r_pl is not None:
        d = max(float(jnp.abs(a - b).max()) for a, b in zip(r_cur, r_pl))
        print(json.dumps({"check": "planar sampler matches",
                          "max_abs_diff": d, "ok": bool(d == 0.0)}),
              flush=True)

    # gather-only: full heap vs a lod0-only table (same index count)
    idx0, _, _ = jax.jit(row_idx)(sid0, uvm)
    g_j = jax.jit(lambda tt, i: jnp.sum(tt[i].astype(jnp.float32)))
    tmr("gather_only_full_heap", g_j, tex.texels_tri, idx0)

    lo = np.asarray(tex.level_offset)
    lw = np.asarray(tex.level_width)
    lh = np.asarray(tex.level_height)
    M = lo.shape[0]
    sizes = (lw[:, 0] * lh[:, 0]).astype(np.int64)
    new_off = np.zeros(M, np.int64)
    np.cumsum(sizes[:-1], out=new_off[1:])
    segs = [jax.lax.dynamic_slice_in_dim(tex.texels_tri, int(lo[m, 0]),
                                         int(sizes[m]), 0)
            for m in range(M)]
    t_lod0 = jnp.concatenate(segs, axis=0)
    jax.block_until_ready(t_lod0)
    print(json.dumps({"lod0_rows": int(t_lod0.shape[0]),
                      "full_rows": int(tex.texels_tri.shape[0])}), flush=True)
    # remap indices into the packed table
    off_new = jnp.asarray(new_off.astype(np.int32))[sid0]
    off_old = tex.level_offset[sid0, 0]
    idx_new = idx0 - off_old + off_new
    jax.block_until_ready(idx_new)
    tmr("gather_only_lod0_heap", g_j, t_lod0, idx_new)


if __name__ == "__main__":
    main()
