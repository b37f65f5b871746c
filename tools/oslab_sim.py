"""Oriented-slab cluster gating simulation (round 3).

Finding that motivates this: the variable-cut SAH build's total cluster
AABB area (8617) is within 2% of the geometric floor (2x total triangle
area = 8457) — ORDERING quality is exhausted, yet camera rays still
slab-hit 10.4 clusters each. The slop is the SHAPE: an AABB around a
thin, roughly-planar 128-tri patch is mostly empty space that rays pass
through without crossing the surface.

Remedy simulated here: one ORIENTED slab per cluster — axis n = the
dominant surface direction (area-weighted mean triangle normal), bounds
[pmin, pmax] = min/max of all member vertices projected on n. Gating
adds one more interval to the 3-axis AABB test:

    tn_o = (pmin - o.n) / (d.n)   (swapped if d.n < 0)
    tn = max(tn, tn_o); tf = min(tf, tf_o)

Cost in the kernel prepass: ~6 extra flops per (cluster, ray) on top of
~12 — worth it if gated clusters drop materially. This probe measures
per-ray hits and per-block union (512/1024) with and without the
oriented slab on camera rays, depth-1 reflection rays, and shadow
segments, all on real wavefront state (reference backend, 640x384).

Usage: JAX_PLATFORMS=cpu python -u tools/oslab_sim.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from split_quality import split_permutation_v2

SCENE = "/root/reference/models/sponza/Sponza.gltf"
K1 = 128


def cluster_geom(order, v0, e1, e2):
    """AABBs + oriented slab (axis, pmin, pmax) per cluster."""
    T = len(order)
    C1 = T // K1
    o = order[: C1 * K1]
    tv0, te1, te2 = v0[o], e1[o], e2[o]
    tmin = np.minimum(np.minimum(tv0, tv0 + te1), tv0 + te2)
    tmax = np.maximum(np.maximum(tv0, tv0 + te1), tv0 + te2)
    cmin = tmin.reshape(C1, K1, 3).min(axis=1)
    cmax = tmax.reshape(C1, K1, 3).max(axis=1)
    # area-weighted mean normal (sign-aligned to the first triangle)
    cr = np.cross(te1, te2).reshape(C1, K1, 3)          # 2*area*normal
    ref = cr[:, :1]
    sgn = np.where((cr * ref).sum(-1, keepdims=True) < 0, -1.0, 1.0)
    n = (cr * sgn).sum(axis=1)
    nn = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(nn, 1e-30)
    # projected bounds over all 3 vertices of every member triangle
    vs = np.stack([tv0, tv0 + te1, tv0 + te2], axis=1).reshape(C1, K1 * 3, 3)
    pr = (vs * n[:, None]).sum(-1)
    pmin, pmax = pr.min(axis=1), pr.max(axis=1)
    return cmin, cmax, n, pmin, pmax


def hits(cmin, cmax, n, pmin, pmax, o, d, tmax, oriented, chunk=4096):
    out = []
    for s in range(0, o.shape[0], chunk):
        oo, dd = o[s:s + chunk], d[s:s + chunk]
        tm = tmax[s:s + chunk]
        inv = 1.0 / np.where(np.abs(dd) < 1e-12, 1e-12, dd)
        t0 = (cmin[None] - oo[:, None]) * inv[:, None]
        t1 = (cmax[None] - oo[:, None]) * inv[:, None]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        if oriented:
            dn = (dd[:, None] * n[None]).sum(-1)          # [R,C]
            on = (oo[:, None] * n[None]).sum(-1)
            idn = 1.0 / np.where(np.abs(dn) < 1e-12, 1e-12, dn)
            ta = (pmin[None] - on) * idn
            tb = (pmax[None] - on) * idn
            # rays ~parallel to the slab: hit iff origin inside bounds
            par = np.abs(dn) < 1e-9
            tno = np.where(par, np.where((on >= pmin[None])
                                         & (on <= pmax[None]), -3e38, 3e38),
                           np.minimum(ta, tb))
            tfo = np.where(par, np.where((on >= pmin[None])
                                         & (on <= pmax[None]), 3e38, -3e38),
                           np.maximum(ta, tb))
            tn = np.maximum(tn, tno)
            tf = np.minimum(tf, tfo)
        out.append((tn <= tf) & (tf >= 1e-3) & (tn <= tm[:, None])
                   & (tm > 1e-3)[:, None])
    return np.concatenate(out)


def report(name, h, tm):
    live = tm > 1e-3
    row = {"state": name, "per_ray": round(float(h.sum(1)[live].mean()), 2)}
    for blk in (512, 1024):
        nb = h.shape[0] // blk
        u = h[:nb * blk].reshape(nb, blk, -1).any(axis=1).sum(axis=1)
        row[f"b{blk}_union"] = round(float(u.mean()), 2)
    print(row, flush=True)
    return row


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
    from vkrt_tpu.wavefront.engine import (camera_ray_blocks,
                                           load_scene_assets, make_backend,
                                           texture_arrays, _broadcast_points)

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
    sd1, st1, _, _, _, _ = state(o1, d1, tm1)

    def flat_rows(x):
        return np.asarray(L.from_cvec(x))

    d0f = flat_rows(d0)
    o0f = np.broadcast_to(np.asarray(op)[None, :], d0f.shape).copy()
    tm0f = np.asarray(L.from_lanes(tm0))
    states = [("cam", o0f, d0f, tm0f),
              ("refl_d1", flat_rows(o1), flat_rows(d1),
               np.asarray(L.from_lanes(tm1)))]
    for li in range(2):                       # 2 of 4 lights is enough signal
        lp = np.asarray(lights[li])
        sdf = flat_rows(sd0[li])
        stf = np.asarray(L.from_lanes(st0[li]))
        of = np.broadcast_to(lp[None], sdf.shape).copy()
        states.append((f"shadow_d0_l{li}", of, sdf, stf))
    sdf = flat_rows(sd1[0])
    states.append(("shadow_d1_l0",
                   np.broadcast_to(np.asarray(lights[0])[None, :],
                                   sdf.shape).copy(), sdf,
                   np.asarray(L.from_lanes(st1[0]))))

    t0 = time.time()
    order = split_permutation_v2(v0, e1, e2)
    cmin, cmax, n, pmin, pmax = cluster_geom(order, v0, e1, e2)
    print({"build+slab": round(time.time() - t0, 1)}, flush=True)

    # slab thickness stats: thin clusters are where the win lives
    ext = np.maximum(cmax - cmin, 0)
    diag = np.linalg.norm(ext, axis=1)
    thick = (pmax - pmin) / np.maximum(diag, 1e-12)
    print({"thickness/diag deciles":
           np.percentile(thick, [10, 30, 50, 70, 90]).round(3).tolist()},
          flush=True)

    for sname, o, d, tm in states:
        h0 = hits(cmin, cmax, n, pmin, pmax, o, d, tm, oriented=False)
        h1 = hits(cmin, cmax, n, pmin, pmax, o, d, tm, oriented=True)
        r0 = report(sname + "_aabb", h0, tm)
        r1 = report(sname + "_oslab", h1, tm)
        print({"state": sname,
               "union512_ratio": round(r1["b512_union"] / r0["b512_union"], 3),
               "per_ray_ratio": round(r1["per_ray"] / r0["per_ray"], 3)},
              flush=True)


if __name__ == "__main__":
    main()
