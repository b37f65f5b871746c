"""Simulate sub-cluster early-out benefit on real wavefront state (round 3).

The dense kernel sweeps every gated cluster's full 128 triangles. For
incoherent wavefronts (depth-1 reflections: live blocks sweep ~42
clusters; depth-1 shadows: 272ms) most rays that gate a cluster only
touch a small part of it. This simulates: per (live block, gated
cluster), how many of the cluster's 16/32/64-tri sub-run AABBs are hit
by >=1 live ray — the fraction of sub-sweeps a sub-gated kernel would
run. Pure numpy on state fetched from one TPU trace.

Run: python -u tools/subgroup_sim.py > /tmp/sgs.out 2>&1
"""
import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from vkrt_tpu import config as C
from vkrt_tpu.rt.dense import TMIN, trace_dense
from vkrt_tpu.shade import shading
from vkrt_tpu.shade.sampling import sample_material
from vkrt_tpu.utils import layout as L
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import (cached_backend, camera_ray_blocks,
                                       _broadcast_points)
from vkrt_tpu.app.camera import Camera

SCENE = "/root/reference/models/sponza/Sponza.gltf"
BLOCK = 512
_INF = 3.0e38
RNG = np.random.default_rng(0)
NSAMP = 160     # live blocks sampled per workload


def boxes_from_tree(tree, refine: bool = False):
    """Host copies: cluster AABBs [C1,6] and sub-run AABBs per size.

    refine=True re-orders each cluster's 128 triangles by a local
    median split (split_permutation with k1=16) before forming sub-run
    boxes — simulating a build whose recursion continues below K1 so
    16-tri runs are spatially tight (the production build currently
    stops splitting at K1; argpartition leaves sub-runs arbitrary)."""
    td = np.array(tree.tri_data[:, :, 0:9])        # v0,e1,e2 (writable)
    v0, e1, e2 = td[..., 0:3], td[..., 3:6], td[..., 6:9]
    if refine:
        from vkrt_tpu.accel.clusters import split_permutation
        for ci in range(td.shape[0]):
            p = split_permutation(v0[ci], e1[ci], e2[ci], k1=16, k2=8)
            td[ci] = td[ci][p]
    p1, p2 = v0 + e1, v0 + e2
    # padding rows are all-zero -> degenerate boxes at origin; mask them
    valid = np.abs(v0).sum(axis=2) + np.abs(e1).sum(axis=2) > 0  # [C1,K1]
    tmin = np.minimum(np.minimum(v0, p1), p2)
    tmax = np.maximum(np.maximum(v0, p1), p2)
    tmin = np.where(valid[..., None], tmin, _INF)
    tmax = np.where(valid[..., None], tmax, -_INF)
    subs = {}
    for sz in (16, 32, 64):
        g = 128 // sz
        lo = tmin.reshape(-1, g, sz, 3).min(axis=2)   # [C1,g,3]
        hi = tmax.reshape(-1, g, sz, 3).max(axis=2)
        subs[sz] = (lo, hi)
    cl = (tmin.min(axis=1), tmax.max(axis=1))         # [C1,3]
    return cl, subs


def slab(lo, hi, o, inv, tmax):
    """Any-live-ray box hit: lo/hi [B,3], o/inv [R,3], tmax [R] -> [B]."""
    t0 = (lo[:, None, :] - o[None, :, :]) * inv[None, :, :]
    t1 = (hi[:, None, :] - o[None, :, :]) * inv[None, :, :]
    tn = np.minimum(t0, t1).max(axis=2)               # [B,R]
    tf = np.maximum(t0, t1).min(axis=2)
    live = tmax > TMIN
    return (tn <= tf) & (tf >= TMIN) & (tn <= tmax[None, :]) & live[None, :]


def simulate(name, o, d, tm, cl, subs):
    o = np.asarray(o).reshape(3, -1, BLOCK)
    d = np.asarray(d).reshape(3, -1, BLOCK)
    tm = np.asarray(tm).reshape(-1, BLOCK)
    liveb = (tm > TMIN).any(axis=1)
    idx = np.flatnonzero(liveb)
    if len(idx) == 0:
        print(json.dumps({"sim": name, "note": "no live blocks"}), flush=True)
        return
    idx = RNG.choice(idx, size=min(NSAMP, len(idx)), replace=False)
    tot = {sz: [0, 0] for sz in subs}   # [hit sub-groups, gated clusters]
    gated_counts = []
    for b in idx:
        ob, db, tb = o[:, b].T, d[:, b].T, tm[b]      # [R,3],[R,3],[R]
        inv = 1.0 / np.where(np.abs(db) < 1e-20,
                             np.where(db < 0, -1e-20, 1e-20), db)
        ghit = slab(cl[0], cl[1], ob, inv, tb).any(axis=1)   # [C1]
        gc = np.flatnonzero(ghit)
        gated_counts.append(len(gc))
        for sz, (lo, hi) in subs.items():
            g = lo.shape[1]
            sh = slab(lo[gc].reshape(-1, 3), hi[gc].reshape(-1, 3),
                      ob, inv, tb).any(axis=1).reshape(len(gc), g)
            tot[sz][0] += int(sh.sum())
            tot[sz][1] += len(gc) * g
    out = {"sim": name, "blocks_sampled": len(idx),
           "gated_mean": round(float(np.mean(gated_counts)), 1)}
    for sz in subs:
        out[f"sub{sz}_hit_frac"] = round(tot[sz][0] / max(tot[sz][1], 1), 3)
    print(json.dumps(out), flush=True)


STATE = "/tmp/sgs_state.npz"


def fetch_state():
    """One TPU trace per workload; cached to disk so box-refinement
    re-runs are pure numpy."""
    import os
    if os.path.exists(STATE):
        return dict(np.load(STATE))
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
    tm1 = jnp.where(refl, C.RAY_TMAX, 0.0)
    tm0 = jnp.where(active0, C.RAY_TMAX, 0.0)
    o0 = _broadcast_points(
        jnp.broadcast_to(op[None, :], (d0.shape[1] * 128 // BLOCK, 3)), d0)

    out = {"closest_d0.o": o0, "closest_d0.d": d0, "closest_d0.tm": tm0,
           "closest_d1.o": o1, "closest_d1.d": d1, "closest_d1.tm": tm1}
    for s in range(min(nl, 2)):       # two lights are representative
        os_ = jnp.broadcast_to(lights[s][:, None, None], o0.shape)
        for dep, sdx, stx in (("d0", sd0, st0), ("d1", sd1, st1)):
            k = f"shadow_{dep}_l{s}"
            out[f"{k}.o"] = os_
            out[f"{k}.d"] = sdx[s]
            out[f"{k}.tm"] = stx[s]
    out = {k: np.asarray(v) for k, v in out.items()}
    np.savez(STATE, **out)
    return out


def pack_rows(o, d, tm):
    """Pack 128-lane rows with any live ray contiguously (dead rows
    dropped), preserving row order (spatial locality). Returns packed
    (o, d, tm) padded to a BLOCK multiple with dead rows."""
    o = np.asarray(o).reshape(3, -1, 128)
    d = np.asarray(d).reshape(3, -1, 128)
    tm = np.asarray(tm).reshape(-1, 128)
    live = (tm > TMIN).any(axis=1)
    idx = np.flatnonzero(live)
    rpb = BLOCK // 128
    npad = -(-len(idx) // rpb) * rpb
    pad = np.zeros(npad - len(idx), np.int64)
    idx = np.concatenate([idx, pad])
    tmp = tm[idx]
    if npad > len(np.flatnonzero(live)):
        tmp[len(np.flatnonzero(live)):] = 0.0
    return o[:, idx], d[:, idx], tmp, len(np.flatnonzero(live))


def main():
    st = fetch_state()
    # tree build is host-side numpy — no TPU needed for the box study
    flat, tex, backend = cached_backend(SCENE, 512, "dense")
    tree = backend.tree
    names = sorted({k.rsplit(".", 1)[0] for k in st})
    for refine in (False, True):
        cl, subs = boxes_from_tree(tree, refine=refine)
        print(json.dumps({"refine": refine}), flush=True)
        for n in names:
            simulate(n, st[f"{n}.o"], st[f"{n}.d"], st[f"{n}.tm"], cl, subs)
            if "d1" in n:
                po, pd, ptm, nlive = pack_rows(
                    st[f"{n}.o"], st[f"{n}.d"], st[f"{n}.tm"])
                print(json.dumps({"sim": n, "packed_rows": int(nlive),
                                  "of_rows": int(st[f"{n}.tm"].size // 128),
                                  "packed_blocks": pd.shape[1] // (BLOCK // 128)}),
                      flush=True)
                simulate(n + "_rowpacked", po, pd, ptm, cl, subs)


if __name__ == "__main__":
    main()
