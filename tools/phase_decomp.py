"""Decompose trace-kernel block cost: launch+sc-pass vs prepass/sort/DMA
vs MT sweeps (round 3).

The sub-cluster sim (tools/subgroup_sim.py) showed block-granular gating
refinements are exhausted (sub-run hit fractions 0.7-0.9 even with
refined within-cluster order), so the next lever depends on WHERE block
time actually goes. Uses the kernels' `ablate` flag:

  full    = launch + sc-pass + prepass + sort + DMA + sweeps
  nosweep = launch + sc-pass + prepass + sort + DMA
  onlysc  = launch + sc-pass

Also prints per-block live-set histograms for the multi-occlusion
kernel (how many of the 4 light sets are live per block — dead sets
still pay full per-set prepass today).

Run: python -u tools/phase_decomp.py > /tmp/pdec.out 2>&1
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

SCENE = "/root/reference/models/sponza/Sponza.gltf"
BLOCK = 512


def tmr(name, jf, *args, extra=None):
    r = jf(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            r = jf(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / 3)
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
        return sd, st, o1, d1, refl

    state_j = jax.jit(frame_state)
    sd0, st0, o1, d1, refl = state_j(tree, tex, op, d0, active0)
    sd1, st1, _, _, _ = state_j(tree, tex, op, d1, refl)
    tm1 = jnp.where(refl, C.RAY_TMAX, 0.0)
    o0 = _broadcast_points(
        jnp.broadcast_to(op[None, :], (d0.shape[1] * 128 // BLOCK, 3)), d0)
    tm0 = jnp.where(active0, C.RAY_TMAX, 0.0)

    # live-set histogram per 1024-block: how many of the 4 light sets
    # have >=1 live segment (dead sets pay full per-set prepass today)
    for name, stx in (("sh0", st0), ("sh1", st1)):
        s = np.asarray(stx) > 0                        # [4, Nb, 128]
        bl = s.any(axis=2).reshape(nl, -1, 8).any(axis=2)  # [4, nblocks]
        nsets = bl.sum(axis=0)
        livebl = nsets > 0
        hist = [int((nsets == k).sum()) for k in range(nl + 1)]
        print(json.dumps({
            "hist": name, "blocks_live_sets_0..4": hist,
            "mean_live_sets_in_live_blocks":
                round(float(nsets[livebl].mean()), 2)}), flush=True)

    variants = sys.argv[1:] or ["", "nosweep", "onlysc"]
    for ab in variants:
        ab = "" if ab == "full" else ab
        lbl = ab or "full"
        occl_j = jax.jit(functools.partial(occluded_multi, block=1024,
                                           ablate=ab))
        tmr(f"occl_d0_{lbl}", occl_j, tree, lights, sd0, st0)
        tmr(f"occl_d1_{lbl}", occl_j, tree, lights, sd1, st1)
        cl_j = jax.jit(functools.partial(
            lambda tree, o, d, tm, ab=ab: trace_dense(
                tree, o, d, tm, with_attributes=True, ablate=ab)))
        tmr(f"closest_d0_{lbl}", cl_j, tree, o0, d0, tm0)
        tmr(f"closest_d1_{lbl}", cl_j, tree, o1, d1, tm1)

    if "bigblocks" in sys.argv[1:]:
        # fixed per-block costs dominate incoherent dispatches — do
        # LARGER blocks pay at depth 1? (512 was optimal for closest at
        # depth 0; 2048 regressed for occlusion at depth 0 — d1 untested)
        cl1k = jax.jit(lambda tree, o, d, tm: trace_dense(
            tree, o, d, tm, with_attributes=True, block=1024))
        tmr("closest_d1_b1024", cl1k, tree, o1, d1, tm1)
        tmr("closest_d0_b1024", cl1k, tree, o0, d0, tm0)
        oc2k = jax.jit(functools.partial(occluded_multi, block=2048))
        tmr("occl_d1_b2048", oc2k, tree, lights, sd1, st1)

    if "prod" in sys.argv[1:]:
        # the production per-depth config: block 1024 + sort for the
        # coherent depth-0 dispatches, block 512/1024 + no sort at d1
        oc0 = jax.jit(functools.partial(occluded_multi, block=1024,
                                        sort=True))
        oc1 = jax.jit(functools.partial(occluded_multi, block=1024,
                                        sort=False))
        tmr("occl_d0_prod", oc0, tree, lights, sd0, st0)
        tmr("occl_d1_prod", oc1, tree, lights, sd1, st1)
        c0 = jax.jit(lambda tree, o, d, tm: trace_dense(
            tree, o, d, tm, with_attributes=True, block=1024))
        c1 = jax.jit(lambda tree, o, d, tm: trace_dense(
            tree, o, d, tm, with_attributes=True, sort=False))
        tmr("closest_d0_prod", c0, tree, o0, d0, tm0)
        tmr("closest_d1_prod", c1, tree, o1, d1, tm1)

    if "stats" in sys.argv[1:] or not sys.argv[1:]:
        # emitted (work-list) and swept cluster counts per dispatch
        st_j = jax.jit(lambda tree, o, d, tm: trace_dense(
            tree, o, d, tm, with_attributes=True, stats=True)[-1])
        for nm, (o_, d_, tm_) in (("closest_d0", (o0, d0, tm0)),
                                  ("closest_d1", (o1, d1, tm1))):
            s = np.asarray(st_j(tree, o_, d_, tm_))
            print(json.dumps({
                "stats": nm,
                "emitted_total": int(s[:, 0].sum()),
                "swept_total": int(s[:, 1].sum())}), flush=True)


if __name__ == "__main__":
    main()
