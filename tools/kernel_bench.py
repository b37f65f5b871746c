"""Batched TPU kernel experiments — run as ONE process (single-tenant chip).

Usage: python tools/kernel_bench.py [step ...]
Steps (default: check closest attrs occl stats):
  check    TPU kernel vs numpy brute force on 1 block of Sponza rays
  closest  raw closest-hit throughput, 720p coherent primaries
  attrs    closest-hit + fused attribute select (the production frame op)
  occl     occlusion throughput
  stats    gated/swept cluster counters at 720p
  big      >64-supercluster scene built on device, traced + spot-checked
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vkrt_tpu import config as C
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.rt.dense import trace_dense
from vkrt_tpu.utils import layout as L
from vkrt_tpu.wavefront.engine import (generate_rays, load_scene_assets,
                                       make_backend, tile)

SCENE = "/root/reference/models/sponza/Sponza.gltf"
W, H = 1280, 704


def camera_rays(w=W, h=H):
    cam = Camera(w, h)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    o, d = generate_rays(jnp.asarray(cam.proj_inverse),
                         jnp.asarray(cam.view_inverse), w, h)
    oj = jnp.stack([tile(c) for c in o])
    dj = L.normalize3(jnp.stack([tile(c) for c in d]))
    return oj, dj


def force(r):
    return float(jnp.sum(jnp.where(jnp.isfinite(r[0]), r[0], 0)))


def bench(fn, reps=5, iters=3):
    force(fn())
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        force(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    steps = sys.argv[1:] or ["check", "closest", "attrs", "occl", "stats"]
    flat, _, _ = load_scene_assets(SCENE, 64)
    backend = make_backend(flat, "dense")
    tree = backend.tree
    oj, dj = camera_rays()
    n = oj.shape[1] * 128
    tmax = jnp.full((oj.shape[1], 128), C.RAY_TMAX, jnp.float32)

    if "check" in steps:
        from vkrt_tpu.golden.cpu_tracer import closest_hit as brute
        idx = np.asarray(flat.indices, np.int64)
        v0 = flat.positions[idx[:, 0]]
        e1 = flat.positions[idx[:, 1]] - v0
        e2 = flat.positions[idx[:, 2]] - v0
        ob, db = oj[:, 4:8], dj[:, 4:8]     # one 512-ray block
        tm = tmax[4:8]
        t, slot, u, v = trace_dense(tree, ob, db, tm)
        on = np.asarray(L.from_cvec(ob))
        dn = np.asarray(L.from_cvec(db))
        bt, btri, bu, bv = brute(on, dn, 0.001, 1e3, v0, e1, e2)
        tn = np.asarray(L.from_lanes(t))
        hit = np.asarray(L.from_lanes(slot)) >= 0
        ok_mask = hit == (btri >= 0)
        both = hit & (btri >= 0)
        t_ok = np.isclose(tn[both], bt[both], rtol=1e-4, atol=1e-5)
        print(json.dumps({"step": "check", "hit_agree": float(ok_mask.mean()),
                          "t_agree": float(t_ok.mean()),
                          "hits": int(hit.sum())}))
        assert ok_mask.mean() == 1.0 and t_ok.mean() > 0.999

    if "closest" in steps:
        dt = bench(lambda: trace_dense(tree, oj, dj, tmax))
        print(json.dumps({"step": "closest", "mrays": round(n / dt / 1e6, 2),
                          "ms": round(dt * 1e3, 2)}))

    if "attrs" in steps:
        dt = bench(lambda: trace_dense(tree, oj, dj, tmax,
                                       with_attributes=True))
        print(json.dumps({"step": "attrs", "mrays": round(n / dt / 1e6, 2),
                          "ms": round(dt * 1e3, 2)}))

    if "occl" in steps:
        dt = bench(lambda: trace_dense(tree, oj, dj, tmax, occlusion=True))
        print(json.dumps({"step": "occl", "mrays": round(n / dt / 1e6, 2),
                          "ms": round(dt * 1e3, 2)}))

    if "stats" in steps:
        out = trace_dense(tree, oj, dj, tmax, stats=True)
        st = np.asarray(out[-1])
        print(json.dumps({"step": "stats",
                          "gated_per_block": round(float(st[:, 0].mean()), 1),
                          "swept_per_block": round(float(st[:, 1].mean()), 1),
                          "gated_max": int(st[:, 0].max())}))

    if "blocks" in steps:
        for blk in (512, 1024, 2048):
            dt = bench(lambda b=blk: trace_dense(tree, oj, dj, tmax, block=b))
            da = bench(lambda b=blk: trace_dense(tree, oj, dj, tmax, block=b,
                                                 with_attributes=True))
            out = trace_dense(tree, oj, dj, tmax, block=blk, stats=True)
            st = np.asarray(out[-1])
            print(json.dumps({
                "step": f"block{blk}",
                "mrays": round(n / dt / 1e6, 2),
                "mrays_attrs": round(n / da / 1e6, 2),
                "swept_per_block": round(float(st[:, 1].mean()), 1)}))

    if "sample" in steps:
        # texture-sampling cost at frame scale (all 3 maps of 2.07M hits
        # in ONE packed-heap gather)
        from vkrt_tpu.shade.sampling import sample_material
        _, tex2, _ = load_scene_assets(SCENE, 512)
        nslots = int(tex2.level_offset.shape[0])
        nb = 2073600 // 128
        rng = np.random.default_rng(3)
        ids = jnp.asarray(rng.integers(0, nslots, (nb, 128)), jnp.int32)
        uv = jnp.asarray(rng.uniform(0, 4, (2, nb, 128)), jnp.float32)

        @jax.jit
        def three_maps(tex2, ids, uv):
            a, b, c = sample_material(tex2.texels_tri, tex2.level_offset,
                                      tex2.level_width, tex2.level_height,
                                      ids, uv)
            return a + b + c

        dt = bench(lambda: (three_maps(tex2, ids, uv),))
        print(json.dumps({"step": "sample3maps_2M",
                          "ms": round(dt * 1e3, 1)}))

    if "k1sweep" in steps:
        # cluster granularity: K1=64 halves the per-cluster sweep and
        # tightens boxes (more clusters gated but fewer tris/ray)
        from vkrt_tpu.accel.clusters import build_clusters, scene_attrs
        idx = np.asarray(flat.indices, np.int64)
        v0 = jnp.asarray(flat.positions[idx[:, 0]])
        e1 = jnp.asarray(flat.positions[idx[:, 1]]) - v0
        e2 = jnp.asarray(flat.positions[idx[:, 2]]) - v0
        for k1 in (64, 128):
            tr = build_clusters(v0, e1, e2, attrs=scene_attrs(flat),
                                with_attributes=True, device=False, k1=k1)
            da = bench(lambda t=tr: trace_dense(t, oj, dj, tmax,
                                                with_attributes=True))
            do = bench(lambda t=tr: trace_dense(t, oj, dj, tmax,
                                                occlusion=True))
            out = trace_dense(tr, oj, dj, tmax, stats=True)
            st = np.asarray(out[-1])
            print(json.dumps({
                "step": f"k1_{k1}",
                "mrays_attrs": round(n / da / 1e6, 2),
                "mrays_occl": round(n / do / 1e6, 2),
                "gated_per_block": round(float(st[:, 0].mean()), 1),
                "swept_per_block": round(float(st[:, 1].mean()), 1)}),
                flush=True)

    if "recip" in steps:
        # approx reciprocal + 1 Newton vs full divide in the closest sweep
        from vkrt_tpu.golden.cpu_tracer import closest_hit as brute
        dt = bench(lambda: trace_dense(tree, oj, dj, tmax,
                                       with_attributes=True,
                                       approx_recip=False))
        dr = bench(lambda: trace_dense(tree, oj, dj, tmax,
                                       with_attributes=True,
                                       approx_recip=True))
        # correctness: same winning slots on a real-ray block
        _, s0, _, _ = trace_dense(tree, oj[:, :64], dj[:, :64], tmax[:64],
                                  approx_recip=False)
        _, s1, _, _ = trace_dense(tree, oj[:, :64], dj[:, :64], tmax[:64],
                                  approx_recip=True)
        agree = float((np.asarray(s0) == np.asarray(s1)).mean())
        print(json.dumps({"step": "recip",
                          "mrays_div": round(n / dt / 1e6, 2),
                          "mrays_approx": round(n / dr / 1e6, 2),
                          "slot_agree": agree}))

    if "phases" in steps:
        # differential frame timing at 1080p: full vs feature-ablated
        # configs isolate where the e2e milliseconds go
        import dataclasses

        from vkrt_tpu.wavefront.engine import Renderer
        base = C.config4_flythrough()
        cam = Camera(base.width, base.height)
        cam.set_position(C.CAMERA_START_POSITION)
        cam.set_rotation(C.CAMERA_START_ROTATION)
        variants = {
            "full": base,
            "no_shadows": dataclasses.replace(base, enable_shadows=False),
            "depth1": dataclasses.replace(base, max_depth=1),
            "flat_albedo": dataclasses.replace(base, flat_albedo=True,
                                               max_depth=1,
                                               enable_shadows=False,
                                               enable_reflections=False),
        }
        for name, cfg in variants.items():
            rnd = Renderer(SCENE, cfg, backend="dense", max_texture_dim=64,
                           quantize=True)
            rnd.render(cam)     # compile
            t0 = time.perf_counter()
            for _ in range(3):
                _, rays = rnd.render(cam)
            ms = (time.perf_counter() - t0) / 3 * 1000
            print(json.dumps({"step": f"phase:{name}",
                              "frame_ms": round(ms, 1), "rays": int(rays)}))

    if "configs" in steps:
        # BASELINE configs 1-3 + 5 with the current engine (config 4 is
        # bench.py). Frames-in-flight pacing like bench.
        from vkrt_tpu.runtime import FrameScheduler
        from vkrt_tpu.wavefront.engine import Renderer
        for name, cfg, reb in (("config1", C.config1_primary(), None),
                               ("config2", C.config2_shadows(), None),
                               ("config3", C.config3_reflections(), None),
                               ("config5", C.config5_stress(), "refit")):
            rnd = Renderer(SCENE, cfg, backend="dense", max_texture_dim=512,
                           quantize=True,
                           rebuild=reb if reb else "refit")
            cam = Camera(cfg.width, cfg.height)
            cam.set_position(C.CAMERA_START_POSITION)
            cam.set_rotation(C.CAMERA_START_ROTATION)
            rnd.render(cam)          # compile
            sched = FrameScheduler(inflight=3)
            rays = 0
            t0 = time.perf_counter()
            nfr = 5
            for _ in range(nfr):
                sched.submit(rnd.render_async, cam)
            for _idx, out in sched.drain():
                rays = int(np.asarray(out[1]))
            ms = (time.perf_counter() - t0) / nfr * 1000
            print(json.dumps({"step": name, "frame_ms": round(ms, 1),
                              "mrays": round(rays / ms / 1e3, 2),
                              "rays": rays}), flush=True)

    if "order" in steps:
        # morton vs SAH-split cluster ordering, same kernel
        from vkrt_tpu.accel.clusters import build_clusters, scene_attrs
        idx = np.asarray(flat.indices, np.int64)
        v0 = jnp.asarray(flat.positions[idx[:, 0]])
        e1 = jnp.asarray(flat.positions[idx[:, 1]]) - v0
        e2 = jnp.asarray(flat.positions[idx[:, 2]]) - v0
        for method in ("morton", "split"):
            tr = build_clusters(v0, e1, e2, attrs=scene_attrs(flat),
                                with_attributes=True, device=False,
                                method=method)
            dt = bench(lambda t=tr: trace_dense(t, oj, dj, tmax))
            da = bench(lambda t=tr: trace_dense(t, oj, dj, tmax,
                                                with_attributes=True))
            do = bench(lambda t=tr: trace_dense(t, oj, dj, tmax,
                                                occlusion=True))
            out = trace_dense(tr, oj, dj, tmax, stats=True)
            st = np.asarray(out[-1])
            print(json.dumps({
                "step": f"order:{method}",
                "mrays": round(n / dt / 1e6, 2),
                "mrays_attrs": round(n / da / 1e6, 2),
                "mrays_occl": round(n / do / 1e6, 2),
                "gated_per_block": round(float(st[:, 0].mean()), 1),
                "swept_per_block": round(float(st[:, 1].mean()), 1)}))

    if "glue" in steps:
        # 1080p: time the frame's pieces separately to expose XLA glue

        from vkrt_tpu.wavefront.engine import camera_ray_blocks
        cam = Camera(1920, 1080)
        cam.set_position(C.CAMERA_START_POSITION)
        cam.set_rotation(C.CAMERA_START_ROTATION)
        cfg = C.config4_flythrough()
        pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)

        rays_fn = jax.jit(functools.partial(camera_ray_blocks, cfg=cfg))
        op1, d1, val1 = rays_fn(pi, vi)
        d1.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            op1, d1, val1 = rays_fn(pi, vi)
        d1.block_until_ready()
        print(json.dumps({"step": "glue:raygen_tile",
                          "ms": round((time.perf_counter() - t0) / 5 * 1e3, 1)}))

        from vkrt_tpu.wavefront.engine import _broadcast_points
        nbl1 = d1.shape[1] * 128 // 512
        opts1 = jnp.broadcast_to(op1[None, :], (nbl1, 3))
        o1 = _broadcast_points(opts1, d1)
        tm1 = jnp.where(val1, C.RAY_TMAX, 0.0)
        dt = bench(lambda: trace_dense(tree, o1, d1, tm1,
                                       with_attributes=True))
        n1 = d1.shape[1] * 128
        print(json.dumps({"step": "glue:trace1080",
                          "mrays": round(n1 / dt / 1e6, 2),
                          "ms": round(dt * 1e3, 1)}))
        dtp = bench(lambda: trace_dense(tree, opts1, d1, tm1,
                                        with_attributes=True,
                                        point_origin=True))
        print(json.dumps({"step": "glue:trace1080_point",
                          "mrays": round(n1 / dtp / 1e6, 2),
                          "ms": round(dtp * 1e3, 1)}))
        dto = bench(lambda: trace_dense(tree, o1, d1, tm1, occlusion=True))
        print(json.dumps({"step": "glue:occl1080",
                          "mrays": round(n1 / dto / 1e6, 2),
                          "ms": round(dto * 1e3, 1)}))
        dtop = bench(lambda: trace_dense(tree, opts1, d1, tm1,
                                         occlusion=True, point_origin=True))
        print(json.dumps({"step": "glue:occl1080_point",
                          "mrays": round(n1 / dtop / 1e6, 2),
                          "ms": round(dtop * 1e3, 1)}))

        # prologue alone: the per-trace sc_order argsort
        @jax.jit
        def prologue(o, d):
            nblocks = o.shape[1] * 128 // 512
            ob = o.reshape(3, nblocks, 512).mean(axis=2)
            db = d.reshape(3, nblocks, 512).mean(axis=2)
            key = ob[0] + db[0]
            return jnp.argsort(
                jnp.broadcast_to(key[:, None], (nblocks, 33)), axis=1)

        x = prologue(o1, d1)
        x.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            x = prologue(o1, d1)
        x.block_until_ready()
        print(json.dumps({"step": "glue:sc_order_argsort",
                          "ms": round((time.perf_counter() - t0) / 5 * 1e3, 1)}))

    if "glue2" in steps:
        # bisect the flat-albedo frame: engine pieces added one at a time

        from vkrt_tpu.shade import shading
        from vkrt_tpu.shade.sampling import sample_material
        from vkrt_tpu.wavefront.engine import (camera_ray_blocks, untile,
                                               _pad_dims)
        from vkrt_tpu.utils import layout as L
        _, tex2, _ = load_scene_assets(SCENE, 64)
        cam = Camera(1920, 1080)
        cam.set_position(C.CAMERA_START_POSITION)
        cam.set_rotation(C.CAMERA_START_ROTATION)
        cfg = C.config4_flythrough()
        pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)

        def stage_a(pi, vi, tex2):           # raygen+trace+interp+sample+acc
            op, d, val = camera_ray_blocks(pi, vi, cfg=cfg)
            tmax = jnp.where(val, C.RAY_TMAX, 0.0)
            opts = jnp.broadcast_to(op[None, :], (d.shape[1] * 128 // 512, 3))
            t, slot, u, v, attrs = trace_dense(tree, opts, d, tmax,
                                               with_attributes=True,
                                               point_origin=True)
            hit = slot >= 0
            pos, normal, uv, tangent, mat_ids = shading.interpolate(
                attrs, u, v)
            base, _, _ = sample_material(tex2.texels_tri, tex2.level_offset,
                                         tex2.level_width, tex2.level_height,
                                         mat_ids[0], uv)
            base = base[:3]
            accum = jnp.where(hit[None], base, 0.0)
            return accum, jnp.sum(hit)

        def stage_b(pi, vi, tex2):           # + untile + u8 quantize
            accum, rays = stage_a(pi, vi, tex2)
            wp, hp = _pad_dims(cfg.width, cfg.height)
            fb = jnp.stack([untile(accum[k], hp, wp)[:1080, :1920]
                            for k in range(3)], axis=-1)
            fb8 = jnp.clip(fb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
            return fb8, rays

        for name, fn in (("stage_a", stage_a), ("stage_b", stage_b)):
            jf = jax.jit(fn)
            r = jf(pi, vi, tex2)
            _ = float(jnp.sum(r[1]))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(3):
                    r = jf(pi, vi, tex2)
                _ = float(jnp.sum(r[1]))
                best = min(best, (time.perf_counter() - t0) / 3)
            print(json.dumps({"step": f"glue2:{name}",
                              "ms": round(best * 1e3, 1)}))

    if "budget" in steps:
        # True per-phase budget of the config-4 frame at 1080p: each
        # phase is jitted separately and fed the REAL intermediate state
        # (depth-1 hits, real reflection rays), texdim 512 (bench default)
        from vkrt_tpu.shade import shading
        from vkrt_tpu.shade.sampling import sample_material
        from vkrt_tpu.utils import layout as L2
        from vkrt_tpu.wavefront.engine import (camera_ray_blocks, untile,
                                               _pad_dims)
        _, tex5, _ = load_scene_assets(SCENE, 512)
        cam = Camera(1920, 1080)
        cam.set_position(C.CAMERA_START_POSITION)
        cam.set_rotation(C.CAMERA_START_ROTATION)
        cfg = C.config4_flythrough()
        pi, vi = jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse)
        lights = jnp.asarray(C.LIGHT_POSITIONS)[:cfg.num_lights]
        nl = cfg.num_lights

        from vkrt_tpu.wavefront.engine import _broadcast_points
        op, d, active0 = jax.jit(
            functools.partial(camera_ray_blocks, cfg=cfg))(pi, vi)
        opts = jnp.broadcast_to(op[None, :], (d.shape[1] * 128 // 512, 3))
        o = _broadcast_points(opts, d)

        def tmr(name, jf, *args):
            r = jf(*args)
            jax.block_until_ready(r)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(3):
                    r = jf(*args)
                jax.block_until_ready(r)
                best = min(best, (time.perf_counter() - t0) / 3)
            print(json.dumps({"step": f"budget:{name}",
                              "ms": round(best * 1e3, 1)}), flush=True)
            return r

        # tree/tex5 MUST be jit ARGUMENTS: a closure embeds them as
        # constants in the remote-compile request (420MB heap -> HTTP 413)
        def closest(tree, o, d, act):
            tm = jnp.where(act, C.RAY_TMAX, 0.0)
            return trace_dense(tree, o, d, tm, with_attributes=True)

        def closest_pt(tree, opts, d, act):
            tm = jnp.where(act, C.RAY_TMAX, 0.0)
            return trace_dense(tree, opts, d, tm, with_attributes=True,
                               point_origin=True)

        closest_j = jax.jit(closest)
        closest_pt_j = jax.jit(closest_pt)
        tmr("closest_d0_point", closest_pt_j, tree, opts, d, active0)
        t, slot, u, v, attrs = tmr("closest_d0", closest_j, tree, o, d,
                                   active0)
        hit = (slot >= 0) & active0

        def interp_sample(tex5, attrs, u, v, hit):
            pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
            sid = jnp.where(hit, mat_ids[0], 0)
            uvs = jnp.where(hit[None], uv, 0.0)
            return sample_material(tex5.texels_tri, tex5.level_offset,
                                   tex5.level_width, tex5.level_height,
                                   sid, uvs)

        interp_sample_j = jax.jit(interp_sample)
        tmr("interp_sample_d0", interp_sample_j, tex5, attrs, u, v, hit)

        def shadows(tree, attrs, u, v, hit):
            pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
            pn = shading.perturbed_normal(
                normal, tangent, jnp.zeros_like(normal) + 0.5)
            geo = [shading.light_geometry(pos, lights[li]) for li in range(nl)]
            casts = [hit & (L2.dot3(pn, g[0]) > 0) for g in geo]
            so = jnp.concatenate(
                [jnp.broadcast_to(lights[li][:, None, None], pos.shape)
                 for li in range(nl)], axis=1)
            sd = jnp.concatenate([-g[0] for g in geo], axis=1)
            st = jnp.concatenate([jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                                  for c, g in zip(casts, geo)], axis=0)
            return trace_dense(tree, so, sd, st, occlusion=True)

        def shadows_pt(tree, attrs, u, v, hit):
            pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
            pn = shading.perturbed_normal(
                normal, tangent, jnp.zeros_like(normal) + 0.5)
            geo = [shading.light_geometry(pos, lights[li]) for li in range(nl)]
            casts = [hit & (L2.dot3(pn, g[0]) > 0) for g in geo]
            nbl = pos.shape[1] * 128 // 512
            so_pts = jnp.concatenate(
                [jnp.broadcast_to(lights[li][None, :], (nbl, 3))
                 for li in range(nl)], axis=0)
            sd = jnp.concatenate([-g[0] for g in geo], axis=1)
            st = jnp.concatenate([jnp.where(c, g[1] - C.RAY_TMIN, 0.0)
                                  for c, g in zip(casts, geo)], axis=0)
            return trace_dense(tree, so_pts, sd, st, occlusion=True,
                               point_origin=True)

        shadows_j = jax.jit(shadows)
        shadows_pt_j = jax.jit(shadows_pt)
        tmr("shadows_d0_point", shadows_pt_j, tree, attrs, u, v, hit)
        tmr("shadows_d0", shadows_j, tree, attrs, u, v, hit)

        # real depth-2 state
        def refl_state(tex5, attrs, u, v, hit, o, d):
            pos, normal, uv, tangent, mat_ids = shading.interpolate(attrs, u, v)
            _, mr4, nmap4 = sample_material(tex5.texels_tri, tex5.level_offset,
                                            tex5.level_width, tex5.level_height,
                                            jnp.where(hit, mat_ids[0], 0),
                                            jnp.where(hit[None], uv, 0.0))
            pn = shading.perturbed_normal(normal, tangent, nmap4[:3])
            reflective = hit & (mr4[2] > C.METALLIC_THRESHOLD)
            o2 = L2.where3(reflective, pos, o)
            d2 = L2.where3(reflective, shading.reflect(d, pn), d)
            return o2, d2, reflective

        o2, d2, refl = jax.jit(refl_state)(tex5, attrs, u, v, hit, o, d)
        print(json.dumps({"step": "budget:live_d1",
                          "frac": round(float(jnp.mean(
                              refl.astype(jnp.float32))), 4)}), flush=True)
        t2 = tmr("closest_d1", closest_j, tree, o2, d2, refl)
        hit2 = (t2[1] >= 0) & refl
        tmr("interp_sample_d1", interp_sample_j, tex5, t2[4], t2[2], t2[3],
            hit2)
        tmr("shadows_d1_point", shadows_pt_j, tree, t2[4], t2[2], t2[3], hit2)

    if "sparse" in steps:
        # cost of a mostly-dead wavefront (depth-2 reality: ~9% live):
        # scattered live rays vs the same rays packed group-contiguously.
        # Quantifies the win of group-level compaction before depth>=1
        # dispatches.
        cam = Camera(1920, 1080)
        cam.set_position(C.CAMERA_START_POSITION)
        cam.set_rotation(C.CAMERA_START_ROTATION)
        from vkrt_tpu.wavefront.engine import (camera_ray_blocks,
                                               _broadcast_points)
        op1, d1, _v1 = jax.jit(lambda pi, vi: camera_ray_blocks(
            pi, vi, cfg=C.config4_flythrough()))(
                jnp.asarray(cam.proj_inverse), jnp.asarray(cam.view_inverse))
        o1 = _broadcast_points(
            jnp.broadcast_to(op1[None, :], (d1.shape[1] * 128 // 512, 3)), d1)
        nb1 = o1.shape[1]
        n1 = nb1 * 128
        rng = np.random.default_rng(11)
        for frac in (0.10, 0.25, 0.60):
            live = jnp.asarray(rng.random((nb1, 128)) < frac)
            tm_sc = jnp.where(live, C.RAY_TMAX, 0.0)       # scattered
            # packed: group-granular — groups sorted by live count
            glive = np.asarray(live).sum(axis=1)
            order = np.argsort(-glive, kind="stable").astype(np.int32)
            op = o1[:, order]
            dp = d1[:, order]
            tm_pk = tm_sc[order]
            dt_sc = bench(lambda: trace_dense(tree, o1, d1, tm_sc,
                                              with_attributes=True))
            dt_pk = bench(lambda: trace_dense(tree, op, dp, tm_pk,
                                              with_attributes=True))
            do_sc = bench(lambda: trace_dense(tree, o1, d1, tm_sc,
                                              occlusion=True))
            do_pk = bench(lambda: trace_dense(tree, op, dp, tm_pk,
                                              occlusion=True))
            print(json.dumps({
                "step": f"sparse{int(frac*100)}",
                "closest_scattered_ms": round(dt_sc * 1e3, 1),
                "closest_packed_ms": round(dt_pk * 1e3, 1),
                "occl_scattered_ms": round(do_sc * 1e3, 1),
                "occl_packed_ms": round(do_pk * 1e3, 1)}))

    if "big" in steps:
        from vkrt_tpu.accel.clusters import build_clusters
        rng = np.random.default_rng(7)
        nt = 620_000
        bv0 = rng.uniform(-50, 50, (nt, 3)).astype(np.float32)
        be1 = rng.uniform(-0.5, 0.5, (nt, 3)).astype(np.float32)
        be2 = rng.uniform(-0.5, 0.5, (nt, 3)).astype(np.float32)
        big = build_clusters(jnp.asarray(bv0), jnp.asarray(be1),
                             jnp.asarray(be2), device=True)
        print("big tree:", big.num_superclusters, "superclusters")
        ro = rng.uniform(-45, 45, (512, 3)).astype(np.float32)
        rd = rng.normal(size=(512, 3)).astype(np.float32)
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)
        t, slot, u, v = trace_dense(big, L.to_cvec(jnp.asarray(ro)),
                                    L.to_cvec(jnp.asarray(rd)),
                                    L.to_lanes(jnp.full(512, 1e3, np.float32)))
        from vkrt_tpu.golden.cpu_tracer import closest_hit as brute
        bt, btri, _, _ = brute(ro, rd, 0.001, 1e3, bv0, be1, be2)
        hit = np.asarray(L.from_lanes(slot)) >= 0
        agree = float((hit == (btri >= 0)).mean())
        print(json.dumps({"step": "big", "hit_agree": agree,
                          "superclusters": big.num_superclusters}))
        assert agree == 1.0


if __name__ == "__main__":
    main()
