"""Round-5 hardware queue, part 2: device variable-cut SAH build cost
(VERDICT r4 item 3 — 365.6 ms at L16 must reach ~<=100 ms at quality
<=10.5 clusters/ray).

Decomposition rows on the real Sponza triangle set (Tp=262272,
Nc=2049):
  1. device_sah_order timing: L16/L12/L10, stable vs unstable, with the
     round-5 PACKED carry (one [Tp,11] wide-row gather per level
     instead of five narrow ones)
  2. isolated cost ladders (16 chained, data-dependent):
     - lax.sort((u32 key, i32 pos)) stable + unstable
     - one [Tp,11] permutation gather vs five narrow gathers
  3. config-5 stress e2e: rebuild="refit" vs "full" at the chosen
     level count (the verdict's done-bar: full within ~15% of refit)
  4. golden smoke (every hardware queue ends with this)

Run: python -u tools/r5_hw_queue2.py > /tmp/r5q2.out 2>&1
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
from vkrt_tpu.accel.device_sah import device_sah_order
from vkrt_tpu.app.camera import Camera
from vkrt_tpu.utils.cache import enable_compilation_cache
from vkrt_tpu.wavefront.engine import Renderer, cached_backend

SCENE = "/root/reference/models/sponza/Sponza.gltf"


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


def rot_y(ang):
    return np.array(
        [[np.cos(ang), 0, np.sin(ang), 0], [0, 1, 0, 0],
         [-np.sin(ang), 0, np.cos(ang), 0], [0, 0, 0, 1]], np.float32)


def main():
    enable_compilation_cache()
    flat, tex, backend = cached_backend(SCENE, 512, "dense")
    idx = np.asarray(flat.indices, np.int64)
    p = flat.positions
    v0 = jnp.asarray(p[idx[:, 0]])
    e1 = jnp.asarray(p[idx[:, 1]] - p[idx[:, 0]])
    e2 = jnp.asarray(p[idx[:, 2]] - p[idx[:, 0]])
    T = v0.shape[0]
    Tp = -(-T // 128) * 128
    print(json.dumps({"info": "scene", "T": int(T), "Tp": int(Tp)}),
          flush=True)

    # --- 1. build timings ---------------------------------------------------
    for lv in (16, 12, 10):
        for stable in (True, False):
            f = jax.jit(functools.partial(device_sah_order, max_levels=lv,
                                          stable=stable))
            tmr(f"device_sah_L{lv}_stable{int(stable)}", f, v0, e1, e2)

    # --- 2. isolated ladders (16 chained, data-dependent) -------------------
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(0, 1 << 29, Tp).astype(np.uint32))
    iota = jnp.arange(Tp, dtype=jnp.int32)

    def sort16(key, stable):
        def body(k, _):
            ks, pos = jax.lax.sort((k, iota), num_keys=1, is_stable=stable)
            return ks ^ jnp.uint32(1), pos
        k, pos = jax.lax.scan(body, key, None, length=16)
        return k, pos
    for stable in (True, False):
        f = jax.jit(functools.partial(sort16, stable=stable))
        tmr(f"sort16_u32key_stable{int(stable)}", f, key0)

    perm = jnp.asarray(rng.permutation(Tp).astype(np.int32))
    S0 = jnp.asarray(rng.normal(size=(Tp, 11)).astype(np.float32))

    def gather16_wide(S):
        def body(s, _):
            return s[perm], None
        s, _ = jax.lax.scan(body, S, None, length=16)
        return s
    tmr("gather16_wide11", jax.jit(gather16_wide), S0)

    def gather16_narrow(S):
        def body(carry, _):
            a, b, c, d, e = carry
            return (a[perm], b[perm], c[perm], d[perm], e[perm]), None
        carry, _ = jax.lax.scan(
            body, (S[:, 0:3], S[:, 3:6], S[:, 6:9], S[:, 9], S[:, 10]),
            None, length=16)
        return carry
    tmr("gather16_narrow5", jax.jit(gather16_narrow), S0)

    # --- 2b. config-4 frame with the shipped round-5 defaults ---------------
    # (partition_shadows d1-only, lane sort capped to the packed live
    # prefix) vs the pinned round-4 path
    from vkrt_tpu.wavefront.engine import render_frame
    cfg4 = C.config4_flythrough()
    cam4 = Camera(cfg4.width, cfg4.height)
    cam4.set_position(C.CAMERA_START_POSITION)
    cam4.set_rotation(C.CAMERA_START_ROTATION)
    pi4 = jnp.asarray(cam4.proj_inverse)
    vi4 = jnp.asarray(cam4.view_inverse)
    li4 = jnp.asarray(C.LIGHT_POSITIONS)[:cfg4.num_lights]
    for name, flags in (
            ("frame_cfg4_r5_defaults", {}),
            ("frame_cfg4_r4_path", {"partition_shadows": False})):
        fcfg = dataclasses.replace(cfg4, **flags)
        fj = jax.jit(functools.partial(render_frame, cfg=fcfg))
        tmr(name, fj, backend, tex, pi4, vi4, li4)

    # --- 3. config-5 stress e2e: refit vs full ------------------------------
    cfg5 = C.config5_stress()
    cam = Camera(cfg5.width, cfg5.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)
    m = rot_y(0.01)
    for rb in ("refit", "full"):
        try:
            rend = Renderer(SCENE, cfg5, backend="dense",
                            max_texture_dim=512, rebuild=rb)
            def run():
                out = rend.render_async(cam, transform=m)
                jax.block_until_ready(out)
                return out
            run()
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"step": f"config5_e2e_{rb}",
                              "ms": round(best * 1e3, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"step": f"config5_e2e_{rb}",
                              "error": repr(e)[:400]}), flush=True)

    # --- 4. golden smoke -----------------------------------------------------
    from r5_hw_queue import golden_smoke
    golden_smoke()


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/tools")
    main()
