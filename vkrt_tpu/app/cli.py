"""CLI entry point — the main.cpp analogue, promoted to a real interface.

The reference has zero CLI (main(void), compile-time constants everywhere —
SURVEY.md §5); here every baked constant is a flag. Examples:

  python -m vkrt_tpu.app.cli --config 1 --output /tmp/frame.png
  python -m vkrt_tpu.app.cli --config 4 --frames 240 --metrics
  python -m vkrt_tpu.app.cli --width 1600 --height 1200 --backend dense
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

DEFAULT_SCENE = "/root/reference/models/sponza/Sponza.gltf"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vkrt-tpu",
        description="TPU-native wavefront ray tracer (vkrt capability port)")
    p.add_argument("--scene", default=DEFAULT_SCENE, help="glTF scene path")
    p.add_argument("--config", type=int, choices=[1, 2, 3, 4, 5],
                   help="BASELINE.json benchmark config")
    p.add_argument("--width", type=int, help="override resolution width")
    p.add_argument("--height", type=int, help="override resolution height")
    p.add_argument("--max-depth", type=int, help="override bounce depth")
    p.add_argument("--lights", type=int, help="override light count (0-4)")
    p.add_argument("--no-shadows", action="store_true")
    p.add_argument("--no-reflections", action="store_true")
    p.add_argument("--backend", choices=["dense", "reference"], default="dense")
    p.add_argument("--frames", type=int, default=1,
                   help=">1 renders the scripted fly-through path")
    p.add_argument("--output", help="PNG (or .npy) output path")
    p.add_argument("--max-texture-dim", type=int, default=0,
                   help="downsample textures at load (0 = full res)")
    p.add_argument("--metrics", action="store_true", help="print metrics JSON")
    p.add_argument("--profile-dir", help="write a jax.profiler trace here")
    p.add_argument("--check-finite", action="store_true",
                   help="NaN/Inf sentinel on every frame")
    p.add_argument("--checkpoint",
                   help="checkpoint path: saved every frame; resumes if present")
    p.add_argument("--raster", action="store_true",
                   help="use the classic raster pipeline instead of RT")
    p.add_argument("--shard", type=int, nargs="?", const=-1, default=None,
                   metavar="N",
                   help="shard rays across a device mesh: bare --shard = "
                        "all visible devices; --shard N = an N-device "
                        "mesh (when fewer devices are visible, re-execs "
                        "onto a virtual N-device CPU mesh — the "
                        "xla_force_host_platform_device_count recipe)")
    p.add_argument("--msaa", type=int, default=8, choices=[1, 8],
                   help="raster-path MSAA sample count")
    p.add_argument("--raster-method", choices=["auto", "edge", "wavefront"],
                   default="auto",
                   help="raster machinery: 'edge' = true edge-function "
                        "rasterizer (vertex stage + screen-space coverage "
                        "+ depth test), 'wavefront' = ray-cast equivalent; "
                        "'auto' = edge on the dense backend")
    p.add_argument("--mip-lod", action="store_true",
                   help="beyond-parity: trilinear mip filtering from "
                        "wavefront ray differentials (the reference's RT "
                        "stage always samples mip 0, so golden configs "
                        "keep this off)")
    p.add_argument("--resort", action="store_true",
                   help="force-enable the secondary-dispatch resort "
                        "(re-tiles reflection + shadow wavefronts into "
                        "coherent ray blocks; on by default — "
                        "wavefront/resort.py)")
    p.add_argument("--no-resort", action="store_true",
                   help="disable the secondary-dispatch resort (A/B "
                        "escape hatch; output equal up to 1-ulp "
                        "near-tie commits)")
    p.add_argument("--recheck", action="store_true",
                   help="two-level pregate for secondary dispatches "
                        "(interval prologue + in-kernel per-ray re-check "
                        "at DMA-issue time; off by default until the "
                        "hardware A/B — rt/dense.py pregate='recheck')")
    p.add_argument("--rebuild", choices=["refit", "full"], default="refit",
                   help="per-frame accel update when the config rebuilds "
                        "(config 5): 'refit' = device AABB refit, 'full' = "
                        "on-device Morton re-sort rebuild")
    return p


def resolve_config(args):
    from vkrt_tpu import config as C
    cfg = C.BASELINE_CONFIGS[args.config]() if args.config else C.reference_config()
    overrides = {}
    if args.width:
        overrides["width"] = args.width
    if args.height:
        overrides["height"] = args.height
    if args.max_depth:
        overrides["max_depth"] = args.max_depth
    if args.lights is not None:
        overrides["num_lights"] = args.lights
    if args.no_shadows:
        overrides["enable_shadows"] = False
    if args.no_reflections:
        overrides["enable_reflections"] = False
    if args.mip_lod:
        overrides["mip_lod"] = True
    if args.resort:
        overrides["resort_secondary"] = True
    if args.no_resort:
        overrides["resort_secondary"] = False
    if args.recheck:
        overrides["recheck_secondary"] = True
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def _shard_devices(n: int):
    """Resolve --shard N to a device list, re-exec'ing onto a virtual
    N-device CPU mesh when fewer devices are visible (the
    dryrun_multichip self-provisioning recipe). Returns the devices, or
    None if this process must be replaced (the re-exec already ran)."""
    import jax

    devices = jax.devices()
    if n <= 0 or n <= len(devices):
        return devices if n <= 0 else devices[:n]
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n}")
    env["XLA_FLAGS"] = " ".join(flags)
    print(f"--shard {n}: only {len(devices)} device(s) visible — "
          f"re-exec on a virtual {n}-device CPU mesh", file=sys.stderr)
    r = subprocess.run([sys.executable, "-m", "vkrt_tpu.app.cli"]
                       + list(sys.argv[1:]), env=env)
    raise SystemExit(r.returncode)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = resolve_config(args)

    from vkrt_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from vkrt_tpu import config as C
    from vkrt_tpu.app import framebuffer
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.app.flythrough import camera_path
    from vkrt_tpu.app.metrics import FrameTimer, check_finite, profile
    from vkrt_tpu.app.state import load_state, save_state

    if args.raster and args.shard:
        import jax
        import jax.numpy as jnp

        from vkrt_tpu.parallel.mesh import (make_mesh,
                                            render_raster_frame_sharded)
        from vkrt_tpu.wavefront.engine import cached_backend

        mesh = make_mesh(_shard_devices(args.shard))
        print(f"sharding raster pixels over {mesh.devices.size} devices",
              file=sys.stderr)
        _, tex, be = cached_backend(args.scene, args.max_texture_dim,
                                    "dense")
        interpret = jax.default_backend() == "cpu"

        class _ShardedRaster:
            def render(self, camera, show_fps=True):
                return np.asarray(render_raster_frame_sharded(
                    be.tree, tex, jnp.asarray(camera.view_matrix),
                    jnp.asarray(camera.projection_matrix), cfg, mesh,
                    msaa=args.msaa, interpret=interpret))

        renderer = _ShardedRaster()
    elif args.raster:
        import jax

        from vkrt_tpu.raster import Rasterizer
        # Pallas kernels (dense backend / edge rasterizer) need interpret
        # mode off-TPU; the reference backend ignores the flag
        interpret = jax.default_backend() == "cpu"
        renderer = Rasterizer(args.scene, cfg, backend=args.backend,
                              max_texture_dim=args.max_texture_dim,
                              msaa=args.msaa, method=args.raster_method,
                              interpret=interpret)
    elif args.shard:
        import jax
        import jax.numpy as jnp

        from vkrt_tpu.parallel import make_mesh, render_frame_sharded
        from vkrt_tpu.wavefront.engine import cached_backend

        mesh = make_mesh(_shard_devices(args.shard))
        print(f"sharding rays over {mesh.devices.size} devices",
              file=sys.stderr)
        _, tex, be = cached_backend(args.scene, args.max_texture_dim,
                                    args.backend)
        lights = jnp.asarray(C.LIGHT_POSITIONS)
        # Pallas kernels (dense backend) need interpret mode off-TPU
        interpret = jax.default_backend() == "cpu"

        class _Sharded:
            def render(self, camera):
                fb, rays = render_frame_sharded(
                    be, tex, jnp.asarray(camera.proj_inverse),
                    jnp.asarray(camera.view_inverse), lights, cfg, mesh,
                    interpret=interpret)
                return np.asarray(fb), int(np.asarray(rays).sum())

        renderer = _Sharded()
    else:
        import jax

        from vkrt_tpu.wavefront.engine import Renderer
        # quantize on device (u8 fb + scalar ray count — the host link is
        # slow) unless the caller needs the f32 image on the host
        quantize = not args.check_finite and not (
            args.output and args.output.endswith(".npy"))
        # Pallas kernels need interpret mode off-TPU (same auto-detect as
        # the raster paths; the reference backend ignores the flag)
        renderer = Renderer(args.scene, cfg, backend=args.backend,
                            max_texture_dim=args.max_texture_dim,
                            quantize=quantize, rebuild=args.rebuild,
                            interpret=jax.default_backend() == "cpu")

    start_frame = 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        _, _, start_frame, _ = load_state(args.checkpoint)
        print(f"resuming at frame {start_frame}", file=sys.stderr)

    if args.frames > 1:
        cams = camera_path(cfg.width, cfg.height)
    else:
        cam = Camera(cfg.width, cfg.height)
        cam.set_position(C.CAMERA_START_POSITION)
        cam.set_rotation(C.CAMERA_START_ROTATION)
        cams = iter([cam])

    timer = FrameTimer()
    fb = None
    # frames-in-flight: JAX async dispatch + FrameScheduler overlap host
    # frame prep (camera path, checkpointing) and device execution of up
    # to `inflight` frames — the reference's 3-swapchain-image pipelining
    # (ref: src/Context.cpp:141-180). Raster/sharded paths stay serial.
    pipeline = (args.frames > 1 and not args.raster
                and hasattr(renderer, "render_async"))

    def retire(idx, cam, out):
        nonlocal fb
        fb, rays_arr = out
        rays = int(np.asarray(rays_arr).sum())
        stats = timer.end(rays)
        timer.begin()
        if args.check_finite:
            check_finite(fb, f"frame {idx}")
        if args.checkpoint:
            save_state(args.checkpoint, cfg, cam, idx + 1)
        if args.metrics:
            print(f"frame {idx}: {stats.frame_ms:.1f}ms "
                  f"{stats.mrays_per_s:.2f} Mrays/s", file=sys.stderr)

    with profile(args.profile_dir):
        if pipeline:
            from vkrt_tpu.runtime import FrameScheduler
            sched = FrameScheduler(inflight=3)
            in_flight_cams = {}
            timer.begin()
            for i in range(args.frames):
                try:
                    cam = next(cams)
                except StopIteration:
                    break
                if i < start_frame:
                    continue  # fast-forward a resumed fly-through
                in_flight_cams[i] = cam
                retired = sched.submit(renderer.render_async, cam)
                if retired is not None:
                    idx, out = retired
                    idx += start_frame
                    retire(idx, in_flight_cams.pop(idx), out)
            for idx, out in sched.drain():
                idx += start_frame
                retire(idx, in_flight_cams.pop(idx), out)
        else:
            for i in range(args.frames):
                try:
                    cam = next(cams)
                except StopIteration:
                    break
                if i < start_frame:
                    continue  # fast-forward a resumed fly-through
                timer.begin()
                if args.raster:
                    fb = renderer.render(cam)
                    rays = cfg.num_pixels * args.msaa
                else:
                    fb, rays = renderer.render(cam)
                stats = timer.end(rays)
                if args.check_finite:
                    check_finite(fb, f"frame {i}")
                if args.checkpoint:
                    save_state(args.checkpoint, cfg, cam, i + 1)
                if args.metrics:
                    print(f"frame {i}: {stats.frame_ms:.1f}ms "
                          f"{stats.mrays_per_s:.2f} Mrays/s", file=sys.stderr)

    if args.output and fb is not None:
        if args.output.endswith(".npy"):
            framebuffer.write_npy(args.output, fb)
        else:
            framebuffer.write_png(args.output, fb)
        print(f"wrote {args.output}", file=sys.stderr)

    if args.metrics:
        print(json.dumps(timer.summary()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
