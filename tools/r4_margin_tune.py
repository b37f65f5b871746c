"""Round-4: stability-margin diagnosis against a SAVED hardware frame.

tools/r4_hw_queue.py saves /tmp/hw_golden_320_golden_defaults.npz
(fb = the TPU engine frame, golden + stable = the oracle render and its
certified mask). This tool re-derives the stability mask under a margin
grid (pure CPU — the oracle re-runs per setting) and reports, per
setting: certified fraction, worst certified-pixel diff, and the count
of certified pixels whose max-channel diff exceeds 0.1 (visibility
flips the mask FAILED to exclude — must be 0 for the gate to be sound).
Also dumps the surviving flip pixels' coordinates + diffs for the
default setting so the failure mode is attributable.

Run: python -u tools/r4_margin_tune.py
"""
import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

SCENE = "/root/reference/models/sponza/Sponza.gltf"
NPZ = "/tmp/hw_golden_320_golden_defaults.npz"


def main():
    from vkrt_tpu import config as C
    from vkrt_tpu.app.camera import Camera
    from vkrt_tpu.golden import render_golden
    from vkrt_tpu.scene import build_texture_heap
    from vkrt_tpu.wavefront.engine import cached_model, load_scene_assets

    d = np.load(NPZ)
    fb, golden = d["fb"], d["golden"]
    ca = np.clip(fb.astype(np.float64), 0, 1)
    cb = np.clip(golden.astype(np.float64), 0, 1)
    diff = np.abs(ca - cb).max(axis=-1)
    sq = ((ca - cb) ** 2).mean(axis=-1)

    flat, _, _ = load_scene_assets(SCENE, 512)
    model = cached_model(SCENE, 512)
    heap = build_texture_heap(model.images)
    cfg = dataclasses.replace(C.reference_config(), width=320, height=240)
    cam = Camera(cfg.width, cfg.height)
    cam.set_position(C.CAMERA_START_POSITION)
    cam.set_rotation(C.CAMERA_START_ROTATION)

    grids = [
        dict(),                                        # defaults
        dict(deps1=1e-4, oeps1=3e-5),
        dict(deps1=1e-4, oeps1=1e-4),
        dict(deps1=3e-4, oeps1=3e-5),
        dict(deps1=3e-4, oeps1=3e-4),
        dict(deps1=1e-3, oeps1=1e-4),
        dict(deps1=1e-3, oeps1=3e-4),
        dict(oeps0=3e-5),
    ]
    for g in grids:
        _, stable = render_golden(flat, heap, cam.proj_inverse,
                                  cam.view_inverse, cfg, accel="native",
                                  with_stable=True, stable_margins=g)
        s = stable.reshape(diff.shape)
        flips = int(((diff > 0.1) & s).sum())
        worst = float(diff[s].max()) if s.any() else 0.0
        rmse_s = float(np.sqrt(sq[s].mean())) if s.any() else 0.0
        print(json.dumps({"margins": g or "defaults",
                          "stable_frac": round(float(s.mean()), 5),
                          "certified_flips": flips,
                          "worst_certified_diff": round(worst, 4),
                          "rmse_stable": round(rmse_s, 6)}), flush=True)
        if not g:
            ys, xs = np.nonzero((diff > 0.1) & s)
            for y, x in list(zip(ys, xs))[:12]:
                print(json.dumps({
                    "flip_px": [int(x), int(y)],
                    "diff": [round(float(v), 3)
                             for v in (ca[y, x] - cb[y, x])],
                    "engine": [round(float(v), 3) for v in ca[y, x]],
                    "oracle": [round(float(v), 3) for v in cb[y, x]]}),
                    flush=True)


if __name__ == "__main__":
    main()
