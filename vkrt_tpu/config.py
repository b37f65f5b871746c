"""Render configuration.

The reference has no config system — everything is a compile-time constant
(SURVEY.md §5: window size src/Utils.hpp:32-33, lights src/Raytracer.cpp:26-31,
camera start src/Raytracer.cpp:267-271, recursion depth src/Raytracer.cpp:978).
Here that constant set is promoted to a real config object, parameterized for
the five BASELINE.json benchmark configs.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

# --- Behavioral contract constants (golden table, SURVEY.md §7) -----------

# ref: src/Raytracer.cpp:26-31
LIGHT_POSITIONS = np.array(
    [[6.0, 6.0, 0.0], [2.0, 5.0, 0.0], [-2.0, 4.0, 0.0], [-6.0, 3.0, 0.0]],
    dtype=np.float32,
)
LIGHT_INTENSITY = 10.0          # ref: shaders/shader.rchit:111
SHADOW_MULTIPLIER = 0.3         # ref: shaders/shader.rchit:147
AMBIENT = 0.1                   # ref: shaders/shader.rchit:154
SKY_COLOR = np.array([0.8, 0.8, 1.0], dtype=np.float32)  # ref: shader.rmiss:17
METALLIC_THRESHOLD = 0.1        # ref: shaders/shader.rchit:162
REFLECT_SCALE = 0.5             # ref: shaders/shader.rchit:165
RAY_TMIN = 0.001                # ref: shaders/shader.rgen:59, shader.rchit:139
RAY_TMAX = 1000.0               # ref: shaders/shader.rgen:61
SCENE_SCALE = 0.01              # TLAS instance transform, ref: src/Raytracer.cpp:1165-1169
CAMERA_START_POSITION = (6.3, 4.5, -0.7)   # ref: src/Raytracer.cpp:267-268
CAMERA_START_ROTATION = (0.0, 1.57, 0.0)   # ref: src/Raytracer.cpp:269-270
TRANSLATION_SPEED = 5.0         # units/s, ref: src/Raytracer.cpp:288
ROTATION_SPEED = 1.5            # rad/s,   ref: src/Raytracer.cpp:289
REF_WIDTH, REF_HEIGHT = 1600, 1200  # ref: src/Utils.hpp:32-33


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """One renderable configuration (a BASELINE.json config row)."""

    width: int = REF_WIDTH
    height: int = REF_HEIGHT
    max_depth: int = 2            # trace iterations: primary + (max_depth-1) bounces
    num_lights: int = 4
    enable_shadows: bool = True
    enable_reflections: bool = True
    flat_albedo: bool = False     # config 1: base color only, no lighting
    rebuild_per_frame: bool = False  # config 5: LBVH rebuilt every frame
    ray_block: int = 1 << 17      # rays processed per wavefront chunk
    # BEYOND-PARITY: per-ray mip LOD from wavefront-neighbor ray
    # differentials (trilinear). The reference's RT stage has no
    # derivatives and always samples level 0 (shader.rchit texture()),
    # so this must stay off in every golden-gated config.
    mip_lod: bool = False
    # Re-tile secondary dispatches into spatially coherent ray blocks
    # (wavefront/resort.py: octant partition before the reflection
    # trace, surface-point cells before every shadow dispatch). Shadow
    # masks are exactly order-independent; closest results equal up to
    # ~1-ulp near-tie commits (CI); sims cut total gated-cluster sweeps
    # to 0.51x / 0.40x / 0.13-0.28x (tools/dirsort_sim*.py). Default
    # OFF: measured DEAD on hardware (tools/r3_hw_queue.py) — the
    # radix-partition permutations alone cost ~420 ms/frame at 1080p
    # (XLA gather/scatter ~30M rows/s x 14 sequential bit-passes over
    # 2M rays), more than every dispatch they accelerate combined
    # (closest_d1 resorted 554 ms vs 95 unsorted+group-gated). The
    # machinery stays for small-wavefront scenes and CI contract tests.
    resort_secondary: bool = False
    # Two-level pregate for secondary dispatches (depth>=1 closest +
    # every shadow pass): the interval prologue nominates candidate
    # clusters (cumsum partition, no argsort) and the kernel re-tests
    # each per-ray at DMA-issue time, replacing the in-kernel per-ray
    # prepass + scalar emission + sort (rt/dense.py pregate="recheck").
    # Occlusion outputs bit-identical; closest equal up to ~1-ulp
    # near-tie commits (visit order differs — same contract as the
    # resort). Default OFF: measured DEAD on hardware
    # (tools/r3_hw_queue.py) — closest_d1 recheck 220.6 ms vs 95.3 for
    # the in-kernel prepass + group-gate; shadows 323/373 vs 147/200.
    # The interval prologue's cumsum partition pays the same XLA
    # scatter cost class that killed the resort, and over-gated
    # candidates still cost DMA issue slots.
    recheck_secondary: bool = False
    # PRUNED FLAGS (round 5, VERDICT r4 item 8 — measured-dead levers
    # removed from the config surface; post-mortems in ROADMAP.md, full
    # machinery in git history at tag round-4 / commit 6c6db9f):
    #   shadow_group_gate     — per-(set,group) occlusion gating:
    #                           shadow_d0 147->334 ms even with the
    #                           slice-reduce prepass (r3_hw_queue2)
    #   closest_d0_group_gate — depth-0 closest group gate: 62.9->72.2
    #                           (coherent tiles gate ~95% anyway)
    #   group_sort_closest    — group resort of reflection closest:
    #                           94.5->101.8 (r4_hw_queue)
    #   defer_shadows         — merged all-depth occlusion dispatch:
    #                           371 vs 343 ms, frame 629 vs 605
    #                           (r3_hw_queue4)
    # Consolidate depth>=1 shadow wavefronts with the Pallas live-ray
    # pack (wavefront/pack.py): a stable compaction by global live rank
    # moves the ~10% live rays into the leading blocks (one-hot MXU
    # matmuls + dynamic-read DMA — no XLA scatters, the cost class that
    # killed the resort), traces the packed wavefront, and scatters the
    # masks back. Masks bit-identical (order-independent any-hit +
    # bit-exact pack, hardware-verified); frame bit-identical (CI).
    # Measured: shadow_d1 199.4 -> 151.1 ms e2e including pack+scatter
    # (tools/r3_hw_queue6.py). Depth-0 shadows stay unpacked (~78%
    # occupancy — nothing to consolidate); closest_d1 measured a wash.
    consolidate_secondary: bool = True
    # GROUP (128-lane) granularity resort of secondary dispatches
    # (wavefront/resort.py group_*, round 4). The ray-granular resort
    # above died on XLA's per-row scatter cost (~420 ms/frame at 1080p);
    # permuting whole 128-lane groups — already spatially tight
    # 8x16-pixel subtiles — is 128x fewer rows: the full roundtrip
    # measured 12.6 ms on hardware (tools/r4_hw_queue.py). Hardware
    # A/B: depth-0 shadows LOSE (146.1 -> 167.1 ms — a camera tile's
    # intra-group depth spread survives any group-level key), packed
    # depth>=1 shadows WIN (149.7 -> 142.3 ms: the group permutation
    # makes the pack's leading blocks draw spatially-similar groups),
    # reflection closest LOSES (94.5 -> 101.8). group_sort_shadows
    # applies at depth>=1 only (default ON, masks bit-identical) and is
    # the fallback coherence pass when partition_shadows is off.
    group_sort_shadows: bool = True
    # Two-level per-ray repartition of secondary dispatches
    # (wavefront/lanesort.py, round 5): a Pallas stable in-BLOCK sort of
    # rays by a fine Morton/octant key (one-hot MXU permutes — no
    # scatters, no cross-block DMA) makes every 128-lane group
    # key-contiguous, then the cheap GROUP radix partition re-tiles the
    # now-coherent groups into coherent blocks — approximating the
    # global ray sort (sims: 0.40x shadow_d0 / 0.13-0.28x shadow_d1 /
    # 0.51x closest_d1 total sweeps) at group granularity without the
    # ~420 ms XLA permutation cost that killed the exact version.
    # Shadow masks bit-identical (any-hit + exact one-hot moves);
    # closest equal up to ~1-ulp near-tie commits (resort contract).
    # partition_shadows composes with consolidate_secondary at depth>=1
    # (pack first, lane-sort only the packed live prefix). Hardware A/B
    # (tools/r5_hw_queue.py, 1080p config 4): partition roundtrip
    # 26.6 ms; depth-1 shadows WIN 142.3 -> 130.1 ms e2e (masks
    # bit-equal) — default ON, applied at depth>=1 only (depth-0 camera
    # tiles LOSE 146.6 -> 152.4: the lane-sort roundtrip exceeds the
    # re-tiling win on already-coherent tiles).
    # partition_closest = the SORTED-DEPTH pipeline: the whole depth>=1
    # iteration (closest trace + shading + sampling + shadow dispatch +
    # accumulation) runs in the repartitioned order; only the per-depth
    # contributions (+ the reflection carry on deeper configs) return
    # through one small inverse pass. Variant 1 (inverse-permute all 40
    # closest outputs per dispatch) measured 110.2 vs 95.0 ms even
    # though the re-tiled dispatch itself ran ~0.56x — the sorted-depth
    # form keeps the dispatch win and shrinks the inverse to 4
    # channels. Hardware rows (tools/r5_hw_queue4.py, /tmp/r5q4.out):
    # cfg4 540.6 vs 542.2 (wash, within noise), cfg5 776.9 vs 768.1
    # (LOSES ~1% — the 12-channel carry inverse at depths 1-3 eats the
    # dispatch win). Frames bit-equal both configs. Default OFF.
    partition_shadows: bool = True
    partition_closest: bool = False
    # In-sweep sub-cluster hierarchy (round 5, VERDICT r4 item 5): the
    # trace kernels slab-test 8 per-cluster 16-tri sub-run AABBs (built
    # into tri_data's pad columns — accel/clusters._assemble) and run
    # only the hitting 16-tri sub-sweeps. Targets the ~45% of swept
    # (cluster,ray) pairs whose per-ray gate is off (block-union
    # over-gate; tools/subgroup_sim.py hit fractions 0.69-0.88).
    # Outputs bit-identical (CI: test_backends/test_refit). MEASURED
    # DEAD on hardware (tools/r5_hw_queue5.py, /tmp/r5q5.out): the 8
    # pl.when regions' branch + commit fragmentation costs more than the
    # 12-31% of sweep math they skip — closest_d0 63.2 -> 66.4 ms,
    # shadow_d0 142.4 -> 155.4, cfg4 frame 541.8 -> 566.9 (shadows) /
    # 675.3 (closest: the fragmented MXU attr-commit is the extra hit) /
    # 700.9 (both); cfg5 767.7 -> 1028.0. Same death class as the
    # group-gate sweeps skips. Both default OFF; keep for scenes with
    # far lower sub-box hit fractions than Sponza's camera/light cones.
    sub_gate_shadows: bool = False
    sub_gate_closest: bool = False

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.width, self.height)

    @property
    def num_pixels(self) -> int:
        return self.width * self.height


# --- The five BASELINE.json configs ---------------------------------------

def config1_primary() -> RenderConfig:
    """Sponza, primary-visibility rays only (flat albedo), 800x600."""
    return RenderConfig(width=800, height=600, max_depth=1, num_lights=0,
                        enable_shadows=False, enable_reflections=False,
                        flat_albedo=True)


def config2_shadows() -> RenderConfig:
    """Sponza + hard shadows (1 shadow ray/hit to point light), 1280x720."""
    return RenderConfig(width=1280, height=720, max_depth=1, num_lights=1,
                        enable_shadows=True, enable_reflections=False)


def config3_reflections() -> RenderConfig:
    """Sponza + single-bounce mirror reflections + shadows, 1280x720."""
    return RenderConfig(width=1280, height=720, max_depth=2, num_lights=1,
                        enable_shadows=True, enable_reflections=True)


def config4_flythrough() -> RenderConfig:
    """Interactive fly-through (240-frame camera path), full shading, 1080p."""
    return RenderConfig(width=1920, height=1080, max_depth=2, num_lights=4,
                        enable_shadows=True, enable_reflections=True)


def config5_stress() -> RenderConfig:
    """Stress: 4-bounce reflections, 4 lights, per-frame LBVH rebuild, 1080p."""
    return RenderConfig(width=1920, height=1080, max_depth=4, num_lights=4,
                        enable_shadows=True, enable_reflections=True,
                        rebuild_per_frame=True)


def reference_config() -> RenderConfig:
    """The reference's own fixed workload: 1600x1200, depth 2, 4 lights."""
    return RenderConfig()


BASELINE_CONFIGS = {
    1: config1_primary,
    2: config2_shadows,
    3: config3_reflections,
    4: config4_flythrough,
    5: config5_stress,
}
