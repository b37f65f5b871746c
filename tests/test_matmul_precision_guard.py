"""Guard against the bf16-default MXU matmul bug class.

On TPU, `jnp.einsum`, `@`, `jnp.dot` and `lax.dot_general` with default
precision truncate f32 operands to bf16 on the MXU. In device (jitted)
code this produces HARDWARE-ONLY wrongness that every CPU test passes:
round 2's attribute-select truncation (RMSE 0.104) and round 3's edge
rasterizer (75% of pixels flipped) and refit both shipped through a
green CPU suite. The fixes route small contractions through explicit
VPU fma math (utils.layout.mat_rows3) or set precision=HIGHEST where
the MXU is intended (rt/dense.py attribute select).

This test greps the package for new matmul sites so a reviewer must
either use mat_rows3 / an explicit precision, or extend the allowlist
CONSCIOUSLY. Host-side numpy code (golden/, app/camera.py,
utils/mathutils.py) is exempt — numpy matmuls are exact f32.
"""

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "vkrt_tpu"

# device-code files where a matmul-ish pattern is EXPECTED, with the
# required guard on the same statement
ALLOWED = {
    # the deliberate MXU attribute select — precision=HIGHEST two lines on
    "rt/dense.py": ["jax.lax.dot_general"],
    # host-side numpy matmul in Renderer._full_rebuild (mc = np.asarray(m)
    # — numpy is exact f32, never traced)
    "wavefront/engine.py": ["self._aabb_corners @"],
}

# host-side numpy modules (never traced/jitted)
HOST_ONLY = {"golden", "app/camera.py", "utils/mathutils.py",
             "scene", "native"}

PATTERNS = [
    (re.compile(r"\bjnp\.einsum\s*\("), "jnp.einsum"),
    (re.compile(r"\bjnp\.(dot|matmul|tensordot)\s*\("), "jnp.dot/matmul"),
    (re.compile(r"\bjax\.lax\.dot(_general)?\s*\("), "lax.dot_general"),
    # Pallas in-kernel matmul (MXU; same bf16 default inside Mosaic)
    (re.compile(r"\bpl\.dot\s*\("), "pl.dot"),
    # `x @ y` matmul operator (exclude decorators and comment mentions)
    (re.compile(r"^[^#@]*\S\s@\s"), "@ operator"),
]


def _host_only(rel: str) -> bool:
    return any(rel == h or rel.startswith(h + "/") for h in HOST_ONLY)


def test_no_unguarded_device_matmuls():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        rel = path.relative_to(PKG).as_posix()
        if _host_only(rel):
            continue
        text = path.read_text()
        lines = text.splitlines()
        for i, line in enumerate(lines):
            stripped = line.split("#", 1)[0]
            if not stripped.strip():
                continue
            for pat, name in PATTERNS:
                if not pat.search(stripped):
                    continue
                allowed = any(tok in stripped
                              for tok in ALLOWED.get(rel, []))
                # a precision=... argument within the next 6 lines of the
                # call counts as guarded
                ctx = "\n".join(lines[i:i + 6])
                guarded = ("precision=" in ctx
                           or "mat_rows3" in stripped)
                if not (allowed or guarded):
                    offenders.append(f"{rel}:{i + 1}: {name}: "
                                     f"{line.strip()[:90]}")
    assert not offenders, (
        "unguarded matmul-class ops in device code (bf16-default MXU on "
        "TPU — use utils.layout.mat_rows3 or precision=HIGHEST, or extend "
        "the allowlist consciously):\n" + "\n".join(offenders))
