"""Hit shading — vectorized port of the closest-hit shader contract.

Implements shaders/shader.rchit:86-172 over ray batches: barycentric
attribute interpolation, TBN normal mapping (tangent.w handedness unused —
quirk preserved, shader.rchit:78-84), the 4-light diffuse loop with
10/d² falloff and hard-shadow multiplier 0.3, 0.1 unattenuated ambient,
and the metallic-reflection rule (blue channel > 0.1 → reflectAmount =
0.5·metallic, attenuation updated BEFORE hitValue is scaled).

Intentional deviation, documented: zero-length vectors safe-normalize
(GLSL normalize(0) is undefined; one Sponza primitive lacks tangents).
"""

from __future__ import annotations

import jax.numpy as jnp

from vkrt_tpu import config as C


def safe_normalize(v, axis=-1):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, 1e-20)


def interpolate(attrs, u, v):
    """Split the kernel's per-corner attr block [N,36] and interpolate.

    Column layout mirrors the cluster slab rows (accel/clusters.py):
    0-2 v0, 3-5 e1, 6-8 e2, 9-11 n0, 12-14 n1, 15-17 n2, 18-19 uv0,
    20-21 uv1, 22-23 uv2, 24-26 t0, 27-29 t1, 30-32 t2, 33-35 material
    image ids (base, metallic-roughness, normal).

    Returns (position, normal, uv, tangent, mat_ids). Position is the
    barycentric reconstruction v0 + u·e1 + v·e2 ≡ w·p0 + u·p1 + v·p2 —
    exactly the interpolation the reference shader performs
    (shader.rchit:94-103) rather than origin + t·dir.
    """
    w = (1.0 - u - v)[:, None]
    uu = u[:, None]
    vv = v[:, None]
    position = attrs[:, 0:3] + uu * attrs[:, 3:6] + vv * attrs[:, 6:9]
    normal = attrs[:, 9:12] * w + attrs[:, 12:15] * uu + attrs[:, 15:18] * vv
    uv = attrs[:, 18:20] * w + attrs[:, 20:22] * uu + attrs[:, 22:24] * vv
    tangent = attrs[:, 24:27] * w + attrs[:, 27:30] * uu + attrs[:, 30:33] * vv
    mat_ids = attrs[:, 33:36].astype(jnp.int32)
    return position, normal, uv, tangent, mat_ids


def perturbed_normal(world_normal, tangent, map_normal):
    """TBN normal mapping (ref: shader.rchit:78-84,105-108)."""
    n = safe_normalize(world_normal)
    t = safe_normalize(tangent)
    b = jnp.cross(t, n)
    m = safe_normalize(map_normal * 2.0 - 1.0)
    return safe_normalize(t * m[:, 0:1] + b * m[:, 1:2] + n * m[:, 2:3])


def light_geometry(position, light_pos):
    """Per-light direction/distance/power (ref: shader.rchit:121-126)."""
    lvec = light_pos[None, :] - position
    ldist = jnp.linalg.norm(lvec, axis=1)
    ldir = lvec / jnp.maximum(ldist[:, None], 1e-20)
    power = C.LIGHT_INTENSITY / jnp.maximum(ldist * ldist, 1e-20)
    return ldir, ldist, power


def reflect(d, n):
    """GLSL reflect (ref: shader.rchit:170)."""
    return d - 2.0 * jnp.sum(d * n, axis=1, keepdims=True) * n
