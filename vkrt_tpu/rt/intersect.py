"""Ray-triangle intersection (Möller–Trumbore, no culling).

The device analogue of what the GPU's RT cores do inside
`vkCmdTraceRaysKHR` (ref: src/Raytracer.cpp:157). The reference sets no
cull flags (shaders/shader.rgen:52, gl_RayFlagsOpaqueEXT only), so both
triangle faces hit. Degenerate (zero-area) triangles — used as padding by
the synthetic scene — are rejected by the determinant guard, matching how
driver BVH builders drop them.
"""

from __future__ import annotations

import jax.numpy as jnp

DET_EPS = 1e-12


def moller_trumbore(o, d, v0, e1, e2, tmin, tmax):
    """Vectorized over leading dims. Returns (t, u, v, valid)."""
    h = jnp.cross(d, e2)
    det = jnp.sum(e1 * h, axis=-1)
    safe_det = jnp.where(det == 0, 1.0, det)
    inv_det = jnp.where(jnp.abs(det) > DET_EPS, 1.0 / safe_det, 0.0)
    s = o - v0
    u = jnp.sum(s * h, axis=-1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(d * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    valid = ((jnp.abs(det) > DET_EPS) & (u >= 0) & (v >= 0) & (u + v <= 1)
             & (t > tmin) & (t < tmax))
    return t, u, v, valid


def safe_inv_dir(d):
    """Reciprocal direction without inf/NaN for axis-parallel rays."""
    tiny = 1e-20
    safe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    return 1.0 / safe


def slab_test(bmin, bmax, o, inv_d, tmin, tmax):
    """Ray-AABB test. Returns (t_entry, hit)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    entry = jnp.maximum(tn, tmin)
    hit = (tn <= tf) & (tf >= tmin) & (tn <= tmax)
    return entry, hit
