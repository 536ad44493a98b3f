"""Vector math + sampling primitives (batched, differentiable-safe).

Re-derives the device math of the reference's lib/ (onb.cuh, sampling.cuh,
raydata.cuh:167-171) as pure vectorized JAX.  All functions operate on [N, 3]
batches.  Two deliberate divergences (SURVEY §7.4):

- quirk 4: `cosine_direction` uses the *correct* cosine-hemisphere formula
  (x = cos(phi)*sqrt(r2)) instead of the reference's book-v1 non-unit variant
  (sampling.cuh:49-60, x = cos(phi)*2*sqrt(r2)).
- rejection-free sphere sampling: the reference's `randomInUnitSphere`
  (sampling.cuh:25-34) loops until accept, which is unbounded work per lane;
  we draw exactly (z, phi, r) and map — identical distribution, fixed cost,
  which is what the lockstep VPU wants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

PI = np.float32(np.pi)
INV_PI = np.float32(1.0 / np.pi)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length(a):
    # clamped away from 0 so reverse-mode through |a| at a=0 (e.g. the
    # zeroed normals of miss lanes) stays finite
    return jnp.sqrt(jnp.maximum(dot(a, a), 1e-30))


def safe_sqrt(x, eps=1e-20):
    # clamped at eps (not 0) so reverse-mode never sees sqrt'(0)=inf; for
    # x < eps the maximum's zero-gradient kills the chain entirely.
    return jnp.sqrt(jnp.maximum(x, eps))


def normalize(a, eps=1e-20):
    return a / jnp.maximum(length(a), eps)[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def reflect(d, n):
    """Mirror reflection; expects unit inputs (matches sutil reflect)."""
    return d - 2.0 * dot(d, n)[..., None] * n


def power_heuristic(a, b):
    """MIS power heuristic, beta=2 (raydata.cuh:167-171)."""
    t = a * a
    return t / jnp.maximum(t + b * b, 1e-20)


def build_onb(n):
    """Orthonormal basis from (unit) normal w; mirrors onb.cuh:20-32.

    Returns (u, v, w) with w = normalize(n).
    """
    w = normalize(n)
    wx = w[..., 0]
    a = jnp.where(
        (jnp.abs(wx) > 0.9)[..., None],
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    v = normalize(jnp.cross(w, a))
    u = jnp.cross(w, v)
    return u, v, w


def onb_local(u, v, w, a):
    """a.x*u + a.y*v + a.z*w (onb.cuh:12-18)."""
    return (a[..., 0:1] * u) + (a[..., 1:2] * v) + (a[..., 2:3] * w)


def cosine_direction(u1, u2):
    """Cosine-weighted hemisphere direction in ONB-local coords; pdf = z/pi."""
    phi = 2.0 * PI * u1
    sr2 = safe_sqrt(u2)
    x = jnp.cos(phi) * sr2
    y = jnp.sin(phi) * sr2
    z = safe_sqrt(1.0 - u2)
    return jnp.stack([x, y, z], axis=-1)


def unit_disk(u1, u2):
    """Concentric-free polar disk sample; matches random_in_unit_disk
    (sampling.cuh:15-22): a = u1*2pi, (sin a, cos a) * sqrt(u2)."""
    a = u1 * 2.0 * PI
    r = safe_sqrt(u2)
    return jnp.stack([jnp.sin(a) * r, jnp.cos(a) * r], axis=-1)


def sphere_surface(u1, u2):
    """Uniform direction on the unit sphere."""
    z = 1.0 - 2.0 * u1
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def unit_ball(u1, u2, u3):
    """Uniform point in the unit ball (replaces rejection sampling)."""
    d = sphere_surface(u1, u2)
    return d * jnp.cbrt(jnp.maximum(u3, 1e-30))[..., None]


def fresnel_schlick(cos_theta_i, eta_i, eta_t):
    """Schlick reflectance (dielectricMaterial.cu:21-27)."""
    r0 = (eta_i - eta_t) / (eta_i + eta_t)
    r0 = r0 * r0
    m = jnp.clip(1.0 - cos_theta_i, 0.0, 1.0)
    return r0 + (1.0 - r0) * (m ** 5)


def where3(mask, a, b):
    """Select [N,3] rows by a [N] mask."""
    return jnp.where(mask[..., None], a, b)


def offset_point(point, normal, out_dir, eps=1e-4):
    """Scale-aware self-intersection offset: nudge a hit point along the
    geometric normal toward the side the outgoing ray leaves on.

    The reference relies on tiny absolute epsilons (tmin=1e-6 raygen.cu:46,
    shadow 5e-5 closehit.cu:100) which are smaller than fp32 hit-point error
    on large geometry (a radius-1000 sphere carries ~1e-4 absolute error) —
    producing shadow acne that its denoiser hides.  We offset by
    eps * max(1, |p|) instead, the standard robust construction."""
    scale = eps * jnp.maximum(1.0, jnp.max(jnp.abs(point), axis=-1))
    side = jnp.sign(dot(normal, out_dir))
    return point + (scale * side)[..., None] * normal
