"""Sample-warping routines (square -> hemisphere/disk/...), SoA jnp.

Equivalent of Mitsuba's ``mi.warp`` used by BSDF/emitter sampling throughout
the reference stack.  All functions take uniform samples in ``[0,1)^2`` with
shape ``(..., 2)`` and are shape-polymorphic.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import safe_sqrt

TWO_PI = 2.0 * jnp.pi
INV_PI = 1.0 / jnp.pi


def square_to_uniform_disk_concentric(sample: jnp.ndarray) -> jnp.ndarray:
    """Shirley–Chiu concentric disk mapping (low-distortion)."""
    x = 2.0 * sample[..., 0] - 1.0
    y = 2.0 * sample[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quad1 = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(quad1, x, y)
    safe_x = jnp.where(is_zero, 1.0, x)
    safe_y = jnp.where(is_zero, 1.0, y)
    phi = jnp.where(
        quad1,
        (jnp.pi / 4.0) * (safe_y / safe_x),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (safe_x / safe_y),
    )
    phi = jnp.where(is_zero, 0.0, phi)
    r = jnp.where(is_zero, 0.0, r)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_cosine_hemisphere(sample: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere (+z) sample; pdf = cos(theta)/pi."""
    p = square_to_uniform_disk_concentric(sample)
    z = safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(v[..., 2], 0.0) * INV_PI


def square_to_uniform_sphere(sample: jnp.ndarray) -> jnp.ndarray:
    z = 1.0 - 2.0 * sample[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = TWO_PI * sample[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf() -> float:
    return 1.0 / (4.0 * jnp.pi)


def square_to_uniform_hemisphere(sample: jnp.ndarray) -> jnp.ndarray:
    z = sample[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = TWO_PI * sample[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_hg(sample: jnp.ndarray, g: jnp.ndarray):
    """Henyey–Greenstein phase direction about +z; returns (dir, pdf).

    Used by the volumetric integrator (cf. reference
    mitransient/integrators/transient_prbvolpath.py HG phase sampling).
    """
    g = jnp.broadcast_to(g, sample[..., 0].shape)
    small = jnp.abs(g) < 1e-3
    g_safe = jnp.where(small, 0.5, g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * sample[..., 1])
    cos_theta_hg = (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    cos_theta = jnp.where(small, 1.0 - 2.0 * sample[..., 1], cos_theta_hg)
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = TWO_PI * sample[..., 0]
    d = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    return d, hg_pdf(cos_theta, g)


def hg_pdf(cos_theta: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Henyey–Greenstein phase value/pdf, FORWARD convention: ``cos_theta``
    is measured from the propagation direction (g > 0 peaks at
    cos_theta = +1).  Matches ``square_to_hg``'s sample distribution and
    Mitsuba's ``eval_pdf`` (whose ``dot(wi, wo)`` equals -cos_theta here —
    its +2g flips to -2g under that substitution).  Round-3 fix: this
    previously used +2g, i.e. the mirror-image phase, under-weighting
    forward NEE by (1-g)^3/(1+g)^3 at grazing alignment — caught by the
    volumetric single-scatter oracle (tests/test_oracle_vol.py)."""
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return (1.0 / (4.0 * jnp.pi)) * (1.0 - g * g) / jnp.maximum(
        denom * safe_sqrt(denom), 1e-12
    )
