"""Small vector-math helpers over SoA ``(..., 3)`` jnp arrays.

The reference stack keeps vectors as Dr.Jit ``Point3f``/``Vector3f`` wide
arrays; on TPU we represent a wavefront of N rays as dense ``(N, 3)`` float32
arrays so every op maps straight onto the VPU with no AoS/SoA conversion.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6
INF = jnp.inf


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis -> shape ``(...)``."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def squared_norm(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    n = norm(a)
    return a / jnp.maximum(n, 1e-20)[..., None]


def safe_rcp(x: jnp.ndarray) -> jnp.ndarray:
    """Reciprocal that returns 0 where ``x == 0`` (Dr.Jit's masked ``dr.rcp``
    idiom used e.g. in the reference russian roulette,
    mitransient/integrators/transientpath.py:255)."""
    return jnp.where(x != 0.0, 1.0 / jnp.where(x != 0.0, x, 1.0), 0.0)


def safe_div(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a / b`` with 0 where ``b == 0`` (broadcasts)."""
    bz = b == 0.0
    return jnp.where(bz, 0.0, a / jnp.where(bz, 1.0, b))


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def lerp(a, b, t):
    return a + (b - a) * t


def mis_weight(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Power heuristic (beta=2) multiple importance sampling weight.

    Mirrors ``mitsuba.ad.integrators.common.mis_weight`` as consumed by the
    reference (mitransient/integrators/transientpath.py:6,168-171): returns
    ``pdf_a^2 / (pdf_a^2 + pdf_b^2)`` and 0 when ``pdf_a == 0``.
    """
    a2 = pdf_a * pdf_a
    w = safe_div(a2, a2 + pdf_b * pdf_b)
    return jnp.where(jnp.isfinite(w), w, 0.0)
