"""Orthonormal shading frames over SoA arrays.

Equivalent of Mitsuba's ``Frame3f`` (used implicitly by every
``si.to_local``/``si.to_world`` call in the reference integrators, e.g.
/root/reference/mitransient/integrators/transientpath.py:207,231).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .math import dot, normalize


def coordinate_system(n: jnp.ndarray):
    """Duff et al. 2017 branchless ONB from a unit normal ``(..., 3)``.

    Returns tangent ``s`` and bitangent ``t`` with ``cross(s, t) = n``.
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return s, t


class Frame(NamedTuple):
    """SoA orthonormal frame; ``n`` is the +z axis (shading normal)."""

    s: jnp.ndarray  # (..., 3)
    t: jnp.ndarray  # (..., 3)
    n: jnp.ndarray  # (..., 3)

    @staticmethod
    def from_normal(n: jnp.ndarray) -> "Frame":
        n = normalize(n)
        s, t = coordinate_system(n)
        return Frame(s, t, n)

    def to_local(self, v: jnp.ndarray) -> jnp.ndarray:
        return jnp.stack([dot(v, self.s), dot(v, self.t), dot(v, self.n)], axis=-1)

    def to_world(self, v: jnp.ndarray) -> jnp.ndarray:
        return (
            self.s * v[..., 0:1] + self.t * v[..., 1:2] + self.n * v[..., 2:3]
        )


def cos_theta(v: jnp.ndarray) -> jnp.ndarray:
    """z component of a local-frame direction (cosine with the normal)."""
    return v[..., 2]
