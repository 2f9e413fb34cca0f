"""Polarized (Mueller-matrix) BSDF evaluation.

TPU-native equivalent of the ``si.to_world_mueller``-wrapped polarized BSDF
evaluations in the reference (/root/reference/mitransient/integrators/
transientpath.py:210,227) and the Mueller Fresnel of the gold-GGX scenes
(/root/reference/examples/polarization).

Factorization: every scalar BSDF value f (already containing the unpolarized
Fresnel average) is lifted to a Mueller matrix ``M = f * P`` where ``P`` is
the *normalized polarization factor* with ``P[0,0] ~= 1``:

* conductor / rough conductor: ``P = M_fresnel / F_unpol`` built from the
  complex-IOR specular-reflection Mueller matrix in the s/p basis, rotated
  into the canonical Stokes bases of the world propagation directions
  (mueller.rotate_mueller_basis — the to_world_mueller step);
* diffuse: ideal depolarizer;
* dielectric reflection: real-IOR specular Mueller; transmission:
  depolarizer (approximation, noted);
* null: identity (polarization passes through unchanged).

Conventions: propagation directions of LIGHT.  At a vertex with camera-ray
direction ``d`` and light direction ``wo_world`` (pointing from the surface
toward the light / next vertex), light propagates in along ``-wo_world`` and
out along ``-d``; Stokes bases are the canonical ``stokes_basis`` of those
world vectors, which makes consecutive vertices' bases agree along shared
segments and composes as beta' = beta @ M (camera-first chain).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import cross, dot, normalize
from ..core.mueller import (
    rotate_mueller_product,
    rotate_stokes_basis,
    specular_reflection_mueller,
    stokes_basis,
)
from ..scene.scene import (
    BSDF_CONDUCTOR,
    BSDF_DIELECTRIC,
    BSDF_DIFFUSE,
    BSDF_NULL,
    BSDF_ROUGH_CONDUCTOR,
)
from .api import LaneBSDF
from .fresnel import fresnel_conductor


def _depolarizer_P(n, C):
    P = jnp.zeros((n, 4, 4, C), jnp.float32)
    return P.at[:, 0, 0, :].set(1.0)


def _identity_P(n, C):
    eye = jnp.eye(4, dtype=jnp.float32)[None, :, :, None]
    return jnp.broadcast_to(eye, (n, 4, 4, C))


def polarization_factor(
    lb: LaneBSDF,
    p_in: jnp.ndarray,  # (N, 3) light propagation INTO the surface (world)
    p_out: jnp.ndarray,  # (N, 3) light propagation OUT (toward camera side)
    cos_theta_i: jnp.ndarray,  # (N,) incidence cosine for the Fresnel term
    transmitted: jnp.ndarray | None = None,  # (N,) bool — dielectric refract
) -> jnp.ndarray:
    """Normalized Mueller polarization factor P (N, 4, 4, C).

    Kinds statically absent from the scene (``lb.ks``) skip their Mueller
    construction at trace time (same scene-specialization as bsdf/api.py)."""
    n = p_in.shape[0]
    C = lb.reflectance.shape[-1]
    ks = lb.ks
    has_cond = ks.has(BSDF_CONDUCTOR) or ks.has(BSDF_ROUGH_CONDUCTOR)
    has_diel = ks.has(BSDF_DIELECTRIC)
    has_null = ks.has(BSDF_NULL)

    ci = jnp.clip(jnp.abs(cos_theta_i), 1e-4, 1.0)

    if has_cond or has_diel:
        # rotate from canonical bases into the s/p basis and back:
        # basis perpendicular to the plane of incidence
        sp = cross(p_in, p_out)
        sp_len = jnp.sqrt(jnp.maximum(jnp.sum(sp * sp, axis=-1), 1e-20))
        degenerate = sp_len < 1e-6
        s_axis = jnp.where(
            degenerate[:, None], stokes_basis(p_in), sp / sp_len[:, None]
        )
        r_in = rotate_stokes_basis(p_in, stokes_basis(p_in), s_axis)
        r_out = rotate_stokes_basis(p_out, s_axis, stokes_basis(p_out))

    if has_cond:
        # specular s/p-basis Mueller for complex IOR, normalized by F_unpol
        Ms = []
        for c in range(C):
            M = specular_reflection_mueller(ci, lb.eta_re[:, c],
                                            lb.eta_im[:, c])
            F = jnp.maximum(M[..., 0, 0], 1e-12)
            Ms.append(M / F[..., None, None])
        M_spec = jnp.stack(Ms, axis=-1)  # (N, 4, 4, C)
        M_spec = rotate_mueller_product(r_out, M_spec, r_in)

    if has_diel:
        # dielectric: real-IOR reflection Mueller; transmission ~ depolarizer
        eta_d = jnp.stack([lb.eta_ratio] * C, axis=-1)
        Md = []
        for c in range(C):
            M = specular_reflection_mueller(ci, eta_d[:, c],
                                            jnp.zeros_like(eta_d[:, c]))
            F = jnp.maximum(M[..., 0, 0], 1e-12)
            Md.append(M / F[..., None, None])
        M_diel = jnp.stack(Md, axis=-1)
        M_diel = rotate_mueller_product(r_out, M_diel, r_in)
        if transmitted is not None:
            M_diel = jnp.where(
                transmitted[:, None, None, None], _depolarizer_P(n, C),
                M_diel
            )

    P = _depolarizer_P(n, C)  # diffuse / rough-plastic default
    k = lb.kind[:, None, None, None]
    if has_cond:
        P = jnp.where(
            (k == BSDF_CONDUCTOR) | (k == BSDF_ROUGH_CONDUCTOR), M_spec, P)
    if has_diel:
        P = jnp.where(k == BSDF_DIELECTRIC, M_diel, P)
    if has_null:
        P = jnp.where(k == BSDF_NULL, _identity_P(n, C), P)
    return P


def sensor_alignment_mueller(ray_d: jnp.ndarray,
                             vertical: jnp.ndarray) -> jnp.ndarray:
    """beta_init (reference utils.py:9-21): rotate the Stokes basis of the
    light arriving at the sensor (propagation -ray.d) from the canonical
    basis to the camera's horizontal axis (cross(d, vertical))."""
    w = -ray_d
    current = stokes_basis(w)
    target = normalize(cross(ray_d, jnp.broadcast_to(vertical, ray_d.shape)))
    return rotate_stokes_basis(w, current, target)  # (N, 4, 4)
