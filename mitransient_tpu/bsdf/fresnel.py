"""Fresnel terms (unpolarized scalar path; polarized Mueller variants live in
core/mueller.py).  Replaces Mitsuba's fresnel.h used by the conductor /
dielectric BSDFs exercised by the reference scenes (gold GGX wall in
/root/reference/examples/polarization, cbox_mirror.xml)."""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import safe_sqrt, stable_sqrt


def fresnel_conductor(cos_theta_i: jnp.ndarray, eta_re: jnp.ndarray,
                      eta_im: jnp.ndarray) -> jnp.ndarray:
    """Unpolarized reflectance for a conductor with complex IOR.

    ``cos_theta_i``: (N,) (>=0); eta_*: (N, C), or (N,) for squeezed mono
    tables (integrators carry C == 1 state as (N,) — see
    integrators/path_regen.py "Mono squeeze").  Returns eta's shape.
    """
    ci = jnp.clip(cos_theta_i, 0.0, 1.0)
    if eta_re.ndim > ci.ndim:
        ci = ci[..., None]
    ci2 = ci * ci
    si2 = 1.0 - ci2
    eta2 = eta_re * eta_re - eta_im * eta_im
    etak2 = 2.0 * eta_re * eta_im

    t0 = eta2 - si2
    # stable_sqrt: on lanes whose BSDF row is a non-conductor (eta = k = 0,
    # evaluated anyway by the dense kind dispatch) both sqrt arguments hit 0
    # exactly and sqrt's infinite VJP would poison masked gradients
    a2b2 = stable_sqrt(t0 * t0 + etak2 * etak2)
    t1 = a2b2 + ci2
    a = stable_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = ci2 * a2b2 + si2 * si2
    t4 = t2 * si2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def fresnel_dielectric(cos_theta_i: jnp.ndarray, eta: jnp.ndarray):
    """Signed-cosine dielectric Fresnel (Mitsuba ``fresnel()`` semantics).

    Args: cos_theta_i (N,) signed; eta (N,) ratio int/ext (>0).
    Returns (F, cos_theta_t, eta_it, eta_ti): reflectance, signed transmitted
    cosine, relative IOR along transmission and its inverse.
    """
    outside = cos_theta_i >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = 1.0 / eta_it

    ci = jnp.abs(cos_theta_i)
    st2 = jnp.maximum(1.0 - ci * ci, 0.0) * (eta_ti * eta_ti)
    tir = st2 >= 1.0
    ct = stable_sqrt(1.0 - st2)  # finite VJP at the TIR boundary

    rs = (ci - eta_it * ct) / jnp.maximum(ci + eta_it * ct, 1e-20)
    rp = (eta_it * ci - ct) / jnp.maximum(eta_it * ci + ct, 1e-20)
    F = jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    cos_theta_t = jnp.where(outside, -ct, ct)
    return F, cos_theta_t, eta_it, eta_ti
