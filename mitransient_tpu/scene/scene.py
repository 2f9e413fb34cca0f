"""Compiled scene representation + device-side scene queries.

This module is the TPU-native stand-in for the Mitsuba ``mi.Scene`` API
surface the reference consumes (SURVEY.md section 2.2): ``ray_intersect``,
``ray_test``, ``sample_emitter_direction``, ``pdf_emitter_direction``,
``eval_emitter_direction`` plus emitter evaluation at surface hits.

Everything the device touches lives in :class:`SceneData` — a pytree of flat
SoA arrays (triangle soup, BSDF parameter table, emitter table).  It threads
through ``jit`` / ``grad`` / ``shard_map`` unchanged, and differentiating the
render w.r.t. its leaves (albedos, emitter radiance) is what gives parameter
gradients.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.frame import Frame
from ..core.math import dot, normalize, safe_div
from ..core.records import DirectionSample, Ray, SurfaceInteraction
from ..ops.intersect import intersect as _intersect_q, ray_test as _ray_test_q

# BSDF kind codes (see bsdf/ modules)
BSDF_DIFFUSE = 0
BSDF_CONDUCTOR = 1
BSDF_ROUGH_CONDUCTOR = 2
BSDF_DIELECTRIC = 3
BSDF_NULL = 4

# Emitter kind codes
EM_AREA = 0
EM_PROJECTOR = 1
EM_ANGULAR_AREA = 2
EM_POINT = 3


class Triangles(NamedTuple):
    v0: jnp.ndarray  # (M, 3)
    e1: jnp.ndarray  # (M, 3) v1 - v0
    e2: jnp.ndarray  # (M, 3) v2 - v0
    ng: jnp.ndarray  # (M, 3) unit geometric normal
    uv0: jnp.ndarray  # (M, 2)
    uv_e1: jnp.ndarray  # (M, 2)
    uv_e2: jnp.ndarray  # (M, 2)
    area: jnp.ndarray  # (M,)
    shape_id: jnp.ndarray  # (M,) int32
    bsdf_id: jnp.ndarray  # (M,) int32
    emitter_id: jnp.ndarray  # (M,) int32, -1 = none


class BSDFParams(NamedTuple):
    kind: jnp.ndarray  # (B,) int32
    two_sided: jnp.ndarray  # (B,) bool
    reflectance: jnp.ndarray  # (B, C) diffuse albedo / specular tint
    eta_re: jnp.ndarray  # (B, C) conductor IOR (real)
    eta_im: jnp.ndarray  # (B, C) conductor IOR (imag); 0 => ideal mirror
    alpha: jnp.ndarray  # (B,) GGX roughness
    eta_ratio: jnp.ndarray  # (B,) dielectric int_ior/ext_ior


class EmitterParams(NamedTuple):
    kind: jnp.ndarray  # (E,) int32
    radiance: jnp.ndarray  # (E, C) area/angulararea radiance; projector irradiance
    position: jnp.ndarray  # (E, 3) delta emitters
    direction: jnp.ndarray  # (E, 3) projector +z axis
    frame_s: jnp.ndarray  # (E, 3) projector x axis
    frame_t: jnp.ndarray  # (E, 3) projector y axis
    tan_half_fov: jnp.ndarray  # (E,)
    cos_beam: jnp.ndarray  # (E,) angulararea full-intensity cone
    cos_cutoff: jnp.ndarray  # (E,) angulararea cutoff cone
    area: jnp.ndarray  # (E,) total shape surface area (area emitters)
    tri_start: jnp.ndarray  # (E,) int32 range into em_tri_* below
    tri_count: jnp.ndarray  # (E,) int32
    em_tri_idx: jnp.ndarray  # (K,) int32 triangle-soup index
    em_tri_cdf: jnp.ndarray  # (K,) float32 CDF within each emitter's range


class SceneData(NamedTuple):
    tri: Triangles
    bsdf: BSDFParams
    emitter: EmitterParams


# --------------------------------------------------------------------------
# Device-side queries
# --------------------------------------------------------------------------

def ray_intersect(sd: SceneData, ray: Ray, active: jnp.ndarray) -> SurfaceInteraction:
    """Closest hit + shading record.  Equivalent of ``mi.Scene.ray_intersect``
    (used at transientpath.py:149)."""
    t, prim, u, v = _intersect_q(
        sd.tri.v0, sd.tri.e1, sd.tri.e2, ray.o, ray.d, ray.maxt, active
    )
    valid = prim >= 0
    prim_c = jnp.maximum(prim, 0)
    p = ray.o + ray.d * jnp.where(valid, t, 0.0)[:, None]
    ng = sd.tri.ng[prim_c]
    uv = (
        sd.tri.uv0[prim_c]
        + sd.tri.uv_e1[prim_c] * u[:, None]
        + sd.tri.uv_e2[prim_c] * v[:, None]
    )
    # Shading normal == geometric normal (flat shading); orient the *shading
    # frame* toward the incident side like Mitsuba does for two-sided BSDFs at
    # the BSDF level, but keep ng fixed for consistent emitter sidedness.
    frame = Frame.from_normal(ng)
    wi = frame.to_local(-ray.d)
    return SurfaceInteraction(
        valid=valid,
        t=jnp.where(valid, t, jnp.inf),
        p=p,
        n=ng,
        frame=frame,
        uv=uv,
        wi=wi,
        prim=jnp.where(valid, prim, -1),
        shape_id=jnp.where(valid, sd.tri.shape_id[prim_c], -1),
        bsdf_id=jnp.where(valid, sd.tri.bsdf_id[prim_c], -1),
        emitter_id=jnp.where(valid, sd.tri.emitter_id[prim_c], -1),
    )


def ray_test(sd: SceneData, o: jnp.ndarray, d_unit: jnp.ndarray, dist: jnp.ndarray,
             active: jnp.ndarray) -> jnp.ndarray:
    """Occlusion query between ``o`` and ``o + d_unit * dist`` (shadow ray),
    with epsilon shortening at both ends; cf. ``mi.Scene.ray_test``."""
    maxt = dist * (1.0 - 1e-3)
    return _ray_test_q(sd.tri.v0, sd.tri.e1, sd.tri.e2, o, d_unit, maxt, active)


# ---- emitters -------------------------------------------------------------

def _sample_emitter_triangle(sd: SceneData, em_idx: jnp.ndarray, u: jnp.ndarray):
    """Pick a triangle of emitter ``em_idx`` area-proportionally via the
    per-emitter CDF segment; returns (soup tri index, rescaled u)."""
    start = sd.emitter.tri_start[em_idx]
    count = sd.emitter.tri_count[em_idx]
    k_total = sd.emitter.em_tri_idx.shape[0]
    steps = max(1, int(np.ceil(np.log2(max(k_total, 2)))))
    lo = start
    hi = start + count - 1
    for _ in range(steps):
        mid = (lo + hi) // 2
        c = sd.emitter.em_tri_cdf[mid]
        go_right = u > c
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    slot = jnp.clip(lo, start, start + count - 1)
    tri = sd.emitter.em_tri_idx[slot]
    cdf_hi = sd.emitter.em_tri_cdf[slot]
    cdf_lo = jnp.where(slot > start, sd.emitter.em_tri_cdf[jnp.maximum(slot - 1, 0)], 0.0)
    pmf = jnp.maximum(cdf_hi - cdf_lo, 1e-30)
    u2 = jnp.clip((u - cdf_lo) / pmf, 0.0, 1.0 - 1e-7)
    return tri, u2


def _uniform_triangle_point(sd: SceneData, tri: jnp.ndarray, u1: jnp.ndarray,
                            u2: jnp.ndarray):
    """Uniform barycentric sample of soup triangle ``tri``."""
    su = jnp.sqrt(jnp.maximum(u1, 0.0))
    b1 = 1.0 - su
    b2 = u2 * su
    p = sd.tri.v0[tri] + sd.tri.e1[tri] * b1[:, None] + sd.tri.e2[tri] * b2[:, None]
    return p, sd.tri.ng[tri]


def sample_emitter_direction(
    sd: SceneData,
    ref_p: jnp.ndarray,
    sample2: jnp.ndarray,
    test_visibility: bool,
    active: jnp.ndarray,
):
    """Next-event estimation sample; mirror of
    ``mi.Scene.sample_emitter_direction`` (transientpath.py:192).

    Returns (DirectionSample, em_weight (N, C)).  ``em_weight`` =
    emitter_radiance / pdf with visibility applied; pdf includes the uniform
    1/E emitter-selection probability.
    """
    E = sd.emitter.kind.shape[0]
    n = ref_p.shape[0]
    if E == 0:
        zero = jnp.zeros((n,), jnp.float32)
        ds = DirectionSample(
            p=jnp.zeros((n, 3)), n=jnp.zeros((n, 3)), d=jnp.zeros((n, 3)),
            dist=zero, pdf=zero, delta=jnp.zeros((n,), bool),
            emitter_id=jnp.full((n,), -1, jnp.int32),
        )
        return ds, jnp.zeros((n, sd.emitter.radiance.shape[-1]))

    u_sel = sample2[:, 0]
    em_idx = jnp.minimum((u_sel * E).astype(jnp.int32), E - 1)
    u0 = jnp.clip(u_sel * E - em_idx.astype(jnp.float32), 0.0, 1.0 - 1e-7)
    sel_pdf = 1.0 / E

    kind = sd.emitter.kind[em_idx]
    is_delta = kind == EM_PROJECTOR

    # --- area-like emitters: sample a point on the shape ------------------
    tri, u0b = _sample_emitter_triangle(sd, em_idx, u0)
    p_area, n_area = _uniform_triangle_point(sd, tri, u0b, sample2[:, 1])
    area = jnp.maximum(sd.emitter.area[em_idx], 1e-30)

    # --- delta emitters: fixed position ------------------------------------
    p = jnp.where(is_delta[:, None], sd.emitter.position[em_idx], p_area)
    n_em = jnp.where(is_delta[:, None], -sd.emitter.direction[em_idx], n_area)

    d_vec = p - ref_p
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d_vec * d_vec, axis=-1), 1e-20))
    d = d_vec / dist[:, None]

    cos_em = dot(n_em, -d)

    # pdf (solid angle at ref): area emitters dist^2/(cos*A); delta: 1
    pdf_area_sa = safe_div(dist * dist, jnp.maximum(cos_em, 0.0) * area)
    pdf = jnp.where(is_delta, 1.0, pdf_area_sa) * sel_pdf

    # emitted radiance toward ref
    spec = emitter_eval_direction(sd, em_idx, p, n_em, d, dist, cos_em)

    valid = active & (pdf > 0.0) & (jnp.sum(jnp.abs(spec), axis=-1) > 0.0)
    if test_visibility:
        o = ref_p + d * 1e-4  # offset along connection dir
        occluded = ray_test(sd, o, d, dist - 2e-4, valid)
        valid = valid & ~occluded

    weight = jnp.where(valid[:, None], safe_div(spec, pdf[:, None]), 0.0)
    ds = DirectionSample(
        p=p, n=n_em, d=d, dist=dist,
        pdf=jnp.where(valid, pdf, 0.0),
        delta=is_delta,
        emitter_id=jnp.where(valid, em_idx, -1),
    )
    return ds, weight


def emitter_eval_direction(sd: SceneData, em_idx, p, n_em, d, dist, cos_em):
    """Radiance leaving emitter point ``p`` toward ``-d``... i.e. toward the
    reference point (direction of travel is ``-d`` from the emitter's view).
    For projector emitters this returns irradiance/dist^2-style intensity."""
    kind = sd.emitter.kind[em_idx]
    rad = sd.emitter.radiance[em_idx]
    front = cos_em > 0.0

    # area: constant radiance from the front side
    val_area = jnp.where(front[:, None], rad, 0.0)

    # angulararea: radiance * falloff(angle between -d and emitter normal)
    # (reference mitransient/emitters/angulararea.py:74-102: full radiance
    # within beam_width, linear falloff to cutoff_angle, zero outside).
    cos_ang = cos_em  # angle between emission dir (-d) and normal
    cb = sd.emitter.cos_beam[em_idx]
    cc = sd.emitter.cos_cutoff[em_idx]
    t_lin = safe_div(cos_ang - cc, jnp.maximum(cb - cc, 1e-9))
    falloff = jnp.clip(t_lin, 0.0, 1.0)
    val_ang = jnp.where(front[:, None], rad * falloff[:, None], 0.0)

    # projector: inside frustum -> irradiance / dist^2
    dirn = sd.emitter.direction[em_idx]
    fs = sd.emitter.frame_s[em_idx]
    ft = sd.emitter.frame_t[em_idx]
    to_ref = -d  # emitter -> ref direction is... p - ref = d*dist so ref-p = -d
    # direction from projector position to ref point:
    v = -d
    z = dot(v, dirn)
    x = dot(v, fs)
    y = dot(v, ft)
    thf = sd.emitter.tan_half_fov[em_idx]
    inside = (z > 0) & (jnp.abs(x) <= z * thf) & (jnp.abs(y) <= z * thf)
    val_proj = jnp.where(inside[:, None], rad, 0.0) / jnp.maximum(dist * dist, 1e-20)[:, None]

    val = jnp.where(
        (kind == EM_AREA)[:, None], val_area,
        jnp.where((kind == EM_ANGULAR_AREA)[:, None], val_ang, val_proj),
    )
    return val


def pdf_emitter_direction(sd: SceneData, ref_p: jnp.ndarray,
                          si: SurfaceInteraction) -> jnp.ndarray:
    """Solid-angle pdf of NEE having sampled the direction that hit ``si``
    (for MIS at emitter hits, transientpath.py:168-171).  Zero for
    non-emitter hits, back faces and delta emitters."""
    E = sd.emitter.kind.shape[0]
    if E == 0:
        return jnp.zeros(ref_p.shape[:-1], jnp.float32)
    em = si.emitter_id
    has_em = em >= 0
    em_c = jnp.maximum(em, 0)
    kind = sd.emitter.kind[em_c]
    area_like = (kind == EM_AREA) | (kind == EM_ANGULAR_AREA)
    d_vec = si.p - ref_p
    dist2 = jnp.sum(d_vec * d_vec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    d = d_vec / dist[:, None]
    cos_em = dot(si.n, -d)
    area = jnp.maximum(sd.emitter.area[em_c], 1e-30)
    pdf = safe_div(dist2, jnp.maximum(cos_em, 0.0) * area) / E
    return jnp.where(has_em & area_like & (cos_em > 0.0), pdf, 0.0)


def emitter_eval_hit(sd: SceneData, si: SurfaceInteraction,
                     ray_d: jnp.ndarray) -> jnp.ndarray:
    """Radiance emitted at a surface hit toward the viewer
    (``ds.emitter.eval(si)`` in transientpath.py:176).  (N, C)."""
    E = sd.emitter.kind.shape[0]
    C = sd.emitter.radiance.shape[-1] if E else sd.bsdf.reflectance.shape[-1]
    n = si.t.shape[0]
    if E == 0:
        return jnp.zeros((n, C), jnp.float32)
    em = si.emitter_id
    has_em = em >= 0
    em_c = jnp.maximum(em, 0)
    cos_em = dot(si.n, -ray_d)
    val = emitter_eval_direction(
        sd, em_c, si.p, si.n, -(-ray_d), jnp.ones_like(cos_em), cos_em
    )
    # emitter_eval_direction's projector branch is meaningless here (delta
    # emitters are never hit); area/angular branches only use cos_em.
    kind = sd.emitter.kind[em_c]
    val = jnp.where((kind == EM_PROJECTOR)[:, None], 0.0, val)
    return jnp.where(has_em[:, None], val, 0.0)
