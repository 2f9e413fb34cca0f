"""Transient path tracer (primal sweep).

TPU-native re-design of the reference's ``TransientPath`` integrator
(/root/reference/mitransient/integrators/transientpath.py:88-326): the same
light-transport estimator — path tracing with next-event estimation, power
-heuristic MIS, optical-path-length tracking and per-bounce transient
splatting — expressed as a dense masked wavefront inside
``jax.lax.fori_loop`` under ``jit`` instead of a Dr.Jit symbolic loop.

Key correspondences (reference line -> here):
* distance accumulation ``distance += si.t * eta``   (:154)
* camera_unwarp subtracts the first-hit distance     (:133-138)
* emitter-hit MIS vs previous-bounce BSDF pdf        (:166-180)
* NEE splat at ``distance + ds.dist * eta``          (:216-218)
* russian roulette from ``rr_depth``                 (:250-257)
* per-lane L accumulates the steady image sample     (:230)

RNG discipline: each bounce consumes exactly 6 sampler dimensions
(NEE 2, BSDF 3, RR 1) at ``base + it * 6``, making the PRB replay sweep
(prb.py) reproduce the primal path exactly without storing it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bsdf import api as bsdf_api
from ..core.math import mis_weight
from ..core.records import Ray
from ..core.rng import Sampler
from ..film.transient_film import TransientFilmState, splat_pair_any
from ..scene.scene import (
    SceneData,
    emitter_eval_hit,
    pdf_emitter_direction,
    ray_intersect,
    sample_emitter_direction,
)
from ..scene.schema import FilmConfig, IntegratorConfig

DIMS_PER_BOUNCE = 6


class PathState(NamedTuple):
    o: jnp.ndarray  # (N, 3)
    d: jnp.ndarray  # (N, 3)
    beta: jnp.ndarray  # (N, C)
    L: jnp.ndarray  # (N, C)
    eta: jnp.ndarray  # (N,)
    distance: jnp.ndarray  # (N,) accumulated OPL
    active: jnp.ndarray  # (N,) bool
    depth: jnp.ndarray  # (N,) int32 — valid-bounce count (alpha flag)
    prev_p: jnp.ndarray  # (N, 3)
    prev_pdf: jnp.ndarray  # (N,)
    prev_delta: jnp.ndarray  # (N,) bool
    film: TransientFilmState
    n_rays: jnp.ndarray  # () f32 — closest-hit + shadow rays actually traced


def sample_primal(
    sd: SceneData,
    sampler: Sampler,
    ray: Ray,
    pix: jnp.ndarray,
    ray_weight: jnp.ndarray,
    film: TransientFilmState,
    film_cfg: FilmConfig,
    icfg: IntegratorConfig,
    sample_scale: float,
    base_dim: int,
    spp: int,
    initial_distance: jnp.ndarray | None = None,
    enable_film: bool = True,
):
    """Trace one wavefront; returns (film', L (N, C), valid (N,)).

    ``sample_scale`` = ray_weight-independent 1/total_spp factor applied to
    every transient splat (common.py:411-422); the steady image instead gets
    the raw per-lane L splatted once by the caller.
    ``initial_distance`` seeds the OPL (NLOS: laser->wall OPL arrives via
    ray.time, transientnlospath.py:718).
    """
    n = pix.shape[0]
    C = sd.bsdf.reflectance.shape[-1]
    key = sampler.key

    distance0 = (
        initial_distance
        if initial_distance is not None
        else jnp.zeros((n,), jnp.float32)
    )
    if icfg.camera_unwarp:
        si0 = ray_intersect(sd, ray, jnp.ones((n,), bool))
        distance0 = distance0 - jnp.where(si0.valid, si0.t, 0.0)

    splat_w = ray_weight * sample_scale

    state = PathState(
        o=ray.o,
        d=ray.d,
        beta=jnp.ones((n, C), jnp.float32),
        L=jnp.zeros((n, C), jnp.float32),
        eta=jnp.ones((n,), jnp.float32),
        distance=distance0,
        active=jnp.ones((n,), bool),
        depth=jnp.zeros((n,), jnp.int32),
        prev_p=ray.o,
        prev_pdf=jnp.ones((n,), jnp.float32),
        prev_delta=jnp.ones((n,), bool),
        film=film,
        n_rays=jnp.zeros((), jnp.float32),
    )

    def bounce(it, st: PathState) -> PathState:
        dim = base_dim + it * DIMS_PER_BOUNCE

        def rnd1(k):
            return jax.random.uniform(jax.random.fold_in(key, dim + k), (n,))

        def rnd2(k):
            return jnp.stack([rnd1(k), rnd1(k + 1)], axis=-1)

        active = st.active
        si = ray_intersect(sd, Ray.make(st.o, st.d), active)
        hit = active & si.valid

        distance = st.distance + jnp.where(hit, si.t, 0.0) * st.eta

        lb = bsdf_api.gather_lane_bsdf(sd.bsdf, si.bsdf_id)

        # ---------------- direct emission (BSDF-sampled MIS) --------------
        pdf_em_hit = pdf_emitter_direction(sd, st.prev_p, si)
        pdf_em_hit = jnp.where(st.prev_delta, 0.0, pdf_em_hit)
        mis = mis_weight(st.prev_pdf, pdf_em_hit)
        Le_raw = emitter_eval_hit(sd, si, st.d)
        Le = jnp.where(
            (hit & ~jnp.bool_(icfg.discard_direct_light))[:, None],
            st.beta * mis[:, None] * Le_raw,
            0.0,
        )

        # ---------------- continuation gating ------------------------------
        active_next = active & (it + 1 < icfg.max_depth) & si.valid

        # ---------------- emitter sampling (NEE) ---------------------------
        active_em = active_next & bsdf_api.is_smooth(lb)
        ds, em_weight = sample_emitter_direction(
            sd, si.p, rnd2(0), True, active_em
        )
        active_em = active_em & (ds.pdf > 0.0)
        wo_em = si.frame.to_local(ds.d)
        f_em, pdf_bsdf_em = bsdf_api.eval_pdf(lb, si.wi, wo_em, active_em)
        mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_bsdf_em))
        Lr_dir = jnp.where(
            active_em[:, None], st.beta * mis_em[:, None] * f_em * em_weight, 0.0
        )
        # one fused film update for both splat events of this bounce
        # (emitter hit at `distance`, NEE at `distance + ds.dist * eta`)
        if enable_film:
            film_st = splat_pair_any(
                st.film, film_cfg, spp,
                distance, Le * splat_w[:, None],
                distance + ds.dist * st.eta, Lr_dir * splat_w[:, None],
                active,
                icfg.temporal_filter, icfg.gaussian_stddev,
            )
        else:
            film_st = st.film

        # ---------------- BSDF sampling ------------------------------------
        bs = bsdf_api.sample(lb, si.wi, rnd1(2), rnd2(3), active_next)
        d_world = si.frame.to_world(bs.wo)
        new_ray = si.spawn_ray(d_world)

        L = st.L + Le + Lr_dir
        beta = jnp.where(active_next[:, None], st.beta * bs.weight, st.beta)
        eta = jnp.where(active_next, st.eta * bs.eta, st.eta)

        # ---------------- stopping criteria --------------------------------
        beta_max = jnp.max(beta, axis=-1)
        active_next = active_next & (beta_max != 0.0)
        rr_prob = jnp.minimum(beta_max * eta * eta, 0.95)
        active_next = active_next & (rr_prob > 0.0)
        rr_active = it >= icfg.rr_depth
        beta = jnp.where(
            (rr_active & active_next)[:, None],
            beta * jnp.where(rr_prob > 0.0, 1.0 / jnp.maximum(rr_prob, 1e-30), 0.0)[:, None],
            beta,
        )
        rr_continue = rnd1(5) < rr_prob
        active_next = active_next & (~rr_active | rr_continue)

        return PathState(
            o=new_ray.o,
            d=d_world,
            beta=beta,
            L=L,
            eta=eta,
            distance=distance,
            active=active_next,
            depth=st.depth + jnp.where(hit, 1, 0),
            prev_p=jnp.where(hit[:, None], si.p, st.prev_p),
            prev_pdf=jnp.where(active_next, bs.pdf, st.prev_pdf),
            prev_delta=jnp.where(active_next, bs.delta, st.prev_delta),
            film=film_st,
            n_rays=st.n_rays
            + jnp.sum(active.astype(jnp.float32))
            + jnp.sum(active_em.astype(jnp.float32)),
        )

    state = jax.lax.fori_loop(0, icfg.max_depth, bounce, state)
    return state.film, state.L, state.depth > 0, state.n_rays
