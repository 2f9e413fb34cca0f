"""Path Replay Backpropagation for the volumetric transient integrator.

The reference's ``TransientPRBVolpath`` backward pass is a replay sweep with
O(1) memory in path depth: it re-traces the primal path and calls
``dr.backward(deltaL * contrib)`` per term, gathering the adjoint at each
term's time bin (/root/reference/mitransient/integrators/
transient_prbvolpath.py:243-386).  Round 1 differentiated this integrator by
taping the whole wavefront loop (integrators/fullad.py), whose memory grows
with max_depth x lanes — untenable for the canonical max_depth-256
volumetric config (cbox_volumetric.xml:4).  This module is the replay
equivalent, structured exactly like the surface PRB (integrators/prb.py):

Sweep 1 (primal, film disabled) produces per-lane total radiance ``L``.
Sweep 2 replays the identical volumetric path — the counter-based sampler
and the fold_in'd tracking streams regenerate every decision — and at each
event forms the locally-attached contribution

    Lo(theta) = Le(theta) + Lr_dir(theta)
                + L_rest * replace_grad(1, factor(theta)/factor_detached)

where ``factor`` is the BSDF value at surface scatters and the medium
*albedo* at real medium scatters (the analog-MC throughput factor,
transient_prbvolpath.py:229's beta update).  Adjoints are read per term at
the term's own bin: the vertex bin for Le + the indirect term, the
NEE-endpoint bin (distance + ds.dist * eta) for Lr_dir — matching the
reference's per-term gathers (:243-247, :319-327).

Like the reference: detached sampling, no forward mode (:131-133), no shape
gradients, unpolarized (the reference's prbvolpath is unpolarized).
Differentiable tables: bsdf.reflectance, emitter.radiance, medium.albedo.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bsdf import api as bsdf_api
from ..core.frame import Frame
from ..core.math import dot, mis_weight
from ..core.records import Ray
from ..core.warp import hg_pdf, square_to_hg
from ..ops.gather import columns_lookup
from ..scene.scene import (
    SceneData,
    emitter_eval_direction,
    emitter_eval_hit,
    pdf_emitter_direction,
    ray_intersect,
    sample_emitter_direction,
)
from ..scene.schema import FilmConfig, IntegratorConfig
from .prb import DiffParams, extract_params, insert_params, read_adjoint, replace_grad
from .volpath import (
    VOL_DIMS_PER_BOUNCE,
    _delta_track_flight,
    _has_grids,
    _medium_lookup,
    _transition,
    transmittance,
)


def sample_volpath_adjoint(
    sd: SceneData,
    sampler_key,
    ray: Ray,
    pix: jnp.ndarray,
    ray_weight: jnp.ndarray,
    L_total: jnp.ndarray,  # (N, C) state_out of the primal sweep
    grad_tr_flat: jnp.ndarray,
    grad_st_flat: jnp.ndarray,
    film_cfg: FilmConfig,
    icfg: IntegratorConfig,
    sample_scale,
) -> DiffParams:
    """The volumetric replay sweep: parameter-table gradients of
    <grad_in, render(theta)>.  Control flow and RNG consumption are
    bit-identical to ``sample_volpath_primal`` (unpolarized, non-spectral
    path), so no path state is stored between sweeps."""
    n = pix.shape[0]
    C = sd.bsdf.reflectance.shape[-1]
    key = sampler_key

    theta0 = extract_params(sd)
    grads0 = jax.tree.map(jnp.zeros_like, theta0)
    splat_w = ray_weight * sample_scale

    # camera_unwarp time-origin shift, matching the primal sweep
    # (transient_prbvolpath.py:161-162); detached — the shift is a
    # time-axis relabeling, not a differentiable quantity
    if icfg.camera_unwarp:
        from .volpath import first_surface_distance

        distance0 = -jax.lax.stop_gradient(first_surface_distance(sd, ray))
    else:
        distance0 = jnp.zeros((n,), jnp.float32)

    carry0 = dict(
        o=ray.o, d=ray.d,
        beta=jnp.ones((n, C), jnp.float32),
        L_rest=L_total,
        eta=jnp.ones((n,), jnp.float32),
        distance=distance0,
        active=jnp.ones((n,), bool),
        medium=jnp.full((n,), -1, jnp.int32),
        prev_p=ray.o,
        prev_pdf=jnp.ones((n,), jnp.float32),
        prev_delta=jnp.ones((n,), bool),
        grads=grads0,
    )

    def bounce(it, st):
        from ..core.rng import draw_bounce_block

        ub = draw_bounce_block(key, it, n, VOL_DIMS_PER_BOUNCE)

        def rnd1(k):
            return ub[:, k]

        def rnd2(k):
            return ub[:, k : k + 2]

        active = st["active"]
        si = ray_intersect(sd, Ray.make(st["o"], st["d"]), active)
        hit = active & si.valid

        # ---- free-flight replay (identical decisions) ---------------------
        sigma_t, med_albedo_det, med_g, in_medium = _medium_lookup(
            sd, st["medium"])
        if _has_grids(sd):
            t_fly = _delta_track_flight(
                sd, key, it, st["medium"], in_medium, st["o"], st["d"],
                jnp.where(hit, si.t, jnp.inf), active)
        else:
            u_ff = rnd1(0)
            t_fly = jnp.where(
                in_medium & (sigma_t > 0.0),
                -jnp.log(jnp.maximum(1.0 - u_ff, 1e-30))
                / jnp.maximum(sigma_t, 1e-30),
                jnp.inf,
            )
        medium_scatter = hit & in_medium & (t_fly < si.t)

        t_event = jnp.where(medium_scatter, t_fly, jnp.where(hit, si.t, 0.0))
        p_event = st["o"] + st["d"] * t_event[:, None]
        distance = st["distance"] + jnp.where(active, t_event, 0.0) * st["eta"]

        lb_det = bsdf_api.gather_lane_bsdf(sd.bsdf, si.bsdf_id, si.uv)
        is_null_srf = bsdf_api.is_null(lb_det) & ~medium_scatter

        # ---- detached MIS / NEE / direction samples (as in primal) --------
        pdf_em_hit = pdf_emitter_direction(sd, st["prev_p"], si)
        pdf_em_hit = jnp.where(st["prev_delta"], 0.0, pdf_em_hit)
        mis = mis_weight(st["prev_pdf"], pdf_em_hit)
        le_mask = hit & ~medium_scatter & ~jnp.bool_(icfg.discard_direct_light)

        active_next = active & (it + 1 < icfg.max_depth) & si.valid
        scatter_event = medium_scatter | (hit & ~is_null_srf)
        active_em = active_next & scatter_event & (
            medium_scatter | bsdf_api.is_smooth(lb_det))
        ds, em_weight_det = sample_emitter_direction(
            sd, p_event, rnd2(1), False, active_em)
        active_em = active_em & (ds.pdf > 0.0)
        trans, occ = transmittance(
            sd, p_event, ds.d, ds.dist, st["medium"], active_em,
            key=key, tag=it)
        active_em = active_em & ~occ
        nee_vis = (em_weight_det.sum(axis=-1) != 0.0) & active_em

        cos_ph = dot(st["d"], ds.d)
        f_phase = hg_pdf(cos_ph, med_g)[:, None] * jnp.ones((n, C))
        pdf_phase = hg_pdf(cos_ph, med_g)
        wo_em = si.frame.to_local(ds.d)
        _f_srf_det, pdf_srf = bsdf_api.eval_pdf(lb_det, si.wi, wo_em,
                                                active_em)
        pdf_for_mis = jnp.where(medium_scatter, pdf_phase, pdf_srf)
        mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_for_mis))

        # detached direction sample (consumes dims 3-5 like primal)
        d_hg_local, pdf_hg = square_to_hg(rnd2(4), med_g)
        frame_d = Frame.from_normal(st["d"])
        d_hg = frame_d.to_world(d_hg_local)
        bs = bsdf_api.sample(lb_det, si.wi, rnd1(3), rnd2(4),
                             active_next & ~medium_scatter)
        wo_sampled = bs.wo
        f_det_sampled = bs.weight * bs.pdf[:, None]  # surface f*cos detached

        beta_pre = st["beta"]
        L_rest = st["L_rest"]
        m_idx = jnp.maximum(st["medium"], 0)

        def contributions(theta: DiffParams):
            sdt = insert_params(sd, theta)
            lb = bsdf_api.gather_lane_bsdf(sdt.bsdf, si.bsdf_id, si.uv)
            albedo_att = jnp.where(
                in_medium[:, None],
                columns_lookup({"a": theta.medium_albedo}, m_idx)["a"],
                1.0,
            )
            # attached sigma_t survival ratio (homogeneous media; primal
            # value exactly 1 — see volpath.sample_volpath_primal).  Grid
            # sigma_t stays detached (delta-tracking chain not replayed
            # attached).
            if not _has_grids(sd):
                sig_att = jnp.where(
                    in_medium,
                    columns_lookup(
                        {"s": theta.medium_sigma_t}, m_idx)["s"],
                    0.0)
                lam = jax.lax.stop_gradient(sig_att)
                t_det = jax.lax.stop_gradient(t_event)
                dsig = sig_att - lam
                decay = jnp.exp(-dsig * jnp.where(
                    jnp.isfinite(t_det), t_det, 0.0))
                r_scatter = sig_att / jnp.maximum(lam, 1e-30) * decay
                ff_ratio = jnp.where(
                    medium_scatter, r_scatter,
                    jnp.where(in_medium & hit, decay, 1.0))
            else:
                ff_ratio = jnp.ones_like(t_event)
            # throughput incl. the attached current-event factors
            beta_evt = jnp.where(medium_scatter[:, None],
                                 beta_pre * albedo_att, beta_pre)
            beta_evt = beta_evt * ff_ratio[:, None]
            # Le (surface emitter hits only; attached radiance)
            Le_raw = emitter_eval_hit(sdt, si, st["d"])
            Le = jnp.where(le_mask[:, None],
                           beta_evt * mis[:, None] * Le_raw, 0.0)
            # Lr_dir: attached surface BSDF / detached phase, attached
            # emitter radiance, detached pdf + transmittance
            f_srf, _ = bsdf_api.eval_pdf(lb, si.wi, wo_em, active_em)
            f_em = jnp.where(medium_scatter[:, None],
                             jax.lax.stop_gradient(f_phase), f_srf)
            em_idx = jnp.maximum(ds.emitter_id, 0)
            cos_em = jnp.sum(ds.n * -ds.d, axis=-1)
            em_val = emitter_eval_direction(
                sdt, em_idx, ds.p, ds.n, ds.d, ds.dist, cos_em)
            em_weight = jnp.where(
                nee_vis[:, None],
                em_val / jnp.maximum(
                    jax.lax.stop_gradient(ds.pdf)[:, None], 1e-30),
                0.0,
            )
            # NEE transmittance: attached through sigma_t for homogeneous
            # media (analytic exp(-sigma_t seg) per segment); detached for
            # grids (reference :319-327 detaches tracking weights too)
            if not _has_grids(sd):
                trans_att, _occ2 = transmittance(
                    sdt, p_event, ds.d, ds.dist, st["medium"], active_em,
                    key=key, tag=it)
            else:
                trans_att = jax.lax.stop_gradient(trans)
            Lr_dir = jnp.where(
                active_em[:, None],
                beta_evt * mis_em[:, None] * f_em * em_weight
                * trans_att[:, None],
                0.0,
            )
            # indirect re-attachment: surface -> BSDF value ratio; medium ->
            # albedo ratio (the analog throughput factor of :229)
            f_cur, _ = bsdf_api.eval_pdf(lb, si.wi, wo_sampled,
                                         active_next & ~medium_scatter)
            inv_det = jnp.where(
                f_det_sampled != 0.0,
                1.0 / jnp.where(f_det_sampled != 0.0, f_det_sampled, 1.0),
                0.0,
            )
            ratio_srf = replace_grad(jnp.ones_like(f_cur), f_cur * inv_det)
            alb_det = jax.lax.stop_gradient(albedo_att)
            inv_alb = jnp.where(alb_det != 0.0,
                                1.0 / jnp.where(alb_det != 0.0, alb_det, 1.0),
                                0.0)
            ratio_med = replace_grad(jnp.ones_like(albedo_att),
                                     albedo_att * inv_alb)
            ratio = jnp.where(medium_scatter[:, None], ratio_med, ratio_srf)
            # deeper vertices also pass through this segment's survival
            # factor -> the indirect re-attachment carries ff_ratio too
            ratio = ratio * ff_ratio[:, None]
            Lr_ind = jax.lax.stop_gradient(L_rest - Le - Lr_dir) * ratio
            return Le, Lr_dir, Lr_ind

        # per-term adjoint reads at each term's own bin (reference
        # transient_prbvolpath.py:243-247 / :319-327)
        dL_vertex = read_adjoint(grad_tr_flat, grad_st_flat, film_cfg, pix,
                                 distance)
        dL_nee = read_adjoint(grad_tr_flat, grad_st_flat, film_cfg, pix,
                              distance + ds.dist * st["eta"])
        weight_lane = jnp.where(active, splat_w, 0.0)

        def scalar_obj(theta):
            Le, Lr_dir, Lr_ind = contributions(theta)
            s = jnp.sum((dL_vertex * (Le + Lr_ind)
                         + dL_nee * Lr_dir) * weight_lane[:, None])
            return s, (Le, Lr_dir)

        g, (Le_det, Lr_dir_det) = jax.grad(scalar_obj, has_aux=True)(theta0)
        grads = jax.tree.map(jnp.add, st["grads"], g)
        Le_det = jax.lax.stop_gradient(Le_det)
        Lr_dir_det = jax.lax.stop_gradient(Lr_dir_det)

        # ---- detached state update (identical to primal) -------------------
        albedo_det = jnp.where(in_medium[:, None], med_albedo_det, 1.0)
        beta = jnp.where(medium_scatter[:, None], beta_pre * albedo_det,
                         beta_pre)
        new_d = jnp.where(medium_scatter[:, None], d_hg,
                          si.frame.to_world(bs.wo))
        new_o = jnp.where(medium_scatter[:, None], p_event,
                          si.spawn_ray(si.frame.to_world(bs.wo)).o)
        w_step = jnp.where(medium_scatter[:, None], jnp.ones((n, C)),
                           bs.weight)
        pdf_step = jnp.where(medium_scatter, pdf_hg, bs.pdf)
        delta_step = jnp.where(medium_scatter, False, bs.delta)
        eta_step = jnp.where(medium_scatter, 1.0, bs.eta)

        new_med = jnp.where(
            hit & ~medium_scatter & bsdf_api.is_null(lb_det),
            _transition(sd, si, st["d"], st["medium"]),
            st["medium"],
        )

        L_rest = L_rest - Le_det - Lr_dir_det
        beta = jnp.where(active_next[:, None], beta * w_step, beta)
        eta = jnp.where(active_next, st["eta"] * eta_step, st["eta"])

        beta_max = jnp.max(beta, axis=-1)
        active_next = active_next & (beta_max != 0.0)
        rr_prob = jnp.minimum(beta_max * eta * eta, 0.95)
        active_next = active_next & (rr_prob > 0.0)
        rr_active = it >= icfg.rr_depth
        rr_scale = jnp.where((rr_active & active_next) & (rr_prob > 0.0),
                             1.0 / jnp.maximum(rr_prob, 1e-6), 1.0)
        beta = beta * rr_scale[:, None]
        rr_continue = rnd1(7) < rr_prob
        active_next = active_next & (~rr_active | rr_continue)

        return dict(
            o=new_o, d=new_d, beta=beta, L_rest=L_rest, eta=eta,
            distance=distance, active=active_next, medium=new_med,
            prev_p=jnp.where(scatter_event[:, None], p_event, st["prev_p"]),
            prev_pdf=jnp.where(active_next & scatter_event, pdf_step,
                               st["prev_pdf"]),
            prev_delta=jnp.where(active_next & scatter_event, delta_step,
                                 st["prev_delta"]),
            grads=grads,
        )

    final = jax.lax.fori_loop(0, icfg.max_depth, bounce, carry0)
    return final["grads"]
