"""Top-level render orchestration.

Mirrors the role of ``TransientADIntegrator.render``
(/root/reference/mitransient/integrators/common.py:122-213): split the total
sample budget into passes bounded by a wavefront-size cap, run the jitted
per-pass wavefront, accumulate into the film, then develop to
``(steady, transient)``.

The reference caps passes at 2^26 samples when the wavefront exceeds 2^32
(common.py:51-85); here the cap is a lane budget chosen to fit HBM, and each
pass is an independently-seeded sampler stream (``Sampler(seed, n,
stream=pass_idx)``), the counter-based equivalent of the reference's
per-pass sampler clones.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .core.rng import Sampler
from .film.transient_film import develop_any as develop, film_init_any as film_init, splat_steady
from .integrators.path import sample_primal
from .scene.schema import FilmConfig, IntegratorConfig, Scene
from .sensors.perspective import build_camera, sample_rays

# Lane budget per pass (lanes = pixels * spp_chunk).  2^21 lanes * ~50 f32 of
# live state ~ 400 MB — comfortable on a 16 GB chip while big enough to fill
# the VPU.
DEFAULT_MAX_LANES = 1 << 21


@partial(
    jax.jit,
    static_argnames=("film_cfg", "icfg", "width", "height", "spp_chunk",
                     "polarized", "spectral"),
    donate_argnames=("film",),
)
def _perspective_pass(
    sd,
    cam,
    film,
    seed,
    pass_idx,
    inv_total_spp,
    *,
    film_cfg: FilmConfig,
    icfg: IntegratorConfig,
    width: int,
    height: int,
    spp_chunk: int,
    polarized: bool = False,
    spectral: bool = False,
):
    n = width * height * spp_chunk
    sampler = Sampler(seed, n, stream=pass_idx)
    # width/height are the DATA (crop) dims; the uv mapping uses the full
    # sensor (mi.Film crop semantics)
    ray, pix, ray_weight = sample_rays(
        cam, sampler, width, height, spp_chunk,
        crop_offset=(film_cfg.crop_offset_x, film_cfg.crop_offset_y),
        full_size=(film_cfg.width, film_cfg.height))
    if icfg.kind == "transient_prbvolpath":
        from .integrators.volpath import sample_volpath_primal as sample_fn

        film, L, valid, n_rays = sample_fn(
            sd, sampler, ray, pix, ray_weight, film, film_cfg, icfg,
            sample_scale=inv_total_spp, base_dim=2, spp=spp_chunk,
            spectral=spectral, polarized=polarized,
            cam_vertical=cam.R[:, 1],
        )
    else:
        film, L, valid, n_rays = sample_primal(
            sd, sampler, ray, pix, ray_weight, film, film_cfg, icfg,
            sample_scale=inv_total_spp, base_dim=2, spp=spp_chunk,
            polarized=polarized, cam_vertical=cam.R[:, 1],
            spectral=spectral,
        )
    if film_cfg.rfilter == "gaussian":
        from .film.transient_film import splat_steady_gaussian

        # reproduce the camera jitter (sampler dims 0-1 of this stream)
        jit2 = Sampler(seed, n, stream=pass_idx).next_2d()
        film = splat_steady_gaussian(
            film, height, width, spp_chunk, L, ray_weight, jit2,
            stddev=film_cfg.rfilter_stddev)
    else:
        film = splat_steady(film, spp_chunk, L, ray_weight)
    return film, n_rays


@partial(
    jax.jit,
    static_argnames=("film_cfg", "icfg", "spp_total", "lanes_per_pixel",
                     "polarized"),
    donate_argnames=("film",),
)
def _regen_render(sd, cam, film, seed, *, film_cfg, icfg, spp_total,
                  lanes_per_pixel, polarized=False):
    from .integrators.path_regen import sample_primal_regen

    film, steady_lanes, n_rays, iters = sample_primal_regen(
        sd, seed, cam, film, film_cfg, icfg, spp_total, lanes_per_pixel,
        polarized=polarized)
    # steady_lanes holds per-lane SUMS of completed-sample radiances; every
    # pixel completes exactly spp_total samples, so reduce the lane rows and
    # count spp_total unit sample weights per pixel
    hw = film.steady.shape[0]
    C = steady_lanes.shape[-1]
    s = steady_lanes.reshape(lanes_per_pixel, hw, C).sum(axis=0)
    film = film._replace(
        steady=film.steady + s,
        steady_weight=film.steady_weight + jnp.float32(spp_total),
    )
    return film, n_rays, iters


def render(
    scene: Scene,
    spp: int | None = None,
    seed: int = 0,
    sensor: int = 0,
    max_lanes: int = DEFAULT_MAX_LANES,
    progress_callback=None,
    return_stats: bool = False,
    regenerate: bool | None = None,
    film_state=None,
    checkpoint_callback=None,
):
    """Render ``(steady, transient)`` for the scene's sensor.

    Parity surface of ``mi.render`` on a transient scene (README.md:154-160
    of the reference): returns steady ``(H, W, C)`` and transient
    ``(H, W, T, C)`` jnp arrays.

    Checkpoint/resume (the reference's per-pass accumulation,
    common.py:61-85, made durable): ``checkpoint_callback(state)`` fires
    after every accumulation pass with an opaque resumable state; pass it
    back as ``film_state=`` to continue an interrupted multi-pass render —
    pass splitting is deterministic in (seed, spp), so resumed output is
    bit-identical to an uninterrupted run.  ``save_film_state`` /
    ``load_film_state`` serialize it.
    """
    cfg = scene.sensors[sensor]
    if (cfg.kind == "nlos_capture_meter"
            or scene.integrator.kind == "transient_nlos_path"):
        from .integrators.nlos_path import render_nlos

        return render_nlos(scene, spp=spp, seed=seed, sensor=sensor,
                           max_lanes=max_lanes,
                           progress_callback=progress_callback,
                           return_stats=return_stats)

    icfg = scene.integrator
    film_cfg = cfg.film
    spp = spp if spp is not None else cfg.spp
    dw, dh = film_cfg.data_width, film_cfg.data_height
    hw = dw * dh

    # Path-regeneration fast path: single while_loop consuming the whole spp
    # budget at ~full occupancy (integrators/path_regen.py).  Used for plain
    # primal transient_path renders on TPU-scale workloads.
    polarized_v = scene.variant.polarized
    if regenerate is None:
        regenerate = (
            icfg.kind == "transient_path"
            and not icfg.camera_unwarp
            and not scene.variant.spectral
            and icfg.temporal_filter != "gaussian"
            and film_cfg.rfilter == "box"
            and not film_cfg.is_cropped
            and spp >= 8
        )
    if film_state is not None:
        regenerate = False  # resuming implies the multi-pass accumulator
    if regenerate:
        lanes_per_pixel = max(1, min(spp, max_lanes // max(hw, 1)))
        cam = build_camera(cfg)
        film = film_init(
            film_cfg,
            scene.variant.color_channels * (4 if polarized_v else 1))
        from .scene.scene import primal_sd

        with jax.profiler.TraceAnnotation("mitr:render_regen"):
            film, n_rays, iters = _regen_render(
                primal_sd(scene.data), cam, film, jnp.uint32(seed),
                film_cfg=film_cfg, icfg=icfg, spp_total=spp,
                lanes_per_pixel=lanes_per_pixel, polarized=polarized_v)
        if progress_callback is not None:
            progress_callback(1.0)
        steady, transient = develop(film, film_cfg)
        extra = surface_sample_validation(film, film_cfg)
        if return_stats:
            return steady, transient, {"rays": n_rays, "spp": spp,
                                       "iters": iters, **extra}
        return steady, transient

    spp_chunk = max(1, min(spp, max_lanes // max(hw, 1)))
    n_passes = (spp + spp_chunk - 1) // spp_chunk
    spp_chunk = (spp + n_passes - 1) // n_passes  # even-ish split
    total_spp = spp_chunk * n_passes

    cam = build_camera(cfg)
    polarized = scene.variant.polarized
    spectral = scene.variant.spectral
    film_channels = scene.variant.color_channels * (4 if polarized else 1)
    film = film_init(film_cfg, film_channels,
                     scan_pixels=hw if film_cfg.is_cropped else None)
    if film_state is not None:
        film, done_passes, total_rays = film_state
        film = jax.tree_util.tree_map(jnp.asarray, film)
        if film.steady.shape[-1] != film_channels:
            raise ValueError("film_state does not match this scene/variant")
    else:
        done_passes, total_rays = 0, 0.0
    for p in range(done_passes, n_passes):
        from .scene.scene import primal_sd

        with jax.profiler.TraceAnnotation("mitr:render_pass"):
            film, n_rays = _perspective_pass(
                primal_sd(scene.data), cam, film, jnp.uint32(seed),
                jnp.uint32(p),
                jnp.float32(1.0 / total_spp),
                film_cfg=film_cfg, icfg=icfg,
                width=dw, height=dh,
                spp_chunk=spp_chunk, polarized=polarized,
                spectral=spectral,
            )
        total_rays = total_rays + n_rays
        if progress_callback is not None:
            progress_callback((p + 1) / n_passes)
        if checkpoint_callback is not None:
            # host copy: the device film is donated to the next pass
            import numpy as _np

            checkpoint_callback((
                jax.tree_util.tree_map(_np.asarray, film), p + 1,
                float(_np.asarray(total_rays))))
    steady, transient = develop(film, film_cfg, shape_hw=(dh, dw))
    extra = surface_sample_validation(film, film_cfg)
    if return_stats:
        return steady, transient, {"rays": total_rays, "spp": total_spp,
                                   **extra}
    return steady, transient


def surface_sample_validation(film, film_cfg) -> dict:
    """Host-side half of the opt-in splat validation
    (transient_image_block.py:106-125): read the dense counters accumulated
    by ``splat_transient_pair`` and emit one leveled warning per render."""
    if not (film_cfg.warn_negative or film_cfg.warn_invalid):
        return {}
    if getattr(film, "n_negative", None) is None:
        return {}
    import numpy as _np

    from . import log as _log

    neg = float(_np.asarray(film.n_negative))
    inv = float(_np.asarray(film.n_invalid))
    if neg > 0:
        _log.warn("Negative sample values: %d splats below -1e-5 "
                  "(warn_negative)", int(neg))
    if inv > 0:
        _log.warn("Invalid sample values: %d non-finite splats "
                  "(warn_invalid)", int(inv))
    return {"n_negative": neg, "n_invalid": inv}


def save_film_state(path: str, state) -> None:
    """Serialize a checkpoint_callback state to disk (numpy archive)."""
    import numpy as np

    film, done_passes, total_rays = state
    arrays = {f"film_{i}": np.asarray(a)
              for i, a in enumerate(jax.tree_util.tree_leaves(film))}
    np.savez(path, done_passes=done_passes,
             total_rays=np.asarray(total_rays), **arrays)


def load_film_state(path: str):
    """Load a film checkpoint saved by :func:`save_film_state`."""
    import numpy as np

    from .film.transient_film import TransientFilmState

    z = np.load(path)
    n = len([k for k in z.files if k.startswith("film_")])
    leaves = [jnp.asarray(z[f"film_{i}"]) for i in range(n)]
    film = TransientFilmState(*leaves)
    assert n == len(TransientFilmState._fields)
    return film, int(z["done_passes"]), float(z["total_rays"])


# --------------------------------------------------------------------------
# Differentiable rendering (PRB two-sweep; mirrors common.py:215-409)
# --------------------------------------------------------------------------

def _prb_setup(scene: Scene, spp, seed, sensor,
               max_lanes: int = DEFAULT_MAX_LANES * 4):
    cfg = scene.sensors[sensor]
    icfg = scene.integrator
    film_cfg = cfg.film
    if film_cfg.is_cropped:
        raise NotImplementedError(
            "differential rendering with a cropped film is not supported; "
            "render the full film or crop the gradient instead")
    if film_cfg.kind == "phasor_hdr_film":
        raise NotImplementedError(
            "the phasor film is not differentiable (matching the "
            "reference's PhasorHDRFilm); use transient_hdr_film for "
            "gradients")
    spp = spp if spp is not None else cfg.spp
    hw = film_cfg.width * film_cfg.height
    if hw * spp > (1 << 32):
        # parity with the reference's refusal threshold: one 2^32-lane
        # wavefront (common.py:51-85,237-240).  Below that, spp is chunked
        # into DEFAULT_MAX_LANES*4-lane passes and gradients/tangent films
        # accumulate additively across passes.
        raise ValueError(
            f"render_backward/forward wavefront exceeds 2^32 lanes "
            f"(lanes = {hw * spp}); reduce spp")
    spp_chunk = max(1, min(spp, max_lanes // max(hw, 1)))
    n_passes = (spp + spp_chunk - 1) // spp_chunk
    spp_chunk = (spp + n_passes - 1) // n_passes
    return cfg, icfg, film_cfg, spp, hw, spp_chunk, n_passes


@partial(jax.jit, static_argnames=("film_cfg", "icfg", "width", "height",
                                   "spp"))
def _backward_pass(sd, cam, grad_st_flat, grad_tr_flat, seed, pass_idx,
                   inv_spp, *, film_cfg, icfg, width, height, spp):
    from .film.transient_film import film_init as _fi
    from .integrators.prb import sample_adjoint
    from .integrators.path import sample_primal

    n = width * height * spp
    sampler = Sampler(seed, n, stream=pass_idx)
    ray, pix, ray_weight = sample_rays(cam, sampler, width, height, spp)
    # sweep 1: primal (state_out = per-lane total L); film splats skipped
    film = _fi(film_cfg, sd.bsdf.reflectance.shape[-1])
    _f, L, _v, _r = sample_primal(
        sd, sampler, ray, pix, ray_weight, film, film_cfg, icfg,
        sample_scale=inv_spp, base_dim=2, spp=spp, enable_film=False,
    )
    # sweep 2: replay with adjoint reads
    grads = sample_adjoint(
        sd, sampler.key, ray, pix, ray_weight, L, grad_tr_flat, grad_st_flat,
        film_cfg, icfg, inv_spp, base_dim=2, mode="backward",
    )
    return grads


def render_backward(scene: Scene, grad_in, spp: int | None = None,
                    seed: int = 0, sensor: int = 0,
                    method: str | None = None,
                    max_lanes: int = DEFAULT_MAX_LANES * 4):
    """Reverse-mode differential rendering (parity with
    ``TransientADIntegrator.render_backward``, common.py:325-409).

    ``grad_in`` = (grad_steady (H, W, C) | None, grad_transient
    (H, W, T, C) | None).  Returns a dict mapping traversal paths (see
    ``traverse``) to gradient arrays, plus the raw table grads under
    ``'__tables__'``.

    Dispatch: ``transient_path`` uses the PRB two-sweep replay
    (integrators/prb.py).  ``transient_prbvolpath`` uses the volumetric
    replay (integrators/prb_vol.py) — O(1) memory in path depth like the
    reference (transient_prbvolpath.py:243-386); pass ``method='fullad'``
    to force the loop-taping full-AD path instead (exact per-splat time
    attribution, memory grows with depth).  ``transient_nlos_path`` uses
    full reverse-mode AD through the wavefront loop
    (integrators/fullad.py).
    """
    if (scene.integrator.kind == "transient_prbvolpath"
            and method != "fullad" and not scene.variant.polarized):
        # polarized volumetric falls through to the chunked full-AD path
        # below — the PRB replay (prb_vol.py) replays the unpolarized
        # estimator, but jax.grad through the polarized primal is exact.
        # Exceeds the reference, whose prbvolpath is unpolarized
        # (transient_prbvolpath.py:40-48).
        return render_backward_volpath(scene, grad_in, spp=spp, seed=seed,
                                       sensor=sensor)
    if (scene.integrator.kind in ("transient_nlos_path",
                                  "transient_prbvolpath")
            or scene.variant.polarized or scene.variant.spectral
            or method == "fullad"):
        # polarized/spectral transient_path routes through full-loop AD:
        # the PRB replay below replays the unpolarized-RGB estimator, which
        # is a DIFFERENT program than the polarized primal (round-3 advisor
        # finding on fullad, applied to the dispatch as well)
        from .integrators.fullad import render_backward_fullad

        return render_backward_fullad(scene, grad_in, spp=spp, seed=seed,
                                      sensor=sensor)
    cfg, icfg, film_cfg, spp, hw, spp_chunk, n_passes = _prb_setup(
        scene, spp, seed, sensor, max_lanes)
    C = scene.variant.color_channels
    T = film_cfg.temporal_bins
    grad_steady, grad_transient = grad_in
    gs = (jnp.zeros((hw, C), jnp.float32) if grad_steady is None
          else jnp.asarray(grad_steady, jnp.float32).reshape(hw, C))
    gt = (jnp.zeros((hw * T, C), jnp.float32) if grad_transient is None
          else jnp.asarray(grad_transient, jnp.float32).reshape(hw * T, C))

    cam = build_camera(cfg)
    from .scene.scene import primal_sd

    # spp-chunked accumulation (gradients are additive across sample
    # chunks), lifting the single-pass cap to the reference's 2^32-lane
    # refusal threshold (common.py:51-85) — same scheme as
    # render_backward_volpath below.
    total_spp = spp_chunk * n_passes
    grads = None
    for p in range(n_passes):
        g = _backward_pass(
            primal_sd(scene.data), cam, gs, gt, jnp.uint32(seed),
            jnp.uint32(p), jnp.float32(1.0 / total_spp),
            film_cfg=film_cfg, icfg=icfg, width=film_cfg.width,
            height=film_cfg.height, spp=spp_chunk,
        )
        grads = g if grads is None else jax.tree_util.tree_map(
            jnp.add, grads, g)
    from .integrators.prb import grads_to_named

    return grads_to_named(scene, grads)


@partial(jax.jit, static_argnames=("film_cfg", "icfg", "width", "height",
                                   "spp"))
def _backward_pass_vol(sd, cam, grad_st_flat, grad_tr_flat, seed, pass_idx,
                       inv_total, *, film_cfg, icfg, width, height, spp):
    from .film.transient_film import film_init as _fi
    from .integrators.prb_vol import sample_volpath_adjoint
    from .integrators.volpath import sample_volpath_primal

    n = width * height * spp
    sampler = Sampler(seed, n, stream=pass_idx)
    ray, pix, ray_weight = sample_rays(cam, sampler, width, height, spp)
    film = _fi(film_cfg, sd.bsdf.reflectance.shape[-1])
    # sweep 1: primal state_out (film splats skipped)
    _f, L, _v, _r = sample_volpath_primal(
        sd, sampler, ray, pix, ray_weight, film, film_cfg, icfg,
        sample_scale=inv_total, base_dim=2, spp=spp, enable_film=False,
    )
    # sweep 2: replay with per-term adjoint reads
    return sample_volpath_adjoint(
        sd, sampler.key, ray, pix, ray_weight, L, grad_tr_flat, grad_st_flat,
        film_cfg, icfg, inv_total,
    )


def render_backward_volpath(scene: Scene, grad_in, spp: int | None = None,
                            seed: int = 0, sensor: int = 0,
                            max_lanes: int = 1 << 20):
    """Volumetric PRB backward: two primal-shaped sweeps, O(1) memory in
    path depth (integrators/prb_vol.py), accumulated over spp chunks — the
    canonical max_depth-256 config (cbox_volumetric.xml:4) trains at full
    chunk sizes, unlike loop-taping full AD whose memory scales with
    depth x lanes."""
    cfg = scene.sensors[sensor]
    icfg = scene.integrator
    film_cfg = cfg.film
    if film_cfg.kind == "phasor_hdr_film":
        raise NotImplementedError(
            "the phasor film is not differentiable (matching the "
            "reference's PhasorHDRFilm); use transient_hdr_film for "
            "gradients")
    if scene.variant.polarized:
        raise NotImplementedError(
            "polarized volumetric is primal-only via the PRB replay; "
            "render_backward dispatches polarized volumetric scenes to "
            "the chunked full-AD path instead")
    spp = spp if spp is not None else cfg.spp
    hw = film_cfg.width * film_cfg.height
    C = scene.variant.color_channels
    T = film_cfg.temporal_bins

    grad_steady, grad_transient = grad_in
    gs = (jnp.zeros((hw, C), jnp.float32) if grad_steady is None
          else jnp.asarray(grad_steady, jnp.float32).reshape(hw, C))
    gt = (jnp.zeros((hw * T, C), jnp.float32) if grad_transient is None
          else jnp.asarray(grad_transient, jnp.float32).reshape(hw * T, C))

    spp_chunk = max(1, min(spp, max_lanes // max(hw, 1)))
    n_passes = (spp + spp_chunk - 1) // spp_chunk
    spp_chunk = (spp + n_passes - 1) // n_passes
    total_spp = spp_chunk * n_passes

    cam = build_camera(cfg)
    from .scene.scene import primal_sd

    grads = None
    for p in range(n_passes):
        g = _backward_pass_vol(
            primal_sd(scene.data), cam, gs, gt, jnp.uint32(seed),
            jnp.uint32(p),
            jnp.float32(1.0 / total_spp),
            film_cfg=film_cfg, icfg=icfg, width=film_cfg.width,
            height=film_cfg.height, spp=spp_chunk,
        )
        grads = g if grads is None else jax.tree_util.tree_map(
            jnp.add, grads, g)

    from .integrators.prb import grads_to_named

    return grads_to_named(scene, grads)


@partial(jax.jit, static_argnames=("film_cfg", "icfg", "width", "height",
                                   "spp"))
def _forward_pass(sd, cam, tangents, seed, pass_idx, inv_spp, *, film_cfg,
                  icfg, width, height, spp):
    """One spp chunk of plain-path forward mode.  Returns the (additive)
    derivative-film STATE; the caller accumulates states across chunks and
    develops once (develop's weight normalization then sees the total
    weight)."""
    from .film.transient_film import film_init as _fi, splat_transient_pair
    from .integrators.prb import sample_adjoint
    from .integrators.path import sample_primal

    n = width * height * spp
    C = sd.bsdf.reflectance.shape[-1]
    sampler = Sampler(seed, n, stream=pass_idx)
    ray, pix, ray_weight = sample_rays(cam, sampler, width, height, spp)
    film = _fi(film_cfg, C)
    _f, L, _v, _r = sample_primal(
        sd, sampler, ray, pix, ray_weight, film, film_cfg, icfg,
        sample_scale=inv_spp, base_dim=2, spp=spp, enable_film=False,
    )
    hw = width * height
    gt0 = jnp.zeros((hw * film_cfg.temporal_bins, C), jnp.float32)
    gs0 = jnp.zeros((hw, C), jnp.float32)
    splats, dists = sample_adjoint(
        sd, sampler.key, ray, pix, ray_weight, L, gt0, gs0,
        film_cfg, icfg, inv_spp, base_dim=2, mode="forward",
        tangents=tangents,
    )
    # splat per-bounce forward derivatives into a fresh film
    # (transientpath.py:312-316)
    dfilm = _fi(film_cfg, C)
    act = jnp.ones((n,), bool)
    for d_ in range(splats.shape[0]):
        dfilm = splat_transient_pair(
            dfilm, film_cfg, spp, dists[d_], splats[d_], None, None, act,
            icfg.temporal_filter, icfg.gaussian_stddev,
        )
    # steady forward derivative: raw per-lane sum of dLo (splats carry the
    # 1/spp_total scale; undo it — develop divides by the accumulated
    # weight sum = spp_total)
    dL_total = jnp.sum(splats, axis=0) / inv_spp
    dfilm = splat_steady(dfilm, spp, dL_total, ray_weight)
    return dfilm


def _build_tangents(scene: Scene, tangent: dict):
    """Map a {traversal-path-or-table: value} tangent dict onto the
    DiffParams pytree structure (jax.jvp requires exact structure match)."""
    from .integrators.prb import extract_params

    sd = scene.data
    tangents = jax.tree_util.tree_map(jnp.zeros_like, extract_params(sd))
    tbl_attr = {
        "bsdf.reflectance": "bsdf_reflectance",
        "emitter.radiance": "emitter_radiance",
        "medium.albedo": "medium_albedo",
        "bsdf.alpha": "bsdf_alpha",
        "medium.sigma_t": "medium_sigma_t",
        "bsdf.textures": "bsdf_textures",
    }
    for path, val in tangent.items():
        if path in tbl_attr:  # whole-table tangent
            tangents = tangents._replace(
                **{tbl_attr[path]: jnp.asarray(val, jnp.float32)})
        elif path in scene._param_paths:
            table, idx = scene._param_paths[path]
            attr = tbl_attr.get(table)
            if attr is not None and getattr(tangents, attr) is not None:
                tangents = tangents._replace(**{
                    attr: getattr(tangents, attr).at[idx].set(
                        jnp.asarray(val, jnp.float32))})
    return tangents


@partial(jax.jit, static_argnames=("film_cfg", "icfg", "spp", "hw", "kind",
                                   "skip_le", "polarized", "spectral"))
def _forward_pass_jvp(sd, ctx, tangents, seed, pass_idx, inv_spp, *,
                      film_cfg, icfg, spp, hw, kind, skip_le=False,
                      polarized=False, spectral=False):
    """Integrator-generic forward mode, one spp chunk: jax.jvp straight
    through the primal wavefront program (film init + loop).  Forward-mode
    needs no taping, so memory is O(1) in path depth — structurally the
    same cost as the reference's Forward-mode replay pass
    (common.py:215-323).  Returns the (primal, tangent) film-STATE pair;
    the caller accumulates states across chunks and differentiates the
    develop step once at the accumulated state."""
    from .film.transient_film import (
        film_init_any,
        splat_steady as _ss,
    )
    from .integrators.prb import extract_params, insert_params

    def f(theta):
        sdt = insert_params(sd, theta)
        C = sdt.bsdf.reflectance.shape[-1]
        Cf = C * (4 if polarized else 1)
        sampler = Sampler(seed, spp * hw, stream=pass_idx)
        if kind == "transient_nlos_path":
            from .integrators.nlos_path import (
                sample_nlos_primal,
                sample_nlos_rays,
            )

            film = film_init_any(film_cfg, Cf, scan_pixels=hw)
            ray, rw = sample_nlos_rays(ctx, spp, hw)
            film, L, _v, _r = sample_nlos_primal(
                sdt, ctx, sampler, ray, rw, film, film_cfg, icfg,
                inv_spp, base_dim=2, spp=spp, skip_le=skip_le,
                polarized=polarized, spectral=spectral)
        elif kind == "transient_prbvolpath":
            from .integrators.volpath import sample_volpath_primal

            film = film_init_any(film_cfg, Cf)
            ray, pix, rw = sample_rays(ctx, sampler, film_cfg.width,
                                       film_cfg.height, spp)
            film, L, _v, _r = sample_volpath_primal(
                sdt, sampler, ray, pix, rw, film, film_cfg, icfg,
                inv_spp, base_dim=2, spp=spp, spectral=spectral,
                polarized=polarized, cam_vertical=ctx.R[:, 1])
        else:
            from .integrators.path import sample_primal as _sp

            film = film_init_any(film_cfg, Cf)
            ray, pix, rw = sample_rays(ctx, sampler, film_cfg.width,
                                       film_cfg.height, spp)
            film, L, _v, _r = _sp(
                sdt, sampler, ray, pix, rw, film, film_cfg, icfg,
                inv_spp, base_dim=2, spp=spp, polarized=polarized,
                spectral=spectral, cam_vertical=ctx.R[:, 1])
        return _ss(film, spp, L, rw)

    return jax.jvp(f, (extract_params(sd),), (tangents,))


def render_forward(scene: Scene, tangent: dict, spp: int | None = None,
                   seed: int = 0, sensor: int = 0,
                   max_lanes: int = DEFAULT_MAX_LANES * 4):
    """Forward-mode differential rendering (parity with
    ``render_forward``, common.py:215-323): returns the derivative
    (d_steady, d_transient) videos for a parameter perturbation direction.

    ``tangent``: dict mapping traversal paths (or the whole-table keys
    'bsdf.reflectance' / 'emitter.radiance') to tangent values.

    Dispatch (integrator-generic like the reference): plain
    ``transient_path`` uses the PRB-style forward replay (_forward_pass);
    NLOS single/confocal and ``transient_prbvolpath`` run jax.jvp through
    the full primal program (exceeding the reference, whose prbvolpath has
    no forward mode, transient_prbvolpath.py:131-133).  Exhaustive NLOS is
    refused like the reference (transientnlospath.py:729-731)."""
    cfg, icfg, film_cfg, spp, hw, spp_chunk, n_passes = _prb_setup(
        scene, spp, seed, sensor, max_lanes)
    nlos = (cfg.kind == "nlos_capture_meter"
            or icfg.kind == "transient_nlos_path")

    if nlos and icfg.capture_type == "exhaustive":
        raise ValueError(
            "Exhaustive capture is not supported in differentiable "
            "rendering (transientnlospath.py:729-731)")
    tangents = _build_tangents(scene, tangent)
    total_spp = spp_chunk * n_passes

    if (icfg.kind == "transient_path" and not nlos
            and not scene.variant.polarized and not scene.variant.spectral):
        cam = build_camera(cfg)
        dfilm = None
        for p in range(n_passes):
            df = _forward_pass(
                scene.data, cam, tangents, jnp.uint32(seed), jnp.uint32(p),
                jnp.float32(1.0 / total_spp),
                film_cfg=film_cfg, icfg=icfg, width=film_cfg.width,
                height=film_cfg.height, spp=spp_chunk,
            )
            dfilm = df if dfilm is None else jax.tree_util.tree_map(
                jnp.add, dfilm, df)
        return develop(dfilm, film_cfg)

    if nlos:
        from .integrators.nlos_path import can_skip_le, prepare_nlos_cached

        ctx = prepare_nlos_cached(scene, cfg, sensor)
        kind = "transient_nlos_path"
        skip_le = can_skip_le(scene.data)
    else:
        ctx = build_camera(cfg)
        kind = icfg.kind
        skip_le = False

    from .film.transient_film import xla_splat_scope

    with xla_splat_scope():  # jvp through the film scatter (no Pallas AD)
        # accumulate (primal, tangent) film STATES over spp chunks, then
        # differentiate the develop step once at the accumulated state —
        # exactly the jvp of the whole multi-pass program (film states are
        # additive; filter weights carry zero tangent)
        s_tot = t_tot = None
        for p in range(n_passes):
            s_p, t_p = _forward_pass_jvp(
                scene.data, ctx, tangents, jnp.uint32(seed), jnp.uint32(p),
                jnp.float32(1.0 / total_spp),
                film_cfg=film_cfg, icfg=icfg, spp=spp_chunk, hw=hw,
                kind=kind, skip_le=skip_le,
                polarized=scene.variant.polarized,
                spectral=scene.variant.spectral)
            if s_tot is None:
                s_tot, t_tot = s_p, t_p
            else:
                s_tot = jax.tree_util.tree_map(jnp.add, s_tot, s_p)
                t_tot = jax.tree_util.tree_map(jnp.add, t_tot, t_p)
        from .film.transient_film import develop_any as _dev

        _out, d_out = jax.jvp(
            lambda s: _dev(s, film_cfg,
                           shape_hw=(film_cfg.height, film_cfg.width)),
            (s_tot,), (t_tot,))
        return d_out


@partial(jax.jit, static_argnames=("width", "height", "spp", "channels"))
def _aov_pass(sd, cam, seed, *, width, height, spp, channels):
    n = width * height * spp
    sampler = Sampler(jnp.uint32(seed), n, stream=jnp.uint32(0))
    ray, pix, ray_weight = sample_rays(cam, sampler, width, height, spp)
    from .scene.scene import ray_intersect
    from .bsdf import api as bsdf_api

    si = ray_intersect(sd, ray, jnp.ones((n,), bool))
    lb = bsdf_api.gather_lane_bsdf(sd.bsdf, si.bsdf_id, si.uv)
    hitf = si.valid.astype(jnp.float32)
    albedo = jnp.where(si.valid[:, None], lb.reflectance, 0.0)
    normal = jnp.where(si.valid[:, None], si.frame.n, 0.0)
    depth = jnp.where(si.valid, si.t, 0.0)
    position = jnp.where(si.valid[:, None], si.p, 0.0)

    def avg(x, c):
        return x.reshape(spp, width * height, c).mean(axis=0).reshape(
            height, width, c)

    return {
        "albedo": avg(albedo, channels),
        "sh_normal": avg(normal, 3),
        "depth": avg(depth[:, None], 1),
        "position": avg(position, 3),
        "alpha": avg(hitf[:, None], 1),
    }


def render_aovs(scene: Scene, spp: int = 16, seed: int = 0, sensor: int = 0,
                aovs=("albedo", "sh_normal", "depth", "position", "alpha")):
    """First-hit arbitrary output variables for the steady image.

    Parity surface of the reference film's appended AOV channels
    (transient_hdr_film.py:176-190, driven by Mitsuba's ``aov`` plugin
    names): per-pixel averages over jittered camera rays of the hit
    albedo / shading normal / depth / world position / hit coverage.
    Returns {name: (H, W, k) jnp array}.
    """
    cfg = scene.sensors[sensor]
    if cfg.kind == "nlos_capture_meter":
        raise ValueError("AOVs apply to perspective sensors")
    film_cfg = cfg.film
    cam = build_camera(cfg)
    out = _aov_pass(
        scene.data, cam, seed, width=film_cfg.width, height=film_cfg.height,
        spp=spp, channels=scene.variant.color_channels)
    return {k: v for k, v in out.items() if k in aovs}
