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
from .film.transient_film import develop, film_init, splat_steady
from .integrators.path import sample_primal
from .scene.schema import FilmConfig, IntegratorConfig, Scene
from .sensors.perspective import build_camera, sample_rays

# Lane budget per pass (lanes = pixels * spp_chunk).  2^21 lanes * ~50 f32 of
# live state ~ 400 MB — comfortable on a 16 GB chip while big enough to fill
# the VPU.
DEFAULT_MAX_LANES = 1 << 21


@partial(
    jax.jit,
    static_argnames=("film_cfg", "icfg", "width", "height", "spp_chunk"),
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
):
    n = width * height * spp_chunk
    sampler = Sampler(seed, n, stream=pass_idx)
    ray, pix, ray_weight = sample_rays(cam, sampler, width, height, spp_chunk)
    film, L, valid, n_rays = sample_primal(
        sd, sampler, ray, pix, ray_weight, film, film_cfg, icfg,
        sample_scale=inv_total_spp, base_dim=2, spp=spp_chunk,
    )
    film = splat_steady(film, spp_chunk, L, ray_weight)
    return film, n_rays


def render(
    scene: Scene,
    spp: int | None = None,
    seed: int = 0,
    sensor: int = 0,
    max_lanes: int = DEFAULT_MAX_LANES,
    progress_callback=None,
    return_stats: bool = False,
):
    """Render ``(steady, transient)`` for the scene's sensor.

    Parity surface of ``mi.render`` on a transient scene (README.md:154-160
    of the reference): returns steady ``(H, W, C)`` and transient
    ``(H, W, T, C)`` jnp arrays.
    """
    cfg = scene.sensors[sensor]
    if cfg.kind == "nlos_capture_meter":
        from .integrators.nlos_path import render_nlos

        return render_nlos(scene, spp=spp, seed=seed, sensor=sensor,
                           max_lanes=max_lanes,
                           progress_callback=progress_callback)

    icfg = scene.integrator
    film_cfg = cfg.film
    spp = spp if spp is not None else cfg.spp
    hw = film_cfg.width * film_cfg.height

    spp_chunk = max(1, min(spp, max_lanes // max(hw, 1)))
    n_passes = (spp + spp_chunk - 1) // spp_chunk
    spp_chunk = (spp + n_passes - 1) // n_passes  # even-ish split
    total_spp = spp_chunk * n_passes

    cam = build_camera(cfg)
    film = film_init(film_cfg, scene.variant.color_channels)
    total_rays = 0.0
    for p in range(n_passes):
        film, n_rays = _perspective_pass(
            scene.data, cam, film, jnp.uint32(seed), jnp.uint32(p),
            jnp.float32(1.0 / total_spp),
            film_cfg=film_cfg, icfg=icfg,
            width=film_cfg.width, height=film_cfg.height,
            spp_chunk=spp_chunk,
        )
        total_rays = total_rays + n_rays
        if progress_callback is not None:
            progress_callback((p + 1) / n_passes)
    steady, transient = develop(film, film_cfg)
    if return_stats:
        return steady, transient, {"rays": total_rays, "spp": total_spp}
    return steady, transient
