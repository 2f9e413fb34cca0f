"""Multi-chip SPMD rendering over a jax.sharding.Mesh.

The reference has no multi-device code at all (SURVEY.md section 2.3): its
parallelism is one Dr.Jit megakernel on one device.  The TPU-native design
generalizes the wavefront: the **spp axis is the data-parallel axis**.  Every
chip renders the full image with an independent counter-based sample stream
(stream id = pass * n_devices + axis_index), producing a private transient
film partial; partials and ray counters are ``psum``-all-reduced over ICI at
the end of the pass.  Scene geometry / BSDF / emitter tables are replicated
— they are tiny next to the wavefront state.  This is the distributed
equivalent of the reference's sequential pass splitting
(common.py:51-85): passes become (device, pass) pairs.

Determinism: the counter-based RNG means the set of samples drawn for a
given (seed, total_spp, n_devices) partitioning is reproducible, and the
only cross-device reduction is a float sum over film partials.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.rng import Sampler
from ..film.transient_film import develop, film_init, splat_steady
from ..integrators.path import sample_primal
from ..scene.schema import Scene
from ..sensors.perspective import build_camera, sample_rays


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), ("shard",))


def render_sharded(
    scene: Scene,
    mesh: Mesh,
    spp: int | None = None,
    seed: int = 0,
    sensor: int = 0,
    spp_per_pass_per_device: int | None = None,
    return_stats: bool = False,
):
    """Distributed ``render``: returns (steady, transient) replicated.

    ``spp`` is the *global* sample count; it is split across
    ``mesh.size`` devices and sequential passes.
    """
    cfg = scene.sensors[sensor]
    if cfg.kind != "perspective":
        raise NotImplementedError("sharded NLOS rendering lands with the NLOS integrator")
    icfg = scene.integrator
    film_cfg = cfg.film
    ndev = mesh.size
    spp = spp if spp is not None else cfg.spp

    spp_dev = max(1, spp // ndev)
    chunk = spp_per_pass_per_device or min(
        spp_dev, max(1, (1 << 21) // (film_cfg.width * film_cfg.height))
    )
    n_passes = (spp_dev + chunk - 1) // chunk
    chunk = (spp_dev + n_passes - 1) // n_passes
    total_spp = chunk * n_passes * ndev

    cam = build_camera(cfg)
    C = scene.variant.color_channels

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def one_pass(sd, cam_, seed_, pass_idx):
        didx = jax.lax.axis_index("shard")
        stream = pass_idx * ndev + didx.astype(jnp.uint32)
        n = film_cfg.width * film_cfg.height * chunk
        sampler = Sampler(seed_, n, stream=stream)
        film = film_init(film_cfg, C)
        ray, pix, ray_weight = sample_rays(
            cam_, sampler, film_cfg.width, film_cfg.height, chunk
        )
        film, L, valid, n_rays = sample_primal(
            sd, sampler, ray, pix, ray_weight, film, film_cfg, icfg,
            sample_scale=1.0 / total_spp, base_dim=2, spp=chunk,
        )
        film = splat_steady(film, chunk, L, ray_weight)
        # all-reduce partials over ICI
        film = jax.tree.map(lambda x: jax.lax.psum(x, "shard"), film)
        n_rays = jax.lax.psum(n_rays, "shard")
        return film, n_rays

    one_pass_jit = jax.jit(one_pass)

    acc = None
    total_rays = 0.0
    for p in range(n_passes):
        film, n_rays = one_pass_jit(
            scene.data, cam, jnp.uint32(seed), jnp.uint32(p)
        )
        total_rays = total_rays + n_rays
        acc = film if acc is None else jax.tree.map(jnp.add, acc, film)
    steady, transient = develop(acc, film_cfg)
    if return_stats:
        return steady, transient, {"rays": total_rays, "spp": total_spp,
                                   "devices": ndev}
    return steady, transient


def render_backward_sharded(
    scene: Scene,
    mesh: Mesh,
    grad_in,
    spp: int | None = None,
    seed: int = 0,
    sensor: int = 0,
):
    """Distributed PRB: every device runs the two-sweep replay on its spp
    share (independent counter streams), parameter-table gradients are
    psum-all-reduced over ICI — the full data-parallel training step of an
    inverse-rendering loop (the distributed generalization the reference
    lacks, SURVEY.md section 2.3).

    Returns the same gradient dict as ``render_backward``.
    """
    import jax.numpy as jnp
    from ..integrators.path import sample_primal
    from ..integrators.prb import sample_adjoint
    from ..film.transient_film import film_init

    cfg = scene.sensors[sensor]
    if cfg.kind != "perspective":
        raise NotImplementedError("sharded NLOS gradients not implemented")
    icfg = scene.integrator
    film_cfg = cfg.film
    ndev = mesh.size
    spp = spp if spp is not None else cfg.spp
    spp_dev = max(1, spp // ndev)
    total_spp = spp_dev * ndev
    hw = film_cfg.width * film_cfg.height
    C = scene.variant.color_channels
    T = film_cfg.temporal_bins

    grad_steady, grad_transient = grad_in
    gs = (jnp.zeros((hw, C), jnp.float32) if grad_steady is None
          else jnp.asarray(grad_steady, jnp.float32).reshape(hw, C))
    gt = (jnp.zeros((hw * T, C), jnp.float32) if grad_transient is None
          else jnp.asarray(grad_transient, jnp.float32).reshape(hw * T, C))

    cam = build_camera(cfg)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def step(sd, cam_, gs_, gt_, seed_):
        didx = jax.lax.axis_index("shard").astype(jnp.uint32)
        n = hw * spp_dev
        sampler = Sampler(seed_, n, stream=didx)
        ray, pix, ray_weight = sample_rays(
            cam_, sampler, film_cfg.width, film_cfg.height, spp_dev)
        film = film_init(film_cfg, C)
        _f, L, _v, _r = sample_primal(
            sd, sampler, ray, pix, ray_weight, film, film_cfg, icfg,
            sample_scale=1.0 / total_spp, base_dim=2, spp=spp_dev,
            enable_film=False,
        )
        grads = sample_adjoint(
            sd, sampler.key, ray, pix, ray_weight, L, gt_, gs_,
            film_cfg, icfg, 1.0 / total_spp, base_dim=2, mode="backward",
        )
        return jax.tree.map(lambda x: jax.lax.psum(x, "shard"), grads)

    grads = jax.jit(step)(scene.data, cam, gs, gt, jnp.uint32(seed))
    out = {"__tables__": grads}
    for path, (table, idx) in scene._param_paths.items():
        if table == "bsdf.reflectance":
            out[path] = grads.bsdf_reflectance[idx]
        elif table == "emitter.radiance":
            out[path] = grads.emitter_radiance[idx]
    return out
