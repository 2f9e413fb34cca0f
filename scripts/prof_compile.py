"""Bisect NLOS compile time at the real benchmark shape: time trace (jit
lower) vs XLA compile for the NLOS one-pass, with pieces disabled.

Usage: python scripts/prof_compile.py [sx sy spp] [variant ...]
Variants: full nolaser nohg plain depth1 nosplat
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import mitransient_tpu as mitr
from mitransient_tpu.core.rng import Sampler
from mitransient_tpu.film.transient_film import film_init
from mitransient_tpu.integrators import nlos_path as NP
from mitransient_tpu.film import transient_film as TF


def build(sx, sy, spp, max_depth=4, laser=True, hg=True):
    from tests.test_nlos import nlos_scene

    d = nlos_scene(sx=sx, sy=sy, laser_sampling=laser, hg_sampling=hg,
                   spp=spp)
    d["integrator"]["max_depth"] = max_depth
    scene = mitr.load_dict(d)
    mitr.nlos.focus_emitter_at_relay_wall_pixel([sx / 2, sy / 2], scene)
    return scene


def profile(name, scene, spp, nosplat=False):
    cfg = scene.sensors[0]
    icfg = scene.integrator
    film_cfg = cfg.film
    hw = film_cfg.width * film_cfg.height
    ctx = NP.prepare_nlos(scene, cfg)
    skip_le = NP.can_skip_le(scene.data)
    film = film_init(film_cfg, 3, scan_pixels=hw)

    if nosplat:
        orig = TF.splat_transient_pair

        def dummy(state, cfg_, spp_, da, va, db, vb, act, *a, **k):
            s = state.steady + jnp.sum(va) + (0 if vb is None else jnp.sum(vb))
            return state._replace(steady=s)
        TF.splat_transient_pair = dummy
        NP.splat_transient_pair = dummy

    def one_pass(sd, ctx_, film):
        sampler = Sampler(jnp.uint32(0), spp * hw, stream=jnp.uint32(0))
        ray, ray_weight = NP.sample_nlos_rays(ctx_, spp, hw)
        film, L, valid, n_rays = NP.sample_nlos_primal(
            sd, ctx_, sampler, ray, ray_weight, film, film_cfg, icfg,
            jnp.float32(1.0 / spp), base_dim=2, spp=spp,
            skip_le=skip_le)
        return film, n_rays

    print(f"{name}: preparing done, tracing...", flush=True)
    t0 = time.perf_counter()
    lowered = jax.jit(one_pass).lower(scene.data, ctx, film)
    t1 = time.perf_counter()
    print(f"{name}: traced in {t1-t0:.1f}s, compiling...", flush=True)
    n_lines = -1
    t2 = time.perf_counter()
    compiled = lowered.compile()
    t3 = time.perf_counter()
    print(f"{name:12s} trace={t1-t0:7.2f}s hlo_lines={n_lines:7d} "
          f"compile={t3-t2:7.2f}s", flush=True)
    if nosplat:
        TF.splat_transient_pair = orig
        NP.splat_transient_pair = orig
    return compiled


if __name__ == "__main__":
    args = sys.argv[1:]
    if len(args) >= 3 and args[0].isdigit():
        sx, sy, spp = int(args[0]), int(args[1]), int(args[2])
        variants = args[3:] or ["full"]
    else:
        sx, sy, spp = 8, 8, 16
        variants = args or ["full"]
    for v in variants:
        if v == "full":
            profile("full", build(sx, sy, spp), spp)
        elif v == "nolaser":
            profile("nolaser", build(sx, sy, spp, laser=False), spp)
        elif v == "nohg":
            profile("nohg", build(sx, sy, spp, hg=False), spp)
        elif v == "plain":
            profile("plain", build(sx, sy, spp, laser=False, hg=False), spp)
        elif v == "depth1":
            profile("depth1", build(sx, sy, spp, max_depth=1), spp)
        elif v == "nosplat":
            profile("nosplat", build(sx, sy, spp), spp, nosplat=True)
        else:
            print("unknown variant", v)
