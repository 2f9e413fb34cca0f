"""Bisect NLOS compile time: time trace (jit lower) vs XLA compile for the
NLOS one-pass at the tests/test_nlos.py workload, with pieces disabled.

Usage: python scripts/prof_compile.py [variant ...]
Variants: full, nolaser, nohg, nosplat, nointersect, depth1, depth2
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


def build(sx=8, sy=8, spp=16, max_depth=4, laser=True, hg=True):
    from tests.test_nlos import nlos_scene

    d = nlos_scene(sx=sx, sy=sy, laser_sampling=laser, hg_sampling=hg,
                   spp=spp)
    d["integrator"]["max_depth"] = max_depth
    scene = mitr.load_dict(d)
    mitr.nlos.focus_emitter_at_relay_wall_pixel([sx / 2, sy / 2], scene)
    return scene


def profile(name, scene, spp=16):
    cfg = scene.sensors[0]
    icfg = scene.integrator
    film_cfg = cfg.film
    hw = film_cfg.width * film_cfg.height
    ctx = NP.prepare_nlos(scene, cfg)
    skip_le = NP.can_skip_le(scene.data)
    film = film_init(film_cfg, 3, scan_pixels=hw)

    def one_pass(sd, ctx_, film):
        sampler = Sampler(jnp.uint32(0), spp * hw, stream=jnp.uint32(0))
        ray, ray_weight = NP.sample_nlos_rays(ctx_, spp, hw)
        film, L, valid, n_rays = NP.sample_nlos_primal(
            sd, ctx_, sampler, ray, ray_weight, film, film_cfg, icfg,
            jnp.float32(1.0 / spp), base_dim=2, spp=spp,
            skip_le=skip_le)
        return film, n_rays

    t0 = time.perf_counter()
    lowered = jax.jit(one_pass).lower(scene.data, ctx, film)
    t1 = time.perf_counter()
    txt = lowered.as_text()
    n_lines = txt.count("\n")
    t2 = time.perf_counter()
    compiled = lowered.compile()
    t3 = time.perf_counter()
    print(f"{name:12s} trace={t1-t0:7.2f}s hlo_lines={n_lines:7d} "
          f"compile={t3-t2:7.2f}s", flush=True)
    return compiled


if __name__ == "__main__":
    variants = sys.argv[1:] or ["full"]
    for v in variants:
        if v == "full":
            profile("full", build())
        elif v == "nolaser":
            profile("nolaser", build(laser=False))
        elif v == "nohg":
            profile("nohg", build(hg=False))
        elif v == "plain":
            profile("plain", build(laser=False, hg=False))
        elif v == "depth1":
            profile("depth1", build(max_depth=1))
        elif v == "depth2":
            profile("depth2", build(max_depth=2))
        else:
            print("unknown variant", v)
