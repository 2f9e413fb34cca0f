"""Attribute the NLOS render cost: intersect vs ray_test vs splat vs NEE
math vs direction sampling (VERDICT round-1 'What's weak' item 2).

The axon tunnel has a ~24 ms per-dispatch floor, so each component is run
K times inside ONE jit with a data dependence between iterations (no CSE),
and the floor is subtracted via a measured empty-loop baseline.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import mitransient_tpu as mitr
from mitransient_tpu.core.records import Ray
from mitransient_tpu.core.rng import Sampler, draw_bounce_block
from mitransient_tpu.scene.scene import ray_intersect, ray_test
from mitransient_tpu.integrators import nlos_path as NP
from mitransient_tpu.bsdf import api as bsdf_api
from mitransient_tpu.film.transient_film import film_init, splat_transient_pair

import tests.test_nlos as fx

mitr.set_variant("rgb")
d = fx.nlos_scene(sx=32, sy=32)
scene = mitr.load_dict(d)
mitr.nlos.focus_emitter_at_relay_wall_pixel([16.0, 16.0], scene)
sd = scene.data
cfg = scene.sensors[0]
icfg = scene.integrator
film_cfg = cfg.film
ctx = NP.prepare_nlos(scene, cfg)
print("tris:", sd.tri.v0.shape[0], "max_depth:", icfg.max_depth,
      "laser:", icfg.nlos_laser_sampling, "hg:",
      icfg.nlos_hidden_geometry_sampling, "bins:", film_cfg.temporal_bins)

spp = 2048
hw = film_cfg.width * film_cfg.height
n = spp * hw
print("lanes:", n)

ray, ray_w = NP.sample_nlos_rays(ctx, spp, hw)
key = Sampler(0, n, stream=0).key
act = jnp.ones((n,), bool)

K = 8
BASE_MS = [0.0]


def timeit(name, f, o_dep=True):
    """f(eps) -> pytree; eps is a traced scalar injected per iteration."""

    def looped(eps0):
        def body(i, eps):
            r = f(eps)
            leaves = [x for x in jax.tree_util.tree_leaves(r)
                      if hasattr(x, "astype")]
            s = sum(jnp.sum(x[:8].astype(jnp.float32)) for x in leaves)
            return eps + s * 1e-30
        return jax.lax.fori_loop(0, K, body, eps0)

    g = jax.jit(looped)
    float(g(0.0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(0.0))
        best = min(best, time.perf_counter() - t0)
    ms = (best * 1e3 - BASE_MS[0]) / K
    print(f"{name:26s} {ms:8.2f} ms/iter", flush=True)
    return ms


# dispatch floor
def empty(eps):
    return eps * 2.0


def floor_loop(eps0):
    return jax.lax.fori_loop(0, K, lambda i, e: e * 1.0000001, eps0)


gf = jax.jit(floor_loop)
float(gf(0.0))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    float(gf(0.0))
    best = min(best, time.perf_counter() - t0)
BASE_MS[0] = best * 1e3
print(f"{'dispatch floor':26s} {BASE_MS[0]:8.2f} ms")

si0 = jax.jit(lambda o, dd: ray_intersect(sd, Ray.make(o, dd), act))(
    ray.o, ray.d)
lt = jnp.broadcast_to(ctx.laser_target, si0.p.shape)
d1v = lt - si0.p
dist1 = jnp.sqrt(jnp.maximum(jnp.sum(d1v * d1v, -1), 1e-20))
d1 = d1v / dist1[:, None]
lb0 = jax.jit(lambda bid, uv: bsdf_api.gather_lane_bsdf(sd.bsdf, bid, uv))(
    si0.bsdf_id, si0.uv)
wo1 = si0.frame.to_local(d1)
ub = draw_bounce_block(key, 0, n, NP.NLOS_DIMS_PER_BOUNCE)
film = film_init(film_cfg, 3, scan_pixels=hw)
L = jnp.ones((n, 3), jnp.float32)

timeit("ray_intersect", lambda e: ray_intersect(
    sd, Ray.make(ray.o + e, ray.d), act))
timeit("ray_test", lambda e: ray_test(
    sd, si0.p + d1 * 1e-4 + e, d1, dist1 - 2e-4, act))
timeit("gather_lane_bsdf", lambda e: bsdf_api.gather_lane_bsdf(
    sd.bsdf, si0.bsdf_id, si0.uv + e))
timeit("bsdf eval_pdf", lambda e: bsdf_api.eval_pdf(
    lb0, si0.wi, wo1 + e, act))
timeit("bsdf sample", lambda e: bsdf_api.sample(
    lb0, si0.wi, ub[:, 6] + e, ub[:, 7:9], act))
timeit("draw_bounce_block", lambda e: draw_bounce_block(
    key, 0, n, NP.NLOS_DIMS_PER_BOUNCE))
timeit("sample_hidden_point", lambda e: NP._sample_hidden_point(
    sd, ctx, ub[:, 4] + e, ub[:, 5]))
timeit("splat_transient_pair", lambda e: splat_transient_pair(
    film, film_cfg, spp, dist1 + e, L, dist1, L, act,
    icfg.temporal_filter, icfg.gaussian_stddev))
timeit("_laser_nee", lambda e: NP._laser_nee(
    sd, ctx, icfg, si0, lb0, jnp.ones((n, 3)) + e, dist1, jnp.ones((n,)),
    0, act, True, wi_world=ray.d))
