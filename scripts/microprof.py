"""Piecewise timing of the regen-loop body components on TPU.

Times each hot component of integrators/path_regen.py's loop body in
isolation on a representative 2^21-lane wavefront, varying inputs between
reps (identical-arg relaunches can hit apparent caching through the axon
tunnel; see .claude/skills/verify).
"""
import sys
import time

sys.path.insert(0, ".")  # run from the repo root

import jax
import jax.numpy as jnp
import numpy as np

import mitransient_tpu as mitr
from mitransient_tpu.bsdf import api as bsdf_api
from mitransient_tpu.core.records import Ray
from mitransient_tpu.film.transient_film import film_init_any
from mitransient_tpu.integrators.path_regen import hash_uniform
from mitransient_tpu.ops.splat_pallas import splat_accumulate
from mitransient_tpu.scene.scene import (
    pdf_emitter_direction,
    ray_intersect,
    sample_emitter_direction,
)

N = 1 << 21
HW = 256 * 256
SPP = N // HW

scene = mitr.load_dict(mitr.cornell_box())
sd = scene.data
film_cfg = scene.sensors[0].film


def timeit(name, fn, *args_list):
    # warm
    r = fn(*args_list[0])
    jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
    best = 1e9
    for args in args_list[1:]:
        t0 = time.perf_counter()
        r = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:8.2f} ms")
    return best


def mk_rays(seed):
    k = jax.random.PRNGKey(seed)
    o = jax.random.uniform(k, (N, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@jax.jit
def f_intersect(o, d):
    si = ray_intersect(sd, Ray.make(o, d), jnp.ones((N,), bool))
    return jnp.sum(si.t) + jnp.sum(si.p) + jnp.sum(si.bsdf_id)


@jax.jit
def f_bsdf(o, d, u1, u2):
    si = ray_intersect(sd, Ray.make(o, d), jnp.ones((N,), bool))
    lb = bsdf_api.gather_lane_bsdf(sd.bsdf, si.bsdf_id, si.uv)
    f, pdf = bsdf_api.eval_pdf(lb, si.wi, si.wi, jnp.ones((N,), bool))
    bs = bsdf_api.sample(lb, si.wi, u1, u2, jnp.ones((N,), bool))
    return jnp.sum(f) + jnp.sum(pdf) + jnp.sum(bs.wo) + jnp.sum(bs.weight)


@jax.jit
def f_emitter(p, u2):
    ds, w = sample_emitter_direction(sd, p, u2, True, jnp.ones((N,), bool))
    return jnp.sum(ds.d) + jnp.sum(ds.pdf) + jnp.sum(w)


def mk_splat(seed):
    k = jax.random.PRNGKey(seed)
    bins = jax.random.randint(k, (N,), 0, 300, jnp.int32)
    vals = jax.random.uniform(jax.random.PRNGKey(seed + 1), (N, 3))
    return bins, vals


film = film_init_any(film_cfg, 3)
tpad = film.transient.shape[1]
hwpad = film.transient.shape[2]
print("film transient shape:", film.transient.shape)


@jax.jit
def _splat_sum(tr, bins, vals, bins2, vals2):
    tr = splat_accumulate(tr, bins, vals, bins2, vals2, spp=SPP, hw=HW)
    return tr, jnp.sum(tr[:, :2, :2])


def f_splat(bins, vals, bins2, vals2):
    global film
    tr, s = _splat_sum(film.transient, bins, vals, bins2, vals2)
    film = film._replace(transient=tr)
    return s


@jax.jit
def f_rng(seed):
    sid = jnp.arange(N, dtype=jnp.uint32)
    out = 0.0
    for k in range(8):
        out = out + hash_uniform(seed, sid, jnp.uint32(k))
    return out


o1, d1 = mk_rays(10)
o2, d2 = mk_rays(20)
o3, d3 = mk_rays(30)
u1a = jax.random.uniform(jax.random.PRNGKey(40), (N,))
u2a = jax.random.uniform(jax.random.PRNGKey(41), (N, 2))
u2b = jax.random.uniform(jax.random.PRNGKey(42), (N, 2))

t_int = timeit("ray_intersect", f_intersect, (o1, d1), (o2, d2), (o3, d3))
t_bsdf = timeit("intersect+bsdf(all)", f_bsdf, (o1, d1, u1a, u2a),
                (o2, d2, u1a, u2b), (o3, d3, u1a, u2a))
t_em = timeit("sample_emitter_direction", f_emitter, (o1, u2a), (o2, u2b),
              (o3, u2a))
ba1, va1 = mk_splat(50)
ba2, va2 = mk_splat(60)
ba3, va3 = mk_splat(70)
t_spl = timeit("splat x2 events", f_splat, (ba1, va1, ba2, va2),
               (ba2, va2, ba3, va3), (ba3, va3, ba1, va1))
t_rng = timeit("rng 8 dims", f_rng, (jnp.uint32(1),), (jnp.uint32(2),),
               (jnp.uint32(3),))
print(f"bsdf-only estimate: {(t_bsdf - t_int)*1e3:.2f} ms")
