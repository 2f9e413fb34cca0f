"""Marginal per-iteration cost of each regen-loop component.

Runs K repetitions of the component inside ONE jitted lax.fori_loop (data-
dependent so XLA can't elide), timed at K=2 and K=2+STEP; the marginal cost
(t2 - t1)/STEP excludes dispatch/tunnel latency.
"""
import sys
import time

sys.path.insert(0, ".")

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
    ray_intersect,
    sample_emitter_direction,
)

N = 1 << 21
HW = 256 * 256
SPP = N // HW
STEP = 10

scene = mitr.load_dict(mitr.cornell_box())
sd = scene.data
film_cfg = scene.sensors[0].film
film = film_init_any(film_cfg, 3)


def marginal(name, make_fn, args):
    f2 = jax.jit(make_fn(2))
    fK = jax.jit(make_fn(2 + STEP))
    # warm both
    np.asarray(f2(*args)), np.asarray(fK(*args))
    ts = {2: 1e9, 2 + STEP: 1e9}
    for rep in range(3):
        for k, f in ((2, f2), (2 + STEP, fK)):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            ts[k] = min(ts[k], time.perf_counter() - t0)
    per = (ts[2 + STEP] - ts[2]) / STEP * 1e3
    print(f"{name:28s} {per:8.2f} ms/iter   (k2={ts[2]*1e3:.1f} ms)")
    return per


def mk_intersect(K):
    def f(o, d):
        def body(i, carry):
            o, d, acc = carry
            si = ray_intersect(sd, Ray.make(o, d), jnp.ones((N,), bool))
            # feed outputs back so iterations serialize
            o2 = si.p * 1e-6 + o * (1.0 - 1e-6)
            return o2, d, acc + jnp.sum(si.t)
        _, _, acc = jax.lax.fori_loop(0, K, body, (o, d, jnp.float32(0)))
        return acc
    return f


def mk_bsdf(K):
    def f(o, d, u1, u2):
        si = ray_intersect(sd, Ray.make(o, d), jnp.ones((N,), bool))
        def body(i, carry):
            u1, u2, acc = carry
            lb = bsdf_api.gather_lane_bsdf(sd.bsdf, si.bsdf_id, si.uv)
            fv, pdf = bsdf_api.eval_pdf(lb, si.wi, si.wi,
                                        jnp.ones((N,), bool))
            bs = bsdf_api.sample(lb, si.wi, u1, u2, jnp.ones((N,), bool))
            u1b = (u1 + pdf * 1e-7) % 1.0
            return u1b, u2, acc + jnp.sum(fv) + jnp.sum(bs.wo)
        _, _, acc = jax.lax.fori_loop(0, K, body,
                                      (u1, u2, jnp.float32(0)))
        return acc
    return f


def mk_emitter(K):
    def f(p, u2):
        def body(i, carry):
            p, acc = carry
            ds, w = sample_emitter_direction(sd, p, u2, True,
                                             jnp.ones((N,), bool))
            return p + ds.d * 1e-7, acc + jnp.sum(w)
        _, acc = jax.lax.fori_loop(0, K, body, (p, jnp.float32(0)))
        return acc
    return f


def mk_splat(K):
    def f(tr, bins, vals, bins2, vals2):
        def body(i, carry):
            tr, acc = carry
            tr = splat_accumulate(tr, bins + i, vals, bins2 + i, vals2,
                                  spp=SPP, hw=HW)
            return tr, acc + tr[0, 0, 0]
        tr, acc = jax.lax.fori_loop(0, K, body, (tr, jnp.float32(0)))
        return acc
    return f


def mk_rng(K):
    def f(seed):
        sid = jnp.arange(N, dtype=jnp.uint32)
        def body(i, acc):
            out = acc
            for k in range(8):
                out = out + jnp.sum(hash_uniform(
                    seed + i.astype(jnp.uint32), sid, jnp.uint32(k)))
            return out
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return f


k = jax.random.PRNGKey(0)
o = jax.random.uniform(k, (N, 3), minval=-0.9, maxval=0.9)
d = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
u1 = jax.random.uniform(jax.random.PRNGKey(2), (N,))
u2 = jax.random.uniform(jax.random.PRNGKey(3), (N, 2))
bins = jax.random.randint(jax.random.PRNGKey(4), (N,), 0, 280, jnp.int32)
vals = jax.random.uniform(jax.random.PRNGKey(5), (N, 3))
bins2 = jax.random.randint(jax.random.PRNGKey(6), (N,), 0, 280, jnp.int32)
vals2 = jax.random.uniform(jax.random.PRNGKey(7), (N, 3))

ALL = {
    "intersect": ("ray_intersect", mk_intersect, (o, d)),
    "bsdf": ("bsdf gather+eval+sample", mk_bsdf, (o, d, u1, u2)),
    "emitter": ("sample_emitter_direction", mk_emitter, (o, u2)),
    "splat": ("splat x2 events", mk_splat,
              (film.transient, bins, vals, bins2, vals2)),
    "rng": ("rng 8 dims", mk_rng, (jnp.uint32(1),)),
}
which = sys.argv[1:] or list(ALL)
for w in which:
    name, fn, args = ALL[w]
    print("running", w, flush=True)
    marginal(name, fn, args)
