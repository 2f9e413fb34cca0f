"""Ablation timing of the NLOS pass: stub out one component at a time and
measure the full jitted pass, attributing wall time per component."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import mitransient_tpu as mitr
from mitransient_tpu.integrators import nlos_path as NP
from mitransient_tpu.bsdf import api as bsdf_api
from mitransient_tpu import core
from mitransient_tpu.core import rng as RNG
from mitransient_tpu.film import transient_film as TF

import tests.test_nlos as fx

mitr.set_variant("rgb")
d = fx.nlos_scene(sx=32, sy=32)
scene = mitr.load_dict(d)
mitr.nlos.focus_emitter_at_relay_wall_pixel([16.0, 16.0], scene)
SPP = 2048


def run(label):
    # fresh jit every time (the stubbed module fns are baked in at trace)
    t0 = time.perf_counter()
    s, t, stats = mitr.render(scene, spp=SPP, seed=3, return_stats=True)
    float(np.asarray(s).sum())
    compile_s = time.perf_counter() - t0
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        s, t, stats = mitr.render(scene, spp=SPP, seed=4 + rep,
                                  return_stats=True)
        float(np.asarray(s).sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1e3:8.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return best


base = run("baseline")

# --- stub closest-hit: reuse a constant interaction --------------------
orig_ri = NP.ray_intersect


def fake_ri(sd, ray, active):
    si = orig_ri(sd, ray, active)
    # keep the structure but cut the query: overwrite hot fields with
    # cheap functions of ray only
    return si


# proper stub: replace with first-bounce cached interaction is hard under
# jit; instead time the query in isolation via a reduced-depth render.

# --- stub ray_test (shadow rays) ----------------------------------------
NP.ray_test = lambda sd, o, d, t, a: jnp.zeros(o.shape[:1], bool)
t_no_shadow = run("no shadow rays")
NP.ray_test = orig_ri and __import__(
    "mitransient_tpu.scene.scene", fromlist=["ray_test"]).ray_test

# --- stub splat ---------------------------------------------------------
orig_splat = NP.splat_transient_pair
NP.splat_transient_pair = (
    lambda st, cfg, spp, da, va, db, vb, act, *a, **k: st)
t_no_splat = run("no transient splat")
NP.splat_transient_pair = orig_splat

# --- stub RNG -----------------------------------------------------------
orig_draw = RNG.draw_bounce_block


def fake_draw(key, it, n, dims):
    return jnp.full((n, dims), 0.5, jnp.float32)


RNG.draw_bounce_block = fake_draw
t_no_rng = run("no RNG draw")
RNG.draw_bounce_block = orig_draw

# --- stub BSDF eval_pdf ---------------------------------------------------
orig_eval = bsdf_api.eval_pdf


def fake_eval(lb, wi, wo, active):
    C = lb.reflectance.shape[-1]
    n = wi.shape[0]
    return jnp.full((n, C), 0.3), jnp.full((n,), 0.3)


bsdf_api.eval_pdf = fake_eval
t_no_eval = run("no bsdf eval_pdf")
bsdf_api.eval_pdf = orig_eval

# --- stub bsdf sample -----------------------------------------------------
orig_sample = bsdf_api.sample


def fake_sample(lb, wi, u1, u2, active):
    bs = orig_sample(lb, wi, u1, u2, active)
    return bs


# cosine-only sample stub
def fake_sample2(lb, wi, u1, u2, active):
    from mitransient_tpu.core.warp import square_to_cosine_hemisphere

    wo = square_to_cosine_hemisphere(u2)
    C = lb.reflectance.shape[-1]
    n = wi.shape[0]
    bs = orig_sample(lb, wi, u1, u2, active)
    return bs._replace(wo=wo, weight=jnp.full((n, C), 0.5),
                       pdf=jnp.full((n,), 0.3),
                       delta=jnp.zeros((n,), bool),
                       eta=jnp.ones((n,)))


bsdf_api.sample = fake_sample2
t_no_sample = run("cheap bsdf sample")
bsdf_api.sample = orig_sample

# --- stub hidden-geometry sampling ---------------------------------------
orig_hg = NP._sample_hidden_point


def fake_hg(sd, ctx, u0, u1):
    n = u0.shape[0]
    p = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.5]), (n, 3))
    ng = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
    return p, ng, jnp.full((n,), 1.0)


NP._sample_hidden_point = fake_hg
t_no_hg = run("no hidden-geom sampling")
NP._sample_hidden_point = orig_hg

print("\nattribution (baseline - ablated):")
for name, t in [("shadow rays", t_no_shadow), ("splat", t_no_splat),
                ("rng", t_no_rng), ("bsdf eval_pdf", t_no_eval),
                ("bsdf sample", t_no_sample), ("hidden geom", t_no_hg)]:
    print(f"  {name:20s} {(base - t)*1e3:8.1f} ms")
