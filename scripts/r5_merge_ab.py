"""Round-5: does merging two half-size wavefronts into one query win?

Times closest-hit over two independent 512k incoherent staircase
wavefronts as (a) two sequential queries, (b) one concatenated 1M-ray
query.  The delta is the amortization + tile-packing gain available to a
pipelined combined shadow+next-bounce query in the integrators.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
    jnp.ones((128,))).block_until_ready()

import mitransient_tpu as mitr
from mitransient_tpu.ops.bvh_pallas import closest_hit_bvh

scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml")
acc = scene.data.accel
v0 = np.asarray(scene.data.tri.v0)
N = 1 << 19
lo, hi = v0.min(axis=0), v0.max(axis=0)
center, span = (lo + hi) / 2, hi - lo


def rays(seed):
    o = jnp.asarray(center, jnp.float32) + (jax.random.uniform(
        jax.random.PRNGKey(seed), (N, 3)) - 0.5) * 0.9 * jnp.asarray(
            span, jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


o1, d1 = rays(7)
o2, d2 = rays(17)
mx = jnp.full((N,), 3e38)
act = jnp.ones((N,), bool)


@jax.jit
def two(o1, d1, o2, d2):
    t1, p1 = closest_hit_bvh(acc, o1, d1, mx, act)
    t2, p2 = closest_hit_bvh(acc, o2, d2, mx, act)
    return (jnp.sum(jnp.where(jnp.isfinite(t1), t1, 0.0))
            + jnp.sum(jnp.where(jnp.isfinite(t2), t2, 0.0)))


@jax.jit
def one(o1, d1, o2, d2):
    o = jnp.concatenate([o1, o2])
    d = jnp.concatenate([d1, d2])
    t, p = closest_hit_bvh(acc, o, d, jnp.full((2 * N,), 3e38),
                           jnp.ones((2 * N,), bool))
    return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))


def timeit(fn, reps=6):
    s = float(np.asarray(fn(o1, d1, o2, d2)))
    t0 = time.perf_counter()
    for _ in range(reps):
        s2 = fn(o1, d1, o2, d2)
    float(np.asarray(s2))
    return (time.perf_counter() - t0) / reps - 0.0014, s


for tag, fn in (("two 512k", two), ("one 1M  ", one)):
    dt, s = timeit(fn)
    print(f"{tag}: {dt*1e3:7.1f} ms  ({2*N/dt/1e6:5.2f} Mrays/s)  "
          f"checksum {s:.6g}", flush=True)
