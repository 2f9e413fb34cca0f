"""Big-scene ray-query throughput (staircase, 262k tris).

Measures closest-hit Mrays/s through the chunked accel structure for two
wavefront regimes: coherent primary rays and incoherent bounce-like rays.
Run from the repo root on the TPU.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import mitransient_tpu as mitr
from mitransient_tpu.ops.bvh_pallas import closest_hit_bvh

scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml")
sd = scene.data
accel = sd.accel
print("tris:", sd.tri.v0.shape[0], "chunks:", accel.pages.shape[0])

N = 1 << 20
lo = np.asarray(accel.aabb_min).min(axis=0)
hi = np.asarray(accel.aabb_max).max(axis=0)
center = (lo + hi) / 2
span = (hi - lo)

k = jax.random.PRNGKey(0)


def coherent(seed):
    kk = jax.random.PRNGKey(seed)
    # camera-like: one origin, jittered directions toward the scene
    o = jnp.broadcast_to(jnp.asarray(center + span * np.array(
        [0.0, 0.2, 1.2]), jnp.float32), (N, 3))
    tgt = jnp.asarray(center, jnp.float32) + (
        jax.random.uniform(kk, (N, 3)) - 0.5) * jnp.asarray(span, jnp.float32)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def incoherent(seed):
    kk = jax.random.PRNGKey(seed)
    o = jnp.asarray(center, jnp.float32) + (
        jax.random.uniform(kk, (N, 3)) - 0.5) * 0.9 * jnp.asarray(
            span, jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@jax.jit
def q(o, d):
    t, p = closest_hit_bvh(accel, o, d, jnp.full((N,), 3e38), jnp.ones((N,), bool))
    return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)), jnp.sum(p >= 0)


for name, gen in (("coherent", coherent), ("incoherent", incoherent)):
    s, h = q(*gen(0))
    float(s)
    best = 1e9
    for rep in range(3):
        o, d = gen(rep + 1)
        t0 = time.perf_counter()
        s, h = q(o, d)
        float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s}: {N/best/1e6:8.2f} Mrays/s  "
          f"(hit rate {float(h)/N:.2f}, {best*1e3:.1f} ms)")
