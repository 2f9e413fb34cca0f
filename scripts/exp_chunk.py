"""Quick chunk-size experiment for the big-scene accel.

Usage: CHUNK_TRIS=128 SUPER_CHUNKS=16 python scripts/exp_chunk.py
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mitransient_tpu.ops import accel as A

ct = int(os.environ.get("CHUNK_TRIS", A.CHUNK_TRIS))
sc = int(os.environ.get("SUPER_CHUNKS", A.SUPER_CHUNKS))
A.CHUNK_TRIS = ct
A.SUPER_CHUNKS = sc

from mitransient_tpu.ops import bvh_pallas as B

B.CHUNK_TRIS = ct
B.SUPER_CHUNKS = sc
B.TRI_ROWS = ct // 8
sl = int(os.environ.get("SUBLANES", B.SUBLANES))
B.SUBLANES = sl
B.TILE = B.LANES * sl

import mitransient_tpu as mitr

t0 = time.perf_counter()
scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml")
accel = scene.data.accel
print(f"load {time.perf_counter()-t0:.1f}s  chunks={accel.pages.shape[0]} "
      f"tri_rows={accel.pages.shape[1]}", flush=True)

N = 1 << 19
lo = np.asarray(accel.aabb_min).min(axis=0)
hi = np.asarray(accel.aabb_max).max(axis=0)
center = (lo + hi) / 2
span = hi - lo


def coherent(seed):
    kk = jax.random.PRNGKey(seed)
    o = jnp.broadcast_to(jnp.asarray(center + span * np.array(
        [0.0, 0.2, 1.2]), jnp.float32), (N, 3))
    tgt = jnp.asarray(center, jnp.float32) + (
        jax.random.uniform(kk, (N, 3)) - 0.5) * jnp.asarray(span, jnp.float32)
    d = tgt - o
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def incoherent(seed):
    kk = jax.random.PRNGKey(seed)
    o = jnp.asarray(center, jnp.float32) + (
        jax.random.uniform(kk, (N, 3)) - 0.5) * 0.9 * jnp.asarray(
            span, jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, 3))
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


@jax.jit
def q(o, d):
    t, p = B.closest_hit_bvh(accel, o, d, jnp.full((N,), 3e38),
                             jnp.ones((N,), bool))
    return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)), jnp.sum(p >= 0)


for name, gen in (("coherent", coherent), ("incoherent", incoherent)):
    t0 = time.perf_counter()
    s, h = q(*gen(0))
    float(s)
    print(f"{name} warm+compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for rep in range(2):
        o, d = gen(rep + 1)
        t0 = time.perf_counter()
        s, h = q(o, d)
        float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s}: {N/best/1e6:8.2f} Mrays/s  "
          f"(hit rate {float(h)/N:.2f}, {best*1e3:.1f} ms)", flush=True)
