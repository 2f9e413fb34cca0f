"""Round-5: re-tune SELECT_K / SUBLANES under the SAH candidate
distribution.  Env: R5_SELECT_K, R5_SUBLANES, R5_OCCL=1 (bench ray_test).
Run one config per process (module constants are baked at trace time).
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
    jnp.ones((128,))).block_until_ready()

from mitransient_tpu.ops import bvh_pallas as bp

if "R5_SELECT_K" in os.environ:
    bp.SELECT_K = int(os.environ["R5_SELECT_K"])
if "R5_SUBLANES" in os.environ:
    bp.SUBLANES = int(os.environ["R5_SUBLANES"])
    bp.TILE = bp.LANES * bp.SUBLANES
if "R5_LNUM" in os.environ:
    bp.LADDER_NUM = int(os.environ["R5_LNUM"])
if "R5_LDEN" in os.environ:
    bp.LADDER_DEN = int(os.environ["R5_LDEN"])
if "R5_FLOOR" in os.environ:
    bp.LADDER_FLOOR_TILES = int(os.environ["R5_FLOOR"])
occl = os.environ.get("R5_OCCL", "0") == "1"

import mitransient_tpu as mitr

scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml")
sd = scene.data
acc = sd.accel
v0 = np.asarray(sd.tri.v0)
N = 1 << 20
lo, hi = v0.min(axis=0), v0.max(axis=0)
center, span = (lo + hi) / 2, hi - lo
o = jnp.asarray(center, jnp.float32) + (jax.random.uniform(
    jax.random.PRNGKey(7), (N, 3)) - 0.5) * 0.9 * jnp.asarray(
        span, jnp.float32)
d = jax.random.normal(jax.random.PRNGKey(8), (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
co = jnp.broadcast_to(jnp.asarray(center + span * np.array(
    [0.0, 0.2, 1.2]), jnp.float32), (N, 3))
tgt = jnp.asarray(center, jnp.float32) + (jax.random.uniform(
    jax.random.PRNGKey(9), (N, 3)) - 0.5) * jnp.asarray(span, jnp.float32)
cd = tgt - co
cd = cd / jnp.linalg.norm(cd, axis=-1, keepdims=True)


@jax.jit
def q(o, d):
    if occl:
        h = bp.ray_test_bvh(acc, o, d, jnp.full((N,), 3e38),
                            jnp.ones((N,), bool))
        return jnp.sum(h.astype(jnp.float32))
    t, p = bp.closest_hit_bvh(acc, o, d, jnp.full((N,), 3e38),
                              jnp.ones((N,), bool))
    return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))


tag = (f"K={bp.SELECT_K} SUB={bp.SUBLANES} "
       f"L={bp.LADDER_NUM}/{bp.LADDER_DEN}@{bp.LADDER_FLOOR_TILES} "
       f"{'occl' if occl else 'closest'}")
for label, oo, dd in (("inc", o, d), ("coh", co, cd)):
    s = float(np.asarray(q(oo, dd)))
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        float(np.asarray(q(oo, dd)))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag} {label}: {N/best/1e6:7.2f} Mrays/s  (chk {s:.6g})",
          flush=True)
