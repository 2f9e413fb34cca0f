"""Round-5: candidate-count comparison of median-split vs binned-SAH chunk
bounds on the staircase (262k tris), plus end-to-end synthetic query rates.

Per-ray candidate count = number of chunks whose AABB entry distance beats
the ray's TRUE hit t (the quantity that bounds the pass count of the
front-to-back loop).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# warm up the loop-program cache (axon first-loop cost)
jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
    jnp.ones((128,))).block_until_ready()

import mitransient_tpu as mitr
from mitransient_tpu import native
from mitransient_tpu.ops import accel as accel_mod
from mitransient_tpu.ops.bvh_pallas import closest_hit_bvh

scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml")
sd = scene.data
v0 = np.asarray(sd.tri.v0)
e1 = np.asarray(sd.tri.e1)
e2 = np.asarray(sd.tri.e2)

N = 1 << 20
lo = v0.min(axis=0)
hi = v0.max(axis=0)
center = (lo + hi) / 2
span = hi - lo
kk = jax.random.PRNGKey(7)
o = jnp.asarray(center, jnp.float32) + (
    jax.random.uniform(kk, (N, 3)) - 0.5) * 0.9 * jnp.asarray(
        span, jnp.float32)
d = jax.random.normal(jax.random.PRNGKey(8), (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

co = jnp.broadcast_to(jnp.asarray(center + span * np.array(
    [0.0, 0.2, 1.2]), jnp.float32), (N, 3))
tgt = jnp.asarray(center, jnp.float32) + (
    jax.random.uniform(jax.random.PRNGKey(9), (N, 3)) - 0.5
) * jnp.asarray(span, jnp.float32)
cd = tgt - co
cd = cd / jnp.linalg.norm(cd, axis=-1, keepdims=True)


@jax.jit
def cand_counts(amin, amax, o, d, t_true):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)
    t0 = (amin[None] - o[:, None, :]) * inv[:, None, :]
    t1 = (amax[None] - o[:, None, :]) * inv[:, None, :]
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 1e-4)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    valid = (tn <= tf) & (tn < t_true[:, None])
    return jnp.sum(valid, axis=-1)


def query_rate(acc, o, d, label):
    @jax.jit
    def q(o, d):
        t, p = closest_hit_bvh(acc, o, d, jnp.full((N,), 3e38),
                               jnp.ones((N,), bool))
        return t, p, jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    t, p, s = q(o, d)
    float(np.asarray(s))
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        _, _, s = q(o, d)
        float(np.asarray(s))
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: {N/best/1e6:7.2f} Mrays/s ({best*1e3:.1f} ms)",
          flush=True)
    return t


for method in ("median", "sah"):
    import mitransient_tpu.native as nat
    orig = nat.build_bvh
    def patched(v0, e1, e2, leaf_size=4, method=method, _orig=orig):
        return _orig(v0, e1, e2, leaf_size, method=method)
    nat.build_bvh = patched
    try:
        t_b = time.perf_counter()
        acc = accel_mod.build_accel(v0, e1, e2)
        t_build = time.perf_counter() - t_b
    finally:
        nat.build_bvh = orig
    C = acc.pages.shape[0]
    cap = acc.pages.shape[1] * 8
    print(f"{method}: C={C} cap={cap} build={t_build:.2f}s", flush=True)
    t_inc = query_rate(acc, o, d, "incoherent")
    t_coh = query_rate(acc, co, cd, "coherent  ")
    for label, oo, dd, tt in (("inc", o, d, t_inc), ("coh", co, cd, t_coh)):
        tt = jnp.where(jnp.isfinite(tt), tt, 3e38)
        cc = np.asarray(cand_counts(acc.aabb_min, acc.aabb_max, oo, dd, tt))
        print(f"  cand[{label}]: mean {cc.mean():.2f}  p50 "
              f"{np.percentile(cc, 50):.0f}  p90 {np.percentile(cc, 90):.0f}"
              f"  p99 {np.percentile(cc, 99):.0f}  max {cc.max()}",
              flush=True)
