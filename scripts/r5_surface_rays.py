"""Round-5: query rate for SURFACE-ORIGIN wavefronts (realistic bounce
rays) vs interior-origin synthetic rays — quantifies the end-to-end gap.

Also times an occlusion wavefront aimed at a fixed point (shadow-like).
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
from mitransient_tpu.ops.bvh_pallas import closest_hit_bvh, ray_test_bvh

scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml")
acc = scene.data.accel
v0 = np.asarray(scene.data.tri.v0)
e1 = np.asarray(scene.data.tri.e1)
e2 = np.asarray(scene.data.tri.e2)
ng = np.cross(e1, e2)
ng /= np.maximum(np.linalg.norm(ng, axis=1, keepdims=True), 1e-12)
M = v0.shape[0]
N = 1 << 20
rng = np.random.RandomState(11)
tri = rng.randint(0, M, N)
u = rng.uniform(0, 1, (N, 2)).astype(np.float32)
flip = u.sum(1) > 1
u[flip] = 1.0 - u[flip]
p = v0[tri] + u[:, :1] * e1[tri] + u[:, 1:] * e2[tri]
n = ng[tri]
# cosine-ish hemisphere directions about the (sign-flipped) normal
side = np.sign(rng.uniform(-1, 1, N)).astype(np.float32)
n = n * side[:, None]
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
wrong = (d * n).sum(1) < 0
d[wrong] = -d[wrong]
o = (p + 1e-4 * n).astype(np.float32)

oj = jnp.asarray(o)
dj = jnp.asarray(d)
mx = jnp.full((N,), 3e38)
act = jnp.ones((N,), bool)


def timeit(fn, *args, reps=4):
    out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.sum(s.ravel()[:8].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.sum(s.ravel()[:8].astype(jnp.float32))))
    return (time.perf_counter() - t0) / reps - 0.0014


q = jax.jit(lambda o, d: closest_hit_bvh(acc, o, d, mx, act))
dt = timeit(q, oj, dj)
print(f"surface-origin closest: {dt*1e3:7.1f} ms ({N/dt/1e6:.2f} Mrays/s)",
      flush=True)

# shadow-like: from surface points toward one far "emitter" point
target = jnp.asarray(v0.mean(0) + np.array([0.0, 0.0, 6.0]), jnp.float32)
dv = target[None, :] - oj
dist = jnp.linalg.norm(dv, axis=-1)
ds = dv / dist[:, None]
qs = jax.jit(lambda o, d, dist: ray_test_bvh(acc, o, d, dist * 0.999, act))
dt = timeit(qs, oj, ds, dist)
print(f"surface-origin shadow : {dt*1e3:7.1f} ms ({N/dt/1e6:.2f} Mrays/s)",
      flush=True)

# half-dead wavefront: same rays, 50% inactive (end-to-end occupancy proxy)
act_half = jnp.asarray(rng.uniform(0, 1, N) < 0.5)
qh = jax.jit(lambda o, d, a: closest_hit_bvh(acc, o, d, mx, a))
dt = timeit(qh, oj, dj, act_half)
alive = float(jnp.sum(act_half))
print(f"50%-dead closest      : {dt*1e3:7.1f} ms "
      f"({alive/dt/1e6:.2f} Mrays/s per ALIVE ray)", flush=True)
