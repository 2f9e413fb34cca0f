"""Round-5: honest per-phase costs of the BVH pass loop (SAH, C=775),
updated for the K=2 cache kernel (cid + cache pair promote/refill).

Times, at a 1M-ray incoherent wavefront (batched calls, scalar fetch):
  - full closest-hit query
  - one 12-array lax.sort
  - one fused sweep pass with caches VALID (refill skipped)
  - one fused sweep pass with caches DRY (refill runs)
  - one standalone K=2 select (pass-0 pick)
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
from mitransient_tpu.ops import bvh_pallas as bp

scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml")
acc = scene.data.accel
v0 = np.asarray(scene.data.tri.v0)
N = 1 << 20
lo, hi = v0.min(axis=0), v0.max(axis=0)
center, span = (lo + hi) / 2, hi - lo
o = jnp.asarray(center, jnp.float32) + (jax.random.uniform(
    jax.random.PRNGKey(7), (N, 3)) - 0.5) * 0.9 * jnp.asarray(
        span, jnp.float32)
d = jax.random.normal(jax.random.PRNGKey(8), (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
maxt = jnp.full((N,), 3e38)
act = jnp.ones((N,), bool)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.sum(s.ravel()[:8].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.sum(s.ravel()[:8].astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / reps - 0.0014
    return dt * 1e3


ctl = jax.jit(lambda x: x + 1.0)
print(f"control x+1: {timeit(ctl, o):.2f} ms", flush=True)

q = jax.jit(lambda o, d: bp.closest_hit_bvh(acc, o, d, maxt, act))
print(f"full query : {timeit(q, o, d, reps=3):.1f} ms", flush=True)

# realistic mid-pass state via the pass-0 pick
ge0 = jnp.full((N,), -jnp.inf)
gc0 = jnp.full((N,), -1, jnp.int32)


@jax.jit
def init_pick(o, d):
    es, cs = bp._select_next_pallas(acc, o, d, maxt, ge0, gc0)
    c1 = cs[0]
    c1f = c1.astype(jnp.float32)
    e2 = jnp.where(cs[1] >= 0, es[1], es[0])
    c2 = jnp.where(cs[1] >= 0, cs[1].astype(jnp.float32),
                   jnp.where(cs[0] >= 0, -(c1f + 2.0), -1.0))
    return c1, e2, c2


c1, e2, c2 = init_pick(o, d)
oidx = jnp.arange(N, dtype=jnp.int32)
sentf = jnp.int32(acc.pages.shape[0])
key = jnp.where(c1 >= 0, c1, sentf)
st = (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
      maxt, jnp.full((N,), -1, jnp.int32), e2, c2, oidx)

sort_fn = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1))
print(f"sort 12-arr: {timeit(sort_fn, *st, reps=10):.2f} ms", flush=True)

srt = sort_fn(*st)
cid_s = jnp.where(srt[0] < sentf, srt[0], -1)
o_s = jnp.stack(srt[1:4], -1)
d_s = jnp.stack(srt[4:7], -1)
bt_s = srt[7]
e2_s = srt[9]
c2_s = srt[10]
oidx_s = srt[11]

sweep = jax.jit(lambda cid, o, d, bt, e2, c2, oi: bp._sweep_pass(
    acc, cid, o, d, bt, e2, c2, oi, N, False))
print(f"pass (cache valid): "
      f"{timeit(sweep, cid_s, o_s, d_s, bt_s, e2_s, c2_s, oidx_s, reps=10):.2f} ms",
      flush=True)

# dry caches: encode every cache slot as a gate so the refill select runs
c2_dry = jnp.where(c2_s >= 0, -(c2_s + 2.0), c2_s)
print(f"pass (cache dry)  : "
      f"{timeit(sweep, cid_s, o_s, d_s, bt_s, e2_s, c2_dry, oidx_s, reps=10):.2f} ms",
      flush=True)

sel = jax.jit(lambda o, d, bt: bp._select_next_pallas(
    acc, o, d, bt, ge0, gc0))
print(f"standalone K=2 select: {timeit(sel, o_s, d_s, bt_s, reps=10):.2f} ms",
      flush=True)
