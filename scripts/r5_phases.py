"""Round-5: honest per-phase costs of the BVH pass loop at C=775 (SAH).

Times, at a 1M-ray incoherent wavefront (batched calls, scalar fetch):
  - full closest-hit query
  - one fused sweep+select kernel pass (sorted wavefront)
  - one standalone select kernel
  - one 12-array lax.sort
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


# control: dispatch overhead
ctl = jax.jit(lambda x: x + 1.0)
print(f"control x+1: {timeit(ctl, o):.2f} ms", flush=True)

q = jax.jit(lambda o, d: bp.closest_hit_bvh(acc, o, d, maxt, act))
print(f"full query : {timeit(q, o, d, reps=3):.1f} ms", flush=True)

# a realistic mid-pass state: run the initial pick to get cids/gates
ge0 = jnp.full((N,), -jnp.inf)
gc0 = jnp.full((N,), -1, jnp.int32)


@jax.jit
def init_pick(o, d):
    es, cs = bp._select_next_pallas(acc, o, d, maxt, ge0, gc0)
    return es[0], cs[0]


e1, c1 = init_pick(o, d)
key = jnp.where(c1 >= 0, c1, acc.pages.shape[0])
st = (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
      maxt, jnp.full((N,), -1, jnp.int32), e1,
      jnp.where(c1 >= 0, c1, gc0).astype(jnp.float32), jnp.arange(N))

sort_fn = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1))
print(f"sort 12-arr: {timeit(sort_fn, *st, reps=10):.2f} ms", flush=True)

srt = sort_fn(*st)
cid_s = jnp.where(srt[0] < acc.pages.shape[0], srt[0], -1)
o_s = jnp.stack(srt[1:4], -1)
d_s = jnp.stack(srt[4:7], -1)
bt_s = srt[7]
ge_s = srt[9]
gc_s = srt[10].astype(jnp.int32)

sweep = jax.jit(lambda cid, o, d, bt, ge, gc: bp._sweep_pass(
    acc, (cid,), o, d, bt, ge, gc, False))
print(f"fused sweep+select: {timeit(sweep, cid_s, o_s, d_s, bt_s, ge_s, gc_s, reps=10):.2f} ms",
      flush=True)

sel = jax.jit(lambda o, d, bt, ge, gc: bp._select_next_pallas(
    acc, o, d, bt, ge, gc))
print(f"standalone select : {timeit(sel, o_s, d_s, bt_s, ge_s, gc_s, reps=10):.2f} ms",
      flush=True)
