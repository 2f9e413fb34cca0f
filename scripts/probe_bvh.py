"""Decompose the big-scene query cost: selection vs sort vs sweep, and
count passes per cascade stage."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import mitransient_tpu as mitr
from mitransient_tpu.ops import bvh_pallas as B

scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml")
accel = scene.data.accel
print("chunks:", accel.pages.shape[0])

N = 1 << 20
lo = np.asarray(accel.aabb_min).min(axis=0)
hi = np.asarray(accel.aabb_max).max(axis=0)
center = (lo + hi) / 2
span = hi - lo


def incoherent(seed):
    kk = jax.random.PRNGKey(seed)
    o = jnp.asarray(center, jnp.float32) + (
        jax.random.uniform(kk, (N, 3)) - 0.5) * 0.9 * jnp.asarray(
            span, jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(seed + 1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


o, d = incoherent(0)
bt = jnp.full((N,), 3e38)
ge = jnp.full((N,), -jnp.inf)
gc = jnp.full((N,), -1, jnp.int32)


def timeit(name, f, *args):
    r = f(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:22s} {best*1e3:8.2f} ms")
    return r


@jax.jit
def sel_timed(o, d, bt, ge, gc):
    e, cid = B._select_next_pallas(accel, o, d, bt, ge, gc)
    return jnp.sum(jnp.where(jnp.isfinite(e), e, 0.0)) + jnp.sum(cid)


@jax.jit
def sel(o, d, bt, ge, gc):
    return B._select_next_pallas(accel, o, d, bt, ge, gc)


@jax.jit
def srt(key, e, o, d):
    out = jax.lax.sort((key, e, o[:, 0], o[:, 1], o[:, 2],
                        d[:, 0], d[:, 1], d[:, 2]), num_keys=1)
    return jnp.sum(out[1])


@jax.jit
def swp_timed(cid, o, d, bt):
    t, p = B._sweep_pass(accel, cid, o, d, bt, False)
    return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) + jnp.sum(p)


@jax.jit
def swp(cid, o, d, bt):
    return B._sweep_pass(accel, cid, o, d, bt, False)


timeit("select (pass 1)", sel_timed, o, d, bt, ge, gc)
e, cid = sel(o, d, bt, ge, gc)
key = jnp.where(cid >= 0, cid, jnp.int32(accel.pages.shape[0]))
timeit("sort", srt, key, e, o, d)
# sort the wavefront by cid for a realistic sweep input
order = jnp.argsort(key)
cid_s, o_s, d_s, bt_s = cid[order], o[order], d[order], bt[order]
timeit("sweep (pass 1)", swp_timed, cid_s, o_s, d_s, bt_s)
t1, p1 = swp(cid_s, o_s, d_s, bt_s)

# distinct chunks per 1024-ray tile after sorting
cids = np.asarray(cid_s).reshape(-1, 1024)
distinct = [len(np.unique(r[r >= 0])) for r in cids]
print("distinct chunks/tile after sort: mean %.1f p50 %d p95 %d" % (
    np.mean(distinct), int(np.percentile(distinct, 50)),
    int(np.percentile(distinct, 95))))

# pass 2 state
bt2 = jnp.where(p1 >= 0, t1, bt_s)
ge2 = jnp.where(cid_s >= 0, e[order], -jnp.inf)
gc2 = jnp.where(cid_s >= 0, cid_s, -1)
timeit("select (pass 2)", sel_timed, o_s, d_s, bt2, ge2, gc2)
e2, cid2 = sel(o_s, d_s, bt2, ge2, gc2)
alive = np.asarray(cid2 >= 0).mean()
print("alive after pass 1: %.3f" % alive)
