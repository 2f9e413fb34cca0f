"""Component probe, chunk-size parameterized (see exp_chunk.py)."""
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

scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml")
accel = scene.data.accel
print("chunks:", accel.pages.shape[0], flush=True)

N = 1 << 19
lo = np.asarray(accel.aabb_min).min(axis=0)
hi = np.asarray(accel.aabb_max).max(axis=0)
center = (lo + hi) / 2
span = hi - lo

kk = jax.random.PRNGKey(0)
o = jnp.asarray(center, jnp.float32) + (
    jax.random.uniform(kk, (N, 3)) - 0.5) * 0.9 * jnp.asarray(
        span, jnp.float32)
d = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

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
    print(f"{name:22s} {best*1e3:8.2f} ms", flush=True)
    return r


@jax.jit
def sel(o, d, bt, ge, gc):
    es, cids = B._select_next_pallas(accel, o, d, bt, ge, gc)
    return (sum(jnp.sum(jnp.where(jnp.isfinite(e), e, 0.0)) for e in es)
            + sum(jnp.sum(c) for c in cids))


timeit("select", sel, o, d, bt, ge, gc)


@jax.jit
def sel_raw(o, d, bt, ge, gc):
    return B._select_next_pallas(accel, o, d, bt, ge, gc)


es_k, cids_k = sel_raw(o, d, bt, ge, gc)
# use the first (front-most) candidate slot for the sort/sweep benchmarks
e, cid = es_k[0], cids_k[0]


def as_ktuple(c):
    """Wrap one cid array into the SELECT_K-tuple _sweep_pass expects."""
    return (c,) + tuple(jnp.full_like(c, -1) for _ in range(B.SELECT_K - 1))


@jax.jit
def srt(cid, e, o, d, bt):
    key = jnp.where(cid >= 0, cid, jnp.int32(accel.pages.shape[0]))
    out = jax.lax.sort(
        (key, e, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], bt),
        num_keys=1)
    return out


@jax.jit
def srt_scalar(cid, e, o, d, bt):
    out = srt(cid, e, o, d, bt)
    return sum(jnp.sum(a) for a in out[1:])


timeit("sort(9 arrays)", srt_scalar, cid, e, o, d, bt)
srt_out = srt(cid, e, o, d, bt)
key_s, e_s = srt_out[0], srt_out[1]
o_s = jnp.stack(srt_out[2:5], -1)
d_s = jnp.stack(srt_out[5:8], -1)
bt_s = srt_out[8]
cid_s = jnp.where(e_s > -jnp.inf, key_s, -1)


@jax.jit
def swp(cid, o, d, bt):
    t, p = B._sweep_pass(accel, as_ktuple(cid), o, d, bt, False)
    return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) + jnp.sum(p)


timeit("sweep(sorted)", swp, cid_s, o_s, d_s, bt_s)
timeit("sweep(unsorted)", swp, cid, o, d, bt)

# distinct chunks per tile after sort
k2 = np.asarray(key_s).reshape(-1, B.TILE)
dc = [len(np.unique(row[row < accel.pages.shape[0]])) for row in k2]
dc = np.array([x for x in dc if x > 0])
print("distinct chunks/tile sorted: mean %.2f p95 %d" %
      (dc.mean(), np.percentile(dc, 95)), flush=True)
ku = np.asarray(cid).reshape(-1, B.TILE)
du = np.array([len(np.unique(r[r >= 0])) for r in ku])
print("distinct chunks/tile unsorted: mean %.2f p95 %d" %
      (du.mean(), np.percentile(du, 95)), flush=True)

ge_s = jnp.where(cid_s >= 0, e_s, -jnp.inf)
gc_s = jnp.where(cid_s >= 0, cid_s, -1)


@jax.jit
def sel2(o, d, bt, ge, gc):
    es, cids = B._select_next_pallas(accel, o, d, bt, ge, gc)
    return (sum(jnp.sum(jnp.where(jnp.isfinite(e), e, 0.0)) for e in es)
            + sum(jnp.sum(c) for c in cids))


timeit("select(sorted,gated)", sel2, o_s, d_s, bt_s, ge_s, gc_s)
