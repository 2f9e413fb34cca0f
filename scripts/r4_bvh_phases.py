"""Decompose big-scene BVH query cost into phases (staircase, 262k tris).

Measures, on a fixed 1M-ray incoherent wavefront:
  - select: one _select_next_pallas pass
  - sort:   one lax.sort of the full pass state
  - sweep:  one _sweep_pass with the selected cids
  - passes: how many (select, sort, sweep) rounds the full query runs
  - visits: per-ray count of chunks whose AABB entry beats the final hit t
            (the theoretical minimum chunk visits under perfect
            front-to-back enumeration)

Run alone on the TPU: python scripts/r4_bvh_phases.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def warm():
    t0 = time.time()
    jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
        jnp.ones((128,))).block_until_ready()
    print(f"# warm {time.time()-t0:.1f}s", flush=True)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    warm()
    import mitransient_tpu as mitr
    from mitransient_tpu.ops import bvh_pallas as bp
    from mitransient_tpu.ops.bvh_pallas import (
        _select_next_pallas, _sweep_pass, closest_hit_bvh, _safe_inv, BIG)

    scene = mitr.load_file(
        "/root/reference/examples/diff-transient/staircase/scene.xml")
    accel = scene.data.accel
    C = accel.pages.shape[0]
    print(f"# chunks={C} supers={accel.sup_min.shape[0]}")

    N = 1 << 20
    lo = np.asarray(accel.aabb_min).min(axis=0)
    hi = np.asarray(accel.aabb_max).max(axis=0)
    center = (lo + hi) / 2
    span = hi - lo

    kk = jax.random.PRNGKey(7)
    o = jnp.asarray(center, jnp.float32) + (
        jax.random.uniform(kk, (N, 3)) - 0.5) * 0.9 * jnp.asarray(
            span, jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(8), (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    maxt = jnp.full((N,), 3e38)
    active = jnp.ones((N,), bool)

    # --- full query ---
    t_full, (tq, pq) = timeit(
        lambda: closest_hit_bvh(accel, o, d, maxt, active))
    print(f"full query : {t_full*1e3:8.2f} ms  ({N/t_full/1e6:.2f} Mrays/s)"
          f"  hit-rate {float(jnp.mean(pq >= 0)):.2f}", flush=True)

    # --- phase: select (pass 1 conditions) ---
    bt = jnp.minimum(maxt, BIG)
    ge = jnp.full((N,), -jnp.inf)
    gc = jnp.full((N,), -1, jnp.int32)

    sel = jax.jit(lambda o, d, bt, ge, gc: _select_next_pallas(
        accel, o, d, bt, ge, gc))
    t_sel, (es, cs) = timeit(sel, o, d, bt, ge, gc)
    print(f"select pass: {t_sel*1e3:8.2f} ms", flush=True)

    # --- phase: sort (12 arrays like the real pass) ---
    state = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             bt, gc, ge, gc, jnp.arange(N, dtype=jnp.int32))
    key = jnp.where(cs[0] >= 0, cs[0], C)

    srt = jax.jit(lambda key, st: jax.lax.sort((key,) + st, num_keys=1))
    t_sort, sorted_ = timeit(srt, key, state)
    print(f"sort pass  : {t_sort*1e3:8.2f} ms", flush=True)

    # --- phase: sweep with sorted cids ---
    skey = sorted_[0]
    scid = jnp.where(skey < C, skey, -1)
    sst = sorted_[1:]
    so = jnp.stack(sst[0:3], -1)
    sd_ = jnp.stack(sst[3:6], -1)
    sbt = sst[6]

    swp = jax.jit(lambda cid, o, d, bt: _sweep_pass(
        accel, (cid,), o, d, bt, False))
    t_swp, _ = timeit(swp, scid, so, sd_, sbt)
    print(f"sweep pass : {t_swp*1e3:8.2f} ms", flush=True)

    # distinct chunks per tile after sorting (host calc)
    scid_np = np.asarray(scid)
    tiles = scid_np[:N - (N % 1024)].reshape(-1, 1024)
    dpt = np.array([len(np.unique(t[t >= 0])) for t in tiles])
    print(f"distinct chunks/tile after sort: mean {dpt.mean():.2f} "
          f"p50 {np.percentile(dpt,50):.0f} p95 {np.percentile(dpt,95):.0f}",
          flush=True)

    # --- minimum visits per ray (chunks whose entry beats final t) ---
    @jax.jit
    def min_visits(o, d, tq):
        inv = _safe_inv(d)
        t0 = (accel.aabb_min[None] - o[:, None, :]) * inv[:, None, :]
        t1 = (accel.aabb_max[None] - o[:, None, :]) * inv[:, None, :]
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 1e-4)
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        tlim = jnp.where(jnp.isfinite(tq), tq, BIG)
        return jnp.sum((tn <= tf) & (tn < tlim[:, None]), axis=1)

    # chunked to bound memory: 1M x 512 bools is fine actually (0.5 GB as
    # i8? compute in slices of 128k rays)
    vs = []
    for i in range(0, N, 1 << 17):
        vs.append(np.asarray(min_visits(o[i:i + (1 << 17)],
                                        d[i:i + (1 << 17)],
                                        tq[i:i + (1 << 17)])))
    v = np.concatenate(vs)
    print(f"min visits/ray: mean {v.mean():.1f}  p50 {np.percentile(v,50):.0f}"
          f"  p90 {np.percentile(v,90):.0f}  p99 {np.percentile(v,99):.0f}"
          f"  max {v.max()}", flush=True)

    # same for the super level
    @jax.jit
    def min_super_visits(o, d, tq):
        inv = _safe_inv(d)
        t0 = (accel.sup_min[None] - o[:, None, :]) * inv[:, None, :]
        t1 = (accel.sup_max[None] - o[:, None, :]) * inv[:, None, :]
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 1e-4)
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        tlim = jnp.where(jnp.isfinite(tq), tq, BIG)
        return jnp.sum((tn <= tf) & (tn < tlim[:, None]), axis=1)

    vs = []
    for i in range(0, N, 1 << 17):
        vs.append(np.asarray(min_super_visits(o[i:i + (1 << 17)],
                                              d[i:i + (1 << 17)],
                                              tq[i:i + (1 << 17)])))
    v8 = np.concatenate(vs)
    print(f"min super visits/ray: mean {v8.mean():.1f}  "
          f"p50 {np.percentile(v8,50):.0f}  p99 {np.percentile(v8,99):.0f}",
          flush=True)


if __name__ == "__main__":
    main()
