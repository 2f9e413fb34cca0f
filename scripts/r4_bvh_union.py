"""Measure candidate-set statistics for the single-kernel BVH redesign.

For the staircase's incoherent wavefront:
  - candidates per ray WITHOUT the final-t limit (pure slab hits) —
    what an unordered (chunk-id-order) enumeration must visit
  - per-tile UNION of candidate sets after sorting rays by first chunk —
    what a tile-min in-kernel walk would sweep per tile
  - the same at a finer chunk granularity (128-tri chunks)

Run alone on the TPU: python scripts/r4_bvh_union.py
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


def stats(name, v):
    print(f"{name}: mean {v.mean():.1f} p50 {np.percentile(v,50):.0f} "
          f"p90 {np.percentile(v,90):.0f} p99 {np.percentile(v,99):.0f} "
          f"max {v.max()}", flush=True)


def main():
    warm()
    import mitransient_tpu as mitr
    from mitransient_tpu.ops import accel as accel_mod
    from mitransient_tpu.ops.bvh_pallas import closest_hit_bvh, _safe_inv, BIG

    scene = mitr.load_file(
        "/root/reference/examples/diff-transient/staircase/scene.xml")
    sd = scene.data
    accel = sd.accel
    C = accel.pages.shape[0]

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
    tq, pq = closest_hit_bvh(accel, o, d, maxt, active)
    jax.block_until_ready(tq)

    def cand(amin, amax, o, d, tlim):
        """(nhit, first_cid, bitmask rows...) per ray for one slice."""
        inv = _safe_inv(d)
        t0 = (amin[None] - o[:, None, :]) * inv[:, None, :]
        t1 = (amax[None] - o[:, None, :]) * inv[:, None, :]
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 1e-4)
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        hit = (tn <= tf) & (tn < tlim[:, None])
        e = jnp.where(hit, tn, jnp.inf)
        first = jnp.argmin(e, axis=1).astype(jnp.int32)
        first = jnp.where(jnp.any(hit, axis=1), first, 1 << 20)
        return jnp.sum(hit, axis=1), first, hit

    def run(amin, amax, tlim, label):
        Cc = amin.shape[0]
        counts = np.zeros(N, np.int32)
        firsts = np.zeros(N, np.int32)
        hits = np.zeros((N, Cc), bool)
        f = jax.jit(lambda o, d, t: cand(amin, amax, o, d, t))
        B = 1 << 16
        for i in range(0, N, B):
            c, fi, h = f(o[i:i + B], d[i:i + B], tlim[i:i + B])
            counts[i:i + B] = np.asarray(c)
            firsts[i:i + B] = np.asarray(fi)
            hits[i:i + B] = np.asarray(h)
        stats(f"{label} cands/ray", counts)
        # sort rays by first chunk; union per tile of 1024 / group of 256
        order = np.argsort(firsts, kind="stable")
        hs = hits[order]
        for tsz in (1024, 256):
            un = hs[: N - N % tsz].reshape(-1, tsz, Cc).any(axis=1).sum(axis=1)
            stats(f"{label} union/{tsz}-tile", un)
        return counts

    tlim_t = jnp.where(jnp.isfinite(tq), tq, BIG)
    tlim_inf = jnp.full((N,), BIG)

    print(f"# C={C} (512-tri chunks)")
    run(accel.aabb_min, accel.aabb_max, tlim_t, "tlim")
    run(accel.aabb_min, accel.aabb_max, tlim_inf, "nolim")

    # finer chunks: rebuild at 128 tris (bounds only; no pages needed)
    v0 = np.asarray(sd.tri.v0)
    e1 = np.asarray(sd.tri.e1)
    e2 = np.asarray(sd.tri.e2)
    from mitransient_tpu import native
    glob = native.build_bvh(v0, e1, e2, leaf_size=8)
    order = np.asarray(glob["prim_order"], np.int64)
    gv0, ge1, ge2 = v0[order], e1[order], e2[order]
    for ct in (128, 256):
        m = v0.shape[0]
        c = (m + ct - 1) // ct
        amin = np.full((c, 3), np.inf, np.float32)
        amax = np.full((c, 3), -np.inf, np.float32)
        for ci in range(c):
            lo_, hi_ = ci * ct, min((ci + 1) * ct, m)
            pts = np.concatenate([gv0[lo_:hi_], gv0[lo_:hi_] + ge1[lo_:hi_],
                                  gv0[lo_:hi_] + ge2[lo_:hi_]])
            amin[ci] = pts.min(0)
            amax[ci] = pts.max(0)
        print(f"# C={c} ({ct}-tri chunks)")
        run(jnp.asarray(amin), jnp.asarray(amax), tlim_t, f"tlim{ct}")
        run(jnp.asarray(amin), jnp.asarray(amax), tlim_inf, f"nolim{ct}")


if __name__ == "__main__":
    main()
