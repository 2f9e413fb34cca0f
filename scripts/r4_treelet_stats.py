"""Candidate-count comparison: equal 512-tri cuts vs BVH-subtree-aligned
cuts of the same median-split order (bounds tightness experiment).

Subtree cuts: recursively walk the builder's tree; emit any subtree with
<= MAXT tris as one chunk (variable size, tight box, pages padded).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

MAXT = 1024


def main():
    jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
        jnp.ones((128,))).block_until_ready()
    import mitransient_tpu as mitr
    from mitransient_tpu import native
    from mitransient_tpu.ops.bvh_pallas import closest_hit_bvh, _safe_inv, BIG

    scene = mitr.load_file(
        "/root/reference/examples/diff-transient/staircase/scene.xml")
    sd = scene.data
    accel = sd.accel

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
    tq, _ = closest_hit_bvh(accel, o, d, jnp.full((N,), 3e38),
                            jnp.ones((N,), bool))
    tq = np.asarray(jax.block_until_ready(tq))
    # force real completion
    float(np.asarray(jnp.sum(jnp.where(jnp.isfinite(tq), tq, 0.0))))

    v0 = np.asarray(sd.tri.v0)
    e1 = np.asarray(sd.tri.e1)
    e2 = np.asarray(sd.tri.e2)
    glob = native.build_bvh(v0, e1, e2, leaf_size=8)
    order = np.asarray(glob["prim_order"], np.int64)
    gv0 = v0[order]
    ge1 = e1[order]
    ge2 = e2[order]
    left = np.asarray(glob["left"])
    right = np.asarray(glob["right"])
    # builder layout: does it expose per-node prim ranges?  Reconstruct by
    # traversal: leaves carry contiguous ranges of prim_order.
    count = np.asarray(glob.get("count"))
    print("# nodes:", left.shape[0], "counts dtype:", count.dtype,
          "root count:", count[0] if count is not None else None, flush=True)

    # builder semantics (native/mitr_native.cpp): leaves have left=-1,
    # right=offset into prim_order, count=#prims; inner nodes count=0.
    # Subtrees occupy contiguous prim_order ranges.
    sys.setrecursionlimit(1000000)

    def rng(nid):
        if left[nid] < 0:
            a = int(right[nid])
            return a, a + int(count[nid])
        la, lb = rng(int(left[nid]))
        ra, rb = rng(int(right[nid]))
        return min(la, ra), max(lb, rb)

    ranges = []

    def walk(nid):
        a, b = rng(nid)
        if b - a <= MAXT or left[nid] < 0:
            ranges.append((a, b))
            return
        walk(int(left[nid]))
        walk(int(right[nid]))

    walk(0)
    ranges.sort()
    end = 0
    for a, b in ranges:
        assert a == end, (a, end)
        end = b
    assert end == v0.shape[0], (end, v0.shape[0])
    sizes = np.array([b - a for a, b in ranges])
    print(f"subtree chunks: {len(ranges)} sizes mean {sizes.mean():.0f} "
          f"p10 {np.percentile(sizes,10):.0f} p90 {np.percentile(sizes,90):.0f}",
          flush=True)

    def bounds_for(ranges):
        amin = np.full((len(ranges), 3), np.inf, np.float32)
        amax = np.full((len(ranges), 3), -np.inf, np.float32)
        for i, (a, b) in enumerate(ranges):
            pts = np.concatenate([gv0[a:b], gv0[a:b] + ge1[a:b],
                                  gv0[a:b] + ge2[a:b]])
            amin[i] = pts.min(0)
            amax[i] = pts.max(0)
        return jnp.asarray(amin), jnp.asarray(amax)

    def cand_stats(amin, amax, label):
        Cc = amin.shape[0]

        @jax.jit
        def f(o, d, tlim):
            inv = _safe_inv(d)
            t0 = (amin[None] - o[:, None, :]) * inv[:, None, :]
            t1 = (amax[None] - o[:, None, :]) * inv[:, None, :]
            tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 1e-4)
            tf = jnp.min(jnp.maximum(t0, t1), -1)
            return jnp.sum((tn <= tf) & (tn < tlim[:, None]), axis=1)

        tlim = jnp.where(jnp.isfinite(jnp.asarray(tq)), jnp.asarray(tq), BIG)
        vs = []
        B = 1 << 16
        for i in range(0, N, B):
            vs.append(np.asarray(f(o[i:i + B], d[i:i + B], tlim[i:i + B])))
        v = np.concatenate(vs)
        # visits weight by swept tris: equal cuts sweep 512/page either way
        print(f"{label}: C={Cc} cands mean {v.mean():.2f} p50 "
              f"{np.percentile(v,50):.0f} p90 {np.percentile(v,90):.0f} "
              f"p99 {np.percentile(v,99):.0f}", flush=True)
        return v

    eq = [(i * 512, min((i + 1) * 512, v0.shape[0]))
          for i in range((v0.shape[0] + 511) // 512)]
    amin_e, amax_e = bounds_for(eq)
    cand_stats(amin_e, amax_e, "equal512  ")
    amin_s, amax_s = bounds_for(ranges)
    cand_stats(amin_s, amax_s, "subtree   ")


if __name__ == "__main__":
    main()
