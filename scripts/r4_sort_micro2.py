"""Isolate why the phase-decomposition sort measured 33 ms."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def warm():
    jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
        jnp.ones((128,))).block_until_ready()


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    warm()
    import mitransient_tpu as mitr
    from mitransient_tpu.ops.bvh_pallas import (
        _select_next_pallas, BIG)

    scene = mitr.load_file(
        "/root/reference/examples/diff-transient/staircase/scene.xml")
    accel = scene.data.accel
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
    bt = jnp.minimum(jnp.full((N,), 3e38), BIG)
    ge = jnp.full((N,), -jnp.inf)
    gc = jnp.full((N,), -1, jnp.int32)

    sel = jax.jit(lambda o, d, bt, ge, gc: _select_next_pallas(
        accel, o, d, bt, ge, gc))
    t_sel = timeit(sel, o, d, bt, ge, gc)
    print(f"select: {t_sel*1e3:.2f} ms", flush=True)
    es, cs = sel(o, d, bt, ge, gc)
    es = jax.block_until_ready(es)

    # exactly as in phases script
    state = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             bt, gc, ge, gc, jnp.arange(N, dtype=jnp.int32))
    state = jax.block_until_ready(state)
    key = jax.block_until_ready(jnp.where(cs[0] >= 0, cs[0], C))
    srt = jax.jit(lambda key, st: jax.lax.sort((key,) + st, num_keys=1))
    t = timeit(srt, key, state)
    print(f"sort(state from select key): {t*1e3:.2f} ms", flush=True)

    key2 = jax.block_until_ready(
        jax.random.randint(jax.random.PRNGKey(0), (N,), 0, C, jnp.int32))
    t = timeit(srt, key2, state)
    print(f"sort(random key)           : {t*1e3:.2f} ms", flush=True)

    # non-jitted lax.sort call (phases used jit; bench in real loop is
    # inside the big jitted program)
    fresh = tuple(jax.random.uniform(jax.random.PRNGKey(i + 50), (N,))
                  for i in range(11))
    t = timeit(srt, key2, fresh)
    print(f"sort(random key, fresh f32): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
