"""Micro: lax.sort cost vs payload count + gather cost at 1M elements."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


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
    N = 1 << 20
    key = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 514,
                             dtype=jnp.int32)
    pays = [jax.random.uniform(jax.random.PRNGKey(i + 1), (N,))
            for i in range(11)]

    for k in (1, 2, 5, 11):
        f = jax.jit(lambda key, *ps: jax.lax.sort((key,) + ps, num_keys=1))
        t = timeit(f, key, *pays[:k])
        print(f"sort 1key+{k:2d} payloads: {t*1e3:7.2f} ms", flush=True)

    # gather by sorted index
    idx = jnp.argsort(key)

    g1 = jax.jit(lambda idx, x: jnp.take(x, idx, axis=0))
    t = timeit(g1, idx, pays[0])
    print(f"take 1 array          : {t*1e3:7.2f} ms", flush=True)

    g10 = jax.jit(lambda idx, *xs: tuple(jnp.take(x, idx) for x in xs))
    t = timeit(g10, idx, *pays[:10])
    print(f"take 10 arrays        : {t*1e3:7.2f} ms", flush=True)

    gs = jax.jit(lambda idx, *xs: jnp.take(jnp.stack(xs, 1), idx, axis=0))
    t = timeit(gs, idx, *pays[:10])
    print(f"take stacked (N,10)   : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
