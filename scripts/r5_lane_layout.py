"""Round-5: does the trailing singleton dim of mono carries ((N,1) f32)
waste VPU lanes?  Times an msoa-bounce-shaped op chain on 16 arrays of
shape (N,1) vs (N,) vs (N,128) at equal element counts of real work.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
    jnp.ones((128,))).block_until_ready()

N = 1 << 22


def chain(arrs, s):
    # rotator cols + fresnel cols + selects: the msoa bounce shape
    out = list(arrs)
    c2 = jnp.cos(s)
    s2 = jnp.sin(s)
    for i in range(4):
        b1, b2 = out[4 * i + 1], out[4 * i + 2]
        out[4 * i + 1] = b1 * c2 - b2 * s2
        out[4 * i + 2] = b1 * s2 + b2 * c2
    A, B, C, S = c2 * 0.9, s2 * 0.1, c2 * 0.8, s2 * 0.2
    res = [None] * 16
    for i in range(4):
        b0, b1, b2, b3 = out[4 * i], out[4 * i + 1], out[4 * i + 2], out[4 * i + 3]
        res[4 * i] = b0 * A + b1 * B
        res[4 * i + 1] = b0 * B + b1 * A
        res[4 * i + 2] = b2 * C - b3 * S
        res[4 * i + 3] = b2 * S + b3 * C
    m = s > 0.5
    return tuple(jnp.where(m, r, a) for r, a in zip(res, arrs))


def run(shape, tag, reps=20):
    key = jax.random.PRNGKey(0)
    arrs = tuple(jax.random.uniform(jax.random.fold_in(key, i), shape)
                 for i in range(16))
    s = jax.random.uniform(jax.random.PRNGKey(99), shape)

    @jax.jit
    def step(arrs, s):
        for _ in range(4):  # 4 chained bounces to amortize dispatch
            arrs = chain(arrs, s)
        return arrs

    out = step(arrs, s)
    float(np.asarray(jnp.sum(out[0].ravel()[:8])))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(out, s)
    float(np.asarray(jnp.sum(out[0].ravel()[:8])))
    dt = (time.perf_counter() - t0) / reps - 0.0014
    n_el = int(np.prod(shape))
    print(f"{tag:12s}: {dt*1e3:7.2f} ms  ({n_el*4/dt/1e9:6.1f} G elem-bounces/s)",
          flush=True)


run((N, 1), "(4M, 1)")
run((N,), "(4M,)")
run((N // 128, 128), "(32k, 128)")
run((N, 4), "(4M, 4)")
