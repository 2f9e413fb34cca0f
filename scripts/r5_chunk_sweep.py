"""Round-5: chunk-size sweep under the SAH builder (staircase)."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
    jnp.ones((128,))).block_until_ready()
import mitransient_tpu as mitr
from mitransient_tpu.ops import accel as accel_mod
from mitransient_tpu.ops.bvh_pallas import closest_hit_bvh

scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml")
sd = scene.data
v0 = np.asarray(sd.tri.v0); e1 = np.asarray(sd.tri.e1); e2 = np.asarray(sd.tri.e2)
N = 1 << 20
lo, hi = v0.min(axis=0), v0.max(axis=0)
center, span = (lo + hi) / 2, hi - lo
o = jnp.asarray(center, jnp.float32) + (jax.random.uniform(
    jax.random.PRNGKey(7), (N, 3)) - 0.5) * 0.9 * jnp.asarray(span, jnp.float32)
d = jax.random.normal(jax.random.PRNGKey(8), (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
co = jnp.broadcast_to(jnp.asarray(center + span * np.array([0.0, 0.2, 1.2]),
                                  jnp.float32), (N, 3))
tgt = jnp.asarray(center, jnp.float32) + (jax.random.uniform(
    jax.random.PRNGKey(9), (N, 3)) - 0.5) * jnp.asarray(span, jnp.float32)
cd = tgt - co; cd = cd / jnp.linalg.norm(cd, axis=-1, keepdims=True)

ref = None
for chunk in (128,):
    accel_mod.CHUNK_TRIS = chunk
    acc = accel_mod.build_accel(v0, e1, e2)
    C, cap = acc.pages.shape[0], acc.pages.shape[1] * 8

    @jax.jit
    def q(o, d, acc=acc):
        t, p = closest_hit_bvh(acc, o, d, jnp.full((N,), 3e38),
                               jnp.ones((N,), bool))
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)), p

    out = []
    for oo, dd in ((o, d), (co, cd)):
        s, p = q(oo, dd); s = float(np.asarray(s))
        best = 1e9
        for rep in range(3):
            t0 = time.perf_counter()
            s2, _ = q(oo, dd); float(np.asarray(s2))
            best = min(best, time.perf_counter() - t0)
        out.append(N / best / 1e6)
    if ref is None:
        ref = s
    assert abs(s - ref) / abs(ref) < 1e-4, (s, ref)
    print(f"CHUNK={chunk:5d}: C={C:4d} cap={cap:5d} "
          f"inc {out[0]:6.2f} M  coh {out[1]:6.2f} M", flush=True)
