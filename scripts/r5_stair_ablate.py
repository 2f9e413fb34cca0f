"""Round-5: staircase end-to-end phase attribution by ablation.

Renders the staircase bench config (a) as-is, (b) with shadow rays
(ray_test) stubbed to all-visible, (c) with closest-hit replaced by a
fixed plane hit (no BVH).  Differences attribute wall time to the two
query kinds vs shading/film.  Ablations change the image — only timing
matters here.
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
from mitransient_tpu.ops import intersect as I

scene = mitr.load_file(
    "/root/reference/examples/diff-transient/staircase/scene.xml",
    resx=256, resy=256, max_depth=6)


def timed(tag):
    _s, _t, st = mitr.render(scene, spp=8, seed=0, return_stats=True)
    jax.block_until_ready(_t)
    float(np.asarray(jnp.sum(_t[:2, :2])))
    best = 1e9
    for rep in range(2):
        t0 = time.perf_counter()
        _s, _t, st = mitr.render(scene, spp=8, seed=1 + rep,
                                 return_stats=True)
        float(np.asarray(jnp.sum(_t[:2, :2])))
        best = min(best, time.perf_counter() - t0)
    rays = float(st["rays"])
    print(f"{tag}: {best:.3f} s  ({rays/best/1e6:.2f} Mrays/s)", flush=True)
    return best


import os
mode = os.environ.get("R5_ABL", "full")
if mode == "noshadow":
    import mitransient_tpu.scene.scene as S
    S.ray_test = lambda sd, o, d, dist, active: jnp.zeros(
        o.shape[0], bool)
elif mode == "noclosest":
    def fake_closest(v0, e1, e2, ray_o, ray_d, maxt, active, accel=None):
        t = jnp.full(ray_o.shape[0], 1.0, jnp.float32)
        prim = jnp.where(active, 0, -1)
        return jnp.where(active, t, jnp.inf), prim
    # scene.scene binds the query at import time — patch its alias
    import mitransient_tpu.scene.scene as S
    S._closest_hit_q = fake_closest
timed(mode)
