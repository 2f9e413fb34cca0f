"""Round-5: polarized cbox residual attribution by ablation.

R5_POL = full | noabcs | norot | noboth
  noabcs: specular_abcs replaced by constants (A=1,B=.3,C=.9,S=.1)
  norot : rotator_angles replaced by identity (c2=1,s2=0)
Ablations change the image; only timing matters.
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
    jnp.ones((128,))).block_until_ready()

mode = os.environ.get("R5_POL", "full")
from mitransient_tpu.core import mueller as M
import mitransient_tpu.bsdf.polarized as P

if mode in ("noabcs", "noboth"):
    def fake_abcs(ci, er, ei):
        o = jnp.ones_like(ci)
        return o, 0.3 * o, 0.9 * o, 0.1 * o
    M.specular_abcs = fake_abcs
    P.specular_abcs = fake_abcs  # imported by name at module import
if mode in ("norot", "noboth"):
    def fake_ra(w, a, b):
        n = w.shape[0]
        return jnp.ones((n,), jnp.float32), jnp.zeros((n,), jnp.float32)
    M.rotator_angles = fake_ra
    P.rotator_angles = fake_ra

import mitransient_tpu as mitr

mitr.set_variant("mono_polarized")
d = mitr.cornell_box()
d["sensor"]["film"]["temporal_bins"] = 400
d["small-box"]["bsdf"] = {"type": "roughconductor", "material": "Au",
                          "alpha": 0.3}
scene = mitr.load_dict(d)

_s, _t, st = mitr.render(scene, spp=64, seed=0, return_stats=True)
float(np.asarray(jnp.sum(_t[:2, :2])))
best = 1e9
for rep in range(3):
    t0 = time.perf_counter()
    _s, _t, st = mitr.render(scene, spp=64, seed=1 + rep, return_stats=True)
    float(np.asarray(jnp.sum(_t[:2, :2])))
    best = min(best, time.perf_counter() - t0)
rays = float(st["rays"])
print(f"{mode}: {best:.3f} s  ({rays/best/1e6:.1f} Mrays/s)", flush=True)
