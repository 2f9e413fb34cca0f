"""Benchmark: transient Cornell box + NLOS rays/sec/chip (BASELINE.md).

Workloads:
* the canonical transient cbox — 256x256 px, 300 time bins, start_opl 3.5,
  bin_width_opl 0.02, max_depth 8 (reference mitransient/utils.py:78-220)
* NLOS single capture — 32x32 scan, 300 bins, laser + hidden-geometry
  sampling at spp 2048 (nlos-z-simple.xml pattern / tests/test_nlos.py)

Prints one JSON line per workload (``{"metric", "value", "unit",
"vs_baseline"}``); the driver parses the LAST line, so the flagship cbox
metric is printed first as the fallback if the budget expires mid-NLOS.

``value`` counts rays actually traced (closest-hit wavefront rays + NEE
shadow rays, i.e. active lanes per bounce — not the lanes*max_depth upper
bound), divided by wall time on one chip.  The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` is None.

Axon-tunnel note (measured in round 3, BASELINE.md): the FIRST
loop-containing XLA program of a process pays a one-time multi-minute
execution cost server-side; a tiny fori_loop program absorbs it up front so
the real workloads compile+run in tens of seconds and the timed reps are
warm either way.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _warm_tunnel():
    """Absorb the per-process first-loop-program cost with a 128-float
    fori_loop before any real workload compiles."""
    x = jnp.ones((128,))
    f = jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0,
                                            x).sum())
    float(f(x))


@jax.jit
def _checksum(arrays):
    total = jnp.zeros((), jnp.float32)
    for a in arrays:
        total = total + jnp.sum(a).astype(jnp.float32)
    return total


def _sync(*arrays) -> float:
    """Force completion of every program the arrays depend on WITHOUT
    hauling them host-side: one fused device reduce + one scalar fetch.

    Round 3's ``np.asarray(t).ravel()[0]`` materialized the full transient
    tensor over the axon tunnel (~30 MB/s device->host) INSIDE the timed
    region — 236 MB / ~8 s for the cbox, which collapsed the recorded
    flagship number 4.6x (BENCH_r03 24.5 M vs 113.6 M measured in-process).
    ``jax.block_until_ready`` is unreliable through the tunnel, so a
    device-side reduce + scalar fetch is the sync; fusing it into a single
    program keeps it to one tunnel round trip (~10 ms)."""
    return float(_checksum(tuple(arrays)))


# Best recorded round-3 numbers (BASELINE.md, in-process measurements with
# the correct scalar sync): the regression reference for vs_prev.
_PREV = {
    "transient_cbox": 113.6e6,
    "nlos_single": 122.9e6,
}


def _bench(name, scene, spp, img, reps=3, **kw):
    import mitransient_tpu as mitr

    # warmup / compile (same per-pass shape as the measured run, including
    # the sync-reduce programs)
    s, t, stats = mitr.render(scene, spp=spp, seed=0, return_stats=True,
                              **kw)
    _sync(s, t)
    best = None
    for rep in range(reps):
        t0 = time.perf_counter()
        s, t, stats = mitr.render(scene, spp=spp, seed=1 + rep,
                                  return_stats=True, **kw)
        _sync(s, t)
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
    rays = float(stats["rays"])
    value = rays / best
    prev = _PREV.get(name)
    print(json.dumps({
        "metric": f"{name}_rays_per_sec_per_chip",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": None,  # the reference publishes no numbers
        "detail": {
            "device": str(jax.devices()[0]),
            "spp": int(stats["spp"]),
            "wall_s": best,
            "rays": rays,
            "img": img,
            "vs_prev_round": (value / prev) if prev else None,
        },
    }), flush=True)


def main():
    import sys

    import mitransient_tpu as mitr

    names = sys.argv[1:] or ["transient_cbox", "nlos_single"]
    _warm_tunnel()

    if "transient_cbox" in names:
        _bench("transient_cbox", mitr.load_dict(mitr.cornell_box()), 1024,
               [256, 256, 300])

    if "nlos_single" in names:
        # NLOS single capture (BASELINE.md row; the verdict-tracked workload)
        import tests.test_nlos as fx

        d = fx.nlos_scene(sx=32, sy=32)
        nscene = mitr.load_dict(d)
        mitr.nlos.focus_emitter_at_relay_wall_pixel([16.0, 16.0], nscene)
        _bench("nlos_single", nscene, 2048, [32, 32, 300])


if __name__ == "__main__":
    main()
