"""Benchmark: transient Cornell box rays/sec/chip (BASELINE.md headline).

Workload: the canonical transient cbox — 256x256 px, 300 time bins,
start_opl 3.5, bin_width_opl 0.02, max_depth 8 (reference
mitransient/utils.py:78-220).  Prints ONE JSON line:
``{"metric", "value", "unit", "vs_baseline"}``.

``value`` counts rays actually traced (closest-hit wavefront rays + NEE
shadow rays, i.e. active lanes per bounce — not the lanes*max_depth upper
bound), divided by wall time on one chip.  The reference publishes no
numbers (BASELINE.md), so ``vs_baseline`` is reported against the driver's
qualitative target of parity (1.0 == assumed baseline parity placeholder).
"""
from __future__ import annotations

import json
import time

import jax


def main():
    import mitransient_tpu as mitr

    scene = mitr.load_dict(mitr.cornell_box())
    spp = 1024

    import numpy as np

    # warmup / compile (same per-pass shape as the measured run)
    s, t, stats = mitr.render(scene, spp=spp, seed=0, return_stats=True)
    float(np.asarray(s).sum())  # full host sync (block_until_ready is
    # unreliable through the axon tunnel)

    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        s, t, stats = mitr.render(scene, spp=spp, seed=1 + rep,
                                  return_stats=True)
        float(np.asarray(s).sum()) + float(np.asarray(t[0, 0, 0]).sum())
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
    dt = best
    rays = float(stats["rays"])
    rays_per_sec = rays / dt

    print(
        json.dumps(
            {
                "metric": "transient_cbox_rays_per_sec_per_chip",
                "value": rays_per_sec,
                "unit": "rays/s",
                "vs_baseline": None,
                "detail": {
                    "device": str(jax.devices()[0]),
                    "spp": int(stats["spp"]),
                    "wall_s": dt,
                    "rays": rays,
                    "img": [256, 256, 300],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
