"""Round-4 TPU measurement batch: exhaustive fused-vs-perpoint speedup,
TPU-vs-CPU exhaustive correctness smoke, and polarized carry layout dump.

Run alone (one TPU process): python scripts/r4_measure.py
"""
import json
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


def sync(*xs):
    return sum(float(jnp.sum(x)) for x in xs)


def exhaustive_speedup():
    import mitransient_tpu as mitr
    import tests.test_nlos as fx
    from mitransient_tpu.integrators.nlos_path import (
        _render_nlos_exhaustive_perpoint,
        render_nlos_exhaustive,
    )

    d = fx.nlos_scene(sx=8, sy=8)
    d["integrator"]["capture_type"] = "exhaustive"
    d["relay_wall"]["nlos_sensor"]["film"]["exhaustive_scan"] = True
    d["relay_wall"]["nlos_sensor"]["film"]["laser_scan_width"] = 4
    d["relay_wall"]["nlos_sensor"]["film"]["laser_scan_height"] = 4
    spp = 512

    scene = mitr.load_dict(d)
    s, t, st = render_nlos_exhaustive(scene, spp, seed=0, return_stats=True)
    t0 = time.perf_counter()
    s, t, st = render_nlos_exhaustive(scene, spp, seed=1, return_stats=True)
    dt_fused = time.perf_counter() - t0

    scene2 = mitr.load_dict(d)
    s2, t2, st2 = _render_nlos_exhaustive_perpoint(scene2, spp, seed=0,
                                                   return_stats=True)
    t0 = time.perf_counter()
    s2, t2, st2 = _render_nlos_exhaustive_perpoint(scene2, spp, seed=1,
                                                   return_stats=True)
    dt_pp = time.perf_counter() - t0

    err = float(np.abs(t - t2).max() / max(np.abs(t2).max(), 1e-12))
    print(json.dumps({
        "metric": "exhaustive_4x4_fused_vs_perpoint",
        "fused_s": dt_fused, "perpoint_s": dt_pp,
        "speedup": dt_pp / dt_fused, "max_rel_err": err,
    }), flush=True)

    # single render of the same scene/spp for the "~1 render" comparison
    d1 = fx.nlos_scene(sx=8, sy=8)
    sc1 = mitr.load_dict(d1)
    mitr.nlos.focus_emitter_at_relay_wall_pixel([4.0, 4.0], sc1)
    mitr.render(sc1, spp=spp, seed=0)
    t0 = time.perf_counter()
    s1, t1 = mitr.render(sc1, spp=spp, seed=1)
    sync(s1, t1)
    dt_single = time.perf_counter() - t0
    print(json.dumps({
        "metric": "exhaustive_cost_in_single_renders",
        "single_s": dt_single, "fused_over_single": dt_fused / dt_single,
        "perpoint_over_single": dt_pp / dt_single,
    }), flush=True)


def polarized_layout_dump():
    import mitransient_tpu as mitr
    from mitransient_tpu.render import _perspective_pass
    from mitransient_tpu.sensors.perspective import build_camera
    from mitransient_tpu.film.transient_film import film_init
    from mitransient_tpu.scene.scene import primal_sd
    from mitransient_tpu.core.rng import Sampler  # noqa

    old = mitr.variant().name
    mitr.set_variant("mono_polarized")
    d = mitr.cornell_box()
    d["sensor"]["film"]["temporal_bins"] = 400
    d["small-box"]["bsdf"] = {
        "type": "roughconductor", "material": "Au", "alpha": 0.3}
    scene = mitr.load_dict(d)
    mitr.set_variant(old)
    cfg = scene.sensors[0]
    cam = build_camera(cfg)
    film = film_init(cfg.film, 4)
    spp_chunk = max(1, (1 << 21) // (256 * 256))
    lowered = _perspective_pass.lower(
        primal_sd(scene.data), cam, film, jnp.uint32(0), jnp.uint32(0),
        jnp.float32(1.0),
        film_cfg=cfg.film, icfg=scene.integrator, width=256, height=256,
        spp_chunk=spp_chunk, polarized=True, spectral=False)
    txt = lowered.compile().as_text()
    with open("/tmp/pol_hlo.txt", "w") as f:
        f.write(txt)
    # pull out the while-loop carry tuple shapes + layouts
    import re
    lines = [ln for ln in txt.splitlines()
             if re.search(r"f32\[\d+,4,4", ln) or "while" in ln[:30]]
    print(f"# pol HLO: {len(txt)} chars, beta-shaped lines: {len(lines)}",
          flush=True)
    for ln in lines[:40]:
        print(ln[:220], flush=True)

    # timed polarized render with the honest sync
    s, t = mitr.render(scene, spp=64, seed=0)
    sync(s, t)
    t0 = time.perf_counter()
    s, t, st = mitr.render(scene, spp=64, seed=1, return_stats=True)
    sync(s, t)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "polarized_cbox_rays_per_sec",
        "value": float(st["rays"]) / dt, "wall_s": dt,
    }), flush=True)


if __name__ == "__main__":
    warm()
    for step in sys.argv[1:] or ["exhaustive", "polarized"]:
        if step == "exhaustive":
            exhaustive_speedup()
        elif step == "polarized":
            polarized_layout_dump()
