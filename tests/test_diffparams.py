"""Widened differentiable-parameter surface (VERDICT round-1 item 6):
texture-atlas texels, GGX roughness alpha, and medium sigma_t — all
validated against finite differences of the same seeded estimator (RR off).

Reference parity: mi.traverse exposes `<bsdf>.reflectance.data` for bitmap
textures (the staircase diff-transient scene optimizes its roughplastic
diffuse_reflectance bitmaps, examples/diff-transient/staircase/scene.xml),
GGX `alpha`, and medium `sigma_t`.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import mitransient_tpu as mitr


def _loss(scene, spp, seed=0):
    _s, t = mitr.render(scene, spp=spp, seed=seed, regenerate=False)
    # float64 accumulation: FD differences can sit near f32 rounding of the
    # full-film sum
    return float(np.asarray(t, np.float64).sum())


def _fd(scene, path, direction, spp, eps):
    params = mitr.traverse(scene)
    base = np.asarray(params[path])
    params[path] = base + eps * direction
    params.update()
    lp = _loss(scene, spp)
    params[path] = base - eps * direction
    params.update()
    lm = _loss(scene, spp)
    params[path] = base
    params.update()
    return (lp - lm) / (2 * eps)


def cbox(**kw):
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = kw.get("res", 16)
    d["sensor"]["film"]["height"] = kw.get("res", 16)
    d["sensor"]["film"]["temporal_bins"] = 200
    d["sensor"]["film"]["start_opl"] = 0.0
    d["sensor"]["film"]["bin_width_opl"] = 0.1
    d["integrator"]["max_depth"] = kw.get("max_depth", 4)
    d["integrator"]["rr_depth"] = 99
    return d


SPP = 48


def test_ggx_alpha_gradient_vs_fd():
    """GGX roughness: detached sampling means the backward and a pathwise
    finite difference are different unbiased estimators of dE/d(alpha) —
    they agree in expectation only, so higher spp + loose tolerance."""
    d = cbox(res=12)
    d["small-box"]["bsdf"] = {"type": "roughconductor", "material": "Al",
                              "alpha": 0.3}
    scene = mitr.load_dict(d)
    cfg = scene.sensors[0].film
    ones_t = np.ones((cfg.height, cfg.width, cfg.temporal_bins, 3),
                     np.float32)
    spp = 512
    grads = mitr.render_backward(scene, (None, ones_t), spp=spp, seed=0)
    keys = [k for k in grads if k.endswith(".alpha.value")
            and "small-box" in k]
    assert keys, sorted(grads)
    an = float(np.asarray(grads[keys[0]]))
    fd = _fd(scene, keys[0], 1.0, spp, eps=0.02)
    assert fd != 0.0 and an != 0.0
    assert np.sign(an) == np.sign(fd)
    assert abs(an - fd) / max(abs(fd), 1e-9) < 0.25, (an, fd)


def test_texture_texel_gradient_vs_fd():
    d = cbox(res=16)
    d["floor"]["bsdf"] = {
        "type": "diffuse",
        "reflectance": {
            "type": "checkerboard",
            "color0": {"type": "rgb", "value": [0.7, 0.3, 0.2]},
            "color1": {"type": "rgb", "value": [0.2, 0.6, 0.7]},
        },
    }
    scene = mitr.load_dict(d)
    keys = [k for k in mitr.traverse(scene).keys()
            if k.endswith("reflectance.data")]
    assert keys, "no texture data paths registered"
    path = keys[0]
    cfg = scene.sensors[0].film
    ones_t = np.ones((cfg.height, cfg.width, cfg.temporal_bins, 3),
                     np.float32)
    grads = mitr.render_backward(scene, (None, ones_t), spp=SPP, seed=0)
    g = np.asarray(grads[path])  # (th, tw, C) atlas slab gradient
    assert np.any(g != 0.0)
    # FD along a fixed random direction over the whole slab
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, g.shape).astype(np.float32)
    an = float((g * v).sum())
    fd = _fd(scene, path, v, SPP, eps=0.05)
    assert fd != 0.0
    assert abs(an - fd) / max(abs(fd), 1e-9) < 0.05, (an, fd)


def test_texture_texel_gradient_matches_taped_ad():
    """The PRB replay's texture gradient must equal exact taped AD through
    the primal loop (texels are linear, sampling is texel-independent, so
    taped == replay analytically)."""
    import jax

    from mitransient_tpu.core.rng import Sampler
    from mitransient_tpu.film.transient_film import develop, film_init
    from mitransient_tpu.integrators.path import sample_primal
    from mitransient_tpu.integrators.prb import extract_params, insert_params
    from mitransient_tpu.sensors.perspective import build_camera, sample_rays

    d = cbox(res=8, max_depth=3)
    d["floor"]["bsdf"] = {
        "type": "diffuse",
        "reflectance": {
            "type": "checkerboard",
            "color0": {"type": "rgb", "value": [0.7, 0.3, 0.2]},
            "color1": {"type": "rgb", "value": [0.2, 0.6, 0.7]},
        },
    }
    scene = mitr.load_dict(d)
    path = [k for k in mitr.traverse(scene).keys()
            if k.endswith("reflectance.data")][0]
    cfg = scene.sensors[0].film
    icfg = scene.integrator
    spp = 16
    hw = cfg.width * cfg.height
    cam = build_camera(scene.sensors[0])
    sd0 = scene.data

    def loss_fn(theta):
        sdt = insert_params(sd0, theta)
        sampler = Sampler(jnp.uint32(0), spp * hw, stream=jnp.uint32(0))
        ray, pix, rw = sample_rays(cam, sampler, cfg.width, cfg.height, spp)
        film = film_init(cfg, 3)
        film, L, _v, _r = sample_primal(
            sdt, sampler, ray, pix, rw, film, cfg, icfg,
            sample_scale=1.0 / spp, base_dim=2, spp=spp)
        _s, t = develop(film, cfg)
        return jnp.sum(t)

    g_tape = jax.jit(jax.grad(loss_fn))(extract_params(sd0))
    ones_t = np.ones((cfg.height, cfg.width, cfg.temporal_bins, 3),
                     np.float32)
    grads = mitr.render_backward(scene, (None, ones_t), spp=spp, seed=0)
    np.testing.assert_allclose(
        np.asarray(grads[path]), np.asarray(g_tape.bsdf_textures[0]),
        rtol=2e-3, atol=1e-6)


def _vol_scene(max_depth=8):
    d = cbox(res=12, max_depth=max_depth)
    d["integrator"] = {"type": "transient_prbvolpath",
                       "max_depth": max_depth, "rr_depth": 99}
    d["small-box"]["bsdf"] = {"type": "null"}
    d["small-box"]["medium"] = {
        "type": "homogeneous", "sigma_t": 2.5,
        "albedo": {"type": "rgb", "value": [0.8, 0.7, 0.6]},
        "phase": {"type": "hg", "g": 0.2},
    }
    return mitr.load_dict(d)


def test_sigma_t_replay_matches_fullad():
    """The O(1)-depth replay (prb_vol) and the loop-taping full-AD path
    differentiate the SAME detached estimator (stop_gradient'd flight
    distances + attached survival ratios + attached NEE transmittance), so
    their sigma_t gradients must agree tightly."""
    scene = _vol_scene(max_depth=6)
    cfg = scene.sensors[0].film
    ones_t = np.ones((cfg.height, cfg.width, cfg.temporal_bins, 3),
                     np.float32)
    g_replay = mitr.render_backward(scene, (None, ones_t), spp=SPP, seed=0)
    g_fullad = mitr.render_backward(scene, (None, ones_t), spp=SPP, seed=0,
                                    method="fullad")
    keys = [k for k in g_replay if k.endswith("sigma_t.value")]
    assert keys, sorted(g_replay)
    a = float(np.asarray(g_replay[keys[0]]))
    b = float(np.asarray(g_fullad[keys[0]]))
    assert a != 0.0
    assert abs(a - b) / max(abs(b), 1e-9) < 5e-3, (a, b)


def test_sigma_t_gradient_vs_fd_expectation():
    """Finite differences of the primal re-sample the flight distances
    (pathwise derivative), while the backward uses detached-sampling
    attached factors — the two only agree in expectation, so this check
    runs at higher spp with a correspondingly loose tolerance."""
    scene = _vol_scene(max_depth=4)
    cfg = scene.sensors[0].film
    ones_t = np.ones((cfg.height, cfg.width, cfg.temporal_bins, 3),
                     np.float32)
    spp = 512
    grads = mitr.render_backward(scene, (None, ones_t), spp=spp, seed=0)
    keys = [k for k in grads if k.endswith("sigma_t.value")]
    an = float(np.asarray(grads[keys[0]]))
    fd = _fd(scene, keys[0], 1.0, spp, eps=0.02)
    assert fd != 0.0 and an != 0.0
    assert np.sign(an) == np.sign(fd)
    assert abs(an - fd) / max(abs(fd), 1e-9) < 0.25, (an, fd)


def test_traverse_exposes_new_paths():
    d = cbox()
    d["small-box"]["bsdf"] = {"type": "roughconductor", "alpha": 0.2}
    scene = mitr.load_dict(d)
    params = mitr.traverse(scene)
    alpha_keys = [k for k in params.keys() if k.endswith(".alpha.value")]
    assert alpha_keys
    k = [x for x in alpha_keys if "small-box" in x][0]
    assert abs(float(params[k]) - 0.2) < 1e-6
    params[k] = 0.4
    params.update()
    assert abs(float(params[k]) - 0.4) < 1e-6


def test_update_batch_device_tables_survive_rebake():
    """A single update() batch staging a device-table edit (reflectance)
    together with a geometry edit (shape.translate) must keep BOTH: the
    rebake used to rebuild SceneData from host objects and silently discard
    the device-table update (round-3 advisor finding)."""
    d = cbox()
    scene = mitr.load_dict(d)
    params = mitr.traverse(scene)
    rkey = next(k for k in params.keys() if k.startswith("white.reflectance"))
    tkey = next(k for k in params.keys() if k.endswith("to_world.translate")
                and "small-box" in k)
    newr = np.array([0.123, 0.456, 0.789], np.float32)
    params[rkey] = newr
    params[tkey] = np.asarray(params[tkey]) + np.array([0.05, 0.0, 0.0])
    params.update()
    assert np.allclose(np.asarray(params[rkey]), newr, atol=1e-6)
    # ... and a LATER geometry-only rebake must not revert it either
    # (the value is mirrored into the host-side BSDF object)
    params[tkey] = np.asarray(params[tkey]) + np.array([-0.05, 0.0, 0.0])
    params.update()
    assert np.allclose(np.asarray(params[rkey]), newr, atol=1e-6)


def test_emitter_radiance_update_survives_rebake():
    d = cbox()
    scene = mitr.load_dict(d)
    params = mitr.traverse(scene)
    ekey = next(k for k in params.keys() if "radiance" in k)
    tkey = next(k for k in params.keys() if k.endswith("to_world.translate")
                and "small-box" in k)
    base = np.asarray(params[ekey])
    params[ekey] = base * 2.0
    params[tkey] = np.asarray(params[tkey]) + np.array([0.02, 0.0, 0.0])
    params.update()
    assert np.allclose(np.asarray(params[ekey]), base * 2.0, rtol=1e-6)


def test_film_params_traversable():
    """Round-5: film re-bin parameters are in the traversal surface
    (parity: transient_hdr_film.py:295-308 exposes temporal_bins /
    bin_width_opl / start_opl as NonDifferentiable).  update() re-bins the
    next render."""
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = 8
    d["sensor"]["film"]["height"] = 8
    d["sensor"]["film"]["temporal_bins"] = 100
    scene = mitr.load_dict(d)
    params = mitr.traverse(scene)
    for key in ("sensor.film.start_opl", "sensor.film.bin_width_opl",
                "sensor.film.temporal_bins"):
        assert key in params.keys(), key
    assert params["sensor.film.temporal_bins"] == 100
    bw = float(params["sensor.film.bin_width_opl"])
    _s, t1 = mitr.render(scene, spp=16, seed=0)
    assert np.asarray(t1).shape[2] == 100
    # halving the bin width doubles the first-arrival bin index
    p1 = np.asarray(t1).sum(axis=(0, 1, 3))
    f1 = np.nonzero(p1)[0][0]
    # halve the bin width and double the bin count: the SAME time window
    # at twice the resolution — energy conserved, first arrival at 2x bin
    params["sensor.film.bin_width_opl"] = bw / 2.0
    params["sensor.film.temporal_bins"] = 200
    params.update()
    assert scene.sensors[0].film.temporal_bins == 200
    _s, t2 = mitr.render(scene, spp=16, seed=0)
    assert np.asarray(t2).shape[2] == 200
    p2 = np.asarray(t2).sum(axis=(0, 1, 3))
    f2 = np.nonzero(p2)[0][0]
    assert abs(f2 - 2 * f1) <= 2, (f1, f2)
    # energy is conserved across re-binning (same paths, same window)
    assert abs(p2.sum() - p1.sum()) / p1.sum() < 1e-3


def test_nlos_laser_params_traversable():
    """NLOS sensor exposes laser_bounce_opl / laser_target
    (nloscapturemeter.py:219-227); updating laser_target refocuses the
    next render (the memoized NLOS context is invalidated)."""
    import sys
    sys.path.insert(0, "tests")
    from test_nlos import nlos_scene

    scene = mitr.load_dict(nlos_scene())
    mitr.nlos.focus_emitter_at_relay_wall_pixel([1.0, 1.0], scene)
    params = mitr.traverse(scene)
    assert "sensor.laser_bounce_opl" in params.keys()
    assert "sensor.laser_target" in params.keys()
    t0 = np.asarray(params["sensor.laser_target"]).copy()
    opl0 = float(params["sensor.laser_bounce_opl"])
    # the focus helper filled both: target on the wall, opl = ||target-o||
    assert np.abs(t0[2]) < 1e-5  # relay wall is the z=0 plane
    assert opl0 > 0
    # writes land in the scene's laser state and invalidate the memoized
    # NLOS context (like the reference's NonDifferentiable params,
    # nloscapturemeter.py:219-227 — writing does not re-aim the emitter
    # there either)
    mitr.nlos.focus_emitter_at_relay_wall_pixel([3.0, 3.0], scene)
    t1 = np.asarray(mitr.traverse(scene)["sensor.laser_target"])
    assert not np.allclose(t0, t1)
    params2 = mitr.traverse(scene)
    params2["sensor.laser_target"] = t0
    params2["sensor.laser_bounce_opl"] = opl0
    params2.update()
    assert np.allclose(np.asarray(scene.laser_target), t0)
    assert float(scene.laser_bounce_opl) == opl0
    assert scene._nlos_ctx_cache is None
