"""Full-loop AD gradients for NLOS and volumetric integrators vs finite
differences (RR disabled for smooth estimators)."""
import numpy as np
import pytest

import mitransient_tpu as mitr
from tests.test_nlos import nlos_scene
from tests.test_volumetric import vol_cbox


def test_nlos_backward_vs_fd():
    d = nlos_scene(sx=2, sy=2)
    d["integrator"]["rr_depth"] = 99
    scene = mitr.load_dict(d)
    mitr.nlos.focus_emitter_at_relay_wall_pixel([1.0, 1.0], scene)
    fc = scene.sensors[0].film
    ones = np.ones((fc.height, fc.width, fc.temporal_bins, 3), np.float32)
    grads = mitr.render_backward(scene, (None, ones), spp=16, seed=0)
    key = next(k for k in grads if "hidden-target" in k)
    g = np.asarray(grads[key])

    params = mitr.traverse(scene)
    base = np.asarray(params[key.replace("", "")]) if False else None
    pkey = key
    base = np.asarray(params[pkey])
    eps = 1e-3
    v = np.array([1.0, 0.5, 0.25], np.float32)

    def loss():
        _s, t = mitr.render(scene, spp=16, seed=0)
        return float(np.asarray(t).sum())

    params[pkey] = base + eps * v
    params.update()
    lp = loss()
    params[pkey] = base - eps * v
    params.update()
    lm = loss()
    params[pkey] = base
    params.update()
    fd = (lp - lm) / (2 * eps)
    an = float(g @ v)
    assert fd != 0.0
    assert abs(an - fd) / max(abs(fd), 1e-9) < 0.02, (an, fd)


def test_volumetric_backward_vs_fd_medium_albedo():
    d = vol_cbox(sigma_t=2.0, albedo=0.8, g=0.2, w=8, h=8, bins=100,
                 max_depth=5)
    d["sensor"]["film"]["start_opl"] = 0.0
    d["sensor"]["film"]["bin_width_opl"] = 0.3
    scene = mitr.load_dict(d)
    fc = scene.sensors[0].film
    ones = np.ones((fc.height, fc.width, fc.temporal_bins, 3), np.float32)
    grads = mitr.render_backward(scene, (None, ones), spp=16, seed=0)
    akey = next(k for k in grads if "albedo" in k)
    g = np.asarray(grads[akey])
    assert np.all(np.isfinite(g)) and np.any(g != 0.0)

    params = mitr.traverse(scene)
    base = np.asarray(params[akey])
    eps = 1e-3
    v = np.ones(3, np.float32)

    def loss():
        _s, t = mitr.render(scene, spp=16, seed=0)
        return float(np.asarray(t).sum())

    params[akey] = base + eps * v
    params.update()
    lp = loss()
    params[akey] = base - eps * v
    params.update()
    lm = loss()
    params[akey] = base
    params.update()
    fd = (lp - lm) / (2 * eps)
    an = float(g @ v)
    assert abs(an - fd) / max(abs(fd), 1e-9) < 0.05, (an, fd)


def test_volumetric_backward_surface_albedo_finite():
    d = vol_cbox(sigma_t=1.0, w=8, h=8, bins=100, max_depth=4)
    scene = mitr.load_dict(d)
    fc = scene.sensors[0].film
    ones = np.ones((fc.height, fc.width, fc.temporal_bins, 3), np.float32)
    grads = mitr.render_backward(scene, (None, ones), spp=8, seed=0)
    g = np.asarray(grads["white.reflectance.value"])
    assert np.all(np.isfinite(g)) and np.any(g != 0.0)


def test_nlos_polarized_backward_vs_fd():
    """Polarized NLOS full-loop AD: the round-3 advisor found the fullad
    path silently dropped the polarized/spectral variant flags and
    differentiated a different (unpolarized) estimator.  Gradient of the
    S0-weighted transient sum wrt the hidden target's reflectance must
    match a same-seed finite difference of the polarized primal."""
    old = mitr.variant().name
    mitr.set_variant("mono_polarized")
    try:
        d = nlos_scene(sx=2, sy=2)
        d["integrator"]["rr_depth"] = 99
        scene = mitr.load_dict(d)
        mitr.nlos.focus_emitter_at_relay_wall_pixel([1.0, 1.0], scene)
        fc = scene.sensors[0].film
        # weight only the S0 (intensity) channel of the 4-Stokes output
        gt = np.zeros((fc.height, fc.width, fc.temporal_bins, 4), np.float32)
        gt[..., 0] = 1.0
        grads = mitr.render_backward(scene, (None, gt), spp=16, seed=0)
        key = next(k for k in grads if "hidden-target" in k)
        g = np.asarray(grads[key])
        assert np.all(np.isfinite(g))

        params = mitr.traverse(scene)
        base = np.asarray(params[key])
        eps = 1e-3
        v = np.ones_like(base)

        def loss():
            _s, t = mitr.render(scene, spp=16, seed=0)
            return float(np.asarray(t)[..., 0].sum())

        params[key] = base + eps * v
        params.update()
        lp = loss()
        params[key] = base - eps * v
        params.update()
        lm = loss()
        params[key] = base
        params.update()
        fd = (lp - lm) / (2 * eps)
        an = float(np.sum(g * v))
        assert fd != 0.0
        assert abs(an - fd) / max(abs(fd), 1e-9) < 0.05, (an, fd)
    finally:
        mitr.set_variant(old)
