"""Gradient correctness: PRB backward/forward vs finite differences.

The reference ships no gradient tests at all (SURVEY.md section 4); the
BASELINE target is 'pixel-and-bin gradients allclose'.  Russian roulette is
disabled (rr_depth > max_depth) so the estimator is a smooth function of the
parameters and finite differences of the *same seeded estimator* equal the
analytic derivative up to O(eps^2).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import mitransient_tpu as mitr


def cbox(w=16, h=16, bins=300, max_depth=4):
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = w
    d["sensor"]["film"]["height"] = h
    d["sensor"]["film"]["temporal_bins"] = bins
    # full-coverage time window: every splat lands in range, so the
    # adjoint-read-at-vertex-distance approximation (transientpath.py:309-311)
    # is exact and gradients match finite differences tightly
    d["sensor"]["film"]["start_opl"] = 0.0
    d["sensor"]["film"]["bin_width_opl"] = 0.1
    d["integrator"]["max_depth"] = max_depth
    d["integrator"]["rr_depth"] = 99  # disable RR: smooth estimator
    return d


SPP = 32


@pytest.fixture(scope="module")
def scene():
    return mitr.load_dict(cbox())


def _loss(scene, spp=SPP, seed=0):
    # regenerate=False: the PRB sweeps replay the fixed-depth sample stream,
    # so exact consistency checks must use the same stream
    _s, t = mitr.render(scene, spp=spp, seed=seed, regenerate=False)
    return float(jnp.sum(t))


def test_emitter_radiance_gradient_linearity(scene):
    """L is linear in the (single) emitter radiance, so
    <grad_radiance, radiance> == loss exactly."""
    cfg = scene.sensors[0].film
    ones_t = np.ones((cfg.height, cfg.width, cfg.temporal_bins, 3), np.float32)
    grads = mitr.render_backward(scene, (None, ones_t), spp=SPP, seed=0)
    g_rad = np.asarray(grads["light.emitter.radiance.value"])
    rad = np.asarray(scene.data.emitter.radiance[0])
    inner = float(g_rad @ rad)
    loss = _loss(scene, seed=0)
    assert abs(inner - loss) / max(loss, 1e-9) < 1e-3


def test_albedo_gradient_vs_finite_difference(scene):
    cfg = scene.sensors[0].film
    ones_t = np.ones((cfg.height, cfg.width, cfg.temporal_bins, 3), np.float32)
    grads = mitr.render_backward(scene, (None, ones_t), spp=SPP, seed=0)
    g = np.asarray(grads["white.reflectance.value"])

    params = mitr.traverse(scene)
    base = np.asarray(params["white.reflectance.value"])
    eps = 1e-3
    v = np.array([1.0, 0.5, 0.25], np.float32)  # direction

    params["white.reflectance.value"] = base + eps * v
    params.update()
    lp = _loss(scene, seed=0)
    params["white.reflectance.value"] = base - eps * v
    params.update()
    lm = _loss(scene, seed=0)
    params["white.reflectance.value"] = base
    params.update()

    fd = (lp - lm) / (2 * eps)
    an = float(g @ v)
    assert fd != 0.0
    assert abs(an - fd) / max(abs(fd), 1e-9) < 0.02, (an, fd)


def test_steady_grad_only(scene):
    """grad_in on the steady image alone also produces gradients
    (deltaL = broadcast of dsteady over bins, common.py:363-366)."""
    cfg = scene.sensors[0].film
    ones_s = np.ones((cfg.height, cfg.width, 3), np.float32)
    grads = mitr.render_backward(scene, (ones_s, None), spp=SPP, seed=0)
    g = np.asarray(grads["white.reflectance.value"])
    assert np.all(np.isfinite(g))
    assert np.any(g != 0.0)


def test_forward_mode_matches_fd_video(scene):
    """Forward-mode derivative video ~ FD of the transient video."""
    eps = 1e-3
    v = np.array([1.0, 1.0, 1.0], np.float32)
    ds, dt = mitr.render_forward(
        scene, {"white.reflectance.value": v}, spp=SPP, seed=0
    )
    params = mitr.traverse(scene)
    base = np.asarray(params["white.reflectance.value"])
    params["white.reflectance.value"] = base + eps * v
    params.update()
    _sp, tp = mitr.render(scene, spp=SPP, seed=0, regenerate=False)
    params["white.reflectance.value"] = base - eps * v
    params.update()
    _sm, tm = mitr.render(scene, spp=SPP, seed=0, regenerate=False)
    params["white.reflectance.value"] = base
    params.update()
    fd = (np.asarray(tp) - np.asarray(tm)) / (2 * eps)
    an = np.asarray(dt)
    assert abs(an.sum() - fd.sum()) / max(abs(fd.sum()), 1e-9) < 0.02
    # per-pixel (time-integrated) derivative images must agree tightly; the
    # *time* attribution of the NEE derivative differs by construction (the
    # reference splats forward derivatives at the vertex distance,
    # transientpath.py:312-316, while FD places them at the NEE bin)
    an_px = an.sum(axis=2)
    fd_px = fd.sum(axis=2)
    num = float((an_px * fd_px).sum())
    den = float(np.sqrt((an_px ** 2).sum() * (fd_px ** 2).sum()))
    assert den > 0 and num / den > 0.999


def test_forward_backward_consistency(scene):
    """<grad_backward, v> == sum(forward(v)) for matching grad_in=ones."""
    cfg = scene.sensors[0].film
    v = np.array([0.3, 0.2, 0.1], np.float32)
    ds, dt = mitr.render_forward(
        scene, {"green.reflectance.value": v}, spp=SPP, seed=0
    )
    fwd_total = float(jnp.sum(dt))
    ones_t = np.ones((cfg.height, cfg.width, cfg.temporal_bins, 3), np.float32)
    grads = mitr.render_backward(scene, (None, ones_t), spp=SPP, seed=0)
    bwd_total = float(np.asarray(grads["green.reflectance.value"]) @ v)
    assert abs(fwd_total - bwd_total) / max(abs(bwd_total), 1e-9) < 1e-3


def test_backward_chunked_matches_single_pass(scene):
    """spp-chunked PRB backward (multi-pass accumulation, round-5 lift of
    the single-pass cap — reference bar common.py:51-85) is an unbiased
    estimate of the same gradient: direction and magnitude agree with the
    single-pass run within MC noise, and the emitter-radiance linearity
    identity <grad, radiance> == E[loss] transfers."""
    cfg = scene.sensors[0].film
    ones_t = np.ones((cfg.height, cfg.width, cfg.temporal_bins, 3),
                     np.float32)
    g1 = mitr.render_backward(scene, (None, ones_t), spp=SPP, seed=0)
    # max_lanes forces 16*16*32 lanes into 4 chunks of spp 8
    gc = mitr.render_backward(scene, (None, ones_t), spp=SPP, seed=0,
                              max_lanes=16 * 16 * 8)
    a = np.asarray(g1["white.reflectance.value"])
    b = np.asarray(gc["white.reflectance.value"])
    cos = float(a @ b) / max(
        float(np.linalg.norm(a) * np.linalg.norm(b)), 1e-12)
    assert cos > 0.99
    assert abs(a.sum() - b.sum()) / max(abs(a.sum()), 1e-9) < 0.1


def test_forward_chunked_matches_single_pass(scene):
    """spp-chunked forward mode (derivative-film state accumulation across
    chunks) agrees with the single-pass derivative video within MC noise."""
    v = np.array([1.0, 1.0, 1.0], np.float32)
    ds1, dt1 = mitr.render_forward(
        scene, {"white.reflectance.value": v}, spp=SPP, seed=0)
    dsc, dtc = mitr.render_forward(
        scene, {"white.reflectance.value": v}, spp=SPP, seed=0,
        max_lanes=16 * 16 * 8)
    # per-bin values are MC-noisy across the different chunk streams;
    # compare the time-integrated derivative images (as the FD test does).
    # Calibration: two independent SINGLE-pass estimates (seed 0 vs 1) have
    # cosine 0.958 at this size — the chunked run measures 0.973, i.e.
    # inside the estimator's own noise floor.
    a = np.asarray(dt1).sum(axis=2)
    b = np.asarray(dtc).sum(axis=2)
    num = float((a * b).sum())
    den = float(np.sqrt((a ** 2).sum() * (b ** 2).sum()))
    assert den > 0 and num / den > 0.95
    assert abs(a.sum() - b.sum()) / max(abs(a.sum()), 1e-9) < 0.1
