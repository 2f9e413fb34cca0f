"""Phasor-field film tests: frequency-domain rendering vs DFT of the
time-domain render (the defining property of the phasor film,
phasor_image_block.py:42-67)."""
import numpy as np
import pytest

import mitransient_tpu as mitr
from mitransient_tpu.film.phasor_film import phasor_frequencies
from mitransient_tpu.scene.schema import FilmConfig


def _mono_cbox(film):
    d = mitr.cornell_box()
    d["sensor"]["film"] = film
    d["integrator"]["max_depth"] = 4
    return d


@pytest.fixture()
def mono_variant():
    old = mitr.variant().name
    mitr.set_variant("mono")
    yield
    mitr.set_variant(old)


def test_frequency_selection_matches_reference_formula():
    cfg = FilmConfig(kind="phasor_hdr_film", temporal_bins=4000,
                     bin_width_opl=0.003, wl_mean=100.0, wl_sigma=100.0)
    f = phasor_frequencies(cfg)
    # band must be non-empty, non-negative, within [0, nyquist]
    assert len(f) >= 1
    assert np.all(f >= 0.0)
    assert f.max() <= 0.5 / cfg.bin_width_opl + 1e-6


def test_phasor_render_matches_dft_of_transient(mono_variant):
    film_ph = {
        "type": "phasor_hdr_film", "width": 16, "height": 16,
        "temporal_bins": 300, "bin_width_opl": 0.02, "start_opl": 3.5,
        "wl_mean": 2.0, "wl_sigma": 1.0,
    }
    scene_ph = mitr.load_dict(_mono_cbox(film_ph))
    steady_ph, phasors = mitr.render(scene_ph, spp=16, seed=0)
    phasors = np.asarray(phasors)
    freqs = phasor_frequencies(scene_ph.sensors[0].film)
    F = len(freqs)
    assert phasors.shape == (16, 16, F, 2)

    film_tr = dict(film_ph)
    film_tr["type"] = "transient_hdr_film"
    scene_tr = mitr.load_dict(_mono_cbox(film_tr))
    steady_tr, transient = mitr.render(scene_tr, spp=16, seed=0)
    tr = np.asarray(transient)[..., 0]  # (H, W, T)

    # DFT of the binned signal at the tracked frequencies, using bin-center
    # OPL offsets from start_opl (the phasor film uses continuous OPL, so
    # agreement is up to binning discretization)
    t_opl = (np.arange(300) + 0.5) * 0.02
    for k, f in enumerate(freqs):
        ref_re = (tr * np.cos(-2 * np.pi * f * t_opl)).sum(axis=2)
        ref_im = (tr * np.sin(-2 * np.pi * f * t_opl)).sum(axis=2)
        got_re = phasors[:, :, k, 0]
        got_im = phasors[:, :, k, 1]
        scale = max(np.abs(ref_re).max(), np.abs(ref_im).max(), 1e-9)
        assert np.abs(got_re - ref_re).max() / scale < 0.08, f
        assert np.abs(got_im - ref_im).max() / scale < 0.08, f

    # steady images identical (same estimator)
    assert np.allclose(np.asarray(steady_ph), np.asarray(steady_tr),
                       atol=1e-5)


def test_zero_frequency_equals_time_integral(mono_variant):
    film_ph = {
        "type": "phasor_hdr_film", "width": 8, "height": 8,
        "temporal_bins": 300, "bin_width_opl": 0.02, "start_opl": 3.5,
        "wl_mean": 50.0, "wl_sigma": 0.5,  # huge wavelength -> f ~ 0 band
    }
    scene = mitr.load_dict(_mono_cbox(film_ph))
    freqs = phasor_frequencies(scene.sensors[0].film)
    assert freqs[0] == 0.0
    _s, ph = mitr.render(scene, spp=8, seed=0)
    ph = np.asarray(ph)
    # f=0: re = time integral of the signal, im = 0
    assert ph[..., 0, 0].sum() > 0.0
    assert np.abs(ph[..., 0, 1]).max() < 1e-6


def test_phasor_not_differentiable():
    """The phasor film is excluded from AD like the reference's
    PhasorHDRFilm: differential entry points raise a clear error."""
    import pytest

    d = mitr.cornell_box()
    d["sensor"]["film"] = {
        "type": "phasor_hdr_film", "width": 8, "height": 8,
        "wl_mean": 100.0, "wl_sigma": 100.0, "temporal_bins": 50,
        "start_opl": 3.5, "bin_width_opl": 0.02}
    scene = mitr.load_dict(d)
    with pytest.raises(NotImplementedError, match="phasor"):
        mitr.render_backward(scene, (None, None), spp=4, seed=0)
    with pytest.raises(NotImplementedError, match="phasor"):
        mitr.render_forward(scene, {}, spp=4, seed=0)
