"""Unit tests: transient film binning / splatting / develop.

Lanes are spp-major: lane = s * HW + pix.
"""
import jax.numpy as jnp
import numpy as np

from mitransient_tpu.film.transient_film import (
    develop,
    film_init,
    splat_steady,
    splat_transient_pair,
    time_bin,
)
from mitransient_tpu.scene.schema import FilmConfig


def cfg():
    return FilmConfig(width=4, height=2, temporal_bins=10,
                      start_opl=1.0, bin_width_opl=0.5)


def test_time_bin_mapping():
    c = cfg()
    d = jnp.array([0.9, 1.0, 1.49, 1.5, 5.99, 6.0, 100.0])
    b, ok = time_bin(c, d)
    assert np.array_equal(np.asarray(ok), [False, True, True, True, True, False, False])
    assert np.array_equal(np.asarray(b), [10, 0, 0, 1, 9, 10, 10])


def _lane_arrays(c, spp, entries):
    """entries: list of (pix, dist, val(list)) per (s, p) slot to fill."""
    hw = c.width * c.height
    n = spp * hw
    dist = np.full(n, 1e9, np.float32)  # default -> overflow bin
    val = np.zeros((n, 3), np.float32)
    act = np.zeros(n, bool)
    for s, (pix, dd, vv) in enumerate(entries):
        lane = s * hw + pix
        dist[lane] = dd
        val[lane] = vv
        act[lane] = True
    return jnp.asarray(dist), jnp.asarray(val), jnp.asarray(act)


def test_splat_and_develop():
    c = cfg()
    st = film_init(c, channels=3)
    # two samples in pixel 0 hitting bin 0, one in pixel 5 hitting bin 2
    dist, val, act = _lane_arrays(
        c, spp=3,
        entries=[(0, 1.0, [1.0, 2.0, 3.0]), (0, 1.0, [1.0, 0.0, 0.0]),
                 (5, 2.0, [4.0, 4.0, 4.0])],
    )
    st = st._replace(transient=st.transient)
    st = splat_transient_pair(st, c, 3, dist, val, None, None, act)
    steady, tr = develop(st, c)
    assert tr.shape == (2, 4, 10, 3)
    assert np.allclose(tr[0, 0, 0], [2.0, 2.0, 3.0])
    assert np.allclose(tr[1, 1, 2], [4.0, 4.0, 4.0])
    assert np.allclose(tr.sum(), 2 + 2 + 3 + 12)


def test_pair_fused_both_events():
    c = cfg()
    st = film_init(c, channels=3)
    hw = c.width * c.height
    n = 1 * hw
    dist_a = jnp.full((n,), 1.0)
    dist_b = jnp.full((n,), 2.0)
    val = jnp.ones((n, 3))
    act = jnp.zeros((n,), bool).at[2].set(True)
    st = splat_transient_pair(st, c, 1, dist_a, val, dist_b, val, act)
    _, tr = develop(st, c)
    assert np.allclose(tr[0, 2, 0], 1.0)  # event A bin 0
    assert np.allclose(tr[0, 2, 2], 1.0)  # event B bin 2
    assert float(tr.sum()) == 6.0


def test_out_of_range_dropped():
    c = cfg()
    st = film_init(c, channels=3)
    dist, val, act = _lane_arrays(c, spp=1, entries=[(0, 100.0, [7.0] * 3)])
    st = splat_transient_pair(st, c, 1, dist, val, None, None, act)
    _, tr = develop(st, c)
    assert float(jnp.sum(tr)) == 0.0


def test_inactive_masked():
    c = cfg()
    st = film_init(c, channels=3)
    dist, val, _ = _lane_arrays(c, spp=1, entries=[(0, 1.2, [7.0] * 3)])
    act = jnp.zeros_like(dist, bool)
    st = splat_transient_pair(st, c, 1, dist, val, None, None, act)
    _, tr = develop(st, c)
    assert float(jnp.sum(tr)) == 0.0


def test_steady_weight_normalization():
    c = cfg()
    st = film_init(c, channels=1)
    hw = c.width * c.height
    # spp=2, pixel 3 gets values 2 and 4
    val = jnp.zeros((2 * hw, 1)).at[3, 0].set(2.0).at[hw + 3, 0].set(4.0)
    st = splat_steady(st, 2, val, jnp.ones((2 * hw,)))
    steady, _ = develop(st, c)
    assert np.allclose(steady[0, 3], 3.0)  # (2+4)/2


def test_gaussian_temporal_filter_conserves_energy():
    c = cfg()
    st = film_init(c, channels=1)
    hw = c.width * c.height
    dist = jnp.full((hw,), 3.0)
    val = jnp.zeros((hw, 1)).at[0, 0].set(5.0)
    act = jnp.zeros((hw,), bool).at[0].set(True)
    st = splat_transient_pair(st, c, 1, dist, val, None, None, act,
                              temporal_filter="gaussian", gaussian_stddev=1.0)
    _, tr = develop(st, c)
    assert abs(float(jnp.sum(tr)) - 5.0) < 1e-4
    assert float(tr[0, 0, 4, 0]) > float(tr[0, 0, 2, 0]) > 0.0


def test_sample_validation_counters():
    # warn_negative / warn_invalid parity (transient_image_block.py:106-125):
    # dense counters accumulated at splat time, surfaced via render stats
    c = cfg()._replace(warn_negative=True, warn_invalid=True)
    st = film_init(c, channels=1)
    hw = c.width * c.height
    val = jnp.ones((hw, 1))
    val = val.at[0, 0].set(-1.0)          # negative
    val = val.at[1, 0].set(jnp.nan)       # invalid
    val = val.at[2, 0].set(jnp.inf)       # invalid
    dist = jnp.full((hw,), 3.0)
    act = jnp.ones((hw,), bool).at[2].set(False)  # inactive not counted
    st = splat_transient_pair(st, c, 1, dist, val, None, None, act)
    assert float(st.n_negative) == 1.0
    assert float(st.n_invalid) == 1.0
    # disabled flags -> counters untouched
    c2 = cfg()
    st2 = film_init(c2, channels=1)
    st2 = splat_transient_pair(st2, c2, 1, dist, val, None, None, act)
    assert float(st2.n_negative) == 0.0 and float(st2.n_invalid) == 0.0


def test_sample_validation_stats_surface():
    import mitransient_tpu as mitr

    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = 8
    d["sensor"]["film"]["height"] = 8
    d["sensor"]["film"]["temporal_bins"] = 16
    d["sensor"]["film"]["warn_invalid"] = True
    d["sensor"]["film"]["warn_negative"] = True
    d["integrator"]["max_depth"] = 2
    scene = mitr.load_dict(d)
    s, t, stats = mitr.render(scene, spp=4, seed=0, return_stats=True,
                              regenerate=False)
    assert stats["n_negative"] == 0.0
    assert stats["n_invalid"] == 0.0


def test_gaussian_spatial_rfilter():
    """Steady image under the gaussian rfilter: energy-preserving blur of
    the box-filtered image (reference: the steady child hdrfilm accepts a
    gaussian rfilter; transient_hdr_film.py:130-144)."""
    import mitransient_tpu as mitr

    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = 32
    d["sensor"]["film"]["height"] = 32
    d["sensor"]["film"]["temporal_bins"] = 32
    d["sensor"]["film"]["bin_width_opl"] = 0.4
    d["integrator"]["max_depth"] = 3
    s_box, _ = mitr.render(mitr.load_dict(d), spp=32, seed=0,
                           regenerate=False)
    d["sensor"]["film"]["rfilter"] = {"type": "gaussian", "stddev": 0.8}
    scene = mitr.load_dict(d)
    assert scene.sensors[0].film.rfilter == "gaussian"
    s_g, t_g = mitr.render(scene, spp=32, seed=0)
    s_box, s_g = np.asarray(s_box), np.asarray(s_g)
    assert np.all(np.isfinite(s_g))
    # weight normalization keeps the mean (interior loses nothing)
    assert abs(s_g.mean() / s_box.mean() - 1.0) < 0.02
    # wider filter smooths: total variation strictly decreases
    tv = lambda x: np.abs(np.diff(x, axis=0)).sum() + np.abs(
        np.diff(x, axis=1)).sum()
    assert tv(s_g) < 0.9 * tv(s_box)
    # transient stays box-binned and consistent
    assert np.asarray(t_g).sum() > 0


def test_render_aovs():
    """First-hit AOVs (reference film's appended AOV channels,
    transient_hdr_film.py:176-190)."""
    import mitransient_tpu as mitr

    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = 16
    d["sensor"]["film"]["height"] = 16
    scene = mitr.load_dict(d)
    aovs = mitr.render_aovs(scene, spp=8, seed=0)
    assert set(aovs) == {"albedo", "sh_normal", "depth", "position", "alpha"}
    alb = np.asarray(aovs["albedo"])
    nrm = np.asarray(aovs["sh_normal"])
    dep = np.asarray(aovs["depth"])
    assert alb.shape == (16, 16, 3) and dep.shape == (16, 16, 1)
    # interior camera rays all hit geometry
    assert np.allclose(np.asarray(aovs["alpha"])[4:12, 4:12], 1.0)
    # left column of the cbox view is the red wall: albedo red-dominant,
    # normal along +-x
    assert alb[8, 0, 0] > alb[8, 0, 1] * 2
    assert abs(nrm[8, 0, 0]) > 0.7
    # back wall normal along the view axis
    assert abs(nrm[8, 8, 2]) > 0.7
    # depth increases toward the back wall vs the near-side walls
    assert dep[8, 8, 0] > dep[8, 0, 0]


def test_crop_window_render():
    """mi.Film crop semantics (inherited by the reference's transient film):
    rendering restricts to the crop window, developed images have the crop
    size, and the projection is that of the full sensor — so the cropped
    render matches the corresponding window of the full render."""
    import mitransient_tpu as mitr

    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = 32
    d["sensor"]["film"]["height"] = 32
    d["sensor"]["film"]["temporal_bins"] = 100
    d["sensor"]["film"]["start_opl"] = 3.5
    d["sensor"]["film"]["bin_width_opl"] = 0.06
    full = mitr.load_dict(d)
    s_full, t_full = mitr.render(full, spp=160, seed=0)

    d["sensor"]["film"]["crop_offset_x"] = 8
    d["sensor"]["film"]["crop_offset_y"] = 4
    d["sensor"]["film"]["crop_width"] = 12
    d["sensor"]["film"]["crop_height"] = 16
    crop = mitr.load_dict(d)
    assert crop.sensors[0].film.data_width == 12
    assert crop.sensors[0].film.data_height == 16
    s_c, t_c = mitr.render(crop, spp=160, seed=0)
    s_c, t_c = np.asarray(s_c), np.asarray(t_c)
    assert s_c.shape == (16, 12, 3)
    assert t_c.shape == (16, 12, 100, 3)
    win = np.asarray(s_full)[4:20, 8:20]
    # different per-lane jitter streams -> statistical agreement only
    num = float((s_c * win).sum())
    den = float(np.sqrt((s_c ** 2).sum() * (win ** 2).sum()))
    assert den > 0 and num / den > 0.995, num / den
    assert abs(s_c.mean() - win.mean()) / win.mean() < 0.1
    tw = np.asarray(t_full)[4:20, 8:20]
    assert abs(t_c.sum() - tw.sum()) / tw.sum() < 0.1


def test_crop_window_validation_and_guards():
    import mitransient_tpu as mitr
    import pytest

    d = mitr.cornell_box()
    d["sensor"]["film"]["crop_width"] = 300  # exceeds 256
    with pytest.raises(ValueError, match="crop window"):
        mitr.load_dict(d)

    d = mitr.cornell_box()
    d["sensor"]["film"]["crop_width"] = 16
    d["sensor"]["film"]["crop_height"] = 16
    scene = mitr.load_dict(d)
    with pytest.raises(NotImplementedError, match="crop"):
        mitr.render_backward(scene, (None, None), spp=4)

    # phasor refuses crops (phasor_hdr_film.py:147-152)
    old = mitr.variant().name
    mitr.set_variant("mono")
    try:
        d = mitr.cornell_box()
        d["sensor"]["film"] = {
            "type": "phasor_hdr_film", "width": 32, "height": 32,
            "wl_mean": 100.0, "wl_sigma": 100.0, "crop_width": 8,
        }
        with pytest.raises(ValueError, match="crop"):
            mitr.load_dict(d)
    finally:
        mitr.set_variant(old)
