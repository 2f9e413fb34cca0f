"""Unit tests: transient film binning / splatting / develop."""
import jax.numpy as jnp
import numpy as np

from mitransient_tpu.film.transient_film import (
    develop,
    film_init,
    splat_steady,
    splat_transient,
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
    # (d - 1.0) / 0.5 -> bins; valid range [0, 10)
    assert np.array_equal(np.asarray(ok), [False, True, True, True, True, False, False])
    assert np.array_equal(np.asarray(b), [10, 0, 0, 1, 9, 10, 10])


def test_splat_and_develop():
    c = cfg()
    st = film_init(c, channels=3)
    pix = jnp.array([0, 0, 5], jnp.int32)
    dist = jnp.array([1.0, 1.0, 2.0])
    val = jnp.array([[1.0, 2.0, 3.0], [1.0, 0.0, 0.0], [4.0, 4.0, 4.0]])
    act = jnp.array([True, True, True])
    st = splat_transient(st, c, pix, dist, val, act)
    steady, tr = develop(st, c)
    assert tr.shape == (2, 4, 10, 3)
    assert np.allclose(tr[0, 0, 0], [2.0, 2.0, 3.0])  # two splats same bin
    assert np.allclose(tr[1, 1, 2], [4.0, 4.0, 4.0])  # pix 5 = (row1, col1)


def test_out_of_range_dropped():
    c = cfg()
    st = film_init(c, channels=1)
    st = splat_transient(
        st, c, jnp.array([0], jnp.int32), jnp.array([100.0]),
        jnp.array([[7.0]]), jnp.array([True])
    )
    _, tr = develop(st, c)
    assert float(jnp.sum(tr)) == 0.0


def test_inactive_masked():
    c = cfg()
    st = film_init(c, channels=1)
    st = splat_transient(
        st, c, jnp.array([0], jnp.int32), jnp.array([1.2]),
        jnp.array([[7.0]]), jnp.array([False])
    )
    _, tr = develop(st, c)
    assert float(jnp.sum(tr)) == 0.0


def test_steady_weight_normalization():
    c = cfg()
    st = film_init(c, channels=1)
    pix = jnp.array([3, 3], jnp.int32)
    st = splat_steady(st, pix, jnp.array([[2.0], [4.0]]), jnp.ones((2,)))
    steady, _ = develop(st, c)
    assert np.allclose(steady[0, 3], 3.0)  # (2+4)/2


def test_gaussian_temporal_filter_conserves_energy():
    c = cfg()
    st = film_init(c, channels=1)
    st = splat_transient(
        st, c, jnp.array([0], jnp.int32), jnp.array([3.0]),
        jnp.array([[5.0]]), jnp.array([True]),
        temporal_filter="gaussian", gaussian_stddev=1.0,
    )
    _, tr = develop(st, c)
    # splat centered at bin 4, spread over neighbors, total preserved
    assert abs(float(jnp.sum(tr)) - 5.0) < 1e-4
    assert float(tr[0, 0, 4, 0]) > float(tr[0, 0, 2, 0]) > 0.0
