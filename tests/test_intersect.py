"""Unit tests: ray/triangle-soup intersection and occlusion."""
import jax.numpy as jnp
import numpy as np

from mitransient_tpu.ops.intersect import intersect_soup, ray_test_soup


def _single_tri():
    v0 = jnp.array([[-1.0, -1.0, 0.0]])
    e1 = jnp.array([[2.0, 0.0, 0.0]])
    e2 = jnp.array([[0.0, 2.0, 0.0]])
    return v0, e1, e2


def test_hit_and_miss():
    v0, e1, e2 = _single_tri()
    o = jnp.array([[0.0, -0.5, 1.0], [5.0, 5.0, 1.0], [0.0, -0.5, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    maxt = jnp.full((3,), jnp.inf)
    act = jnp.ones((3,), bool)
    t, prim, u, v = intersect_soup(v0, e1, e2, o, d, maxt, act)
    assert np.allclose(t[0], 1.0)
    assert prim[0] == 0
    assert prim[1] == -1 and np.isinf(t[1])
    assert prim[2] == -1  # pointing away


def test_closest_of_two():
    v0 = jnp.array([[-1.0, -1.0, 0.0], [-1.0, -1.0, -2.0]])
    e1 = jnp.array([[2.0, 0.0, 0.0]] * 2)
    e2 = jnp.array([[0.0, 2.0, 0.0]] * 2)
    o = jnp.array([[0.0, -0.5, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, prim, _, _ = intersect_soup(
        v0, e1, e2, o, d, jnp.array([jnp.inf]), jnp.array([True])
    )
    assert prim[0] == 0 and np.allclose(t[0], 1.0)


def test_maxt_and_active_respected():
    v0, e1, e2 = _single_tri()
    o = jnp.array([[0.0, -0.5, 1.0], [0.0, -0.5, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t, prim, _, _ = intersect_soup(
        v0, e1, e2, o, d, jnp.array([0.5, jnp.inf]),
        jnp.array([True, False]),
    )
    assert prim[0] == -1  # beyond maxt
    assert prim[1] == -1  # inactive


def test_barycentric_uv():
    v0, e1, e2 = _single_tri()
    o = jnp.array([[-0.5, -0.5, 1.0]])  # v0 + 0.25*e1 + 0.25*e2
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, prim, u, v = intersect_soup(
        v0, e1, e2, o, d, jnp.array([jnp.inf]), jnp.array([True])
    )
    assert np.allclose([u[0], v[0]], [0.25, 0.25], atol=1e-5)


def test_ray_test_occlusion():
    v0, e1, e2 = _single_tri()
    o = jnp.array([[0.0, -0.5, 1.0], [0.0, -0.5, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    occ = ray_test_soup(
        v0, e1, e2, o, d, jnp.array([2.0, 2.0]), jnp.ones((2,), bool)
    )
    assert bool(occ[0]) and not bool(occ[1])


def test_large_ray_count_chunking():
    v0, e1, e2 = _single_tri()
    n = 10_000
    o = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    t, prim, _, _ = intersect_soup(
        v0, e1, e2, o, d, jnp.full((n,), jnp.inf), jnp.ones((n,), bool),
        tri_chunk=8,
    )
    assert np.all(np.asarray(prim) == 0)
    assert np.allclose(np.asarray(t), 1.0, atol=1e-5)
