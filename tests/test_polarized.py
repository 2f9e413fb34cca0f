"""Polarized (Stokes/Mueller) transient rendering tests.

Parity targets: the reference's mono_polarized variant
(cbox_polarized.xml, transient_nlos_polarization.ipynb) with 4 Stokes
channels packed per pixel (transient_image_block.py:90-99).
"""
import numpy as np
import pytest

import mitransient_tpu as mitr


@pytest.fixture()
def mono_pol():
    old = mitr.variant().name
    mitr.set_variant("mono_polarized")
    yield
    mitr.set_variant(old)


def pol_cbox(box_bsdf=None, w=16, h=16, bins=300, max_depth=4):
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = w
    d["sensor"]["film"]["height"] = h
    d["sensor"]["film"]["temporal_bins"] = bins
    d["integrator"]["max_depth"] = max_depth
    if box_bsdf is not None:
        d["small-box"]["bsdf"] = box_bsdf
    return d


def test_polarized_shapes_and_stokes_validity(mono_pol):
    scene = mitr.load_dict(pol_cbox())
    s, t = mitr.render(scene, spp=16, seed=0)
    s, t = np.asarray(s), np.asarray(t)
    # mono_polarized: 4 Stokes channels (reference channel layout '0123')
    assert s.shape == (16, 16, 4)
    assert t.shape == (16, 16, 300, 4)
    assert np.all(np.isfinite(s)) and np.all(np.isfinite(t))
    I = s[..., 0]
    assert I.min() >= -1e-6 and I.sum() > 0
    # physical Stokes: DoP <= 1 (I^2 >= Q^2+U^2+V^2), allow MC noise
    lin = np.sqrt(s[..., 1] ** 2 + s[..., 2] ** 2 + s[..., 3] ** 2)
    mask = I > 1e-3
    assert np.quantile(lin[mask] / I[mask], 0.95) <= 1.05


def test_diffuse_scene_nearly_unpolarized(mono_pol):
    """All-diffuse cbox: depolarizing BSDFs -> Q,U,V ~ 0."""
    scene = mitr.load_dict(pol_cbox())
    s, _t = mitr.render(scene, spp=32, seed=0)
    s = np.asarray(s)
    I = s[..., 0].sum()
    quv = np.abs(s[..., 1:]).sum()
    assert quv / max(I, 1e-9) < 1e-3


def test_gold_wall_polarizes(mono_pol):
    """Specular gold reflections produce nonzero linear polarization
    (the polarization/ example scenes' point)."""
    scene = mitr.load_dict(
        pol_cbox(box_bsdf={"type": "roughconductor", "material": "Au",
                           "alpha": 0.1}, max_depth=5))
    s, _t = mitr.render(scene, spp=64, seed=0)
    s = np.asarray(s)
    I = s[..., 0]
    Q = s[..., 1]
    U = s[..., 2]
    lin = np.sqrt(Q ** 2 + U ** 2)
    dop = lin / np.maximum(I, 1e-6)
    # some pixels (mirror reflections off the gold box) show DoP >> 0
    assert np.quantile(dop[I > 1e-3], 0.99) > 0.02


def test_intensity_matches_unpolarized_render(mono_pol):
    """Stokes I must agree with the mono unpolarized render (depolarized
    scene => identical estimator up to polarization bookkeeping)."""
    scene_p = mitr.load_dict(pol_cbox())
    s_p, t_p = mitr.render(scene_p, spp=32, seed=0)
    mitr.set_variant("mono")
    scene_u = mitr.load_dict(pol_cbox())
    # both variants default to the regen path -> identical sample streams
    s_u, t_u = mitr.render(scene_u, spp=32, seed=0)
    mitr.set_variant("mono_polarized")
    I = np.asarray(s_p)[..., 0]
    U = np.asarray(s_u)[..., 0]
    assert np.allclose(I, U, rtol=1e-4, atol=1e-6)
    assert np.allclose(np.asarray(t_p)[..., 0], np.asarray(t_u)[..., 0],
                       rtol=1e-3, atol=1e-6)


def test_polarized_visualization_functions(mono_pol):
    from mitransient_tpu import vis_polarized as vp

    scene = mitr.load_dict(
        pol_cbox(box_bsdf={"type": "roughconductor", "material": "Au",
                           "alpha": 0.1}))
    s, t = mitr.render(scene, spp=8, seed=0)
    s = np.asarray(s)
    dop = vp.degree_of_polarization(s)
    assert dop.shape == (16, 16) and np.all(np.isfinite(dop))
    for mode in ("dop", "aolp", "top", "chirality"):
        img = vp.polarization_generate_false_color(s, mode)
        assert img.shape == (16, 16, 3)
        assert np.all(np.isfinite(img)) and img.min() >= 0 and img.max() <= 1
    tm = vp.tonemap_transient(np.asarray(t))
    assert np.all(np.isfinite(tm))


# ---------------------------------------------------------------------------
# Polarized NLOS (reference: transient_nlos_polarization.ipynb — gold GGX
# relay wall + hidden Z, mono_polarized, 4 Stokes channels)
# ---------------------------------------------------------------------------

def _nlos_pol_scene(wall_bsdf):
    from tests.test_nlos import nlos_scene

    d = nlos_scene(sx=4, sy=4, bins=200, spp=32)
    d["relay_wall"]["bsdf"] = wall_bsdf
    return d


def test_polarized_nlos_stokes_validity(mono_pol):
    scene = mitr.load_dict(_nlos_pol_scene({
        "type": "roughconductor", "material": "Au", "alpha": 0.15,
    }))
    mitr.nlos.focus_emitter_at_relay_wall_pixel([2.0, 2.0], scene)
    steady, transient = mitr.render(scene, spp=32, seed=0)
    tr = np.asarray(transient)
    assert tr.shape == (4, 4, 200, 4)
    s0, s1, s2, s3 = [tr[..., k] for k in range(4)]
    assert np.isfinite(tr).all()
    assert float(s0.sum()) > 0.0
    # physical Stokes vectors: I >= sqrt(Q^2 + U^2 + V^2) (tolerate MC noise)
    lin = np.sqrt(s1 ** 2 + s2 ** 2 + s3 ** 2)
    mask = s0 > 1e-6 * s0.max()
    assert float((lin[mask] <= s0[mask] * 1.05 + 1e-9).mean()) > 0.99
    # specular gold wall polarizes the NLOS return somewhere
    assert float(lin[mask].max() / s0[mask].max()) > 1e-3


def test_polarized_nlos_intensity_matches_unpolarized():
    desc = _nlos_pol_scene({
        "type": "diffuse", "reflectance": {"type": "rgb", "value": 1.0},
    })
    mitr.set_variant("mono")
    sc_u = mitr.load_dict(desc)
    mitr.nlos.focus_emitter_at_relay_wall_pixel([2.0, 2.0], sc_u)
    _, tr_u = mitr.render(sc_u, spp=48, seed=0)
    mitr.set_variant("mono_polarized")
    try:
        sc_p = mitr.load_dict(desc)
        mitr.nlos.focus_emitter_at_relay_wall_pixel([2.0, 2.0], sc_p)
        _, tr_p = mitr.render(sc_p, spp=48, seed=0)
    finally:
        mitr.set_variant("rgb")
    a = np.asarray(tr_u)[..., 0]
    b = np.asarray(tr_p)[..., 0]
    # same sampler decisions -> intensity agrees tightly
    np.testing.assert_allclose(a.sum(), b.sum(), rtol=5e-2)
    np.testing.assert_allclose(a, b, rtol=0.35, atol=1e-4 * a.max())


def test_polarized_exhaustive_capture(mono_pol):
    """Exhaustive capture in a polarized variant: 6-D film whose trailing
    channel axis carries the 4 Stokes components (reference leaves polarized
    exhaustive untested; shapes follow transient_image_block.py:63-68 with
    the Stokes packing of :90-99)."""
    from tests.test_nlos import nlos_scene

    d = nlos_scene(sx=2, sy=2, bins=200, spp=8)
    d["integrator"]["capture_type"] = "exhaustive"
    d["relay_wall"]["nlos_sensor"]["film"]["exhaustive_scan"] = True
    d["relay_wall"]["nlos_sensor"]["film"]["laser_scan_width"] = 2
    d["relay_wall"]["nlos_sensor"]["film"]["laser_scan_height"] = 2
    scene = mitr.load_dict(d)
    s, t = mitr.render(scene, spp=8, seed=0)
    assert t.shape == (2, 2, 2, 2, 200, 4)
    t = np.asarray(t)
    assert np.all(np.isfinite(t)) and t[..., 0].sum() > 0
    # Stokes physicality on the aggregated signal: I >= |Q|,|U|,|V|
    agg = t.sum(axis=(0, 1, 2, 3, 4))
    assert agg[0] >= abs(agg[1]) and agg[0] >= abs(agg[2])
    # different laser points illuminate differently
    assert not np.allclose(t[:, :, 0, 0], t[:, :, 1, 1])


def test_polarized_backward_routes_to_fullad_and_matches_fd(mono_pol):
    """render_backward on a polarized transient_path scene must
    differentiate the POLARIZED estimator (it now routes through full-loop
    AD; the PRB replay is unpolarized-RGB and was silently used before)."""
    d = pol_cbox(w=8, h=8, bins=100, max_depth=3)
    d["sensor"]["film"]["start_opl"] = 0.0
    d["sensor"]["film"]["bin_width_opl"] = 0.1
    d["integrator"]["rr_depth"] = 99
    scene = mitr.load_dict(d)
    fc = scene.sensors[0].film
    gt = np.zeros((fc.height, fc.width, fc.temporal_bins, 4), np.float32)
    gt[..., 0] = 1.0  # S0-weighted loss
    grads = mitr.render_backward(scene, (None, gt), spp=16, seed=0)
    key = "white.reflectance.value"
    g = np.asarray(grads[key])
    assert np.all(np.isfinite(g)) and np.any(g != 0.0)

    params = mitr.traverse(scene)
    base = np.asarray(params[key])
    eps = 1e-3
    v = np.ones_like(base)

    def loss():
        _s, t = mitr.render(scene, spp=16, seed=0)
        return float(np.asarray(t, np.float64)[..., 0].sum())

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


def test_pending_rotator_carry_matches_dense_chain():
    """The structured bounce update (pending-rotator carry: stored beta
    @ R(pend), Givens + Fresnel column applies, core/mueller.py) must equal
    the dense msoa_product chain beta @ (R_out F R_in) per bounce, for
    random sequences of specular / depolarizing / null lobes."""
    import jax.numpy as jnp
    from mitransient_tpu.core.mueller import (
        msoa_apply_fresnel_cols, msoa_apply_rotator_cols, msoa_identity,
        msoa_matvec, msoa_product, rot2_compose, rotator_soa,
        specular_sandwich_soa, stokes_rotate,
    )

    rng = np.random.RandomState(11)
    n, C = 64, 1

    def rnd():
        return jnp.asarray(rng.uniform(-1, 1, (n, C)).astype(np.float32))

    def angles():
        th = rng.uniform(0, 2 * np.pi, (n,)).astype(np.float32)
        return jnp.asarray(np.cos(th)), jnp.asarray(np.sin(th))

    # dense chain state
    pc2, ps2 = angles()  # sensor alignment
    dense = msoa_product(msoa_identity(rnd() * 0),
                         tuple(jnp.broadcast_to(e[:, None], (n, C))
                               for e in rotator_soa(pc2, ps2)))
    # structured state
    stored = msoa_identity(jnp.zeros((n, C), jnp.float32))
    pend = (pc2, ps2)

    for bounce in range(4):
        A, B, Cc, S = rnd(), rnd(), rnd(), rnd()
        ci2, si2 = angles()
        co2, so2 = angles()
        kind = rng.randint(0, 3, (n,))  # 0 spec, 1 depol, 2 null
        is_spec = jnp.asarray(kind == 0)
        is_null = jnp.asarray(kind == 2)
        f = rnd()

        # dense update
        M = specular_sandwich_soa(A, B, Cc, S, ci2[:, None], si2[:, None],
                                  co2[:, None], so2[:, None])
        depol = [jnp.ones((n, C))] + [jnp.zeros((n, C))] * 15
        eye = msoa_identity(jnp.zeros((n, C), jnp.float32))
        M = [jnp.where(is_spec[:, None], m,
                       jnp.where(is_null[:, None], e, d))
             for m, e, d in zip(M, eye, depol)]
        dense = msoa_product(dense, tuple(m * f for m in M))

        # structured update (mirrors path_regen.py)
        cc, cs = rot2_compose(pend[0], pend[1], co2, so2)
        spec_beta = msoa_apply_fresnel_cols(
            msoa_apply_rotator_cols(stored, cc[:, None], cs[:, None]),
            A * f, B * f, Cc * f, S * f)
        nullf = is_null[:, None].astype(jnp.float32)
        sp = is_spec[:, None]
        stored = tuple(
            jnp.where(sp, spec_beta[4 * i + j],
                      stored[4 * i + j] * f * (1.0 if j == 0 else nullf))
            for i in range(4) for j in range(4))
        pend = (jnp.where(is_spec, ci2, jnp.where(is_null, pend[0], 1.0)),
                jnp.where(is_spec, si2, jnp.where(is_null, pend[1], 0.0)))

        # equivalence on an unpolarized-source contribution (column 0 of a
        # random NEE factor) AND on the emitter-hit column 0
        colP = (rnd(), rnd(), rnd(), rnd())
        want = msoa_matvec(dense, colP)
        got = msoa_matvec(stored, stokes_rotate(
            colP, pend[0][:, None], pend[1][:, None]))
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g),
                                       rtol=2e-4, atol=2e-5)
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(dense[4 * i]), np.asarray(stored[4 * i]),
                rtol=2e-4, atol=2e-5)
