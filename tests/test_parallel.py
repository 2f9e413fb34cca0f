"""Multi-device SPMD tests on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mitransient_tpu as mitr
from mitransient_tpu.parallel.mesh import make_mesh, render_sharded


def small_cbox(w=16, h=16, bins=60):
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = w
    d["sensor"]["film"]["height"] = h
    d["sensor"]["film"]["temporal_bins"] = bins
    return d


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_render_runs_and_matches_stats():
    scene = mitr.load_dict(small_cbox())
    mesh = make_mesh(4)
    s_sh, t_sh, stats = render_sharded(scene, mesh, spp=64, seed=0,
                                       return_stats=True)
    assert stats["devices"] == 4
    assert s_sh.shape == (16, 16, 3)
    assert t_sh.shape == (16, 16, 60, 3)
    # statistical agreement with the single-device renderer
    s_1, t_1 = mitr.render(scene, spp=64, seed=0)
    m_sh, m_1 = float(jnp.mean(s_sh)), float(jnp.mean(s_1))
    assert abs(m_sh - m_1) / max(m_1, 1e-9) < 0.15
    ratio = float(jnp.sum(t_sh)) / max(float(jnp.sum(s_sh)), 1e-9)
    assert 0.4 < ratio <= 1.0001


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_deterministic():
    scene = mitr.load_dict(small_cbox())
    mesh = make_mesh(8)
    s1, t1 = render_sharded(scene, mesh, spp=16, seed=3)
    s2, t2 = render_sharded(scene, mesh, spp=16, seed=3)
    assert np.allclose(np.asarray(s1), np.asarray(s2))
    assert np.allclose(np.asarray(t1), np.asarray(t2))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_device_count_changes_sample_set_not_mean():
    scene = mitr.load_dict(small_cbox())
    s2, _ = render_sharded(scene, make_mesh(2), spp=128, seed=0)
    s4, _ = render_sharded(scene, make_mesh(4), spp=128, seed=0)
    m2, m4 = float(jnp.mean(s2)), float(jnp.mean(s4))
    assert abs(m2 - m4) / max(m2, 1e-9) < 0.15


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_sharded_backward_matches_single_device_scale():
    from mitransient_tpu.parallel.mesh import render_backward_sharded

    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = 8
    d["sensor"]["film"]["height"] = 8
    d["sensor"]["film"]["temporal_bins"] = 60
    d["sensor"]["film"]["start_opl"] = 0.0
    d["sensor"]["film"]["bin_width_opl"] = 0.3
    d["integrator"]["max_depth"] = 3
    d["integrator"]["rr_depth"] = 99
    scene = mitr.load_dict(d)
    ones_t = np.ones((8, 8, 60, 3), np.float32)
    g_sh = render_backward_sharded(scene, make_mesh(4), (None, ones_t),
                                   spp=64, seed=0)
    g_1 = mitr.render_backward(scene, (None, ones_t), spp=64, seed=0)
    a = np.asarray(g_sh["white.reflectance.value"])
    b = np.asarray(g_1["white.reflectance.value"])
    # different sample sets, same estimator: statistical agreement
    assert np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9) < 0.2


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_sharded_nlos_matches_single_device():
    """spp-axis sharding of the NLOS integrator (the workload with the
    largest sample budgets — nlos-z-room.xml runs at 250k spp)."""
    from test_nlos import nlos_scene

    scene = mitr.load_dict(nlos_scene(sx=4, sy=4, bins=200))
    s_sh, t_sh = render_sharded(scene, make_mesh(4), spp=128, seed=0)
    assert s_sh.shape == (4, 4, 3) and t_sh.shape == (4, 4, 200, 3)
    s_1, t_1 = mitr.render(scene, spp=128, seed=0)
    m_sh, m_1 = float(jnp.sum(t_sh)), float(jnp.sum(t_1))
    assert m_1 > 0 and abs(m_sh - m_1) / m_1 < 0.2


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_sharded_nlos_confocal():
    from test_nlos import nlos_scene

    d = nlos_scene(sx=1, sy=1, bins=200)
    d["integrator"]["capture_type"] = "confocal"
    d["relay_wall"]["nlos_sensor"]["original_film_width"] = 2
    d["relay_wall"]["nlos_sensor"]["original_film_height"] = 2
    scene = mitr.load_dict(d)
    mitr.nlos.focus_emitter_at_relay_wall_pixel([1.0, 1.0], scene)
    s_sh, t_sh = render_sharded(scene, make_mesh(4), spp=64, seed=0)
    s_1, t_1 = mitr.render(scene, spp=64, seed=0)
    assert t_sh.shape == t_1.shape
    assert float(jnp.sum(t_sh)) > 0


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_sharded_volumetric_and_albedo_grad():
    """Sharded transient_prbvolpath primal + backward, including the
    medium.albedo named-path gradient (round-1 gap: mesh.py dropped it)."""
    from test_volumetric import vol_cbox

    d = vol_cbox(sigma_t=2.0, w=8, h=8, bins=60, max_depth=4)
    d["sensor"]["film"]["start_opl"] = 0.0
    d["sensor"]["film"]["bin_width_opl"] = 0.3
    scene = mitr.load_dict(d)
    s_sh, t_sh = render_sharded(scene, make_mesh(4), spp=32, seed=0)
    assert float(jnp.sum(t_sh)) > 0
    from mitransient_tpu.parallel.mesh import render_backward_sharded

    ones_t = np.ones((8, 8, 60, 3), np.float32)
    g_sh = render_backward_sharded(scene, make_mesh(4), (None, ones_t),
                                   spp=16, seed=0)
    g_1 = mitr.render_backward(scene, (None, ones_t), spp=16, seed=0)
    paths = [k for k in g_sh if k.endswith("albedo.value")]
    assert paths, "medium.albedo must appear in sharded named gradients"
    a = np.asarray(g_sh[paths[0]])
    b = np.asarray(g_1[paths[0]])
    assert np.linalg.norm(a) > 0
    assert np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9) < 0.3


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_sharded_polarized():
    old = mitr.variant().name
    mitr.set_variant("mono_polarized")
    try:
        d = small_cbox(8, 8, 60)
        d["integrator"]["max_depth"] = 3
        scene = mitr.load_dict(d)
        s_sh, t_sh = render_sharded(scene, make_mesh(4), spp=16, seed=0)
        assert s_sh.shape == (8, 8, 4)  # 4 Stokes channels
        assert float(jnp.sum(s_sh[..., 0])) > 0
    finally:
        mitr.set_variant(old)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_sharded_exhaustive_matches_local():
    """Sharded exhaustive NLOS (laser-point round-robin over the mesh) must
    reproduce the local exhaustive capture bit-for-bit: identical pass/
    stream layout per laser point, whole points per device (VERDICT r2
    task 6; film semantics transientnlospath.py:597-628)."""
    from tests.test_nlos import nlos_scene

    d = nlos_scene(sx=2, sy=2)
    d["integrator"]["capture_type"] = "exhaustive"
    d["relay_wall"]["nlos_sensor"]["film"]["exhaustive_scan"] = True
    d["relay_wall"]["nlos_sensor"]["film"]["laser_scan_width"] = 3
    d["relay_wall"]["nlos_sensor"]["film"]["laser_scan_height"] = 2

    scene = mitr.load_dict(d)
    s_loc, t_loc = mitr.render(scene, spp=16, seed=0)

    scene2 = mitr.load_dict(d)
    mesh = make_mesh(4)  # 6 laser points over 4 devices: 2 uneven rounds
    s_sh, t_sh, stats = render_sharded(scene2, mesh, spp=16, seed=0,
                                       return_stats=True)
    assert stats["devices"] == 4
    assert np.asarray(t_sh).shape == (2, 2, 2, 3, 300, 3)
    np.testing.assert_array_equal(np.asarray(t_sh), np.asarray(t_loc))
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_loc),
                               rtol=1e-5, atol=1e-7)
    assert float(np.asarray(t_sh).sum()) > 0


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_gaussian_rfilter_matches_local():
    """render_sharded must honor the film's gaussian spatial rfilter
    (round-3 advisor finding: it silently used the box splat).  On a
    1-device mesh the stream layout coincides with the local driver's, so
    the images must match exactly."""
    d = small_cbox()
    d["sensor"]["film"]["rfilter"] = {"type": "gaussian", "stddev": 0.8}
    scene = mitr.load_dict(d)
    s_loc, t_loc = mitr.render(scene, spp=8, seed=0)
    s_sh, t_sh = render_sharded(scene, make_mesh(1), spp=8, seed=0)
    assert np.allclose(np.asarray(s_sh), np.asarray(s_loc),
                       rtol=1e-5, atol=1e-7)
    assert np.allclose(np.asarray(t_sh), np.asarray(t_loc),
                       rtol=1e-5, atol=1e-7)
    # multi-device: statistical agreement
    s4, _t4 = render_sharded(scene, make_mesh(4), spp=64, seed=0)
    m4, ml = float(np.mean(np.asarray(s4))), float(np.mean(np.asarray(s_loc)))
    assert abs(m4 - ml) / max(ml, 1e-9) < 0.2


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_sharded_crop_matches_local_crop():
    """Round-5: crop windows in the sharded renderer (mesh.py previously
    refused them).  The sharded crop render must match the single-device
    crop render statistically and have the crop's data dims."""
    d = small_cbox(w=16, h=16)
    d["sensor"]["film"]["crop_width"] = 8
    d["sensor"]["film"]["crop_height"] = 6
    d["sensor"]["film"]["crop_offset_x"] = 4
    d["sensor"]["film"]["crop_offset_y"] = 5
    scene = mitr.load_dict(d)
    s_sh, t_sh = render_sharded(scene, make_mesh(4), spp=64, seed=0)
    assert s_sh.shape == (6, 8, 3)
    assert t_sh.shape == (6, 8, 60, 3)
    s_1, t_1 = mitr.render(scene, spp=64, seed=0)
    assert s_1.shape == s_sh.shape
    m_sh, m_1 = float(jnp.mean(s_sh)), float(jnp.mean(s_1))
    assert m_1 > 0 and abs(m_sh - m_1) / m_1 < 0.15
    # crop must equal the same window of a full-film render (statistically)
    d2 = small_cbox(w=16, h=16)
    full_s, _ = mitr.render(mitr.load_dict(d2), spp=256, seed=1)
    win = np.asarray(full_s)[5:11, 4:12]
    assert abs(float(np.mean(s_sh)) - float(win.mean())) / win.mean() < 0.2


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multiple devices")
def test_sharded_polarized_volumetric_backward():
    """Round-5: polarized volumetric backward through the sharded full-AD
    path (previously a NotImplementedError)."""
    from test_volumetric import vol_cbox
    from mitransient_tpu.parallel.mesh import render_backward_sharded

    old = mitr.variant().name
    mitr.set_variant("rgb_polarized")
    try:
        d = vol_cbox(sigma_t=2.0, albedo=0.8, g=0.2, w=8, h=8, bins=50,
                     max_depth=6)
        d["sensor"]["film"]["start_opl"] = 0.0
        d["sensor"]["film"]["bin_width_opl"] = 1.2
        scene = mitr.load_dict(d)
        fc = scene.sensors[0].film
        ones = np.zeros((fc.height, fc.width, fc.temporal_bins, 12),
                        np.float32)
        ones[..., 0:3] = 1.0
        g_sh = render_backward_sharded(scene, make_mesh(4), (None, ones),
                                       spp=16, seed=0)
        g_1 = mitr.render_backward(scene, (None, ones), spp=16, seed=0)
        akey = next(k for k in g_1.keys() if "albedo" in k)
        a, b = np.asarray(g_sh[akey]), np.asarray(g_1[akey])
        assert np.all(np.isfinite(a)) and np.abs(a).sum() > 0
        # different device streams -> statistical agreement
        assert abs(a.sum() - b.sum()) / max(abs(b.sum()), 1e-9) < 0.3
    finally:
        mitr.set_variant(old)
