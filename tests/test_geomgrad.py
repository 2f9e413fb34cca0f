"""Geometry (shape-pose) gradients: attached ray_intersect vs finite
differences.

The reference runs ``scene.ray_intersect`` *attached* inside
``dr.resume_grad`` (transientpath.py:148-151) so gradients flow through hit
points into shape parameters.  Here the equivalent surface is the per-shape
rigid delta (``<shape>.to_world.translate`` / ``.rotate`` traverse paths,
scene.GeomParams) flowing through the plane-equation re-derivation in
``ray_intersect``, the NEE emitter-point attachment (em_tri_shape routing),
and the delta-emitter ``<light>.position`` table.

Methodology: finite differences of the *same seeded estimator* equal full-AD
(`method='fullad'`) exactly when no discrete decision flips with the
parameter — so the scenes here are built flip-free: a large floor fully
covering the camera frustum, lights that are never hit by contributing rays
(point light, or an area light with ``discard_direct_light``), RR off.
Silhouette terms (which non-reparameterized PRB deliberately omits, like the
reference) are therefore exactly zero and the comparison is tight.  The
gaussian temporal filter makes bin placement differentiable, so the
*transient* gradient (arrival-time shift) is validated too — the part a
box-filter histogram cannot express.
"""
import numpy as np
import pytest

import mitransient_tpu as mitr

SPP = 64
W = H = 16


def flat_scene(light="point", bins=100, tfilter="gaussian"):
    """Flip-free geometry-gradient scene: big floor + non-visible light."""
    d = {
        "type": "scene",
        "integrator": {
            "type": "transient_path",
            "max_depth": 2,
            "rr_depth": 99,
            "temporal_filter": tfilter,
            # kill the Le/MIS term so bounce rays grazing the area light's
            # edge cannot flip a contribution (see module docstring)
            "discard_direct_light": light == "area",
        },
        "floor": {
            "type": "rectangle",
            "to_world": {"scale": 5.0},
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": [0.7, 0.5, 0.3]}},
        },
        "sensor": {
            "type": "perspective",
            "fov": 40,
            "to_world": {
                "look_at": {"origin": [0, 0, 3], "target": [0, 0, 0],
                            "up": [0, 1, 0]},
            },
            "film": {
                "type": "transient_hdr_film",
                "width": W, "height": H,
                "temporal_bins": bins,
                "start_opl": 0.0,
                "bin_width_opl": 0.1,
            },
            "sampler": {"type": "independent", "sample_count": SPP},
        },
    }
    if light == "point":
        d["light"] = {
            "type": "point",
            "to_world": {"translate": [0.6, 0.4, 2.0]},
            "intensity": {"type": "rgb", "value": [10.0, 10.0, 10.0]},
        }
    else:
        d["light"] = {
            "type": "rectangle",
            "to_world": {
                "translate": [0.5, 0.3, 2.0],
                "rotate": {"axis": [1, 0, 0], "angle": 180},
                "scale": 0.3,
            },
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": [8.0, 8.0, 8.0]}},
        }
    return d


def _loss(scene, gs, gt, spp=SPP, seed=0):
    s, t = mitr.render(scene, spp=spp, seed=seed, regenerate=False)
    out = 0.0
    if gs is not None:
        out += float(np.sum(np.asarray(s) * gs))
    if gt is not None:
        out += float(np.sum(np.asarray(t) * gt))
    return out


def _fd(scene, key, v, gs, gt, eps, spp=SPP, seed=0):
    params = mitr.traverse(scene)
    if key.endswith(".rotate"):
        # rotation deltas are ADDITIVE across update() calls (the pose is
        # re-baked each time and the staged delta resets to zero)
        params[key] = eps * v
        params.update()
        lp = _loss(scene, gs, gt, spp=spp, seed=seed)
        params[key] = -2 * eps * v
        params.update()
        lm = _loss(scene, gs, gt, spp=spp, seed=seed)
        params[key] = eps * v  # restore
        params.update()
        return (lp - lm) / (2 * eps)
    base = np.asarray(params[key])
    params[key] = base + eps * v
    params.update()
    lp = _loss(scene, gs, gt, spp=spp, seed=seed)
    params[key] = base - eps * v
    params.update()
    lm = _loss(scene, gs, gt, spp=spp, seed=seed)
    params[key] = base
    params.update()
    return (lp - lm) / (2 * eps)


def _check(scene, key, v, gs, gt, rel=5e-3, eps=1e-3):
    grads = mitr.render_backward(scene, (gs, gt), spp=SPP, seed=0,
                                 method="fullad")
    g = np.asarray(grads[key])
    an = float(g @ v)
    fd = _fd(scene, key, v, gs, gt, eps=eps)
    assert abs(an) > 1e-4, (key, an)
    assert abs(fd - an) / max(abs(fd), abs(an)) < rel, (key, fd, an)
    return an


GS = np.ones((H, W, 3), np.float32)


def _gt(scene, kind="rand"):
    T = scene.sensors[0].film.temporal_bins
    if kind == "rand":
        rng = np.random.RandomState(0)
        return rng.uniform(0.0, 1.0, (H, W, T, 3)).astype(np.float32)
    # mean-arrival weights: loss = sum_b b * transient_b
    return np.broadcast_to(
        np.arange(T, dtype=np.float32)[None, None, :, None],
        (H, W, T, 3)).copy()


def test_floor_translate_steady():
    """d(steady)/d(floor z): attached hit distance + NEE r^2/cos chain."""
    scene = mitr.load_dict(flat_scene("point"))
    _check(scene, "floor.to_world.translate",
           np.array([0.0, 0.0, 1.0], np.float32), GS, None)


def test_floor_translate_transient():
    """d(transient)/d(floor z) under the gaussian temporal filter: arrival
    bins move smoothly with the hit distance."""
    scene = mitr.load_dict(flat_scene("point"))
    _check(scene, "floor.to_world.translate",
           np.array([0.0, 0.0, 1.0], np.float32), None, _gt(scene))


def test_floor_rotate():
    """Axis-angle delta about the pivot: tilting the floor changes the
    shading frame (NEE cosine) and hit distances."""
    scene = mitr.load_dict(flat_scene("point"))
    _check(scene, "floor.to_world.rotate",
           np.array([1.0, 0.0, 0.0], np.float32), GS, _gt(scene), rel=2e-2)


def test_point_emitter_position():
    """Delta-emitter position gradient (``<light>.position``): NEE direction,
    inverse-square and the NEE splat distance all move."""
    scene = mitr.load_dict(flat_scene("point"))
    _check(scene, "light.position",
           np.array([0.3, -0.2, 1.0], np.float32), GS, _gt(scene))


def test_area_emitter_translate_transient():
    """A moving area emitter: the NEE sample point rides the shape's rigid
    delta (em_tri_shape routing), changing radiometry AND bin placement."""
    scene = mitr.load_dict(flat_scene("area"))
    # eps=3e-4: the loss curves strongly in the light's z (the 1/r^2 term
    # at r ~ 2), so larger steps carry visible truncation error
    _check(scene, "light.to_world.translate",
           np.array([0.0, 0.0, 1.0], np.float32), None, _gt(scene),
           rel=1e-2, eps=3e-4)


def test_area_emitter_rotate():
    scene = mitr.load_dict(flat_scene("area"))
    _check(scene, "light.to_world.rotate",
           np.array([0.0, 1.0, 0.0], np.float32), GS, None, rel=1e-2)


def test_emitter_arrival_weighted_gradient():
    """Bin-placement gradient isolated: with arrival-weighted loss
    sum_b b * transient_b, the gradient mixes energy (1/r^2) and time-shift
    terms; FD validates both together."""
    scene = mitr.load_dict(flat_scene("point"))
    gt = _gt(scene, "arrival")
    _check(scene, "light.position",
           np.array([0.0, 0.0, 1.0], np.float32), None, gt,
           rel=1e-2, eps=3e-4)


def test_cbox_geometry_gradient_seed_stable():
    """On the full cbox (visibility discontinuities make FD meaningless),
    the analytic pose gradient must at least be estimator-stable: two
    independent sample streams agree."""
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = 16
    d["sensor"]["film"]["height"] = 16
    d["sensor"]["film"]["temporal_bins"] = 120
    d["sensor"]["film"]["start_opl"] = 0.0
    d["sensor"]["film"]["bin_width_opl"] = 0.1
    d["integrator"]["max_depth"] = 3
    d["integrator"]["rr_depth"] = 99
    d["integrator"]["temporal_filter"] = "gaussian"
    scene = mitr.load_dict(d)
    gs = np.ones((16, 16, 3), np.float32)
    g0 = np.asarray(mitr.render_backward(
        scene, (gs, None), spp=128, seed=0,
        method="fullad")["floor.to_world.translate"])
    g1 = np.asarray(mitr.render_backward(
        scene, (gs, None), spp=128, seed=7,
        method="fullad")["floor.to_world.translate"])
    assert abs(g0[1]) > 1e-3
    assert abs(g0[1] - g1[1]) / abs(g0[1]) < 0.25, (g0, g1)


def test_zero_delta_primal_unchanged():
    """The attach path must not change a single primal bit at zero deltas."""
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = 16
    d["sensor"]["film"]["height"] = 16
    scene = mitr.load_dict(d)
    s1, t1 = mitr.render(scene, spp=8, seed=0)
    sd = scene.data
    scene.data = sd._replace(geom=None)
    s2, t2 = mitr.render(scene, spp=8, seed=0)
    scene.data = sd
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
