"""Full-loop AD must produce finite gradients for every BSDF family.

Round-3 regression suite for a class of NaN bugs found via the staircase
inverse render: masked lanes (misses, backfacing wi, non-GGX rows evaluated
by the dense kind dispatch) ran through sqrt/normalize/divide ops whose
VJPs are infinite at their clamp points, and inf * 0 (the where-mask
cotangent) = NaN poisoned whole parameter tables.  Fixed sites:
fresnel_conductor/f. _dielectric (stable_sqrt), GGX alpha floor +
wi sanitization + VNDF disk clamps (bsdf/api.py), normalize / safe_div /
safe_rcp hardening (core/math.py), rodrigues clamp (geometry deltas).
"""
import numpy as np
import pytest

import mitransient_tpu as mitr

GT = None


def scene_with(bsdf, max_depth=3):
    return {
        "type": "scene",
        "integrator": {"type": "transient_path", "max_depth": max_depth,
                       "rr_depth": 99},
        "floor": {"type": "rectangle", "to_world": {"scale": 3.0},
                  "bsdf": bsdf},
        "light": {"type": "rectangle",
                  "to_world": {"translate": [0.4, 0.2, 2.0],
                               "rotate": {"axis": [1, 0, 0], "angle": 180},
                               "scale": 0.3},
                  "emitter": {"type": "area", "radiance": 6.0}},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": {"look_at": {"origin": [0, 0, 3],
                                            "target": [0, 0, 0],
                                            "up": [0, 1, 0]}},
                   "film": {"type": "transient_hdr_film", "width": 8,
                            "height": 8, "temporal_bins": 40,
                            "start_opl": 0.0, "bin_width_opl": 0.4}},
    }


BSDFS = {
    "diffuse": {"type": "diffuse", "reflectance": 0.6},
    "roughconductor": {"type": "roughconductor", "alpha": 0.1},
    "roughplastic": {"type": "roughplastic", "alpha": 0.1,
                     "diffuse_reflectance": 0.5},
    "roughplastic_tex": {"type": "roughplastic", "alpha": 0.1,
                         "diffuse_reflectance": {"type": "checkerboard"}},
    "conductor": {"type": "conductor"},
    "dielectric": {"type": "dielectric"},
    "twosided_rc": {"type": "twosided",
                    "nested": {"type": "roughconductor", "alpha": 0.1}},
}


@pytest.mark.parametrize("name", sorted(BSDFS))
def test_fullad_gradients_finite(name):
    scene = mitr.load_dict(scene_with(BSDFS[name]))
    gt = np.ones((8, 8, 40, 3), np.float32)
    grads = mitr.render_backward(scene, (None, gt), spp=8, seed=0,
                                 method="fullad")
    tab = grads["__tables__"]
    for f in tab._fields:
        v = getattr(tab, f)
        if v is None:
            continue
        assert np.isfinite(np.asarray(v)).all(), (name, f)


def test_prb_gradients_finite_mixed_scene():
    """The PRB replay on a mixed-material cbox (GGX box + diffuse walls)."""
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = 8
    d["sensor"]["film"]["height"] = 8
    d["sensor"]["film"]["temporal_bins"] = 64
    d["integrator"]["max_depth"] = 4
    d["small-box"]["bsdf"] = {"type": "roughconductor", "alpha": 0.05}
    scene = mitr.load_dict(d)
    gt = np.ones((8, 8, 64, 3), np.float32)
    grads = mitr.render_backward(scene, (None, gt), spp=8, seed=0)
    tab = grads["__tables__"]
    for f in tab._fields:
        v = getattr(tab, f)
        if v is None:
            continue
        assert np.isfinite(np.asarray(v)).all(), f
