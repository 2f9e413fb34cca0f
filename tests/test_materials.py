"""BSDF library integration tests: mirror / dielectric / rough conductor in
the cornell box (parity with the reference's cbox_mirror.xml and
polarization gold-GGX scenes), plus mesh loading."""
import os
import tempfile

import numpy as np
import pytest

import mitransient_tpu as mitr


def cbox_with(box_bsdf, w=24, h=24, bins=300, max_depth=6):
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = w
    d["sensor"]["film"]["height"] = h
    d["sensor"]["film"]["temporal_bins"] = bins
    d["integrator"]["max_depth"] = max_depth
    d["small-box"]["bsdf"] = box_bsdf
    return d


def _render(d, spp=16):
    scene = mitr.load_dict(d)
    s, t = mitr.render(scene, spp=spp, seed=0)
    return np.asarray(s), np.asarray(t)


def test_mirror_box():
    s, t = _render(cbox_with({"type": "conductor"}))
    s_diff, _ = _render(cbox_with({"type": "ref", "id": "white"}))
    assert np.all(np.isfinite(s)) and np.all(np.isfinite(t))
    assert s.sum() > 0
    # the mirror's camera-facing face reflects the cbox's open front (void),
    # so the box region must be much darker than with a diffuse box --
    # and must differ from the diffuse render
    box = np.s_[16:21, 12:17]
    assert s[box].mean() < 0.5 * s_diff[box].mean()
    assert not np.allclose(s, s_diff)


def test_rough_conductor_gold():
    s, t = _render(cbox_with({"type": "roughconductor", "material": "Au",
                              "alpha": 0.2}))
    assert np.all(np.isfinite(s)) and s.sum() > 0
    # gold tint: red channel should dominate blue in the box region
    region = s[14:22, 12:20]
    assert region[..., 0].mean() > region[..., 2].mean()


def test_dielectric_box():
    s, t = _render(cbox_with({"type": "dielectric"}), spp=32)
    assert np.all(np.isfinite(s)) and s.sum() > 0
    # glass transmits: the wall behind the box is partially visible, so the
    # box region is not black
    assert s[18, 16].sum() > 1e-4


def test_energy_conservation_white_furnace_like():
    """A mirror box must not create energy: total flux with an ideal mirror
    box stays within MC noise of the diffuse-box render."""
    s_diff, _ = _render(cbox_with({"type": "ref", "id": "white"}), spp=32)
    s_mirr, _ = _render(cbox_with({"type": "conductor"}), spp=32)
    assert s_mirr.sum() < s_diff.sum() * 1.3


def test_obj_mesh_loading_and_render():
    """Round-trip a generated OBJ through the loader into a render
    (reference NLOS scenes load Z.obj, tests/integration/test_nlos.py:13)."""
    from mitransient_tpu.scene.shapes import load_obj

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "quad.obj")
        with open(path, "w") as f:
            f.write("""# quad
v -1 -1 0
v 1 -1 0
v 1 1 0
v -1 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3 4/4
""")
        verts, faces, uvs = load_obj(path)
        assert verts.shape == (4, 3)
        assert faces.shape == (2, 3)  # quad triangulated
        assert uvs is not None

        d = mitr.cornell_box()
        d["sensor"]["film"]["width"] = 8
        d["sensor"]["film"]["height"] = 8
        d["sensor"]["film"]["temporal_bins"] = 60
        d["integrator"]["max_depth"] = 3
        d["mesh-box"] = {
            "type": "obj",
            "filename": path,
            "to_world": {"translate": [0.0, 0.0, 0.5], "scale": 0.3},
            "bsdf": {"type": "ref", "id": "white"},
        }
        s, t = _render(d, spp=4)
        assert np.all(np.isfinite(s)) and s.sum() > 0


def test_ply_mesh_loading():
    from mitransient_tpu.scene.shapes import load_ply

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "tri.ply")
        with open(path, "w") as f:
            f.write("""ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
""")
        verts, faces, uvs = load_ply(path)
        assert verts.shape == (3, 3)
        assert faces.shape == (1, 3)
