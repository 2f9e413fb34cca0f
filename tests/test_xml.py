"""XML scene importer tests (mi.load_file parity surface)."""
import os
import tempfile

import numpy as np
import pytest

import mitransient_tpu as mitr

CBOX_XML = """<scene version="3.0.0">
    <default name="spp" value="8"/>
    <default name="res" value="16"/>
    <integrator type="transient_path">
        <integer name="max_depth" value="4"/>
        <string name="temporal_filter" value="box"/>
    </integrator>
    <sensor type="perspective">
        <string name="fov_axis" value="smaller"/>
        <float name="fov" value="39.3077"/>
        <transform name="to_world">
            <lookat origin="0 0 3.9" target="0 0 0" up="0 1 0"/>
        </transform>
        <sampler type="independent">
            <integer name="sample_count" value="$spp"/>
        </sampler>
        <film type="transient_hdr_film">
            <integer name="width" value="$res"/>
            <integer name="height" value="$res"/>
            <integer name="temporal_bins" value="100"/>
            <float name="start_opl" value="3.5"/>
            <float name="bin_width_opl" value="0.06"/>
            <rfilter type="box"/>
        </film>
    </sensor>
    <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.885, 0.698, 0.666"/>
    </bsdf>
    <shape type="rectangle" id="light-shape">
        <transform name="to_world">
            <rotate x="1" angle="90"/>
            <scale value="0.23 0.19 0.19"/>
            <translate value="0 0.99 0.01"/>
        </transform>
        <ref id="white"/>
        <emitter type="area">
            <rgb name="radiance" value="18.387 13.9873 6.75357"/>
        </emitter>
    </shape>
    <shape type="rectangle" id="back">
        <transform name="to_world">
            <translate value="0 0 -1"/>
        </transform>
        <ref id="white"/>
    </shape>
    <shape type="rectangle" id="floor">
        <transform name="to_world">
            <rotate x="1" angle="-90"/>
            <translate value="0 -1 0"/>
        </transform>
        <ref id="white"/>
    </shape>
</scene>
"""


def test_load_file_and_render():
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "scene.xml")
        with open(path, "w") as f:
            f.write(CBOX_XML)
        scene = mitr.load_file(path)
        assert scene.sensors[0].film.width == 16  # $res default substituted
        assert scene.sensors[0].spp == 8
        assert scene.integrator.max_depth == 4
        s, t = mitr.render(scene, spp=8, seed=0)
        s = np.asarray(s)
        assert s.shape == (16, 16, 3)
        assert np.all(np.isfinite(s)) and s.sum() > 0
        # first arrival = camera->emitter distance ~3.84 -> bin ~5-6
        prof = np.asarray(t).sum(axis=(0, 1, 3))
        first = np.nonzero(prof)[0][0]
        assert 4 <= first <= 8


def test_transform_order_matches_mitsuba():
    """XML applies listed ops to the point in order: rotate THEN translate
    here places the light at y=0.99."""
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "scene.xml")
        with open(path, "w") as f:
            f.write(CBOX_XML)
        scene = mitr.load_file(path)
        light = scene.shapes[scene.shape_index("light-shape")]
        td_ = light.triangles()
        center = (td_.v0.mean(axis=0) + td_.v1.mean(axis=0)
                  + td_.v2.mean(axis=0)) / 3
        assert abs(center[1] - 0.99) < 1e-4


def test_nlos_capture_type_code_mapping():
    xml = """<scene version="2.1.0">
    <integrator type="transient_nlos_path">
        <integer name="capture_type" value="1"/>
        <boolean name="nlos_laser_sampling" value="true"/>
    </integrator>
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <film type="transient_hdr_film">
            <integer name="width" value="4"/>
            <integer name="height" value="4"/>
        </film>
    </sensor>
    <shape type="rectangle" id="wall"/>
    </scene>
    """
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "s.xml")
        with open(path, "w") as f:
            f.write(xml)
        scene = mitr.load_file(path)
        assert scene.integrator.capture_type == "single"
        assert scene.integrator.nlos_laser_sampling


REF_EXAMPLES = "/root/reference/examples"


@pytest.mark.skipif(not os.path.isdir(REF_EXAMPLES),
                    reason="reference examples not mounted")
def test_reference_example_scenes_load():
    """All canonical reference scenes must load through the XML importer."""
    names = [
        "transient-nlos/nlos-z-simple.xml",
        "transient/cornell-box/cbox_diffuse.xml",
        "transient/cornell-box/cbox_mirror.xml",
        "transient/cornell-box/cbox_diffuse_freq.xml",
        "polarization/cornell-box/cbox_polarized.xml",
        "transient-nlos/nlos-z-room.xml",
        "diff-transient/cornell-box/cbox_volumetric.xml",
    ]
    for name in names:
        scene = mitr.load_file(os.path.join(REF_EXAMPLES, name))
        assert scene.data.tri.v0.shape[0] > 0


@pytest.mark.skipif(not os.path.isdir(REF_EXAMPLES),
                    reason="reference examples not mounted")
def test_reference_nlos_z_scene_renders():
    """End-to-end render of the actual nlos-z-simple.xml (Z shape + relay
    wall + projector laser, BASELINE.md row 4) at smoke spp."""
    scene = mitr.load_file(
        os.path.join(REF_EXAMPLES, "transient-nlos/nlos-z-simple.xml"))
    # no explicit focus: the laser target comes from intersecting the
    # projector axis with the scene (transientnlospath.py:328-336)
    s, t = mitr.render(scene, spp=4, seed=0)
    t = np.asarray(t)
    assert t.shape == (32, 32, 300, 3)
    assert np.all(np.isfinite(t))
    assert t.sum() > 0
