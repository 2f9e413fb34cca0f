"""Every example script must run end-to-end in --quick mode (the examples
corpus is reference surface: /root/reference/examples, SURVEY.md §2.1 last
row).  Scripts run in-process (runpy) so they share the session's jit cache
and CPU-platform conftest configuration."""
import os
import runpy
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

SCRIPTS = [
    "transient/render_cbox_diffuse.py",
    "transient/render_cbox_volumetric.py",
    "transient/frequency_space_rendering.py",
    "transient/rainbow_visualization.py",
    "transient_nlos/simple_nlos_scenes.py",
    "polarization/render_cbox_polarized.py",
    "polarization/transient_nlos_polarization.py",
    "diff_transient/optimize_reflectance.py",
    "diff_transient/optimize_staircase_texture.py",
    "diff_transient/forward_time_gradients.py",
    "angulararea_emitter/render_angular_vs_area.py",
]


@pytest.mark.parametrize("rel", SCRIPTS, ids=[s.split("/")[-1][:-3]
                                              for s in SCRIPTS])
def test_example_quick(rel, tmp_path, monkeypatch):
    path = os.path.join(EXAMPLES, rel)
    monkeypatch.setattr(sys, "argv",
                        [path, "--quick", "--out", str(tmp_path)])
    monkeypatch.chdir(REPO)
    runpy.run_path(path, run_name="__main__")


@pytest.mark.skipif(
    not os.path.exists(
        "/root/reference/examples/transient-nlos/nlos-z-room.xml"),
    reason="reference examples not mounted")
def test_complex_nlos_quick(tmp_path, monkeypatch):
    path = os.path.join(EXAMPLES, "transient_nlos", "complex_nlos_scenes.py")
    monkeypatch.setattr(sys, "argv",
                        [path, "--quick", "--spp", "8", "--out",
                         str(tmp_path)])
    monkeypatch.chdir(REPO)
    runpy.run_path(path, run_name="__main__")
