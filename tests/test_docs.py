"""Plugin documentation generator (parity with the reference's Sphinx
plugin-doc pipeline, docs/generate_plugin_doc.py)."""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "docs"))


def test_generator_covers_all_plugins(tmp_path):
    import generate_plugin_docs as g

    written = g.generate(str(tmp_path))
    names = {os.path.basename(p) for p in written}
    for expected in ("transient_path.md", "transient_nlos_path.md",
                     "transient_prbvolpath.md", "transient_hdr_film.md",
                     "phasor_hdr_film.md", "nlos_capture_meter.md",
                     "angulararea.md", "heterogeneous.md", "plastic.md",
                     "index.md"):
        assert expected in names, expected
    idx = open(os.path.join(str(tmp_path), "index.md")).read()
    assert "transient_nlos_path" in idx


def test_checked_in_docs_are_in_sync(tmp_path):
    import filecmp

    import generate_plugin_docs as g

    checked_in = os.path.join(ROOT, "docs", "plugins")
    assert os.path.isdir(checked_in), "run docs/generate_plugin_docs.py"
    written = g.generate(str(tmp_path))
    for p in written:
        rel = os.path.relpath(p, str(tmp_path))
        q = os.path.join(checked_in, rel)
        assert os.path.exists(q), f"missing {rel}; re-run the generator"
        assert filecmp.cmp(p, q, shallow=False), (
            f"{rel} is stale; re-run docs/generate_plugin_docs.py")


def test_user_guides_exist_and_link():
    """The user-guide surface (docs/index.md + docs/guides/*) — the
    tutorial counterpart of the reference's docs/src/tutorials."""
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..", "docs")
    index = open(os.path.join(root, "index.md")).read()
    links = re.findall(r"\]\(([^)#]+\.md)\)", index)
    assert any("guides/" in l for l in links)
    for link in links:
        assert os.path.exists(os.path.join(root, link)), link
    for g in ("getting_started", "transient_rendering", "nlos",
              "polarization", "differentiable", "volumetric_spectral",
              "distributed", "performance"):
        assert os.path.exists(os.path.join(root, "guides", g + ".md")), g
