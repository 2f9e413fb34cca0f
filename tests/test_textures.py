"""Textured BSDF parameters: atlas packing + bilinear lookup + rendering.

Reference behavior: Mitsuba `bitmap`/`checkerboard` texture plugins driving
BSDF reflectance (e.g. roughplastic diffuse_reflectance in
examples/diff-transient/staircase/scene.xml).  Here textures compile into a
padded atlas in BSDFParams and resolve at shading time via a 4-tap bilinear
gather (bsdf/api.py:_apply_texture).
"""
import numpy as np
import pytest

import jax.numpy as jnp

import mitransient_tpu as mitr
from mitransient_tpu.bsdf import api as bsdf_api


def _cbox_with_floor_texture(tex_spec, res=24):
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = res
    d["sensor"]["film"]["height"] = res
    d["sensor"]["film"]["temporal_bins"] = 64
    d["sensor"]["film"]["bin_width_opl"] = 0.1
    d["integrator"]["max_depth"] = 3
    d["floor"]["bsdf"] = {"type": "diffuse", "reflectance": tex_spec}
    return mitr.load_dict(d)


def test_checkerboard_compiles_into_atlas():
    scene = _cbox_with_floor_texture(
        {"type": "checkerboard",
         "color0": {"type": "rgb", "value": [0.9, 0.1, 0.1]},
         "color1": {"type": "rgb", "value": [0.1, 0.9, 0.1]}}
    )
    bp = scene.data.bsdf
    assert bp.textures is not None
    assert bp.textures.shape[0] == 1
    assert int(jnp.sum(bp.tex_id >= 0)) == 1
    # untextured rows keep tex_id == -1
    assert int(jnp.sum(bp.tex_id == -1)) == bp.tex_id.shape[0] - 1


def test_untextured_scene_has_no_atlas():
    scene = mitr.load_dict(mitr.cornell_box())
    assert scene.data.bsdf.textures is None


def test_bilinear_lookup_matches_numpy():
    """_apply_texture against a straight numpy bilinear reference."""
    rng = np.random.default_rng(3)
    h, w, C = 7, 5, 3
    img = rng.uniform(0.0, 1.0, (h, w, C)).astype(np.float32)
    scene = _cbox_with_floor_texture({"type": "checkerboard"})
    bp = scene.data.bsdf
    ti = int(np.argmax(np.asarray(bp.tex_id) >= 0))
    # overwrite the atlas with our random texture
    atlas = np.zeros((1, h, w, C), np.float32)
    atlas[0] = img
    bp = bp._replace(
        textures=jnp.asarray(atlas),
        tex_hw=bp.tex_hw.at[ti].set(jnp.array([h, w], jnp.float32)),
    )
    uv = rng.uniform(-1.0, 2.0, (64, 2)).astype(np.float32)  # incl. wrap
    lb = bsdf_api.gather_lane_bsdf(
        bp, jnp.full((64,), ti, jnp.int32), jnp.asarray(uv))
    got = np.asarray(lb.reflectance)

    # numpy reference: repeat wrap, bilinear, texel centers at (i+0.5)/w
    u = uv[:, 0] - np.floor(uv[:, 0])
    v = uv[:, 1] - np.floor(uv[:, 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def tap(xi, yi):
        return img[np.mod(yi, h), np.mod(xi, w)]

    ref = ((tap(x0, y0) * (1 - fx) + tap(x0 + 1, y0) * fx) * (1 - fy)
           + (tap(x0, y0 + 1) * (1 - fx) + tap(x0 + 1, y0 + 1) * fx) * fy)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_checkerboard_render_is_spatially_varying():
    """A red/green checker floor must produce opposite-channel dominance in
    different steady-image regions (would be uniform with mean-collapse)."""
    scene = _cbox_with_floor_texture(
        {"type": "checkerboard",
         "color0": {"type": "rgb", "value": [0.9, 0.02, 0.02]},
         "color1": {"type": "rgb", "value": [0.02, 0.9, 0.02]}},
        res=32,
    )
    steady, transient = mitr.render(scene, spp=16, seed=0)
    img = np.asarray(steady)
    # bottom rows of the image see the floor; find pixels dominated by red
    # vs green — both classes must exist
    bottom = img[24:, :, :]
    lum = bottom.sum(-1)
    lit = lum > np.percentile(lum, 50)
    r_dom = (bottom[..., 0] > 2.0 * bottom[..., 1]) & lit
    g_dom = (bottom[..., 1] > 2.0 * bottom[..., 0]) & lit
    assert r_dom.sum() > 5, f"no red-dominant floor pixels ({r_dom.sum()})"
    assert g_dom.sum() > 5, f"no green-dominant floor pixels ({g_dom.sum()})"


def test_bitmap_texture_loads_and_renders(tmp_path):
    import imageio.v3 as iio

    # 8x8 image: left half dark, right half bright (uint8 -> sRGB decode)
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, 4:] = 240
    fn = tmp_path / "tex.png"
    iio.imwrite(fn, img)
    scene = _cbox_with_floor_texture(
        {"type": "bitmap", "filename": str(fn)})
    bp = scene.data.bsdf
    assert bp.textures is not None
    atlas = np.asarray(bp.textures[0])
    assert atlas[:, :4].mean() < 0.01
    assert atlas[:, 4:].mean() > 0.8  # sRGB 240/255 -> ~0.87 linear
    steady, transient = mitr.render(scene, spp=4, seed=0)
    assert np.isfinite(np.asarray(steady)).all()
    assert float(np.asarray(steady).sum()) > 0


def test_texture_to_uv_scale():
    """to_uv scaling tiles the texture: with a 2x scale the checker flips
    twice as often along u."""
    scene = _cbox_with_floor_texture(
        {"type": "checkerboard",
         "color0": {"type": "rgb", "value": [1.0, 1.0, 1.0]},
         "color1": {"type": "rgb", "value": [0.0, 0.0, 0.0]},
         "to_uv": {"scale": [4.0, 4.0, 1.0]}})
    bp = scene.data.bsdf
    ti = int(np.argmax(np.asarray(bp.tex_id) >= 0))
    su = float(bp.tex_uv[ti, 0])
    assert su == 4.0
    # sample along u at v'=0.25 (mid-cell, away from the blend boundary):
    # period becomes 1/su
    n = 64
    uv = np.stack([np.linspace(0, 0.999, n), np.full(n, 0.0625)], -1)
    lb = bsdf_api.gather_lane_bsdf(
        bp, jnp.full((n,), ti, jnp.int32), jnp.asarray(uv, jnp.float32))
    r = np.asarray(lb.reflectance)[:, 0]
    flips = np.sum(np.abs(np.diff((r > 0.5).astype(int))))
    assert flips >= 7  # 4 tiles x 2 flips/tile - edges


def test_staircase_xml_loads_with_textures():
    path = "/root/reference/examples/diff-transient/staircase/scene.xml"
    import os

    if not os.path.exists(path):
        pytest.skip("reference staircase scene not mounted")
    scene = mitr.load_file(path, resx=16, resy=16, spp=1)
    bp = scene.data.bsdf
    assert bp.textures is not None
    assert bp.textures.shape[0] >= 5  # distinct texture files
    assert bp.textures.shape[1] <= 512 and bp.textures.shape[2] <= 512
    assert int(jnp.sum(bp.tex_id >= 0)) >= 5
