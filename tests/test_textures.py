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


# ---------------------------------------------------------------------------
# Bump / normal mapping (Mitsuba bumpmap/normalmap wrappers; the staircase
# scene wraps BrushedAluminium roughconductor in a bumpmap)
# ---------------------------------------------------------------------------

def _rect_scene(bsdf_dict, tmp_path=None):
    d = {
        "type": "scene",
        "rect": {"type": "rectangle", "bsdf": bsdf_dict},
        "light": {
            "type": "rectangle",
            # face the floor: normal -z via a look_at from above
            "to_world": {"look_at": {"origin": [0, 0, 5], "target": [0, 0, 0],
                                     "up": [0, 1, 0]}},
            "emitter": {"type": "area", "radiance": 1.0},
        },
        "sensor": {
            "type": "perspective",
            "to_world": {"look_at": {"origin": [0, 0, 3], "target": [0, 0, 0],
                                     "up": [0, 1, 0]}},
            "film": {"type": "transient_hdr_film", "width": 4, "height": 4,
                     "temporal_bins": 16},
        },
    }
    return mitr.load_dict(d, base_dir=str(tmp_path) if tmp_path else ".")


def _write_ramp_png(tmp_path, w=64, h=16):
    import imageio.v3 as iio

    ramp = np.tile(np.round(np.linspace(0, 255, w)).astype(np.uint8), (h, 1))
    fn = str(tmp_path / "ramp.png")
    iio.imwrite(fn, ramp)
    return fn


def test_bumpmap_tilts_shading_normal(tmp_path):
    """Linear height ramp h(u)=u on the unit rectangle: analytic tilt.

    Rectangle spans x in [-1,1] with u in [0,1] -> |dp_du| = 2.  With
    raw=True the loaded heights are exactly x/(w-1), so the texel-unit
    gradient is 1/(w-1) and dh/du = w/(w-1).  Expected shading normal
    is normalize((-dh_du, 0, |dp_du| * |dp_dv| / |dp_dv|)) ~ tan = dh_du/2.
    """
    from mitransient_tpu.core.records import Ray
    from mitransient_tpu.scene.scene import ray_intersect

    w = 64
    fn = _write_ramp_png(tmp_path, w=w)
    scene = _rect_scene({
        "type": "bumpmap",
        "map": {"type": "bitmap", "filename": fn, "raw": True},
        "bsdf": {"type": "diffuse"},
    }, tmp_path)
    bp = scene.data.bsdf
    assert bp.bump_textures is not None
    assert int(np.sum(np.asarray(bp.bump_kind) == 1)) == 1

    o = jnp.asarray(np.array([[0.1, 0.2, 1.0], [0.1, 0.2, 1.0]], np.float32))
    dd = jnp.asarray(np.array([[0, 0, -1.0], [0, 0, -1.0]], np.float32))
    si = ray_intersect(scene.data, Ray.make(o, dd),
                       jnp.ones((2,), bool))
    assert bool(si.valid[0])
    n = np.asarray(si.frame.n)[0]
    dh_du = w / (w - 1.0)
    tan = dh_du / 2.0  # |dp_du| = 2
    expect = np.array([-tan, 0.0, 1.0])
    expect /= np.linalg.norm(expect)
    assert np.allclose(n, expect, atol=5e-3), (n, expect)
    # geometric normal stays +z
    assert np.allclose(np.asarray(si.n)[0], [0, 0, 1], atol=1e-6)


def test_normalmap_identity_keeps_normal(tmp_path):
    """A constant (0.5, 0.5, 1) normal map encodes (0,0,1): no change."""
    import imageio.v3 as iio

    from mitransient_tpu.core.records import Ray
    from mitransient_tpu.scene.scene import ray_intersect

    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0] = 128
    img[..., 1] = 128
    img[..., 2] = 255
    fn = str(tmp_path / "nm.png")
    iio.imwrite(fn, img)
    scene = _rect_scene({
        "type": "normalmap",
        "normalmap": {"type": "bitmap", "filename": fn, "raw": True},
        "bsdf": {"type": "diffuse"},
    }, tmp_path)
    bp = scene.data.bsdf
    assert int(np.sum(np.asarray(bp.bump_kind) == 2)) == 1

    o = jnp.asarray(np.array([[0.3, -0.4, 1.0]], np.float32))
    dd = jnp.asarray(np.array([[0, 0, -1.0]], np.float32))
    si = ray_intersect(scene.data, Ray.make(o, dd), jnp.ones((1,), bool))
    n = np.asarray(si.frame.n)[0]
    assert np.allclose(n, [0, 0, 1], atol=2e-2), n


def test_bumpmap_scene_renders(tmp_path):
    fn = _write_ramp_png(tmp_path)
    scene = _rect_scene({
        "type": "bumpmap",
        "map": {"type": "bitmap", "filename": fn},
        "scale": 2.0,
        "bsdf": {"type": "diffuse"},
    }, tmp_path)
    steady, transient = mitr.render(scene, spp=8, seed=0)
    assert np.isfinite(np.asarray(steady)).all()
    assert float(np.asarray(steady).sum()) > 0
