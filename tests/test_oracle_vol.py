"""Volumetric radiometry oracle (VERDICT r2 task 4b).

Closed-form / float64-quadrature ground truth for ``transient_prbvolpath``
(reference /root/reference/mitransient/integrators/transient_prbvolpath.py:
164-360), with no shared code with the renderer:

* **Transmittance law**: a camera staring through a homogeneous purely
  absorbing cube (albedo 0) at an emissive panel inside it reads exactly
  ``L_e * exp(-sigma_t * ell)`` per pixel (ell = in-medium path length) and
  all energy lands at the geometric-distance bin -> validates free-flight
  sampling's absorption handling and in-medium OPL accumulation (mei.t*eta,
  :229) with a per-pixel exponential, not just a constant.
* **Single-scatter tail**: with albedo > 0 and a point light inside the
  medium, the scattered transient equals the float64 line integral
  sigma_s exp(-sigma_t (t-t0)) p_HG(cos) exp(-sigma_t r) I / r^2 dt with
  OPL = t + r, binned exactly per quadrature sample -> validates the
  delta-tracking estimator, HG phase evaluation, NEE-through-media
  transmittance (:413-512) and medium-vertex time binning.
"""
import numpy as np
import pytest

import mitransient_tpu as mitr

SIGMA_T = 0.8
CAM_O = np.array([0.0, 0.0, 3.0])
EM_HALF = 0.4  # emissive panel half-extent
EM_Z = -0.5
LE = np.array([5.0, 8.0, 11.0])
FOV = 10.0  # narrow: frustum stays well inside the cube's x/y faces
W = H = 8
BINW = 0.02
NBINS = 200
START = 3.0

PL_POS = np.array([0.4, 0.2, 2.2])  # point light OUTSIDE the cube: bounds
# the NEE 1/r^2 (finite-variance estimator) and makes every NEE segment
# cross the null boundary (partial in-medium transmittance)
PL_I = np.array([6.0, 6.0, 6.0])
ALBEDO = 0.5
HG_G = 0.3


def base_scene(albedo, max_depth, light="panel"):
    d = {
        "type": "scene",
        "integrator": {
            "type": "transient_prbvolpath",
            "max_depth": max_depth,
            "rr_depth": 99,
        },
        "sensor": {
            "type": "perspective",
            "fov": FOV,
            "fov_axis": "x",
            "to_world": {
                "look_at": {"origin": list(CAM_O), "target": [0, 0, 0],
                            "up": [0, 1, 0]},
            },
            "film": {
                "type": "transient_hdr_film",
                "width": W, "height": H,
                "temporal_bins": NBINS,
                "start_opl": START,
                "bin_width_opl": BINW,
            },
        },
        "fogcube": {
            "type": "cube",
            "to_world": {"scale": 1.0},
            "bsdf": {"type": "null"},
            "medium": {
                "type": "homogeneous",
                "sigma_t": SIGMA_T,
                "albedo": {"type": "rgb", "value": [albedo] * 3},
                "phase": {"type": "hg", "g": HG_G},
            },
        },
    }
    if light == "panel":
        d["panel"] = {
            "type": "rectangle",
            "to_world": {"translate": [0.0, 0.0, EM_Z],
                         "scale": [EM_HALF, EM_HALF, 1.0]},
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": [0, 0, 0]}},
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": list(LE)}},
        }
    else:
        d["plight"] = {
            "type": "point",
            "to_world": {"translate": list(PL_POS)},
            "intensity": {"type": "rgb", "value": list(PL_I)},
        }
    return d


def _pixel_dirs(jit_k=2):
    t = np.tan(np.radians(FOV) / 2.0)
    tx, ty = t, t * H / W
    fwd = np.array([0.0, 0.0, -1.0])
    left = np.array([-1.0, 0.0, 0.0])  # cross(up, fwd), up = +y
    new_up = np.cross(fwd, left)
    R = np.stack([left, new_up, fwd], axis=1)
    j = (np.arange(jit_k) + 0.5) / jit_k
    px, py = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    u = (px[..., None, None] + j[None, None, :, None]) / W
    v = (py[..., None, None] + j[None, None, None, :]) / H
    u, v = np.broadcast_arrays(u, v)
    d_cam = np.stack(
        [(1.0 - 2.0 * u) * tx, (1.0 - 2.0 * v) * ty, np.ones_like(u)],
        axis=-1)
    d = d_cam @ R.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d.reshape(-1, 3)


def test_transmittance_law():
    """Per-pixel Beer-Lambert through the absorbing cube + exact arrival
    bin.  Deterministic up to delta-tracking MC noise; 1% aggregate."""
    scene = mitr.load_dict(base_scene(albedo=0.0, max_depth=16))
    s, t = mitr.render(scene, spp=2048, seed=1)
    s = np.asarray(s, np.float64)
    d = _pixel_dirs(4)
    # entry at z=+1 plane, panel hit at z=EM_Z
    t_in = (CAM_O[2] - 1.0) / (-d[:, 2])
    t_hit = (CAM_O[2] - EM_Z) / (-d[:, 2])
    ell = t_hit - t_in
    ref = (np.exp(-SIGMA_T * ell)[:, None] * LE[None, :]).reshape(
        H, W, 4, 4, 3).mean(axis=(2, 3))
    rel = np.abs(s - ref) / ref
    assert np.abs(s.mean() / ref.mean() - 1.0) < 1e-2
    assert np.median(rel) < 4e-2
    # arrival bins: all energy within the pixel's geometric-distance bin
    tr = np.asarray(t, np.float64)
    np.testing.assert_allclose(tr.sum(axis=2), s, rtol=1e-5)
    bins = np.floor((t_hit.reshape(H, W, 4, 4).mean(axis=(2, 3)) - START)
                    / BINW).astype(int)
    for yy in (0, H // 2, H - 1):
        for xx in (0, W // 2, W - 1):
            prof = tr[yy, xx].sum(axis=-1)
            nz = np.nonzero(prof)[0]
            assert abs(nz.min() - bins[yy, xx]) <= 1
            assert abs(nz.max() - bins[yy, xx]) <= 1


def _quad_single_scatter(jit_k=2, n_t=4096):
    """Float64 line integral of the single-scatter term with exact binning.

    Camera ray r(t); scatter inside the cube at t in (t_in, t_out); NEE to
    the interior point light with HG phase and in-medium transmittance on
    both segments.  Returns (steady (H, W, 3), transient (H, W, NBINS, 3)).
    """
    d = _pixel_dirs(jit_k)
    t_in = (CAM_O[2] - 1.0) / (-d[:, 2])
    t_out = (CAM_O[2] + 1.0) / (-d[:, 2])
    npnt = d.shape[0]
    steady = np.zeros(npnt)
    tr = np.zeros((npnt, NBINS))
    sigma_s = ALBEDO * SIGMA_T
    g = HG_G
    for i in range(npnt):
        tm = np.linspace(t_in[i], t_out[i], n_t + 1)
        tc = 0.5 * (tm[:-1] + tm[1:])
        dt = tm[1] - tm[0]
        x = CAM_O[None, :] + tc[:, None] * d[i][None, :]
        to_l = PL_POS[None, :] - x
        r = np.linalg.norm(to_l, axis=-1)
        # HG about the FORWARD (propagation) direction
        cos_fwd = np.sum(d[i][None, :] * to_l, axis=-1) / r
        ph = (1.0 - g * g) / (4.0 * np.pi * (1.0 + g * g
                                             - 2.0 * g * cos_fwd) ** 1.5)
        # in-medium portion of the NEE segment: x -> crossing of z = +1
        t_star = (1.0 - x[:, 2]) / (PL_POS[2] - x[:, 2])
        len_med = np.clip(t_star, 0.0, 1.0) * r
        contrib = (sigma_s * np.exp(-SIGMA_T * (tc - t_in[i]))
                   * ph * np.exp(-SIGMA_T * len_med) / (r * r) * dt)
        steady[i] = contrib.sum()
        opl = tc + r
        b = np.floor((opl - START) / BINW).astype(np.int64)
        ok = (b >= 0) & (b < NBINS)
        tr[i] = np.bincount(b[ok], weights=contrib[ok], minlength=NBINS)
    steady3 = (steady[:, None] * PL_I[None, :]).reshape(
        H, W, jit_k, jit_k, 3).mean(axis=(2, 3))
    tr3 = (tr[:, :, None] * PL_I[None, None, :]).reshape(
        H, W, jit_k, jit_k, NBINS, 3).mean(axis=(2, 3))
    return steady3, tr3


def test_single_scatter_quadrature():
    """Scattered-in radiance from an interior point light vs the float64
    line integral, in aggregate and per significant bin.  max_depth=3
    (entry null crossing + scatter vertex) excludes all multi-scatter, so
    the render estimates EXACTLY the oracle's integrand; the estimator is
    noisy near the light's 1/r^2 -> average two sample streams.

    This oracle caught a real phase-convention bug in round 3: hg_pdf used
    the +2g (mirror-image) formula, under-weighting forward NEE by ~22%
    at g = 0.3 in this geometry (core/warp.py history)."""
    scene = mitr.load_dict(base_scene(albedo=ALBEDO, max_depth=3,
                                      light="point"))
    acc_s, acc_t = 0.0, 0.0
    seeds = (2, 3, 11, 12)
    for sd_ in seeds:
        s, t = mitr.render(scene, spp=4096, seed=sd_)
        acc_s = acc_s + np.asarray(s, np.float64)
        acc_t = acc_t + np.asarray(t, np.float64)
    s = acc_s / len(seeds)
    t = acc_t / len(seeds)
    tq, trq = _quad_single_scatter()
    assert np.abs(s.mean() / tq.mean() - 1.0) < 5e-2
    prof = t.mean(axis=(0, 1))
    ref_prof = trq.mean(axis=(0, 1))
    peak = ref_prof.max()
    empty = ref_prof < 1e-12
    assert prof[empty].max(initial=0.0) < 5e-3 * peak
    sig = ref_prof > 0.05 * peak
    rel = np.abs(prof[sig] - ref_prof[sig]) / ref_prof[sig]
    assert np.median(rel) < 1e-1
    assert np.abs(prof.sum() / ref_prof.sum() - 1.0) < 5e-2
