"""Ground-truth radiometry oracle (BASELINE correctness target).

The BASELINE target is "output allclose to mitransient within 1e-3 relative
error" on the cbox estimator.  Mitsuba is not installable in this
environment, so correctness is proven against an *independent* oracle
instead: deterministic numerical quadrature of the rendering equation's
single-bounce term (the same physics mitransient's transient_path estimates,
/root/reference/mitransient/integrators/transientpath.py:88-326), evaluated
in float64 numpy with no shared code with the renderer.

Scene: a diffuse floor (y=0 plane, albedo rho) lit by a one-sided
rectangular area emitter facing down, pinhole camera seeing only the floor.
Closed-form facts being checked:

* steady pixel = (rho/pi) * integral_emitter L_e cos(th_p) cos(th_q)/r^2 dA,
  averaged over the pixel footprint -> validates absolute radiometry,
  cosine importance, NEE pdf (dist^2 / (cos * A)), and the MIS combination
  (at max_depth=2 both the NEE and BSDF-sampled-emitter-hit strategies
  contribute; any mis-weighting bias shifts the total).
* transient bin b = same integral restricted to paths with OPL
  |cam->p| + |p->q| in bin b -> validates start_opl/bin_width binning
  (transient_hdr_film.py:250-276 semantics).
* a camera staring at the emitter reads exactly L_e (radiance invariance).
* d(sum steady)/d rho = sum steady / rho elementwise (the estimator is
  linear in rho with RR off) -> the PRB replay gradient must reproduce it
  near float precision, a stricter check than finite differences.
"""
import numpy as np
import pytest

import mitransient_tpu as mitr

# emitter rectangle: local [-1,1]^2, scaled (0.25, 0.35), rotated to face -y,
# centered at (0.4, 1.2, 0.2)
EM_C = np.array([0.9, 1.2, 0.3])
EM_SX, EM_SZ = 0.25, 0.35
EM_AREA = 4.0 * EM_SX * EM_SZ
RHO = np.array([0.7, 0.5, 0.3])
LE = np.array([10.0, 14.0, 6.0])
CAM_O = np.array([0.0, 2.0, 1.1])  # steep view: compact OPL range; the
CAM_T = np.array([0.0, 0.0, 0.3])  # emitter sits outside the frustum
FOV = 30.0
W = H = 8
START_OPL = 3.0
BIN_W = 0.05
NBINS = 60


def oracle_scene(max_depth=2):
    return {
        "type": "scene",
        "integrator": {
            "type": "transient_path",
            "max_depth": max_depth,
            "rr_depth": 99,
        },
        "sensor": {
            "type": "perspective",
            "fov": FOV,
            "fov_axis": "x",
            "to_world": {
                "look_at": {
                    "origin": list(CAM_O),
                    "target": list(CAM_T),
                    "up": [0, 1, 0],
                }
            },
            "film": {
                "type": "transient_hdr_film",
                "width": W,
                "height": H,
                "temporal_bins": NBINS,
                "start_opl": START_OPL,
                "bin_width_opl": BIN_W,
            },
        },
        "floor_bsdf": {
            "type": "diffuse",
            "reflectance": {"type": "rgb", "value": list(RHO)},
        },
        "black": {
            "type": "diffuse",
            "reflectance": {"type": "rgb", "value": [0.0, 0.0, 0.0]},
        },
        "floor": {
            "type": "rectangle",
            "to_world": {
                "translate": [0.0, 0.0, 0.0],
                "rotate": {"axis": [1, 0, 0], "angle": -90},
                "scale": 4.0,
            },
            "bsdf": {"type": "ref", "id": "floor_bsdf"},
        },
        "light": {
            "type": "rectangle",
            "to_world": {
                "translate": list(EM_C),
                "rotate": {"axis": [1, 0, 0], "angle": 90},
                "scale": [EM_SX, EM_SZ, 1.0],
            },
            "bsdf": {"type": "ref", "id": "black"},
            "emitter": {
                "type": "area",
                "radiance": {"type": "rgb", "value": list(LE)},
            },
        },
    }


def _camera_basis():
    """Replicate the look_at basis (Mitsuba convention: left-handed camera
    frame with x = 'left', matching sensors/perspective.py)."""
    fwd = CAM_T - CAM_O
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    left = np.cross(up, fwd)
    left /= np.linalg.norm(left)
    new_up = np.cross(fwd, left)
    return np.stack([left, new_up, fwd], axis=1)  # columns


def _pixel_dirs(jit_k):
    """World directions for a jit_k x jit_k midpoint grid per pixel.

    fov_axis='x': tan_half_x = tan(fov/2), tan_half_y = tan_half_x / aspect.
    """
    t = np.tan(np.radians(FOV) / 2.0)
    tx, ty = t, t * H / W
    R = _camera_basis()
    j = (np.arange(jit_k) + 0.5) / jit_k
    px, py = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    u = (px[..., None, None] + j[None, None, :, None]) / W
    v = (py[..., None, None] + j[None, None, None, :]) / H
    u, v = np.broadcast_arrays(u, v)
    d_cam = np.stack(
        [(1.0 - 2.0 * u) * tx, (1.0 - 2.0 * v) * ty, np.ones_like(u)],
        axis=-1,
    )  # (H, W, k, k, 3)
    d = d_cam @ R.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d


def _quad(jit_k=4, em_g=192, bins=False):
    """Quadrature of the single-bounce term.  Returns steady (H, W, 3) and,
    if ``bins``, the transient (H, W, NBINS, 3)."""
    d = _pixel_dirs(jit_k)  # (H, W, k, k, 3)
    tmin = -CAM_O[1] / d[..., 1]
    p = CAM_O + tmin[..., None] * d  # floor hit points
    cam_dist = tmin  # |cam -> p| (d normalized)

    # emitter midpoint grid
    g = (np.arange(em_g) + 0.5) / em_g * 2.0 - 1.0
    qx, qz = np.meshgrid(EM_C[0] + g * EM_SX, EM_C[2] + g * EM_SZ,
                         indexing="ij")
    q = np.stack([qx.ravel(), np.full(em_g * em_g, EM_C[1]), qz.ravel()],
                 axis=-1)  # (G, 3)
    dA = EM_AREA / (em_g * em_g)

    # w = q - p ; cos_p = w_y / r ; cos_q = w_y / r   (both normals +-y)
    P = p.reshape(-1, 3)
    wy = q[None, :, 1] - P[:, None, 1]
    r2 = np.sum((q[None, :, :] - P[:, None, :]) ** 2, axis=-1)
    geom = wy * wy / (r2 * r2) * dA  # (Np, G)
    E = geom.sum(axis=-1)  # irradiance / L_e
    steady = (RHO[None, :] / np.pi) * E[:, None] * LE[None, :]
    steady = steady.reshape(H, W, jit_k, jit_k, 3).mean(axis=(2, 3))
    if not bins:
        return steady
    opl = cam_dist.reshape(-1)[:, None] + np.sqrt(r2)
    b = np.floor((opl - START_OPL) / BIN_W).astype(np.int64)
    valid = (b >= 0) & (b < NBINS)
    npnt = P.shape[0]
    flat = np.arange(npnt)[:, None] * NBINS + np.clip(b, 0, NBINS - 1)
    tr = np.bincount(flat[valid], weights=geom[valid],
                     minlength=npnt * NBINS).reshape(npnt, NBINS)
    tr = tr.reshape(H, W, jit_k, jit_k, NBINS).mean(axis=(2, 3))
    transient = (RHO[None, None, None, :] / np.pi) * tr[..., None] * LE
    return steady, transient


@pytest.fixture(scope="module")
def rendered():
    scene = mitr.load_dict(oracle_scene())
    steady, transient = mitr.render(scene, spp=4096, seed=3)
    return np.asarray(steady, np.float64), np.asarray(transient, np.float64)


def test_steady_absolute_radiometry(rendered):
    """Rendered direct lighting matches float64 quadrature: image mean
    within 0.4%, every pixel within 4% (MC noise at 4096 spp ~ 0.8%/pixel).
    Catches any constant-factor, pdf or MIS-weight bias."""
    steady, _ = rendered
    ref = _quad()
    assert ref.min() > 0
    rel = np.abs(steady - ref) / ref
    assert np.abs(steady.mean() / ref.mean() - 1.0) < 4e-3
    assert rel.max() < 4e-2


def test_transient_bin_oracle(rendered):
    """Per-bin transient matches the quadrature oracle binned with the same
    box filter: validates OPL accumulation + start_opl/bin_width semantics
    per bin, not just in aggregate."""
    _, transient = rendered
    ref_s, ref_t = _quad(bins=True)
    # energy conservation: sum over bins == steady oracle (no out-of-range)
    np.testing.assert_allclose(ref_t.sum(axis=2), ref_s, rtol=1e-12)
    prof = transient.mean(axis=(0, 1))  # (T, 3) image-average per bin
    ref_prof = ref_t.mean(axis=(0, 1))
    peak = ref_prof.max()
    # support match: bins the oracle says are empty get < 0.1% of peak
    empty = ref_prof < 1e-12
    assert prof[empty].max(initial=0.0) < 1e-3 * peak
    # significant bins (>2% of peak) match within 5%
    sig = ref_prof > 0.02 * peak
    rel = np.abs(prof[sig] - ref_prof[sig]) / ref_prof[sig]
    assert rel.max() < 5e-2
    # aggregate transient energy within 0.4%
    assert np.abs(prof.sum() / ref_prof.sum() - 1.0) < 4e-3


def test_emitter_radiance_invariance():
    """A camera staring straight at the emitter reads exactly L_e in every
    fully-covered pixel — deterministic, tolerance is float32 epsilon-level
    (radiance invariance along a ray; transientpath.py:174-180)."""
    d = oracle_scene(max_depth=1)
    d["sensor"]["to_world"]["look_at"] = {
        "origin": list(EM_C + np.array([0.0, -0.8, 0.0])),
        "target": list(EM_C),
        "up": [0, 0, 1],
    }
    d["sensor"]["fov"] = 10.0  # footprint ~0.14 < emitter half-extent 0.25
    d["sensor"]["film"]["start_opl"] = 0.5
    scene = mitr.load_dict(d)
    steady, transient = mitr.render(scene, spp=16, seed=0)
    steady = np.asarray(steady)
    np.testing.assert_allclose(steady, np.broadcast_to(LE, steady.shape),
                               rtol=1e-5)
    # all energy lands at OPL in [0.8, 0.8/cos(corner angle)] -> bin 6
    tr = np.asarray(transient)
    np.testing.assert_allclose(tr.sum(axis=2), steady, rtol=1e-5)
    nz = np.nonzero(tr.sum(axis=(0, 1, 3)))[0]
    assert nz.min() == 6 and nz.max() == 6


def test_prb_gradient_exact_linearity():
    """With RR off and max_depth=2 the estimator is exactly linear in the
    floor albedo and the emitter radiance, so for the SAME sample stream
    d(sum steady)/d rho_c == sum_c(steady)/rho_c.  The PRB replay
    (integrators/prb.py) must reproduce this near float32 precision — a
    bias-free-gradient check stronger than finite differences."""
    scene = mitr.load_dict(oracle_scene())
    spp = 64
    steady, _t = mitr.render(scene, spp=spp, seed=0, regenerate=False)
    steady = np.asarray(steady, np.float64)
    ones_s = np.ones((H, W, 3), np.float32)
    grads = mitr.render_backward(scene, (ones_s, None), spp=spp, seed=0)
    g = grads["__tables__"]
    s_sum = steady.sum(axis=(0, 1))

    # floor albedo gradient (find the floor's row in the bsdf table)
    gb = np.asarray(g.bsdf_reflectance, np.float64)
    row = np.argmax(np.abs(gb).sum(axis=-1)[: gb.shape[0]])
    np.testing.assert_allclose(gb[row], s_sum / RHO, rtol=2e-3)
    # emitter radiance gradient
    ge = np.asarray(g.emitter_radiance, np.float64)
    np.testing.assert_allclose(ge.sum(axis=0)[-3:], s_sum / LE, rtol=2e-3)


# ---------------------------------------------------------------------------
# Two-bounce oracle: camera -> floor -> wall -> point light (VERDICT r2
# task 4a).  The point light sits BELOW the floor plane so the floor gets no
# direct light (its NEE cosine is negative and the segment is floor-occluded)
# and the camera frustum sees only the floor — so the depth-3 render equals
# the two-bounce term alone, which the oracle integrates in float64 over a
# wall-point grid with exact per-pair OPL binning (no profile smearing) and
# exact visibility of the wall->light segment against the finite floor.
# ---------------------------------------------------------------------------

WALL_C = np.array([0.0, 1.0, -1.5])  # vertical wall, facing +z
WALL_SX, WALL_SY = 1.6, 1.0  # local [-1,1]^2 scaled -> spans y in [0, 2]
WALL_RHO = np.array([0.6, 0.55, 0.45])
PL_POS = np.array([3.5, -0.5, 1.0])  # point light below the floor plane
PL_I = np.array([40.0, 30.0, 20.0])
FLOOR_HALF = 1.2  # small floor: most wall->light segments clear its edge
B2_START, B2_BINW, B2_NBINS = 5.0, 0.05, 180  # covers worst-case OPL ~13.2


def two_bounce_scene(max_depth=3):
    return {
        "type": "scene",
        "integrator": {
            "type": "transient_path",
            "max_depth": max_depth,
            "rr_depth": 99,
        },
        "sensor": {
            "type": "perspective",
            "fov": FOV,
            "fov_axis": "x",
            "to_world": {
                "look_at": {
                    "origin": list(CAM_O),
                    "target": list(CAM_T),
                    "up": [0, 1, 0],
                }
            },
            "film": {
                "type": "transient_hdr_film",
                "width": W,
                "height": H,
                "temporal_bins": B2_NBINS,
                "start_opl": B2_START,
                "bin_width_opl": B2_BINW,
            },
        },
        "floor": {
            "type": "rectangle",
            "to_world": {
                "rotate": {"axis": [1, 0, 0], "angle": -90},
                "scale": FLOOR_HALF,
            },
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": list(RHO)}},
        },
        "wall": {
            "type": "rectangle",
            "to_world": {
                "translate": list(WALL_C),
                "scale": [WALL_SX, WALL_SY, 1.0],
            },
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": list(WALL_RHO)}},
        },
        "plight": {
            "type": "point",
            "to_world": {"translate": list(PL_POS)},
            "intensity": {"type": "rgb", "value": list(PL_I)},
        },
    }


def _quad_two_bounce(jit_k=4, wall_g=160):
    """Float64 quadrature of the two-bounce term with exact per-(p, s) OPL
    binning.  Returns (steady (H, W, 3), transient (H, W, B2_NBINS, 3))."""
    d = _pixel_dirs(jit_k)
    tmin = -CAM_O[1] / d[..., 1]
    p = (CAM_O + tmin[..., None] * d).reshape(-1, 3)  # floor points
    cam_dist = tmin.reshape(-1)

    # wall grid (midpoint): world x in +-WALL_SX, y in WALL_C.y +- WALL_SY
    g = (np.arange(wall_g) + 0.5) / wall_g * 2.0 - 1.0
    sx, sy = np.meshgrid(WALL_C[0] + g * WALL_SX, WALL_C[1] + g * WALL_SY,
                         indexing="ij")
    s = np.stack([sx.ravel(), sy.ravel(),
                  np.full(wall_g * wall_g, WALL_C[2])], axis=-1)  # (G, 3)
    dA = (4.0 * WALL_SX * WALL_SY) / (wall_g * wall_g)
    n_wall = np.array([0.0, 0.0, 1.0])

    # wall <- light: E(s) = I * cos_s / r^2, with exact floor-edge shadow
    to_l = PL_POS[None, :] - s
    r_sl = np.linalg.norm(to_l, axis=-1)
    cos_s_l = (to_l @ n_wall) / r_sl  # wall faces +z
    # floor-plane crossing of segment s -> L (y goes from s_y>0 to -0.5)
    t_star = s[:, 1] / (s[:, 1] - PL_POS[1])
    cross = s + t_star[:, None] * (PL_POS[None, :] - s)
    blocked = (np.abs(cross[:, 0]) <= FLOOR_HALF) & (
        np.abs(cross[:, 2]) <= FLOOR_HALF) & (t_star > 0) & (t_star < 1)
    vis_sl = (cos_s_l > 0) & ~blocked
    E_s = np.where(vis_sl, cos_s_l / (r_sl * r_sl), 0.0)  # per-channel x I

    # floor -> wall transport, chunked over floor points
    npnt = p.shape[0]
    steady_w = np.zeros(npnt)  # scalar geometric part (per-channel later)
    tr_w = np.zeros((npnt, B2_NBINS))
    opl_in = r_sl  # |s - L|
    for lo in range(0, npnt, 128):
        hi = min(lo + 128, npnt)
        w = s[None, :, :] - p[lo:hi, None, :]  # (n, G, 3)
        r2 = np.sum(w * w, axis=-1)
        r = np.sqrt(r2)
        cos_p = w[:, :, 1] / r  # floor normal +y
        cos_s = -w[:, :, 2] / r  # wall normal +z, direction wall -> floor
        geomv = np.where((cos_p > 0) & (cos_s > 0),
                         cos_p * cos_s / r2, 0.0) * E_s[None, :] * dA
        steady_w[lo:hi] = geomv.sum(axis=-1)
        opl = cam_dist[lo:hi, None] + r + opl_in[None, :]
        b = np.floor((opl - B2_START) / B2_BINW).astype(np.int64)
        ok = (b >= 0) & (b < B2_NBINS)
        flat = (np.arange(hi - lo)[:, None] * B2_NBINS
                + np.clip(b, 0, B2_NBINS - 1))
        tr_w[lo:hi] = np.bincount(
            flat[ok], weights=geomv[ok],
            minlength=(hi - lo) * B2_NBINS).reshape(hi - lo, B2_NBINS)

    col = (RHO / np.pi) * (WALL_RHO / np.pi) * PL_I  # (3,)
    steady = (steady_w[:, None] * col[None, :]).reshape(
        H, W, jit_k, jit_k, 3).mean(axis=(2, 3))
    transient = (tr_w[:, :, None] * col[None, None, :]).reshape(
        H, W, jit_k, jit_k, B2_NBINS, 3).mean(axis=(2, 3))
    return steady, transient


@pytest.fixture(scope="module")
def rendered_two_bounce():
    scene = mitr.load_dict(two_bounce_scene())
    steady, transient = mitr.render(scene, spp=4096, seed=5)
    return np.asarray(steady, np.float64), np.asarray(transient, np.float64)


def test_two_bounce_steady_radiometry(rendered_two_bounce):
    """Depth-3 absolute radiometry vs independent float64 quadrature —
    locks the recursive estimator (BSDF-sampled continuation pdf, second
    NEE, throughput chaining), not just the direct term."""
    steady, _ = rendered_two_bounce
    ref, _reft = _quad_two_bounce()
    assert ref.min() > 0
    assert np.abs(steady.mean() / ref.mean() - 1.0) < 1e-2
    rel = np.abs(steady - ref) / ref
    # per-pixel MC noise at 4096 spp for a one-bounce-sampled quantity is
    # larger than the direct case; 10% per pixel, 1% in aggregate
    assert np.median(rel) < 5e-2
    assert rel.max() < 2e-1


def test_two_bounce_transient_bins(rendered_two_bounce):
    """Per-bin two-bounce transient vs the oracle: validates OPL summation
    across TWO path segments plus the laser-like delta third segment."""
    _, transient = rendered_two_bounce
    ref_s, ref_t = _quad_two_bounce()
    np.testing.assert_allclose(ref_t.sum(axis=2), ref_s, rtol=1e-9)
    prof = transient.mean(axis=(0, 1))
    ref_prof = ref_t.mean(axis=(0, 1))
    peak = ref_prof.max()
    empty = ref_prof < 1e-12
    assert prof[empty].max(initial=0.0) < 2e-3 * peak
    sig = ref_prof > 0.05 * peak
    rel = np.abs(prof[sig] - ref_prof[sig]) / ref_prof[sig]
    assert np.median(rel) < 5e-2
    assert rel.max() < 2e-1
    assert np.abs(prof.sum() / ref_prof.sum() - 1.0) < 1e-2
