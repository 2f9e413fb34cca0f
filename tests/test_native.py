"""Native (C++) runtime component tests: OBJ parser and BVH builder agree
with their Python reference implementations."""
import os
import tempfile

import numpy as np
import pytest

from mitransient_tpu import native
from mitransient_tpu.scene.shapes import load_obj


def _random_obj(path, n=50, seed=0):
    rng = np.random.default_rng(seed)
    verts = rng.normal(size=(n, 3))
    faces = rng.integers(0, n, size=(n * 2, 3))
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for fc in faces:
            f.write(f"f {fc[0]+1} {fc[1]+1} {fc[2]+1}\n")
    return verts, faces


def test_native_library_builds():
    assert native.available(), "g++ toolchain should build libmitr_native.so"


def test_native_obj_matches_python_loader():
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.obj")
        _random_obj(path)
        res = native.load_obj_native(path)
        assert res is not None
        verts_n, faces_n = res
        verts_p, faces_p, _uv = load_obj(path)
        assert np.allclose(verts_n, verts_p.astype(np.float32), atol=1e-6)
        assert np.array_equal(faces_n, faces_p)


def test_native_obj_quads_and_negative_indices():
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "q.obj")
        with open(path, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
            f.write("f 1 2 3 4\n")      # quad -> 2 tris
            f.write("f -4 -3 -2\n")     # negative indices
        res = native.load_obj_native(path)
        assert res is not None
        verts, faces = res
        verts_p, faces_p, _ = load_obj(path)
        assert faces.shape == (3, 3)
        assert np.array_equal(faces, faces_p)


def _bvh_invariants(bvh, v0, e1, e2):
    m = v0.shape[0]
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    tmin = pts.min(axis=1)
    tmax = pts.max(axis=1)
    n = bvh["bbox_min"].shape[0]
    assert n <= 2 * m
    assert sorted(bvh["prim_order"].tolist()) == list(range(m))
    total = 0
    for i in range(n):
        if bvh["left"][i] == -1:  # leaf
            off, cnt = int(bvh["right"][i]), int(bvh["count"][i])
            total += cnt
            prims = bvh["prim_order"][off : off + cnt]
            assert np.all(tmin[prims] >= bvh["bbox_min"][i] - 1e-5)
            assert np.all(tmax[prims] <= bvh["bbox_max"][i] + 1e-5)
        else:
            l, r = int(bvh["left"][i]), int(bvh["right"][i])
            for ch in (l, r):
                assert 0 <= ch < n
                assert np.all(bvh["bbox_min"][ch] >= bvh["bbox_min"][i] - 1e-5)
                assert np.all(bvh["bbox_max"][ch] <= bvh["bbox_max"][i] + 1e-5)
    assert total == m


def test_bvh_native_and_python_invariants():
    rng = np.random.default_rng(1)
    m = 200
    v0 = rng.normal(size=(m, 3)).astype(np.float32)
    e1 = rng.normal(size=(m, 3)).astype(np.float32) * 0.1
    e2 = rng.normal(size=(m, 3)).astype(np.float32) * 0.1
    bvh_n = native.build_bvh(v0, e1, e2, leaf_size=4)
    _bvh_invariants(bvh_n, v0, e1, e2)
    bvh_p = native._build_bvh_py(v0, e1, e2, leaf_size=4)
    _bvh_invariants(bvh_p, v0, e1, e2)
