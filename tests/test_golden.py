"""Golden-regression lock (BASELINE 'allclose' target, regression half).

tests/test_oracle.py proves the estimator's absolute radiometry against an
independent quadrature oracle; this suite *locks* today's verified output so
any future drift — estimator math, RNG streams, binning, variant packing,
gradient replay — fails loudly.  Goldens are committed (tests/goldens/*.npz)
and regenerated deliberately via scripts/make_goldens.py.

All renders run on the deterministic CPU backend (conftest.py), so the
comparison is near-bit-exact; the loose-ish rtol only absorbs cross-version
XLA instruction-reordering noise.
"""
import os

import numpy as np
import pytest

from golden_configs import WORKLOADS

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.mark.parametrize("name", sorted(WORKLOADS))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.fail(
            f"missing golden {path} — run scripts/make_goldens.py and "
            "commit the result")
    golden = np.load(path)
    out = WORKLOADS[name]()
    assert set(out) == set(golden.files)
    for k in sorted(out):
        got, want = out[k], golden[k]
        assert got.shape == want.shape, (name, k, got.shape, want.shape)
        scale = np.abs(want).max() or 1.0
        np.testing.assert_allclose(
            got, want, rtol=5e-4, atol=5e-5 * scale,
            err_msg=f"{name}:{k} drifted from committed golden")
