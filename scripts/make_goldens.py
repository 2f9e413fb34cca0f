"""Regenerate the committed golden outputs for tests/test_golden.py.

Run from the repo root:  python scripts/make_goldens.py [name ...]

Only run this when an *intentional* estimator change invalidates the old
goldens, and only after tests/test_oracle.py passes — the oracle proves the
new output correct, the goldens then lock it.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# same deterministic platform as the test harness (tests/conftest.py)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from golden_configs import WORKLOADS  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main():
    names = sys.argv[1:] or sorted(WORKLOADS)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names:
        out = WORKLOADS[name]()
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, **{k: np.asarray(v).astype(np.float32)
                                     for k, v in out.items()})
        sizes = {k: v.shape for k, v in out.items()}
        print(f"wrote {path}  {sizes}")


if __name__ == "__main__":
    main()
