"""Shared helpers for the example scripts.

Every example accepts ``--quick`` (tiny config, seconds on CPU — used by
tests/test_examples.py) and ``--out DIR`` (where figures/videos land,
default ``examples/out/<script>``).  Mirrors the reference's notebook corpus
(/root/reference/examples/README.md) as runnable scripts.
"""
from __future__ import annotations

import argparse
import os
import sys

# allow `python examples/<suite>/<script>.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def example_args(name: str, description: str) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--quick", action="store_true",
                   help="tiny configuration (CI-time, CPU-friendly)")
    p.add_argument("--out", default=os.path.join("examples", "out", name),
                   help="output directory for figures/videos")
    p.add_argument("--spp", type=int, default=None,
                   help="override samples per pixel")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    return args


def save_image(path: str, img, gamma: float = 2.2):
    """Tonemap (percentile-normalized, gamma) and save an (H, W, C|1) image."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    scale = np.quantile(img, 0.99)
    out = np.clip((img / max(scale, 1e-9)) ** (1.0 / gamma), 0.0, 1.0)
    plt.imsave(path, out)
    return path
