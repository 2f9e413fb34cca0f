"""Polarized NLOS: time-resolved Stokes capture of a hidden target behind a
gold relay wall.

Mirrors `polarization/transient_nlos_polarization.ipynb` (canonical config:
64x64 scan, spp 65,536, gold GGX wall + hidden Z — BASELINE.md row 8): the
NLOS capture in the ``mono_polarized`` variant returns 4 Stokes channels
per scan point and time bin; specular wall bounces imprint linear
polarization the diffuse case lacks.

    python examples/polarization/transient_nlos_polarization.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

from common import example_args, save_image

import mitransient_tpu as mitr

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "transient_nlos"))
from simple_nlos_scenes import nlos_scene  # noqa: E402


def main():
    args = example_args("nlos_polarization", __doc__)
    sx, bins, spp = (8, 200, 64) if args.quick else (64, 300, 65_536)
    spp = args.spp or spp

    old = mitr.variant()
    mitr.set_variant("mono_polarized")
    try:
        d = nlos_scene(sx, sx, bins)
        # gold GGX relay wall (transient_nlos_polarization.ipynb scene cell)
        d["relay_wall"]["bsdf"] = {"type": "roughconductor",
                                   "material": "Au", "distribution": "ggx",
                                   "alpha": 0.3}
        scene = mitr.load_dict(d)
        mitr.nlos.focus_emitter_at_relay_wall_pixel([sx / 2, sx / 2], scene)

        _s, transient = mitr.render(scene, spp=spp, seed=0)
        tr = np.asarray(transient)  # (sy, sx, T, 4) Stokes
        print(f"transient {tr.shape}, energy {tr[..., 0].sum():.4f}")

        integ = tr.sum(axis=2)  # (sy, sx, 4) time-integrated Stokes
        save_image(os.path.join(args.out, "intensity.png"), integ[..., :1])
        aolp = mitr.vis_polarized.polarization_generate_false_color(
            integ, mode="aolp")
        save_image(os.path.join(args.out, "aolp.png"), np.asarray(aolp),
                   gamma=1.0)
        print("wrote", args.out)
    finally:
        mitr.set_variant(old)


if __name__ == "__main__":
    main()
