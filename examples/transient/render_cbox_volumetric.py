"""Transient volumetric rendering: Cornell box filled with scattering fog.

Mirrors the reference's volumetric transient tutorial (README of
/root/reference/examples: "more advanced tutorials for transient volumetric
rendering"; canonical config diff-transient/cornell-box/cbox_volumetric.xml):
a homogeneous Henyey-Greenstein medium inside the box, rendered with the
``transient_prbvolpath`` integrator.

    python examples/transient/render_cbox_volumetric.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

from common import example_args, save_image

import mitransient_tpu as mitr


def main():
    args = example_args("cbox_volumetric", __doc__)
    res, bins, spp, depth = (24, 64, 16, 8) if args.quick else (128, 400, 512,
                                                               64)
    spp = args.spp or spp

    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = res
    d["sensor"]["film"]["height"] = res
    d["sensor"]["film"]["temporal_bins"] = bins
    d["integrator"] = {"type": "transient_prbvolpath", "max_depth": depth}
    # fog inside the small box (null boundary -> pure medium interface)
    d["small-box"]["bsdf"] = {"type": "null"}
    d["small-box"]["medium"] = {
        "type": "homogeneous",
        "sigma_t": 1.8,
        "albedo": {"type": "rgb", "value": [0.9, 0.9, 0.9]},
        "phase": {"type": "hg", "g": 0.3},
    }
    scene = mitr.load_dict(d)

    steady, transient = mitr.render(scene, spp=spp, seed=0)
    steady = np.asarray(steady)
    transient = np.asarray(transient)
    print(f"steady {steady.shape}  transient {transient.shape}")

    save_image(os.path.join(args.out, "steady.png"), steady)
    frames = mitr.vis.tonemap_transient(transient)
    if not args.quick:
        mitr.vis.save_video(frames, os.path.join(args.out, "transient.mp4"))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
