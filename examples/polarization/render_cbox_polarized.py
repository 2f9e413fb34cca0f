"""Time-resolved polarization: Cornell box with a gold GGX box, rendered in
the ``mono_polarized`` variant, with Stokes-vector visualization.

Mirrors `polarization/render_cbox_polarized_and_visualization.ipynb` (and
its steady sibling): the canonical polarized cbox config is a gold
roughconductor (reference polarization/cornell-box/cbox_polarized.xml:52-56,
Au GGX alpha 0.3).  The render returns 4 packed Stokes channels
(I, Q, U, V); we derive DoP / DoLP / DoCP / AoLP false-color maps
(reference polarized_visualization.py).

    python examples/polarization/render_cbox_polarized.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

from common import example_args, save_image

import mitransient_tpu as mitr


def main():
    args = example_args("cbox_polarized", __doc__)
    res, bins, spp = (24, 64, 32) if args.quick else (256, 400, 4096)
    spp = args.spp or spp

    old = mitr.variant()
    mitr.set_variant("mono_polarized")
    try:
        d = mitr.cornell_box()
        d["sensor"]["film"]["width"] = res
        d["sensor"]["film"]["height"] = res
        d["sensor"]["film"]["temporal_bins"] = bins
        d["integrator"]["max_depth"] = 5
        # gold GGX box (cbox_polarized.xml:52-56)
        d["small-box"]["bsdf"] = {"type": "roughconductor", "material": "Au",
                                  "distribution": "ggx", "alpha": 0.3}
        scene = mitr.load_dict(d)

        steady, transient = mitr.render(scene, spp=spp, seed=0)
        steady = np.asarray(steady)      # (H, W, 4) Stokes
        transient = np.asarray(transient)  # (H, W, T, 4)
        print(f"steady {steady.shape}  transient {transient.shape}")

        # intensity + polarization false-color maps
        save_image(os.path.join(args.out, "intensity.png"), steady[..., :1])
        for mode in ("dop", "aolp", "top", "chirality"):
            img = mitr.vis_polarized.polarization_generate_false_color(
                steady, mode=mode)
            save_image(os.path.join(args.out, f"{mode}.png"),
                       np.asarray(img), gamma=1.0)

        # polarized transient video: 8-panel Stokes animation
        if not args.quick:
            frames = mitr.vis_polarized.tonemap_transient(transient)
            mitr.vis.save_video(np.asarray(frames),
                                os.path.join(args.out, "stokes.mp4"))
        print("wrote", args.out)
    finally:
        mitr.set_variant(old)


if __name__ == "__main__":
    main()
