"""Rainbow visualization: color-code the transient by time of arrival.

Mirrors `transient/4-rainbow_visualization.ipynb`: collapse the transient
volume to a single image whose hue encodes each pixel's (modulo-wrapped)
arrival time, exposing light "wavefronts" sweeping the scene.

    python examples/transient/rainbow_visualization.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

from common import example_args, save_image

import mitransient_tpu as mitr


def main():
    args = example_args("rainbow", __doc__)
    res, bins, spp = (32, 64, 16) if args.quick else (256, 300, 512)
    spp = args.spp or spp

    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = res
    d["sensor"]["film"]["height"] = res
    d["sensor"]["film"]["temporal_bins"] = bins
    scene = mitr.load_dict(d)

    _steady, transient = mitr.render(scene, spp=spp, seed=0)
    transient = np.asarray(transient)

    rainbow = mitr.vis.rainbow_visualization(transient)
    save_image(os.path.join(args.out, "rainbow.png"), np.asarray(rainbow),
               gamma=1.0)
    # modulo wrap: repeat the hue cycle every `bins // 4` bins to highlight
    # successive wavefronts
    wrapped = mitr.vis.rainbow_visualization(transient, modulo=bins // 4)
    save_image(os.path.join(args.out, "rainbow_modulo.png"),
               np.asarray(wrapped), gamma=1.0)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
