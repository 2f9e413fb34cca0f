"""Frequency-space (phasor-field) rendering of the Cornell box.

Mirrors `transient/3-frequency_space_rendering.ipynb`: swap the transient
film for a ``phasor_hdr_film`` (Morlet-windowed on-the-fly DFT, reference
films/phasor_hdr_film.py) and visualize amplitude + phase per frequency.
The phasor film is monochromatic-only, like the reference.

    python examples/transient/frequency_space_rendering.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

from common import example_args, save_image

import mitransient_tpu as mitr
from mitransient_tpu.film.phasor_film import phasor_frequencies


def main():
    args = example_args("frequency_space", __doc__)
    res, bins, spp = (24, 512, 16) if args.quick else (200, 4000, 128)
    spp = args.spp or spp

    old = mitr.variant()
    mitr.set_variant("mono")
    try:
        d = mitr.cornell_box()
        d["sensor"]["film"] = {
            "type": "phasor_hdr_film",
            "width": res, "height": res,
            "temporal_bins": bins,
            "bin_width_opl": d["sensor"]["film"]["bin_width_opl"],
            "start_opl": d["sensor"]["film"]["start_opl"],
            # Morlet wavelet parameters (cbox_diffuse_freq.xml:2-43)
            "wl_mean": 2.0, "wl_sigma": 2.0,
        }
        scene = mitr.load_dict(d)
        freqs = phasor_frequencies(scene.sensors[0].film)
        print(f"{len(freqs)} frequencies in the Morlet ±3σ band:", freqs)

        steady, phasors = mitr.render(scene, spp=spp, seed=0)
        phasors = np.asarray(phasors)  # (H, W, F, 2) re/im
        amp = np.hypot(phasors[..., 0], phasors[..., 1])
        phase = np.arctan2(phasors[..., 1], phasors[..., 0])

        k = len(freqs) // 2
        save_image(os.path.join(args.out, "steady.png"), np.asarray(steady))
        save_image(os.path.join(args.out, f"amplitude_f{k}.png"), amp[..., k])
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.imsave(os.path.join(args.out, f"phase_f{k}.png"),
                   phase[..., k], cmap="twilight")
        print("wrote", args.out)
    finally:
        mitr.set_variant(old)


if __name__ == "__main__":
    main()
