"""Complex NLOS scene: the reference's Z-in-a-room XML, loaded directly.

Mirrors `transient-nlos/2-complex-nlos-scenes.ipynb`: instead of building
the setup from Python dicts, import the reference's full scene description
(`nlos-z-room.xml`, 32x32 scan, canonical spp 250,000) through the XML
loader and render it.  Requires the reference example corpus on disk; pass
``--scene`` to point elsewhere.

    python examples/transient_nlos/complex_nlos_scenes.py [--quick]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

from common import save_image

import mitransient_tpu as mitr

DEFAULT_SCENE = "/root/reference/examples/transient-nlos/nlos-z-room.xml"


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--scene", default=DEFAULT_SCENE)
    p.add_argument("--spp", type=int, default=None)
    p.add_argument("--out", default=os.path.join("examples", "out",
                                                 "complex_nlos"))
    args = p.parse_args()
    if not os.path.exists(args.scene):
        print(f"scene {args.scene} not found — pass --scene", file=sys.stderr)
        return 1
    os.makedirs(args.out, exist_ok=True)

    spp = args.spp or (256 if args.quick else 250_000)
    scene = mitr.load_file(args.scene)
    cfg = scene.sensors[0].film
    print(f"scan {cfg.width}x{cfg.height}, {cfg.temporal_bins} bins")
    # aim the laser at the scan center when the scene uses a capture meter;
    # the z-room variant observes through a perspective sensor and aims its
    # projector in the XML (the integrator intersects the laser axis itself,
    # reference transientnlospath.py:328-336)
    if any(s.kind == "nlos_capture_meter" for s in scene.sensors):
        mitr.nlos.focus_emitter_at_relay_wall_pixel(
            [cfg.width / 2, cfg.height / 2], scene)

    _s, transient = mitr.render(scene, spp=spp, seed=0)
    tr = np.asarray(transient)
    print(f"transient {tr.shape}, energy {tr.sum():.4f}")
    save_image(os.path.join(args.out, "integrated.png"), tr.sum(axis=2))
    np.save(os.path.join(args.out, "transient.npy"), tr)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    rc = main()
    if rc:
        sys.exit(rc)
