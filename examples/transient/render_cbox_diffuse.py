"""First steps: create, render, edit, and visualize a transient Cornell box.

Mirrors the reference's `transient/0-render_cbox_diffuse.ipynb` tutorial
(the entry point of /root/reference/examples/README.md): build the canonical
Cornell box (reference utils.py:78-220), render a ``(steady, transient)``
pair, tonemap + save the steady image and a transient video, then edit the
scene through ``traverse`` (mi.traverse semantics) and re-render.

    python examples/transient/render_cbox_diffuse.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

from common import example_args, save_image

import mitransient_tpu as mitr


def main():
    args = example_args("cbox_diffuse", __doc__)
    res, bins, spp = (32, 64, 16) if args.quick else (256, 300, 1024)
    spp = args.spp or spp

    # --- build the canonical transient Cornell box ------------------------
    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = res
    d["sensor"]["film"]["height"] = res
    d["sensor"]["film"]["temporal_bins"] = bins
    scene = mitr.load_dict(d)

    # --- render (steady, transient) ---------------------------------------
    steady, transient = mitr.render(scene, spp=spp, seed=0)
    steady = np.asarray(steady)
    transient = np.asarray(transient)
    print(f"steady {steady.shape}  transient {transient.shape}  "
          f"energy ratio {transient.sum() / steady.sum():.4f}")

    save_image(os.path.join(args.out, "steady.png"), steady)

    # tonemapped transient frames + video (vis parity:
    # reference unpolarized_visualization.py tonemap_transient / save_video)
    frames = mitr.vis.tonemap_transient(transient)
    mitr.vis.save_frames(frames[..., bins // 2:bins // 2 + 4, :],
                         args.out, prefix="frame")
    if not args.quick:
        mitr.vis.save_video(frames, os.path.join(args.out, "transient.mp4"))

    # --- edit the scene and re-render -------------------------------------
    params = mitr.traverse(scene)
    key = [k for k in params.keys() if "green" in k and "reflectance" in k][0]
    params[key] = [0.1, 0.1, 0.8]  # repaint the green wall blue
    params.update()
    steady2, _ = mitr.render(scene, spp=spp, seed=0)
    save_image(os.path.join(args.out, "steady_edited.png"),
               np.asarray(steady2))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
