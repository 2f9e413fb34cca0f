"""Forward-mode gradients in the time domain.

Mirrors the reference's `diff-transient` forward-AD example
(examples/README.md: "forward inverse rendering (forward-mode autodiff) in
the time domain"): ``render_forward`` propagates a parameter tangent
through the estimator, giving d(transient)/d(theta) as a full (H, W, T, C)
video — visualized with the gradient tonemap (red = positive, blue =
negative, reference unpolarized_visualization.py).

    python examples/diff_transient/forward_time_gradients.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

from common import example_args, save_image

import mitransient_tpu as mitr


def main():
    args = example_args("forward_time_gradients", __doc__)
    res, bins, spp = (16, 48, 32) if args.quick else (128, 300, 512)
    spp = args.spp or spp

    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = res
    d["sensor"]["film"]["height"] = res
    d["sensor"]["film"]["temporal_bins"] = bins
    # full-coverage window so the gradient video includes the indirect tail
    d["sensor"]["film"]["start_opl"] = 0.0
    d["sensor"]["film"]["bin_width_opl"] = 8.0 / bins
    d["integrator"]["max_depth"] = 4
    scene = mitr.load_dict(d)

    # tangent: brighten the green wall uniformly
    v = np.array([1.0, 1.0, 1.0], np.float32)
    ds, dt = mitr.render_forward(scene, {"green.reflectance.value": v},
                                 spp=spp, seed=0)
    ds, dt = np.asarray(ds), np.asarray(dt)
    print(f"d(steady) {ds.shape}  d(transient) {dt.shape}  "
          f"total {dt.sum():.4f}")

    save_image(os.path.join(args.out, "dsteady.png"),
               np.asarray(mitr.vis.tonemap_grad_transient(ds[:, :, None])[
                   :, :, 0]), gamma=1.0)
    frames = mitr.vis.tonemap_grad_transient(dt)
    mitr.vis.save_frames(np.asarray(frames[..., bins // 2:bins // 2 + 3, :]),
                         args.out, prefix="dgrad")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
