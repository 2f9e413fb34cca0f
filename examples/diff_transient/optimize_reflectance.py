"""Differentiable transient rendering: recover a wall albedo by gradient
descent on the transient video.

Mirrors the reference's `diff-transient` suite (backward-mode autodiff,
examples/README.md: "gradient-based optimization with a transient signal"):
render a target transient with the true Cornell-box colors, perturb the
white wall's reflectance, then recover it by Adam on the L2 transient loss
using ``render_backward`` (PRB two-sweep replay, integrators/prb.py).

    python examples/diff_transient/optimize_reflectance.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import optax

from common import example_args

import mitransient_tpu as mitr


def main():
    args = example_args("optimize_reflectance", __doc__)
    res, bins, spp, iters, lr = ((16, 48, 32, 16, 0.1) if args.quick
                                 else (64, 200, 256, 60, 5e-2))
    spp = args.spp or spp

    d = mitr.cornell_box()
    d["sensor"]["film"]["width"] = res
    d["sensor"]["film"]["height"] = res
    d["sensor"]["film"]["temporal_bins"] = bins
    # full-coverage time window: the loss must see the multi-bounce tail
    # (which carries the reflectance signal), not just direct light
    d["sensor"]["film"]["start_opl"] = 0.0
    d["sensor"]["film"]["bin_width_opl"] = 8.0 / bins
    d["integrator"]["max_depth"] = 4
    scene = mitr.load_dict(d)
    path = "white.reflectance.value"
    params = mitr.traverse(scene)
    true_val = np.asarray(params[path]).copy()

    # target transient at the true parameters.  Quick mode uses one fixed
    # seed throughout: the loss is then a deterministic function of theta
    # and Adam converges exactly despite the tiny spp; the full config
    # varies seeds per iteration (stochastic gradient descent proper).
    target_seed = 0 if args.quick else 7
    _s, target = mitr.render(scene, spp=spp, seed=target_seed)
    target = np.asarray(target)

    # perturb and optimize back
    params[path] = np.array([0.15, 0.6, 0.25], np.float32)
    params.update()
    opt = optax.adam(lr)
    theta = np.asarray(params[path]).astype(np.float32)
    opt_state = opt.init(theta)

    for it in range(iters):
        seed = 0 if args.quick else it
        params[path] = theta
        params.update()
        _s, img = mitr.render(scene, spp=spp, seed=seed, regenerate=False)
        img = np.asarray(img)
        # d(L2)/d(transient) = 2 (img - target); feed as adjoint
        grad_in = (2.0 / target.size) * (img - target)
        grads = mitr.render_backward(scene, (None, grad_in.astype(np.float32)),
                                     spp=spp, seed=seed)
        g = np.asarray(grads[path])
        updates, opt_state = opt.update(g, opt_state)
        theta = np.clip(theta + np.asarray(updates), 0.0, 1.0)
        loss = float(((img - target) ** 2).mean())
        err = float(np.abs(theta - true_val).max())
        print(f"iter {it:3d}  loss {loss:.3e}  max|theta-true| {err:.4f}")

    tol = 0.25 if args.quick else 0.1  # quick mode runs few, large steps
    assert err < tol, f"optimization did not converge: {theta} vs {true_val}"
    print("recovered", theta, "true", true_val)
    with open(os.path.join(args.out, "result.txt"), "w") as f:
        f.write(f"recovered {theta.tolist()} true {true_val.tolist()}\n")


if __name__ == "__main__":
    main()
