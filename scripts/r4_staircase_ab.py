"""A/B the BVH traversal mode on the staircase (262k tris) end-to-end.
Run alone (one TPU process): python scripts/r4_staircase_ab.py
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def warm():
    t0 = time.time()
    jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
        jnp.ones((128,))).block_until_ready()
    print(f"# warm {time.time()-t0:.1f}s", flush=True)


def sync(*xs):
    return sum(float(jnp.sum(x)) for x in xs)


def main():
    warm()
    import mitransient_tpu as mitr
    from mitransient_tpu.ops import bvh_pallas

    scene = mitr.load_file(
        "/root/reference/examples/diff-transient/staircase/scene.xml",
        resx=256, resy=256, max_depth=6)
    spp = 8
    for mode in (sys.argv[1:] or ["super", "chunk"]):
        bvh_pallas.BVH_MODE = mode
        jax.clear_caches()
        t0 = time.time()
        s, t, st = mitr.render(scene, spp=spp, seed=0, return_stats=True)
        sync(s, t)
        print(f"# {mode} compile+first {time.time()-t0:.1f}s", flush=True)
        best = None
        for rep in range(2):
            t0 = time.perf_counter()
            s, t, st = mitr.render(scene, spp=spp, seed=1 + rep,
                                   return_stats=True)
            sync(s, t)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({
            "metric": f"staircase_{mode}",
            "rays_per_sec": float(st["rays"]) / best,
            "wall_s": best, "rays": float(st["rays"]),
            "checksum": float(jnp.sum(t)),
        }), flush=True)


if __name__ == "__main__":
    main()
