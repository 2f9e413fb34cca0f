"""Minimal repro hunt for the XLA:CPU many-live-executables segfault.

Round 3 observed `pytest tests/` segfaulting reproducibly at ~95% of the
run; holding hundreds of distinct compiled XLA:CPU executables live in one
process was the suspected cause, and tests/conftest.py works around it by
calling jax.clear_caches() between test modules.

This script compiles N DISTINCT loop-containing programs (distinct static
shapes force distinct executables), runs each once, and keeps them alive.
Usage:  python scripts/repro_xla_cpu_segfault.py [N=1500] [mode=loops]

Run under a separate process (it may crash by design); the exit code and
the last printed count localize the failure.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def program(i, mode):
    n = 8 + i  # distinct shape -> distinct executable
    if mode == "loops":
        def f(x):
            def body(j, a):
                return a * 1.000001 + jnp.sin(a) * 0.001
            return jax.lax.fori_loop(0, 4, body, x).sum()
    else:
        def f(x):
            return jnp.tanh(x * 1.5 + i).sum()
    return jax.jit(f), jnp.ones((n,), jnp.float32)


def main():
    n_prog = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    mode = sys.argv[2] if len(sys.argv) > 2 else "loops"
    live = []
    for i in range(n_prog):
        f, x = program(i, mode)
        float(f(x))
        live.append(f)  # hold the executable
        if (i + 1) % 100 == 0:
            print(f"alive: {i + 1}", flush=True)
    print("completed without crash", flush=True)


if __name__ == "__main__":
    main()
