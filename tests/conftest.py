"""Test harness config: force an 8-virtual-device CPU platform so tests are
deterministic, parallel-safe and runnable without TPU hardware (SURVEY.md
section 4 'Implication').

Note: this image registers an 'axon' TPU PJRT plugin from sitecustomize and
pins JAX_PLATFORMS=axon, so plain env vars are not enough — the platform is
overridden through jax.config *before* backends initialize.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Stability: the full suite compiles many hundreds of distinct XLA:CPU
# programs in one process; with all of them held live the process
# segfaults near the end of the run (observed round 3, reproducibly at
# ~95% through `pytest tests/`).  Dropping the in-memory executable caches
# between test modules bounds that accumulation; the on-disk compilation
# cache keeps re-compiles cheap.
#
# Root-cause status (round 4): a minimal repro was attempted —
# scripts/repro_xla_cpu_segfault.py holds 1200 distinct live
# loop-containing XLA:CPU executables in one process and does NOT crash,
# so "many live executables" alone is not the trigger; the crash needs
# something additional this suite does (large donated buffers, Pallas
# interpreter programs, or the AOT-cache loads with mismatched CPU
# features logged by cpu_aot_loader).  The fixture stays until a genuine
# repro isolates it.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
