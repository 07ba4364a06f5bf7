"""Test harness: run everything on a virtual 8-device CPU mesh.

Real multi-chip TPU hardware is not available in CI; sharding paths are
exercised on XLA's host-platform virtual devices instead (the driver
separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

Note: this environment's TPU plugin ("axon", registered by sitecustomize)
ignores the JAX_PLATFORMS *env var*, so the platform is forced through
jax.config after import — that path does take effect.  XLA_FLAGS must still
be set before backend initialisation.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# ALGP_TPU_PERF=1 leaves the real device visible so tests/test_perf.py can
# assert the hardware budget; ALGP_TPU_HW=1 likewise for the on-hardware
# fidelity tests (test_hw_fidelity.py).  Everything else runs on the
# virtual CPU mesh.
if os.environ.get("ALGP_TPU_PERF") != "1" and os.environ.get("ALGP_TPU_HW") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
