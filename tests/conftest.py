"""Test configuration: force an 8-virtual-device CPU platform so mesh /
sharding tests run without TPUs (SURVEY.md §4 item (d))."""

import os

# NOTE: this image's sitecustomize pins JAX_PLATFORMS=axon (real TPU via a
# tunnel). JAX_PLATFORM_NAME alone does NOT reliably win over an explicit
# JAX_PLATFORMS (observed: tests silently ran on the axon TPU with bf16
# matmuls, minutes-long remote compiles and ~1% numeric drift) — override
# JAX_PLATFORMS itself and skip the axon pool handshake too, so a bare
# `python -m pytest tests/` behaves like scripts/test.sh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys  # noqa: E402

if "jax" in sys.modules:
    # When PALLAS_AXON_POOL_IPS is set in the ambient env, sitecustomize has
    # ALREADY imported jax (axon.register registers the PJRT plugin at
    # interpreter startup), so jax captured JAX_PLATFORMS=axon before the
    # env overrides above — tests then silently run on the TPU (bf16 drift,
    # minutes-long remote compiles). Backends are still uninitialized at
    # conftest time, so flipping the jax config directly wins.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
