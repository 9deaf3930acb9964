"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars BEFORE jax is imported anywhere (SURVEY.md §4's
multi-host testing recipe the reference lacks).

The platform is FORCED to cpu (an environment that presets JAX_PLATFORMS
to a TPU backend would silently move the whole suite onto a single real
chip and break every 8-device mesh test). The real-hardware lane is
explicit opt-in:

    CVT_TPU_TEST_PLATFORM=tpu pytest tests/test_pallas.py tests/test_adc_index.py
"""

import os

_platform = os.environ.get("CVT_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
# any other value = hardware lane: leave the environment's accelerator
# platform selection (JAX_PLATFORMS) exactly as the environment set it
# (plugin platform names vary; overriding with a guessed name breaks
# plugin-registered backends)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Environments can import jax BEFORE this conftest via sitecustomize
# (a TPU plugin registered at interpreter startup), in which case the
# JAX_PLATFORMS env write above is too late — jax snapshotted the old
# value at import. Force the platform through the live config too (a
# no-op when the env var path already worked). Without this, the "CPU"
# suite silently runs single-chip on whatever accelerator the
# environment preset, breaking every 8-device mesh test.
if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture()
def rng():
    # function-scoped: a session-scoped shared generator makes every
    # test's data depend on which tests ran before it (order-dependent
    # flakiness); a fresh seeded generator per test is deterministic
    # under any test selection.
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def sift_like():
    """Small synthetic SIFT-like dataset shared across tests."""
    from cvt_tpu.io.datasets import synthetic_sift
    base, queries = synthetic_sift(4096, 128, n_queries=64, seed=0)
    return base, queries
