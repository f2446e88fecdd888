"""Test harness: run everything on an 8-device virtual CPU mesh.

This is the TPU-world answer to the reference's 8-GPU CI cluster
(SURVEY §4): `xla_force_host_platform_device_count=8` gives real SPMD
semantics (collectives, sharding) with no hardware. Set
PASSL_TPU_TEST_PLATFORM=tpu to run on a real chip instead.
"""
import os

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

import jax  # noqa: E402

if os.environ.get("PASSL_TPU_TEST_PLATFORM", "cpu") == "cpu":
    # The axon sitecustomize force-sets jax_platforms; override back.
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_xla_executables():
    """Drop compiled XLA executables between test modules.

    One pytest process over the full tier used to accumulate hundreds
    of CPU executables and abort with a fatal XLA runtime error at
    ~75% (8 GB host). Clearing per module bounds live executables to
    one module's worth at the cost of a few cross-module recompiles,
    letting plain `pytest tests/` complete (run_full.sh sharding is no
    longer required, just faster on repeat runs)."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def mesh():
    from passl_tpu import distributed as dist

    return dist.init_dist_env()


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
