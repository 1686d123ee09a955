"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere (the JAX analogue of a fake communication backend — the reference's
test suite has no such thing; see SURVEY.md §4).

Note: this image's sitecustomize registers the axon TPU backend at interpreter
start (before conftest), so env vars alone are too late — we also flip
``jax_platforms`` via ``jax.config`` before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_cache_growth():
    """Drop JAX's in-process executable caches between test modules.

    The suite compiles hundreds of XLA:CPU programs (pipeline scans, PAB
    step variants, oracle comparisons); letting them accumulate in one
    process has produced allocator pressure deep into the run (observed: a
    segfault inside a late compile that reproduces clean in isolation).
    Cross-module cache reuse is negligible, so clearing at module teardown
    costs nothing."""
    yield
    jax.clear_caches()
    gc.collect()
