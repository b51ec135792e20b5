"""Test configuration: run on CPU with 8 virtual devices and float64.

The numerics tests reproduce the reference's all-double behavior (tolerances
down to 1e-10), so x64 is enabled; multi-chip sharding tests use the 8 virtual
CPU devices.  Benchmarks (bench.py) run separately on real TPU in float32.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment may pin JAX_PLATFORMS to a TPU plugin (and a sitecustomize
# imports jax before conftest runs), so env vars are too late here — use the
# config API to force the local CPU backend for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_spd_tensor_field(rng, shape, ndim, lo=1.0, hi=10.0, dtype=np.float64):
    """Random smooth symmetric positive-definite tensor field (*shape, D, D)."""
    n = int(np.prod(shape))
    a = rng.normal(size=(n, ndim, ndim))
    m = np.einsum("nij,nkj->nik", a, a)  # A A^T, PSD
    m += np.eye(ndim) * lo
    scale = rng.uniform(1.0, hi, size=(n, 1, 1))
    return (m * scale).reshape(*shape, ndim, ndim).astype(dtype)


@pytest.fixture
def spd_tensor():
    return make_spd_tensor_field


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound accumulated compiled-executable state: the full suite holds
    ~300 XLA CPU programs by its last third, and the heavy 8-device FMG
    shard_map compiles there have been observed to abort inside
    backend_compile under that load (the same tests pass when run fresh).
    Clearing per module keeps intra-module cache reuse."""
    yield
    jax.clear_caches()
