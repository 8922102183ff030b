"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the standard JAX trick for testing
multi-chip sharding without hardware) and with x64 enabled so complex128
matches the SciPy host oracles bit-for-bit in structure.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The image's sitecustomize force-registers the axon TPU backend and latches
# JAX_PLATFORMS=axon before user code runs; the config update below (not the
# env var) is what actually pins tests to the virtual-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from deflatedmlmc_schwinger_tpu.utils import jaxcache

jaxcache.enable()

import numpy as np
import pytest
import scipy.sparse as sp


SCHWINGER16 = "schwinger16.mat"
SCHWINGER128 = "schwinger128.mat"
MASS16 = -1.00690114 * 0.99   # reference: gateway.py:86
MASS128 = -0.1320             # reference: gateway.py:156


@pytest.fixture(scope="session")
def op16():
    from deflatedmlmc_schwinger_tpu.io import load_operator

    return load_operator(SCHWINGER16, MASS16)


@pytest.fixture(scope="session")
def op128():
    from deflatedmlmc_schwinger_tpu.io import load_operator

    return load_operator(SCHWINGER128, MASS128)


@pytest.fixture(scope="session")
def dense16(op16):
    _, A = op16
    return np.asarray(A.todense())


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Reset JAX's in-process executable caches after each test module.

    The unbounded jit cache keeps every compiled executable (and its
    captured hierarchy constants) alive for the whole suite, and letting
    XLA:CPU state accumulate across ~115 tests made a late fgmres
    COMPILATION segfault deterministically (r4; the same test passes alone
    and the host has >100 GB free, so it is toolchain state, not memory).
    Clearing between modules re-pays some per-module compiles but keeps
    each module's compilation environment fresh.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
