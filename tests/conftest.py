"""Test configuration: CPU backend with 8 virtual devices (for sharding
tests) and float64 enabled (dense oracles / finite-difference checks need
the headroom; production TPU code paths are dtype-polymorphic and run f32)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The sandbox's sitecustomize imports jax and pins JAX_PLATFORMS=axon before
# conftest runs; override via config (effective because backends init lazily).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def random_sparse_spd(rng, n, density=0.05):
    """Random sparse SPD matrix (diagonally dominant), as in the reference's
    dense-baseline unit tests (test/test_gmrf.jl:64-76)."""
    import scipy.sparse as sp

    A = sp.random(n, n, density=density, random_state=np.random.RandomState(rng.integers(1 << 31)))
    A = A + A.T
    A = A + sp.eye(n) * (np.abs(A).sum(axis=1).max() + 1.0)
    return A.tocsr()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight compile/scale tests — excluded from the smoke tier "
        "(run `pytest -m 'not slow' -n 2` for the CI smoke job — measured "
        "~18 min on 2 loaded cores, r5; the full tier incl. all examples "
        "runs nightly)",
    )
