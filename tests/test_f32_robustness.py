"""f32 robustness of the factorization backends on ill-conditioned
precisions (VERDICT weak #8): the production TPU path runs f32 with Jacobi
equilibration (supernodal.py module docstring, dense.py) and full-f32 matmul
accumulation (`mxu_f32`, solvers/base.py) — these tests pin that the f32
numerics hold up where the bf16-accumulation default demonstrably fails
(observed NaN logdet on TPU at n≈16k Matérn α=2 before the fix)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_gmrf import MaternModel
from tpu_gmrf.solvers import SolverSpec
from tpu_gmrf.solvers.banded import banded_factorize
from tpu_gmrf.solvers.dense import dense_factorize
from tpu_gmrf.solvers.supernodal import supernodal_factorize
from tpu_gmrf.sparse.matrix import from_dense


def _ill_conditioned_matern(npts=24):
    """2D Matérn α=2 precision — condition grows like h⁻⁴; at f32 this is
    the regime where unequilibrated/bf16 Cholesky breaks down."""
    gx, gy = np.meshgrid(np.linspace(0, 1, npts), np.linspace(0, 1, npts))
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    model = MaternModel(pts, smoothness=1, solver=SolverSpec(kind="supernodal"))
    return model.precision(tau=1.0, range=0.25)


@pytest.mark.parametrize("backend", ["supernodal", "banded", "dense"])
@pytest.mark.slow
def test_f32_illconditioned_factorization(backend):
    Q = _ill_conditioned_matern()
    Q64 = dataclasses.replace(Q, data=jnp.asarray(np.asarray(Q.data), jnp.float64))
    Q32 = dataclasses.replace(Q, data=jnp.asarray(np.asarray(Q.data), jnp.float32))
    if backend == "supernodal":
        f64, f32 = supernodal_factorize(Q64), supernodal_factorize(Q32)
    elif backend == "banded":
        f64, f32 = banded_factorize(Q64), banded_factorize(Q32)
    else:
        f64 = dense_factorize(dataclasses.replace(Q64, data=Q64.data))
        f32 = dense_factorize(Q32)
    ld64, ld32 = float(f64.logdet()), float(f32.logdet())
    assert np.isfinite(ld32), f"{backend} f32 logdet non-finite"
    # logdet ≈ 1.3e5 here; f32 should hold ~5 significant digits
    np.testing.assert_allclose(ld32, ld64, rtol=1e-4)
    # solve consistency: relative residual of an f32 solve stays small
    rng = np.random.default_rng(0)
    b = rng.normal(size=Q.shape[0]).astype(np.float32)
    x32 = np.asarray(f32.solve(jnp.asarray(b)))
    assert np.isfinite(x32).all()
    r = np.asarray(Q64.matvec(jnp.asarray(x32, jnp.float64))) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-3

    # selected-inverse diagonal: positive, finite, and close to f64
    v32 = np.asarray(f32.selinv_diag())
    v64 = np.asarray(f64.selinv_diag())
    assert np.isfinite(v32).all() and (v32 > 0).all()
    np.testing.assert_allclose(v32, v64, rtol=5e-2)


def test_f32_highest_precision_is_traced_in():
    """mxu_f32 must apply at trace time: the jaxpr of a jitted supernodal
    factorization carries HIGHEST-precision dot_generals."""
    Q = _ill_conditioned_matern(10)
    Q32 = dataclasses.replace(Q, data=jnp.asarray(np.asarray(Q.data), jnp.float32))

    def work(data):
        return supernodal_factorize(dataclasses.replace(Q32, data=data)).logdet()

    jaxpr = str(jax.make_jaxpr(work)(Q32.data))
    assert "HIGHEST" in jaxpr.upper() or "precision=" not in jaxpr
