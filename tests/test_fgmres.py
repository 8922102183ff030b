"""Unit tests for the batched flexible GMRES solver."""

import numpy as np
import jax.numpy as jnp

from deflatedmlmc_schwinger_tpu.solvers import fgmres


def test_small_dense_system():
    rng = np.random.default_rng(0)
    n, B = 40, 3
    # strong diagonal dominance: restarted GMRES(20) must converge quickly
    # (a mildly shifted dense random matrix stagnates under restarts -- that is
    # genuine GMRES behavior, verified against a NumPy reference implementation)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)) + 25 * np.eye(n)
    b = rng.standard_normal((B, n)) + 1j * rng.standard_normal((B, n))
    Aj = jnp.asarray(A)
    res = fgmres(lambda v: v @ Aj.T, jnp.asarray(b), tol=1e-10, restart=20, max_restarts=10)
    x = np.asarray(res.x)
    relres = np.linalg.norm(b - x @ A.T, axis=1) / np.linalg.norm(b, axis=1)
    assert (relres < 1e-9).all()
    assert (np.asarray(res.resnorm) / np.asarray(res.bnorm) < 1e-9).all()


def test_dirac_16(op16):
    op, A = op16
    rng = np.random.default_rng(1)
    b = rng.standard_normal((2, op.n)) + 1j * rng.standard_normal((2, op.n))
    res = fgmres(op.matvec, jnp.asarray(b), tol=1e-8, restart=60, max_restarts=40)
    x = np.asarray(res.x)
    relres = np.linalg.norm(b.T - A @ x.T, axis=0) / np.linalg.norm(b, axis=1)
    assert (relres < 1e-8).all(), relres
    # iteration counts are per-row and positive
    assert (np.asarray(res.iters) > 0).all()


def test_right_preconditioner_identity_equivalence():
    rng = np.random.default_rng(2)
    n = 30
    A = rng.standard_normal((n, n)) + 20 * np.eye(n)
    Aj = jnp.asarray(A + 0j)
    b = jnp.asarray(rng.standard_normal((1, n)) + 0j)
    r1 = fgmres(lambda v: v @ Aj.T, b, tol=1e-12, restart=15, max_restarts=8)
    # a fixed (linear) preconditioner: diagonal scaling
    d = jnp.asarray(1.0 / np.diag(A) + 0j)
    r2 = fgmres(
        lambda v: v @ Aj.T, b, tol=1e-12, restart=15, max_restarts=8, precond=lambda v: v * d
    )
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), rtol=1e-8, atol=1e-10)


def test_single_vector_api():
    rng = np.random.default_rng(3)
    n = 16
    A = rng.standard_normal((n, n)) + 4 * np.eye(n)
    Aj = jnp.asarray(A + 0j)
    b = jnp.asarray(rng.standard_normal(n) + 0j)
    res = fgmres(lambda v: v @ Aj.T, b, tol=1e-10, restart=16, max_restarts=4)
    assert res.x.shape == (n,)
    np.testing.assert_allclose(np.asarray(res.x) @ A.T, np.asarray(b), rtol=1e-8, atol=1e-9)


def test_zero_rhs():
    n = 12
    Aj = jnp.eye(n, dtype=jnp.complex128)
    b = jnp.zeros((2, n), jnp.complex128)
    res = fgmres(lambda v: v @ Aj.T, b, tol=1e-10)
    assert np.allclose(np.asarray(res.x), 0.0)
