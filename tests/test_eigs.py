"""Eigensolver tests: CheFSI and subspace iteration vs scipy ARPACK oracles
(residual-norm checked, not bitwise -- SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp

from deflatedmlmc_schwinger_tpu.ops import gamma3
from deflatedmlmc_schwinger_tpu.solvers.eigs import (
    chebyshev_filtered_smallest,
    inverse_iteration_smallest,
    subspace_iteration_largest,
)


def test_chefsi_smallest_Q(op16):
    op, A = op16
    mvQ = lambda v: gamma3(op.matvec(v))
    res = chebyshev_filtered_smallest(
        mvQ, op.n, 4, dtype=jnp.complex128, key=jax.random.key(0), degree=150, rounds=10
    )
    from scipy.sparse.linalg import eigsh

    half = A.shape[0] // 2
    Q = A.tolil(copy=True)
    Q[half:, :] = -Q[half:, :]
    ev = eigsh(Q.tocsc(), k=4, sigma=0, which="LM", return_eigenvectors=False)
    np.testing.assert_allclose(
        np.sort(np.abs(np.asarray(res.values))), np.sort(np.abs(ev)), rtol=1e-4
    )
    assert (np.asarray(res.resnorms) < 1e-3).all()


def test_subspace_iteration_largest_dense():
    rng = np.random.default_rng(0)
    n = 60
    M = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (M + M.conj().T) / 2
    Hj = jnp.asarray(H)
    res = subspace_iteration_largest(
        lambda v: v @ Hj.T, n, 4, dtype=jnp.complex128, key=jax.random.key(1), rounds=40
    )
    ev = np.linalg.eigvalsh(H)
    want = np.sort(np.abs(ev))[-4:]
    np.testing.assert_allclose(np.sort(np.abs(np.asarray(res.values))), want, rtol=1e-4)


def test_inverse_iteration_smallest_dense():
    rng = np.random.default_rng(2)
    n = 50
    M = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (M + M.conj().T) / 2 + 0.1 * np.eye(n)
    Hinv = np.linalg.inv(H)
    Hj, Hinvj = jnp.asarray(H), jnp.asarray(Hinv)
    res = inverse_iteration_smallest(
        lambda v: v @ Hj.T,
        lambda v: v @ Hinvj.T,
        n,
        3,
        dtype=jnp.complex128,
        key=jax.random.key(3),
        rounds=15,
    )
    ev = np.linalg.eigvalsh(H)
    want = np.sort(np.abs(ev))[:3]
    np.testing.assert_allclose(np.sort(np.abs(np.asarray(res.values))), want, rtol=1e-8)
    assert (np.asarray(res.resnorms) < 1e-6).all()
