"""Unit tests for the batched flexible GMRES solver."""

import numpy as np
import jax.numpy as jnp

from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.solvers import fgmres


def dense_pair_matvec(A):
    Ap = cplx.from_complex(np.asarray(A, dtype=complex))
    return lambda v: cplx.matmul_right(v, Ap)


def test_small_dense_system():
    rng = np.random.default_rng(0)
    n, B = 40, 3
    # strong diagonal dominance: restarted GMRES(20) must converge quickly
    # (a mildly shifted dense random matrix stagnates under restarts -- that is
    # genuine GMRES behavior, verified against a NumPy reference implementation)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)) + 25 * np.eye(n)
    b = rng.standard_normal((B, n)) + 1j * rng.standard_normal((B, n))
    res = fgmres(dense_pair_matvec(A), cplx.from_complex(b), tol=1e-10, restart=20, max_restarts=10)
    x = cplx.to_complex(res.x)
    relres = np.linalg.norm(b - x @ A.T, axis=1) / np.linalg.norm(b, axis=1)
    assert (relres < 1e-9).all()
    assert (np.asarray(res.resnorm) / np.asarray(res.bnorm) < 1e-9).all()


def test_dirac_16(op16):
    op, A = op16
    pop = pair_operator(op)
    rng = np.random.default_rng(1)
    b = rng.standard_normal((2, op.n)) + 1j * rng.standard_normal((2, op.n))
    res = fgmres(pop.matvec, cplx.from_complex(b), tol=1e-8, restart=60, max_restarts=40)
    x = cplx.to_complex(res.x)
    relres = np.linalg.norm(b.T - A @ x.T, axis=0) / np.linalg.norm(b, axis=1)
    assert (relres < 1e-8).all(), relres
    # iteration counts are per-row and positive
    assert (np.asarray(res.iters) > 0).all()


def test_right_preconditioner_identity_equivalence():
    rng = np.random.default_rng(2)
    n = 30
    A = rng.standard_normal((n, n)) + 20 * np.eye(n)
    b = cplx.from_complex(rng.standard_normal((1, n)) + 0j)
    mv = dense_pair_matvec(A)
    r1 = fgmres(mv, b, tol=1e-12, restart=15, max_restarts=8)
    # a fixed (linear) preconditioner: diagonal scaling
    dp = cplx.from_complex(1.0 / np.diag(A) + 0j)
    r2 = fgmres(mv, b, tol=1e-12, restart=15, max_restarts=8,
                precond=lambda v: cplx.cmul(dp, v))
    np.testing.assert_allclose(cplx.to_complex(r1.x), cplx.to_complex(r2.x), rtol=1e-8, atol=1e-10)


def test_single_vector_api():
    rng = np.random.default_rng(3)
    n = 16
    A = rng.standard_normal((n, n)) + 4 * np.eye(n)
    b = rng.standard_normal(n) + 0j
    res = fgmres(dense_pair_matvec(A), cplx.from_complex(b), tol=1e-10, restart=16, max_restarts=4)
    assert res.x.re.shape == (n,)
    np.testing.assert_allclose(cplx.to_complex(res.x) @ A.T, b, rtol=1e-8, atol=1e-9)


def test_zero_rhs():
    n = 12
    b = cplx.from_complex(np.zeros((2, n), complex))
    res = fgmres(dense_pair_matvec(np.eye(n)), b, tol=1e-10)
    assert np.allclose(cplx.to_complex(res.x), 0.0)


def test_stagnation_stops_restarts():
    """A tol below the attainable floor must not burn max_restarts: the
    restart loop stops when a full cycle stops improving active rows."""
    import numpy as np
    from deflatedmlmc_schwinger_tpu.ops import cplx
    from deflatedmlmc_schwinger_tpu.solvers.fgmres import fgmres

    rng = np.random.default_rng(2)
    n = 48
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    # singular operator: exact solve impossible to 1e-30
    A[:, 0] = A[:, 1]
    Ap = cplx.from_complex(A + 0j)
    b = cplx.from_complex(rng.standard_normal((2, n)) + 0j)
    res = fgmres(lambda v: cplx.matmul_right(v, Ap), b, tol=1e-30,
                 restart=8, max_restarts=50)
    assert int(res.cycles) < 50
