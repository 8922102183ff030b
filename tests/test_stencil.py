"""Unit tests: stencil extraction and the stencil matvec vs the CSR oracle.

Survey test strategy (SURVEY.md section 4): "Pallas stencil matvec vs
scipy.sparse CSR matvec on the loaded .mat (exact row-by-row agreement, both
lattices); gamma3-Hermiticity of Q".
"""

import numpy as np
import jax.numpy as jnp

from deflatedmlmc_schwinger_tpu.io import csr_from_stencil
from deflatedmlmc_schwinger_tpu.ops import gamma3, shift_rows_down, shift_rows_up


def test_stencil_roundtrip_16(op16):
    op, A = op16
    A2 = csr_from_stencil(np.asarray(op.coeffs))
    assert (A - A2).nnz == 0 or abs(A - A2).max() == 0.0


def test_stencil_roundtrip_128(op128):
    op, A = op128
    A2 = csr_from_stencil(np.asarray(op.coeffs))
    diff = abs(A - A2)
    assert diff.max() == 0.0


def _check_matvec(op, A, batch):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, A.shape[0])) + 1j * rng.standard_normal((batch, A.shape[0]))
    y_ref = (A @ x.T).T
    y = np.asarray(op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


def test_matvec_16(op16):
    _check_matvec(*op16, batch=3)


def test_matvec_128(op128):
    _check_matvec(*op128, batch=2)


def test_matvec_single_vector_shape(op16):
    op, A = op16
    x = np.arange(A.shape[0]).astype(np.complex128)
    y = np.asarray(op.matvec(jnp.asarray(x)))
    assert y.shape == (A.shape[0],)
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)


def test_gamma3_hermiticity(op16):
    """Q = gamma3 @ D is exactly Hermitian (reference: multigrid.py:130-133)."""
    _, A = op16
    Q = np.asarray(A.todense())
    half = Q.shape[0] // 2
    Q[half:, :] = -Q[half:, :]
    assert np.linalg.norm(Q - Q.conj().T) == 0.0


def test_gamma3_op(op16):
    op, _ = op16
    x = np.random.default_rng(1).standard_normal((2, op.n)).astype(np.complex128)
    g = np.asarray(gamma3(jnp.asarray(x)))
    ref = x.copy()
    ref[:, op.n // 2:] *= -1
    np.testing.assert_array_equal(g, ref)


def test_shift_ops_match_reference_pperm():
    """Pperm built as in multigrid.py:151-153 equals roll(x, -d); its transpose
    equals roll(x, +d)."""
    import scipy.sparse as sp

    N, d = 32, 6
    diagonals = [np.ones(N - d), np.ones(d)]
    Pperm = sp.diags(diagonals, [-d, N - d]).transpose().tocsr()
    x = np.random.default_rng(2).standard_normal(N)
    np.testing.assert_array_equal(Pperm @ x, np.asarray(shift_rows_up(jnp.asarray(x), d)))
    np.testing.assert_array_equal(
        Pperm.T @ x, np.asarray(shift_rows_down(jnp.asarray(x), d))
    )
