"""Pallas stencil kernel vs the XLA rolled-read oracle (interpret mode on the
CPU test backend; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import pytest

from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.ops.pallas_stencil import (
    pallas_available,
    stencil_matvec_pallas,
)


@pytest.mark.parametrize("batch", [(), (3,), (2, 4)])
def test_pallas_matches_xla_oracle(op16, batch):
    op, A = op16
    pop = pair_operator(op)
    rng = np.random.default_rng(11)
    shape = batch + (pop.n,)
    z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    v = cplx.from_complex(z)
    y_ref = cplx.to_complex(pop.matvec(v))  # XLA path (16^2 not tile-aligned)
    y_pal = cplx.to_complex(
        stencil_matvec_pallas(pop.coeffs, v, pop.nx, pop.nt, interpret=True)
    )
    np.testing.assert_allclose(y_pal, y_ref, atol=1e-12)
    # both equal the CSR oracle
    np.testing.assert_allclose(
        y_pal.reshape(-1, pop.n), (A @ z.reshape(-1, pop.n).T).T, atol=1e-10
    )


def test_pallas_128(op128):
    op, A = op128
    pop = pair_operator(op)
    rng = np.random.default_rng(12)
    z = rng.standard_normal((2, pop.n)) + 1j * rng.standard_normal((2, pop.n))
    v = cplx.from_complex(z)
    y = cplx.to_complex(
        stencil_matvec_pallas(pop.coeffs, v, pop.nx, pop.nt, interpret=True)
    )
    np.testing.assert_allclose(y, (A @ z.T).T, atol=1e-10)


def test_pallas_gate():
    # tile alignment: T multiple of 128, X multiple of 8
    assert not pallas_available(16, 16, backend="tpu")
    assert pallas_available(128, 128, backend="tpu")
    assert pallas_available(256, 128, backend="tpu")
    assert not pallas_available(128, 128, backend="cpu")


def test_pallas_residual_matches_oracle(op16):
    """Fused r = b - A x kernel vs the XLA path."""
    from deflatedmlmc_schwinger_tpu.ops.pallas_stencil import (
        stencil_residual_pallas,
    )

    op, _ = op16
    pop = pair_operator(op)
    rng = np.random.default_rng(21)
    z = rng.standard_normal((3, pop.n)) + 1j * rng.standard_normal((3, pop.n))
    w = rng.standard_normal((3, pop.n)) + 1j * rng.standard_normal((3, pop.n))
    b = cplx.from_complex(z)
    x = cplx.from_complex(w)
    r_ref = cplx.to_complex(b - pop.matvec(x))
    r_pal = cplx.to_complex(
        stencil_residual_pallas(pop.coeffs, b, x, pop.nx, pop.nt, interpret=True)
    )
    np.testing.assert_allclose(r_pal, r_ref, atol=1e-12)


@pytest.mark.parametrize("with_residual", [False, True])
def test_pallas_poly_smoother_matches_xla(op16, with_residual):
    """Fused polynomial-smoother kernel vs mg/cycle.py poly_smoother, and the
    emitted residual really is r - A x."""
    import jax

    from deflatedmlmc_schwinger_tpu.mg.cycle import poly_smoother
    from deflatedmlmc_schwinger_tpu.ops.pallas_stencil import (
        stencil_poly_smooth_pallas,
    )

    op, _ = op16
    pop = pair_operator(op)
    rng = np.random.default_rng(23)
    roots = tuple(
        complex(a, b)
        for a, b in zip(rng.standard_normal(4) + 3.0, rng.standard_normal(4))
    )
    z = rng.standard_normal((2, pop.n)) + 1j * rng.standard_normal((2, pop.n))
    r = cplx.from_complex(z)
    mv = jax.jit(pop.matvec)
    x_ref = poly_smoother(mv, r, roots)
    x_pal, cur = stencil_poly_smooth_pallas(
        pop.coeffs, r, roots, pop.nx, pop.nt,
        with_residual=with_residual, interpret=True,
    )
    np.testing.assert_allclose(
        cplx.to_complex(x_pal), cplx.to_complex(x_ref), atol=1e-12
    )
    if with_residual:
        r_true = cplx.to_complex(r - pop.matvec(x_pal))
        np.testing.assert_allclose(cplx.to_complex(cur), r_true, atol=1e-12)
    else:
        assert cur is None


def test_poly_smoother_residual_recurrence(op16):
    """poly_smoother(with_residual=True) returns exactly (x, r - A x)."""
    import jax

    from deflatedmlmc_schwinger_tpu.mg.cycle import poly_smoother

    op, _ = op16
    pop = pair_operator(op)
    rng = np.random.default_rng(29)
    roots = tuple(
        complex(a, b)
        for a, b in zip(rng.standard_normal(3) + 3.0, rng.standard_normal(3))
    )
    z = rng.standard_normal((2, pop.n)) + 1j * rng.standard_normal((2, pop.n))
    r = cplx.from_complex(z)
    mv = jax.jit(pop.matvec)
    x, cur = poly_smoother(mv, r, roots, with_residual=True)
    x2 = poly_smoother(mv, r, roots)
    np.testing.assert_allclose(
        cplx.to_complex(x), cplx.to_complex(x2), atol=1e-13
    )
    np.testing.assert_allclose(
        cplx.to_complex(cur), cplx.to_complex(r - pop.matvec(x)), atol=1e-12
    )
