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
