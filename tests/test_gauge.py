"""Gauge-config generator: structural parity with the shipped matrices and
gamma3-Hermiticity of generated operators."""

import numpy as np

from deflatedmlmc_schwinger_tpu.io.gauge import (
    I2,
    SIGMA1,
    SIGMA2,
    generate_operator,
    stencil_from_links,
)
from deflatedmlmc_schwinger_tpu.io.stencil import csr_from_stencil


def test_shipped_128_is_gauged_wilson(op128):
    """The shipped 128^2 matrix has exactly the link-phase structure
    stencil_from_links produces (the generator's defining contract)."""
    op, _ = op128
    C = np.asarray(op.coeffs)  # mass -0.1320 already added
    u = C[0, 0, 1]  # forward-t coefficient = link phase (spin (0,0) of 1-sigma1)
    v = C[0, 0, 3]
    np.testing.assert_allclose(np.abs(u), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.abs(v), 1.0, atol=1e-12)
    C2 = stencil_from_links(np.angle(u), np.angle(v), -0.1320 - 4.0 + 4.0)
    # rebuild from extracted angles; mass term = diag of C
    C2[:, :, 0] = C[:, :, 0]
    np.testing.assert_allclose(C2, C, atol=1e-12)


def test_generated_gamma3_hermitian():
    op = generate_operator(16, 16, mass=-0.3, beta=4.0, seed=7)
    A = csr_from_stencil(np.asarray(op.coeffs)).todense()
    g3 = np.kron(np.diag([1.0, -1.0]), np.eye(16 * 16))
    Q = g3 @ A
    assert np.abs(Q - Q.conj().T).max() < 1e-13
    # not Hermitian itself
    assert np.abs(A - A.conj().T).max() > 0.1


def test_generated_matvec_matches_csr():
    op = generate_operator(8, 8, mass=-0.2, beta=2.0, seed=3)
    A = csr_from_stencil(np.asarray(op.coeffs))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, op.n)) + 1j * rng.standard_normal((3, op.n))
    y = np.asarray(op.matvec(x))
    np.testing.assert_allclose(y, (A @ x.T).T, atol=1e-12)


def test_beta_controls_roughness():
    """Higher beta -> smoother config -> plaquette angles concentrated."""
    from deflatedmlmc_schwinger_tpu.io.gauge import sample_links

    _, thx_smooth = sample_links(32, 32, beta=50.0, seed=1)
    _, thx_rough = sample_links(32, 32, beta=0.5, seed=1)
    # plaquette spread (diff along t reconstructs plaquettes)
    sm = np.std(np.diff(thx_smooth, axis=1))
    rg = np.std(np.diff(thx_rough, axis=1))
    assert sm < 0.3 < rg
