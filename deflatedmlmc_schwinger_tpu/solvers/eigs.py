"""Eigsolvers for setup phases: TPU-native replacements for ARPACK.

The reference computes
  * near-kernel test vectors per MG level with shift-invert ARPACK
    ``eigs(A, sigma=0)`` / ``eigsh(Q, sigma=0)`` backed by a SuperLU
    factorization (reference: multigrid.py:157-188),
  * the Hutchinson deflation basis with ``eigsh(Q, k, sigma=0)``
    (utils.py:137-140), and
  * MLMC difference-operator deflation with plain Lanczos ``eigsh(lop, k)``
    (utils.py:141-143).

There is no sparse LU on TPU; instead:
  * smallest-|lambda| eigenpairs of the Hermitian Q = gamma3 @ A come from
    Chebyshev-filtered subspace iteration (CheFSI) on Q^2 -- a jittable,
    batched three-term recurrence that amplifies the near-kernel -- followed
    by Rayleigh--Ritz on Q (signed eigenvalues);
  * when a solver for A is available (the MG hierarchy itself), inverse
    subspace iteration V <- A^{-1} gamma3 V converges in a handful of rounds
    (this is the survey's "shift-invert replaced by the MG-preconditioned
    solver" design, SURVEY.md section 2.2 N2/N3);
  * largest-|lambda| eigenpairs of a Hermitian operator (the MLMC difference
    operator) come from plain subspace iteration with Rayleigh--Ritz.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class EigResult(NamedTuple):
    values: jnp.ndarray    # (k,) real, sorted ascending by |value|
    vectors: jnp.ndarray   # (n, k)
    resnorms: jnp.ndarray  # (k,) ||Q v - theta v||_2


def _orthonormalize(V: jnp.ndarray) -> jnp.ndarray:
    """QR-orthonormalize the columns of (n, k) V (deterministic phase)."""
    Q, R = jnp.linalg.qr(V)
    d = jnp.diagonal(R, axis1=-2, axis2=-1)
    phase = jnp.where(jnp.abs(d) > 0, d / jnp.maximum(jnp.abs(d), 1e-300), 1.0)
    return Q * jnp.conj(phase)[None, :]


def power_bound(matvec_H: Callable, n: int, dtype, key, iters: int = 30) -> float:
    """Cheap upper estimate of the largest |eigenvalue| of a Hermitian operator."""
    v = jax.random.normal(key, (n,), jnp.float32).astype(dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, carry):
        v, lam = carry
        w = matvec_H(v)
        nw = jnp.linalg.norm(w)
        return (w / jnp.maximum(nw, 1e-30), nw)

    v, lam = lax.fori_loop(0, iters, body, (v, jnp.asarray(0.0, v.real.dtype)))
    return float(lam) * 1.05


def harmonic_ritz_smallest(matvec_H: Callable, V: jnp.ndarray, k: int) -> EigResult:
    """Harmonic Rayleigh--Ritz targeting eigenvalues of Hermitian H nearest 0.

    Standard Ritz extraction on an indefinite operator produces spurious
    near-zero "ghost" values from non-invariant directions (Rayleigh quotients
    of mixed +/- eigencomponents); harmonic values theta = ||Hw||^2 / <w,Hw>
    cannot sit near zero unless ||Hw|| is genuinely small, so the smallest-|.|
    selection is ghost-free. Solved as the Hermitian pencil
    (U^H W) y = mu (U^H U) y with U = H W, theta = 1/mu.
    """
    W = _orthonormalize(V)
    U = matvec_H(W.T).T
    Amat = U.conj().T @ W
    Amat = 0.5 * (Amat + Amat.conj().T)
    Bmat = U.conj().T @ U
    Bmat = 0.5 * (Bmat + Bmat.conj().T)
    m = W.shape[1]
    scale = jnp.real(jnp.trace(Bmat)) / m
    eps = jnp.asarray(jnp.finfo(W.real.dtype).eps, scale.dtype)
    Lc = jnp.linalg.cholesky(Bmat + (1e3 * eps * scale) * jnp.eye(m, dtype=Bmat.dtype))
    import jax.scipy.linalg as jsl

    Linv_A = jsl.solve_triangular(Lc, Amat, lower=True)
    M = jsl.solve_triangular(Lc, Linv_A.conj().T, lower=True).conj().T
    M = 0.5 * (M + M.conj().T)
    mu, Z = jnp.linalg.eigh(M)
    y = jsl.solve_triangular(Lc.conj().T, Z, lower=False)
    X = W @ y
    X = X / jnp.maximum(jnp.linalg.norm(X, axis=0, keepdims=True), 1e-300)
    # theta = Rayleigh quotient of the harmonic vectors (more accurate than 1/mu)
    HX = matvec_H(X.T).T
    theta = jnp.real(jnp.sum(jnp.conj(X) * HX, axis=0))
    order = jnp.argsort(jnp.where(jnp.abs(mu) > 0, 1.0 / jnp.abs(mu), jnp.inf))[:k]
    theta = theta[order]
    X = X[:, order]
    R = HX[:, order] - X * theta[None, :].astype(X.dtype)
    res = jnp.linalg.norm(R, axis=0)
    return EigResult(values=theta, vectors=X, resnorms=res)


def rayleigh_ritz_hermitian(
    matvec_H: Callable, V: jnp.ndarray, k: int, which: str = "smallest_abs"
) -> EigResult:
    """Rayleigh--Ritz of a Hermitian operator on the column span of V."""
    W = _orthonormalize(V)
    HW = matvec_H(W.T).T  # operators act on (..., n) batches; W is (n, m)
    M = W.conj().T @ HW
    M = 0.5 * (M + M.conj().T)
    theta, Y = jnp.linalg.eigh(M)
    if which == "smallest_abs":
        order = jnp.argsort(jnp.abs(theta))
    elif which == "largest_abs":
        order = jnp.argsort(-jnp.abs(theta))
    else:
        raise ValueError(which)
    order = order[:k]
    theta = theta[order]
    X = W @ Y[:, order]
    R = matvec_H(X.T).T - X * theta[None, :].astype(X.dtype)
    res = jnp.linalg.norm(R, axis=0)
    return EigResult(values=theta, vectors=X, resnorms=res)


def chebyshev_filtered_smallest(
    matvec_H: Callable,
    n: int,
    k: int,
    *,
    dtype,
    key,
    degree: int = 100,
    rounds: int = 8,
    buffer: Optional[int] = None,
    lam_max: Optional[float] = None,
    cut_init_frac: float = 1.0e-2,
    tol: float = 0.0,
) -> EigResult:
    """Smallest-|lambda| eigenpairs of Hermitian H via CheFSI on H^2.

    The filter is the Chebyshev polynomial T_degree mapped to
    [cut^2, lam_max^2] in t = lambda^2; eigenvalues below the cut are
    amplified exponentially in the degree. The cut adapts to the current
    Ritz values each round.
    """
    m = buffer if buffer is not None else max(k + 2, int(round(1.5 * k)))
    m = min(m, n)
    if lam_max is None:
        lam_max = power_bound(matvec_H, n, dtype, jax.random.fold_in(key, 17))

    kr, ki = jax.random.split(jax.random.fold_in(key, 3))
    V = (
        jax.random.normal(kr, (n, m), jnp.float32)
        + 1j * jax.random.normal(ki, (n, m), jnp.float32)
    ).astype(dtype)
    V = _orthonormalize(V)

    b = lam_max * lam_max
    cut = lam_max * cut_init_frac

    def h2(X):  # columns-as-batch application of H^2
        return matvec_H(matvec_H(X))

    @functools.partial(jax.jit, static_argnames=("deg",))
    def filter_rounds(V, a, b, deg):
        # scaled operator: y(v) = (2 H^2 v - (a+b) v) / (b - a)
        c0 = (a + b) / (b - a)
        c1 = 2.0 / (b - a)

        def y(X):
            return (c1 * h2(X.T).T - c0 * X).astype(V.dtype)

        T0 = V
        T1 = y(V)

        def body(_, carry):
            Tm1, Tm0 = carry
            Tp = 2.0 * y(Tm0) - Tm1
            return (Tm0, Tp)

        _, Tk = lax.fori_loop(0, deg - 1, body, (T0, T1))
        return Tk

    result = None
    for r in range(rounds):
        a = max(cut * cut, b * 1.0e-12)
        V = filter_rounds(V, jnp.asarray(a), jnp.asarray(b), int(degree))
        # normalize columns to avoid overflow before QR
        V = V / jnp.maximum(jnp.linalg.norm(V, axis=0, keepdims=True), 1e-30)
        result = harmonic_ritz_smallest(matvec_H, V, m)
        V = result.vectors
        # adapt the cut to sit just above the k-th wanted eigenvalue
        theta_abs = np.sort(np.abs(np.asarray(result.values)))
        new_cut = float(theta_abs[min(k, m - 1)])
        if new_cut > 0:
            cut = min(max(new_cut, 1e-8 * lam_max), 0.5 * lam_max)
        if tol > 0 and float(np.max(np.asarray(result.resnorms[:k]))) < tol:
            break
    return EigResult(
        values=result.values[:k],
        vectors=result.vectors[:, :k],
        resnorms=result.resnorms[:k],
    )


def inverse_iteration_smallest(
    matvec_H: Callable,
    apply_inv: Callable,
    n: int,
    k: int,
    *,
    dtype,
    key,
    rounds: int = 6,
    buffer: Optional[int] = None,
    tol: float = 0.0,
    V0: Optional[jnp.ndarray] = None,
) -> EigResult:
    """Smallest-|lambda| eigenpairs of Hermitian H via inverse subspace
    iteration V <- H^{-1} V (``apply_inv`` applies H^{-1} to (B, n) batches).

    This replaces ARPACK's shift-invert mode; apply_inv is typically the
    MG-preconditioned FGMRES solve composed with gamma3.
    """
    m = buffer if buffer is not None else max(k + 2, int(round(1.25 * k)))
    m = min(m, n)
    if V0 is not None:
        V = V0
        m = V.shape[1]
    else:
        kr, ki = jax.random.split(jax.random.fold_in(key, 5))
        V = (
            jax.random.normal(kr, (n, m), jnp.float32)
            + 1j * jax.random.normal(ki, (n, m), jnp.float32)
        ).astype(dtype)
    result = None
    for r in range(rounds):
        V = _orthonormalize(V)
        V = apply_inv(V.T).T
        result = harmonic_ritz_smallest(matvec_H, V, m)
        V = result.vectors
        if tol > 0 and float(np.max(np.asarray(result.resnorms[:k]))) < tol:
            break
    return EigResult(
        values=result.values[:k],
        vectors=result.vectors[:, :k],
        resnorms=result.resnorms[:k],
    )


def subspace_iteration_largest(
    matvec_H: Callable,
    n: int,
    k: int,
    *,
    dtype,
    key,
    rounds: int = 10,
    buffer: Optional[int] = None,
    tol: float = 0.0,
) -> EigResult:
    """Largest-|lambda| eigenpairs of a Hermitian operator by block power
    iteration + Rayleigh--Ritz (the MLMC difference-operator deflation,
    reference: utils.py:141-143, needs only loose accuracy -- tol 1e-1)."""
    m = buffer if buffer is not None else max(k + 2, int(round(1.25 * k)))
    m = min(m, n)
    kr, ki = jax.random.split(jax.random.fold_in(key, 11))
    V = (
        jax.random.normal(kr, (n, m), jnp.float32)
        + 1j * jax.random.normal(ki, (n, m), jnp.float32)
    ).astype(dtype)
    result = None
    for r in range(rounds):
        V = _orthonormalize(V)
        V = matvec_H(V.T).T
        result = rayleigh_ritz_hermitian(matvec_H, V, m, which="largest_abs")
        V = result.vectors
        if tol > 0 and float(np.max(np.asarray(result.resnorms[:k]))) < tol:
            break
    return EigResult(
        values=result.values[:k],
        vectors=result.vectors[:, :k],
        resnorms=result.resnorms[:k],
    )


def smallest_eigpairs_nonhermitian(
    matvec_A: Callable,
    matvec_Q: Callable,
    n: int,
    k: int,
    *,
    dtype,
    key,
    degree: int = 100,
    rounds: int = 8,
    buffer: Optional[int] = None,
) -> Tuple[np.ndarray, jnp.ndarray]:
    """Approximate smallest-|lambda| eigenpairs of the NON-Hermitian A
    ('EVs' test-vector mode, reference: multigrid.py:173-174).

    The search subspace comes from CheFSI on Q^2 = A^H A (the small right
    singular subspace contains A's small eigenvectors); the small oblique
    eigenproblem G = W^H A W is solved densely on the host. The hierarchy is
    insensitive to the difference (only estimator variance, never bias,
    depends on test-vector quality).
    """
    m = buffer if buffer is not None else max(k + 2, 2 * k)
    sub = chebyshev_filtered_smallest(
        matvec_Q, n, m, dtype=dtype, key=key, degree=degree, rounds=rounds,
        buffer=max(m + 2, int(round(1.25 * m))),
    )
    W = _orthonormalize(sub.vectors)
    AW = matvec_A(W.T).T
    G = np.asarray(W.conj().T @ AW)
    theta, Y = np.linalg.eig(G)
    order = np.argsort(np.abs(theta))[:k]
    vecs = W @ jnp.asarray(Y[:, order])
    return theta[order], vecs
