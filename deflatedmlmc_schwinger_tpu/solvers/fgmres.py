"""Batched flexible GMRES, jitted, with fixed-size Krylov buffers.

TPU-native replacement for the reference's outer Krylov solver -- pyamg
``fgmres`` around the V-cycle preconditioner (reference: multigrid.py:347-366)
-- and for the scipy ``lgmres`` smoother (multigrid.py:392-394): the smoother
here is the same routine with ``restart=smooth_iters, max_restarts=1, tol=0``.

Design points:
  * Solves a whole batch of right-hand sides (B, n) simultaneously -- probes
    are embarrassingly parallel and batching keeps the VPU/MXU busy.
  * Arnoldi with modified Gram--Schmidt, complex Givens rotations for a
    per-row running residual estimate, and ``lax.while_loop`` control flow:
    the inner loop exits as soon as every batch row is converged, the outer
    loop re-computes the true residual and restarts.
  * The preconditioner may be any (possibly nonlinear) callable -- flexible
    GMRES stores the preconditioned basis Z.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class FGMRESResult(NamedTuple):
    x: jnp.ndarray          # (B, n) solution
    resnorm: jnp.ndarray    # (B,) final true residual norms
    bnorm: jnp.ndarray      # (B,) rhs norms
    iters: jnp.ndarray      # (B,) int32 Arnoldi steps spent on each row
    cycles: jnp.ndarray     # () int32 restart cycles used


def _givens(a: jnp.ndarray, b: jnp.ndarray):
    """Complex Givens rotation: c real, s complex with
    [c, s; -conj(s), c] @ [a, b]^T = [r, 0]^T."""
    eps = jnp.finfo(a.real.dtype).tiny
    na = jnp.abs(a)
    nb = jnp.abs(b)
    t = jnp.sqrt(na * na + nb * nb)
    t_safe = jnp.maximum(t, eps)
    na_safe = jnp.maximum(na, eps)
    c = na / t_safe
    s = (a / na_safe) * jnp.conj(b) / t_safe
    # a == 0: rotate (0, b) -> (|b|, 0) with c=0, s=conj(b)/|b|
    nb_safe = jnp.maximum(nb, eps)
    c = jnp.where(na > 0, c, 0.0)
    s = jnp.where(na > 0, s, jnp.conj(b) / nb_safe)
    # both zero: identity
    c = jnp.where(t > 0, c, 1.0)
    s = jnp.where(t > 0, s, 0.0)
    r = c * a + s * b
    return c, s, r


def _norm(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=-1))


@functools.partial(
    jax.jit, static_argnames=("matvec", "precond", "restart", "max_restarts")
)
def _fgmres_impl(matvec, precond, b, x0, tol_abs, restart, max_restarts):
    B, n = b.shape
    m = restart
    cdtype = b.dtype
    rdtype = jnp.zeros((), cdtype).real.dtype
    eps = jnp.finfo(rdtype).tiny

    def cycle_body(state):
        x, resnorm, iters, cycles = state
        r = b - matvec(x)
        beta = _norm(r)
        V = jnp.zeros((m + 1, B, n), cdtype)
        V = V.at[0].set(r / jnp.maximum(beta, eps)[:, None])
        Z = jnp.zeros((m, B, n), cdtype)
        H = jnp.zeros((B, m + 1, m), cdtype)
        g = jnp.zeros((B, m + 1), cdtype).at[:, 0].set(beta.astype(cdtype))
        cs = jnp.zeros((m, B), rdtype)
        sn = jnp.zeros((m, B), cdtype)
        res = beta

        def arnoldi_cond(c):
            V, Z, H, g, cs, sn, j, res, iters = c
            return jnp.logical_and(j < m, jnp.any(res > tol_abs))

        def arnoldi_body(c):
            V, Z, H, g, cs, sn, j, res, iters = c
            active = res > tol_abs
            iters = iters + active.astype(jnp.int32)
            vj = V[j]
            z = precond(vj)
            w = matvec(z)
            Z = Z.at[j].set(z)

            hcol = jnp.zeros((B, m + 1), cdtype)

            def mgs(i, wh):
                w, hcol = wh
                hi = jnp.sum(jnp.conj(V[i]) * w, axis=-1)
                w = w - hi[:, None] * V[i]
                return (w, hcol.at[:, i].set(hi))

            w, hcol = lax.fori_loop(0, j + 1, mgs, (w, hcol))
            hnorm = _norm(w)
            hcol = hcol.at[:, j + 1].set(hnorm.astype(cdtype))
            V = V.at[j + 1].set(w / jnp.maximum(hnorm, eps)[:, None])

            # apply the accumulated rotations to the new column
            def rot(i, hcol):
                hi = cs[i] * hcol[:, i] + sn[i] * hcol[:, i + 1]
                hip1 = -jnp.conj(sn[i]) * hcol[:, i] + cs[i] * hcol[:, i + 1]
                return hcol.at[:, i].set(hi).at[:, i + 1].set(hip1)

            hcol = lax.fori_loop(0, j, rot, hcol)
            c_new, s_new, r_new = _givens(hcol[:, j], hcol[:, j + 1])
            hcol = hcol.at[:, j].set(r_new).at[:, j + 1].set(0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            gj = g[:, j]
            g = g.at[:, j].set(c_new * gj)
            g = g.at[:, j + 1].set(-jnp.conj(s_new) * gj)
            H = H.at[:, :, j].set(hcol)
            res = jnp.where(active, jnp.abs(g[:, j + 1]), res)
            return (V, Z, H, g, cs, sn, j + 1, res, iters)

        init = (V, Z, H, g, cs, sn, jnp.int32(0), res, iters)
        V, Z, H, g, cs, sn, j_fin, res, iters = lax.while_loop(
            arnoldi_cond, arnoldi_body, init
        )

        # solve the (rotated, upper-triangular) least-squares system, padding
        # unused columns with an identity diagonal so the triangular solve is
        # well-posed for any j_fin
        R = H[:, :m, :m]
        diag_idx = jnp.arange(m)
        used = diag_idx < j_fin
        Rdiag = R[:, diag_idx, diag_idx]
        Rdiag = jnp.where(used[None, :], Rdiag, 1.0)
        R = R.at[:, diag_idx, diag_idx].set(Rdiag)
        rhs = jnp.where(used[None, :], g[:, :m], 0.0)
        y = jax.scipy.linalg.solve_triangular(R, rhs, lower=False)
        x = x + jnp.einsum("jbn,bj->bn", Z, y)
        return (x, res, iters, cycles + 1)

    def cycle_cond(state):
        x, resnorm, iters, cycles = state
        return jnp.logical_and(cycles < max_restarts, jnp.any(resnorm > tol_abs))

    x0_res = _norm(b - matvec(x0))
    state = (x0, x0_res, jnp.zeros((B,), jnp.int32), jnp.int32(0))
    x, _, iters, cycles = lax.while_loop(cycle_cond, cycle_body, state)
    final_res = _norm(b - matvec(x))
    return x, final_res, iters, cycles


def fgmres(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    *,
    tol: float,
    restart: int = 20,
    max_restarts: int = 10,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    x0: Optional[jnp.ndarray] = None,
) -> FGMRESResult:
    """Solve A x = b for a batch of right-hand sides.

    Args:
      matvec: (B, n) -> (B, n) application of A.
      b: (B, n) right-hand sides (a single (n,) vector is promoted).
      tol: relative residual tolerance (||b - A x|| <= tol * ||b|| per row).
      restart: Krylov subspace dimension per cycle.
      max_restarts: maximum number of cycles.
      precond: right preconditioner (B, n) -> (B, n); identity if None.
      x0: initial guess, zeros if None.
    """
    single = b.ndim == 1
    if single:
        b = b[None, :]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    elif single:
        x0 = x0[None, :]
    if precond is None:
        precond = lambda v: v
    bnorm = _norm(b)
    tol_abs = jnp.asarray(tol, bnorm.dtype) * bnorm
    x, res, iters, cycles = _fgmres_impl(
        matvec, precond, b, x0, tol_abs, int(restart), int(max_restarts)
    )
    if single:
        x, res, bnorm, iters = x[0], res[0], bnorm[0], iters[0]
    return FGMRESResult(x=x, resnorm=res, bnorm=bnorm, iters=iters, cycles=cycles)
