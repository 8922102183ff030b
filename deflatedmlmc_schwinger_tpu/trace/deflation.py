"""Deflation pre-computations for both estimators.

Reference: utils.py:130-201. Semantics preserved exactly:
  * Hutchinson: eigenpairs of the Hermitian Q = gamma3 A nearest zero; the
    deflation basis is U = Pi gamma3 V sign(Lambda) (the value the reference
    returns and projects probes against, utils.py:145-155,199) and the exact
    low-rank term is tr1 = tr(U^H V |Lambda|^{-1}) (utils.py:173).
  * MLMC level l: top eigenpairs of the Hermitian difference operator
    Q_l = f_l o gamma3; probe projector basis is V = gamma3 W, U = W sign,
    tr1 = tr(U^H V |Lambda|) for defl_type 'exact' (utils.py:174-189) or the
    explicitly applied f_l for 'inexact_01'.

TPU-native upgrades (flagged where behavior could differ):
  * the eigensolver is MG-driven inverse subspace iteration (Hutchinson) /
    block power iteration (MLMC) instead of ARPACK -- solvers/eigs.py;
  * correction_mode='solve' computes tr1 = sum_i <U_i, A^{-1} Pi^T U_i> with
    k extra MG solves, which is EXACT for any basis quality (the reference's
    eigendecomposition formula is exact only for converged eigenpairs); the
    reference formula is available as correction_mode='eig'.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deflatedmlmc_schwinger_tpu.config import TraceConfig
from deflatedmlmc_schwinger_tpu.mg.cycle import MGSolver
from deflatedmlmc_schwinger_tpu.mg.diff_op import make_diff_op, make_diff_op_Q
from deflatedmlmc_schwinger_tpu.ops.dirac import gamma3, shift_rows_down, shift_rows_up
from deflatedmlmc_schwinger_tpu.solvers.eigs import (
    inverse_iteration_smallest,
    subspace_iteration_largest,
)


@dataclasses.dataclass
class Deflation:
    """Deflation data for one estimator/level."""

    U: Optional[jnp.ndarray]        # probe projector basis (n, k) or None
    tr1: complex                    # low-rank trace correction
    values: Optional[np.ndarray] = None
    resnorms: Optional[np.ndarray] = None
    aux_V: Optional[jnp.ndarray] = None  # MLMC: U of the reference (for inexact_03)


def hutchinson_deflation(
    op,
    solver: MGSolver,
    cfg: TraceConfig,
    *,
    key=None,
    correction_mode: str = "solve",
    rounds: int = 6,
) -> Deflation:
    """Deflation basis + exact correction for deflated Hutchinson."""
    k = int(cfg.nr_deflat_vctrs)
    if k == 0:
        return Deflation(U=None, tr1=0.0 + 0.0j)
    if key is None:
        key = jax.random.key(cfg.seed + 101)
    dtype = op.dtype
    mvQ = lambda v: gamma3(op.matvec(v))
    solve_tol = max(cfg.defl_eigvs_tol_Hutch, solver.cfg.tol_floor(dtype))

    def apply_Qinv(v):  # Q^{-1} v = A^{-1} gamma3 v
        return solver.solve(gamma3(v), solve_tol).x

    eig = inverse_iteration_smallest(
        mvQ, apply_Qinv, op.n, k, dtype=dtype, key=key, rounds=rounds,
        tol=cfg.defl_eigvs_tol_Hutch,
    )
    theta = np.asarray(eig.values)           # signed eigenvalues of Q
    V = eig.vectors                          # (n, k)
    sgn = jnp.asarray(np.sign(theta).astype(np.float64)).astype(dtype)
    U = gamma3(V.T).T * sgn[None, :]
    d = solver.hier.levels[0].perm_shift
    if cfg.use_permuted and d:
        U = shift_rows_up(U.T, d).T

    if correction_mode == "eig":
        # reference formula (utils.py:173): tr(U^H V |Lambda|^{-1})
        small = (U.conj().T @ V) * jnp.asarray(1.0 / np.abs(theta))[None, :].astype(dtype)
        tr1 = complex(jnp.trace(small))
    elif correction_mode == "solve":
        # exact: tr(A^{-1} Pi^T U U^H) = sum_i <U_i, A^{-1} Pi^T U_i>
        rhs = U.T
        if cfg.use_permuted and d:
            rhs = shift_rows_down(rhs, d)
        Z = solver.solve(rhs, max(cfg.function_tol, solver.cfg.tol_floor(dtype))).x
        tr1 = complex(jnp.sum(jnp.conj(U.T) * Z))
    else:
        raise ValueError(correction_mode)
    return Deflation(U=U, tr1=tr1, values=theta, resnorms=np.asarray(eig.resnorms))


def mlmc_level_deflation(
    solver: MGSolver,
    level: int,
    k: int,
    cfg: TraceConfig,
    skip_level: bool,
    *,
    key=None,
    rounds: int = 10,
) -> Deflation:
    """Per-difference-level deflation for MLMC (reference: utils.py:141-189,
    stoch_trace.py:246-274). Each operator application costs two MG solves at
    diff_lev_op_tol."""
    if k == 0:
        return Deflation(U=None, tr1=0.0 + 0.0j)
    if key is None:
        key = jax.random.key(cfg.seed + 202 + level)
    n = solver.hier.levels[level].n
    dtype = solver.hier.levels[level].op.dtype
    qd = make_diff_op_Q(solver, level, cfg.diff_lev_op_tol, skip_level)
    eig = subspace_iteration_largest(
        qd, n, k, dtype=dtype, key=key, rounds=rounds, tol=cfg.defl_eigvs_tol_MLMC
    )
    theta = np.asarray(eig.values)
    W = eig.vectors
    sgn = jnp.asarray(np.sign(theta).astype(np.float64)).astype(dtype)
    Uref = W * sgn[None, :]                  # the reference's Ux (utils.py:148-149)
    V = gamma3(W.T).T                        # probe projector basis (utils.py:157)

    if cfg.defl_type == "exact":
        small = (Uref.conj().T @ V) * jnp.asarray(np.abs(theta))[None, :].astype(dtype)
        tr1 = complex(jnp.trace(small))
    elif cfg.defl_type == "inexact_01":
        f = make_diff_op(solver, level, cfg.diff_lev_op_tol, skip_level)
        Vbuff = f(V.T).T
        tr1 = complex(jnp.trace(V.conj().T @ Vbuff))
    elif cfg.defl_type == "inexact_02":
        raise NotImplementedError("deflation type inexact_02 under construction")
    elif cfg.defl_type == "inexact_03":
        tr1 = 0.0 + 0.0j
    else:
        raise ValueError(f"unknown deflation type {cfg.defl_type!r}")
    return Deflation(
        U=V, tr1=tr1, values=theta, resnorms=np.asarray(eig.resnorms), aux_V=Uref
    )


def deflate(x: jnp.ndarray, U: Optional[jnp.ndarray]) -> jnp.ndarray:
    """x - U (U^H x) on (B, n) batches (one fused tall-skinny matmul pair,
    reference: utils.py:224,266)."""
    if U is None:
        return x
    c = x @ jnp.conj(U)          # (B, k)
    return x - c @ U.T
