"""The V-cycle and the multigrid-preconditioned FGMRES solver.

Reference semantics (multigrid.py:347-447):
  * ``MG.solve`` = flexible GMRES on the level operator, right-preconditioned
    by one V-cycle, maxiter = min(N, 1000);
  * V-cycle: pre-smooth (2-iteration Krylov smoother from zero initial
    guess), residual, restrict; dense precomputed inverse on the coarsest
    level; prolongate-correct, residual, post-smooth;
  * solves may start from ANY level (``level_nr`` retargeting) -- the MLMC
    estimator reuses the hierarchy as its level structure.

TPU-native re-design: everything below is jitted and batched over probe
vectors; the smoother is a fixed-iteration GMRES built on a static-size
Arnoldi (lax.fori_loop, normal-equation least squares -- exact for the tiny
smoothing subspaces used here); closures are cached per starting level so
XLA compiles each (level, batch-shape) combination exactly once.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from deflatedmlmc_schwinger_tpu.config import SolverConfig
from deflatedmlmc_schwinger_tpu.mg.hierarchy import Hierarchy
from deflatedmlmc_schwinger_tpu.solvers.fgmres import FGMRESResult, fgmres


def gmres_smoother(matvec: Callable, r: jnp.ndarray, iters: int) -> jnp.ndarray:
    """k-step GMRES from a zero initial guess (the reference's
    ``lgmres(tol=1e-20, maxiter=smooth_iters)`` smoothing role,
    multigrid.py:392-394). Static iteration count, batched over rows."""
    B, n = r.shape
    m = iters
    cdtype = r.dtype
    eps = jnp.finfo(r.real.dtype).tiny
    beta = jnp.sqrt(jnp.sum(jnp.abs(r) ** 2, axis=-1))
    V = jnp.zeros((m + 1, B, n), cdtype).at[0].set(r / jnp.maximum(beta, eps)[:, None])
    H = jnp.zeros((B, m + 1, m), cdtype)

    def step(j, carry):
        V, H = carry
        w = matvec(V[j])

        def mgs(i, wh):
            w, hcol = wh
            hi = jnp.sum(jnp.conj(V[i]) * w, axis=-1)
            return (w - hi[:, None] * V[i], hcol.at[:, i].set(hi))

        w, hcol = lax.fori_loop(0, j + 1, mgs, (w, jnp.zeros((B, m + 1), cdtype)))
        hn = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2, axis=-1))
        hcol = hcol.at[:, j + 1].set(hn.astype(cdtype))
        V = V.at[j + 1].set(w / jnp.maximum(hn, eps)[:, None])
        H = H.at[:, :, j].set(hcol)
        return (V, H)

    V, H = lax.fori_loop(0, m, step, (V, H))
    # least squares min ||beta e1 - H y|| via normal equations (m is tiny)
    e1 = jnp.zeros((B, m + 1), cdtype).at[:, 0].set(beta.astype(cdtype))
    HtH = jnp.einsum("bij,bik->bjk", jnp.conj(H), H)
    HtH = HtH + 1e-30 * jnp.eye(m, dtype=cdtype)[None]
    Htb = jnp.einsum("bij,bi->bj", jnp.conj(H), e1)
    y = jnp.linalg.solve(HtH, Htb[..., None])[..., 0]
    return jnp.einsum("jbn,bj->bn", V[:m], y)


class MGSolver:
    """Multigrid-preconditioned batched solver over a Hierarchy.

    The analog of the reference's MG class solve path; carries the same
    bookkeeping (outer iteration counts, coarsest-level applications,
    reference: multigrid.py:349-352, 419-423)."""

    def __init__(self, hier: Hierarchy, cfg: Optional[SolverConfig] = None):
        self.hier = hier
        self.cfg = cfg or SolverConfig()
        self._matvecs: Dict[int, Callable] = {}
        self._preconds: Dict[int, Callable] = {}
        # counters in the spirit of multigrid.py:66-77
        self.num_iters = 0
        self.coarsest_lev_iters = [0] * hier.nr_levels
        self.total_solve_calls = 0

    # -- cached closures ----------------------------------------------------
    def matvec(self, level: int = 0) -> Callable:
        if level not in self._matvecs:
            op = self.hier.levels[level].op
            self._matvecs[level] = op.matvec
        return self._matvecs[level]

    def precond(self, level: int = 0) -> Callable:
        if level not in self._preconds:
            levels = self.hier.levels[level:]
            coarsest_inv = self.hier.coarsest_inv
            smooth_iters = self.cfg.smooth_iters

            def v_cycle(b: jnp.ndarray) -> jnp.ndarray:
                bs = [b]
                xs = []
                for lev in levels[:-1]:
                    x = gmres_smoother(lev.op.matvec, bs[-1], smooth_iters)
                    r = bs[-1] - lev.op.matvec(x)
                    xs.append(x)
                    bs.append(lev.P.apply_adjoint(r))
                xc = bs[-1] @ coarsest_inv.T
                for lev, x, bf in zip(levels[-2::-1], xs[::-1], bs[-2::-1]):
                    x = x + lev.P.apply(xc)
                    r = bf - lev.op.matvec(x)
                    x = x + gmres_smoother(lev.op.matvec, r, smooth_iters)
                    xc = x
                return xc

            self._preconds[level] = v_cycle
        return self._preconds[level]

    # -- solves -------------------------------------------------------------
    def solve(
        self,
        b: jnp.ndarray,
        tol: float,
        *,
        level: int = 0,
        precondition: bool = True,
        max_restarts: Optional[int] = None,
    ) -> FGMRESResult:
        """Solve A_level x = b for a batch b of shape (B, n_level)."""
        tol_eff = self.cfg.effective_tol(tol, b.dtype)
        res = fgmres(
            self.matvec(level),
            b,
            tol=tol_eff,
            restart=self.cfg.restart,
            max_restarts=max_restarts if max_restarts is not None else self.cfg.max_restarts,
            precond=self.precond(level) if precondition else None,
        )
        iters = int(jnp.max(res.iters))
        self.num_iters = iters
        self.total_solve_calls += 1
        # one coarsest-inverse application per V-cycle = per outer iteration
        self.coarsest_lev_iters[level] += iters
        return res

    def coarsest_solve(self, b: jnp.ndarray) -> jnp.ndarray:
        """Directly apply the precomputed dense coarsest inverse
        (reference: multigrid.py:413-414)."""
        self.coarsest_lev_iters[self.hier.nr_levels - 1] += 1
        return b @ self.hier.coarsest_inv.T
