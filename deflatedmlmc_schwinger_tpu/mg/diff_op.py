"""MLMC difference-level operators over the MG hierarchy.

f_l(v) = (A_l^{-1} - P_l A_{l+1}^{-1} R_l) v, and the Hermitian
Q-form f_l(gamma3 v) used for deflation eigensolves
(reference: multigrid.py:461-549). With level skipping (only level 1, as in
the reference, stoch_trace.py:199-206) the level-0 difference uses the
composite P0 P1 / R1 R0 and the level-2 coarse operator.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

from deflatedmlmc_schwinger_tpu.mg.cycle import MGSolver
from deflatedmlmc_schwinger_tpu.ops.dirac import gamma3_pair


def level_structure(solver: MGSolver, level: int, skip_level: bool) -> Tuple:
    """(fine_level, coarse_level, restrict, prolong) for difference level
    ``level``; handles the composite skip-level-1 case."""
    hier = solver.hier
    if skip_level and level == 0:
        P0 = hier.levels[0].P
        P1 = hier.levels[1].P
        restrict = lambda v: P1.apply_adjoint(P0.apply_adjoint(v))
        prolong = lambda v: P0.apply(P1.apply(v))
        coarse = 2
    else:
        P = hier.levels[level].P
        restrict = P.apply_adjoint
        prolong = P.apply
        coarse = level + 1
    return level, coarse, restrict, prolong


def make_diff_op(
    solver: MGSolver, level: int, tol: float, skip_level: bool
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """The difference operator f_l acting on (B, n_l) pair batches."""
    fine, coarse, restrict, prolong = level_structure(solver, level, skip_level)
    coarsest = solver.hier.nr_levels - 1

    def f(v: jnp.ndarray) -> jnp.ndarray:
        vc = restrict(v)
        t1 = solver.solve(v, tol, level=fine).x
        if coarse == coarsest:
            t2 = solver.coarsest_solve(vc)
        else:
            t2 = solver.solve(vc, tol, level=coarse).x
        return t1 - prolong(t2)

    return f


def make_diff_op_Q(
    solver: MGSolver, level: int, tol: float, skip_level: bool
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Hermitian form f_l(gamma3 v) (reference: multigrid.py:461-468)."""
    f = make_diff_op(solver, level, tol, skip_level)
    return lambda v: f(gamma3_pair(v))
