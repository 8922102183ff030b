"""Analytic V-cycle FLOP-complexity model (reference: utils.py:19-31).

The reference charges (2*smooth_iters + 2)*nnz(A_l) on the level the solve
starts from ("bare level") and (2*smooth_iters + 1)*nnz(A_l) below it, summed
over levels above the coarsest; consumers add coarsest and deflation work
(stoch_trace.py:165-175, 443-463).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from deflatedmlmc_schwinger_tpu.mg.hierarchy import BlockStencilOperator, Hierarchy
from deflatedmlmc_schwinger_tpu.ops.dirac import PairStencilOperator, StencilOperator


def level_nnz(hier: Hierarchy) -> List[int]:
    """Structural nonzero count of each level operator (CSR-equivalent)."""
    out = []
    for lev in hier.levels:
        op = lev.op
        if isinstance(op, StencilOperator):
            out.append(int(np.count_nonzero(np.asarray(op.coeffs))))
        elif isinstance(op, PairStencilOperator):
            nz = np.abs(np.asarray(op.coeffs.re)) + np.abs(np.asarray(op.coeffs.im))
            out.append(int(np.count_nonzero(nz)))
        elif isinstance(op, BlockStencilOperator):
            nz = np.abs(np.asarray(op.blocks.re)) + np.abs(np.asarray(op.blocks.im))
            out.append(int(np.count_nonzero(nz)))
        else:
            nz = np.abs(np.asarray(op.mat.re)) + np.abs(np.asarray(op.mat.im))
            out.append(int(np.count_nonzero(nz)))
    return out


def flops_vcycle(
    nnz: Sequence[int], smooth_iters: int, bare_level: int, level_id: int
) -> float:
    """Direct port of the recursion in utils.py:19-31 (same charging rule)."""
    last_charged = len(nnz) - 2
    coeff = (2 * smooth_iters + 2) if level_id == bare_level else (2 * smooth_iters + 1)
    total = coeff * nnz[level_id]
    if level_id < last_charged:
        total += flops_vcycle(nnz, smooth_iters, bare_level, level_id + 1)
    return float(total)
