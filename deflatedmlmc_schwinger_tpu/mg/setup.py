"""Aggregation-based algebraic multigrid setup, TPU-first.

Reference behavior being reproduced (multigrid.py:100-344):
  * per level, k = dof[i+1]/2 near-kernel test vectors from an eigensolver
    (shift-invert ARPACK there; CheFSI / inverse iteration here -- see
    solvers/eigs.py);
  * the prolongator P assigns each aggregate (a contiguous strip of
    L = aggrs[i]*dof[i] flat indices; strips never straddle the spin
    boundary) two column groups split by the position phase
    (pos % p < p/2 with p = dof[0] at level 0, dof[i]/2 above), each group
    carrying the per-aggregate orthonormalized test vectors
    (multigrid.py:192-259 -- the Python quad loops + CGS become one batched
    host QR);
  * R = P^H (multigrid.py:267-274), Galerkin A_{i+1} = R A_i P
    (multigrid.py:276), dense coarsest inverse (multigrid.py:341-344);
  * per-level displacement shifts for the permuted observable
    (multigrid.py:141-155, 318-331).

Heavy applications (Galerkin chunks, eigensolver filters) run on device in
pair form; the per-aggregate QR, the small Ritz problems and the coarsest
inverse run on the host -- all are tiny one-time costs.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from deflatedmlmc_schwinger_tpu.config import TraceConfig
from deflatedmlmc_schwinger_tpu.mg.hierarchy import (
    BlockProlongator,
    DenseOperator,
    Hierarchy,
    MGLevel,
    block_stencil_from_dense,
)
from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.cplx import CP
from deflatedmlmc_schwinger_tpu.ops.dirac import (
    PairStencilOperator,
    StencilOperator,
    gamma3_pair,
    pair_operator,
)
from deflatedmlmc_schwinger_tpu.solvers.eigs import (
    chebyshev_filtered_smallest,
    smallest_eigpairs_nonhermitian,
)


def build_P_blocks(tv: np.ndarray, L: int, phase_period: int, rdtype) -> BlockProlongator:
    """Build the block prolongator from host test vectors tv (n, k)."""
    n, k = tv.shape
    if n % L:
        raise ValueError(f"lattice size {n} not divisible by aggregate size {L}")
    na = n // L
    T = tv.reshape(na, L, k)
    pos = np.arange(L)
    g0 = np.where((pos % phase_period) < (phase_period // 2))[0]
    g1 = np.where((pos % phase_period) >= (phase_period // 2))[0]
    blocks = np.zeros((na, L, 2 * k), dtype=np.complex128)
    for idx, off in ((g0, 0), (g1, k)):
        sub = T[:, idx, :]                       # (na, L/2, k)
        Q, R = np.linalg.qr(sub)
        d = np.diagonal(R, axis1=-2, axis2=-1)   # (na, k)
        phase = np.where(np.abs(d) > 0, d / np.maximum(np.abs(d), 1e-300), 1.0)
        Q = Q * np.conj(phase)[:, None, :]
        blocks[:, idx[:, None], off + np.arange(k)[None, :]] = Q
    return BlockProlongator(
        blocks=CP(
            jnp.asarray(blocks.real.astype(np.dtype(rdtype))),
            jnp.asarray(blocks.imag.astype(np.dtype(rdtype))),
        )
    )


def galerkin_coarse(op, P: BlockProlongator, rdtype) -> np.ndarray:
    """Host complex coarse operator C = P^H A P via dc batched applications.

    Columns are processed in within-aggregate-index groups: for fixed c the
    basis vectors {P e_{(j,c)}}_j have disjoint support, so one (na, n) pair
    batch matvec produces a full column stripe of C.
    """
    na, L, dc = P.blocks.re.shape
    n = na * L
    nc = na * dc
    C = np.zeros((nc, nc), dtype=np.complex128)
    ar = jnp.arange(na)
    for c in range(dc):
        Xr = jnp.zeros((na, na, L), rdtype).at[ar, ar, :].set(P.blocks.re[:, :, c])
        Xi = jnp.zeros((na, na, L), rdtype).at[ar, ar, :].set(P.blocks.im[:, :, c])
        X = CP(Xr.reshape(na, n), Xi.reshape(na, n))
        Y = op.matvec(X)                 # (na, n) pair
        RY = P.apply_adjoint(Y)          # (na, nc) ; row j = C[:, j*dc+c]
        C[:, c::dc] = cplx.to_complex(RY).T
    return C


def _test_vectors(op, k: int, cfg: TraceConfig, seed: int, tol: float) -> np.ndarray:
    """Near-kernel test vectors of the level pair operator (reference modes
    'EVs' | 'LSVs' | 'RSVs', multigrid.py:159-188). Returns host (n, k)."""
    mode = cfg.test_vectors_type
    rdtype = op.dtype
    mvQ = lambda v: gamma3_pair(op.matvec(v))
    if mode in ("RSVs", "LSVs"):
        res = chebyshev_filtered_smallest(
            mvQ, op.n, k, rdtype=rdtype, seed=seed,
            degree=cfg.chebyshev_degree, rounds=cfg.subspace_iters, tol=tol,
        )
        V = res.vectors
        if mode == "LSVs":
            half = V.shape[0] // 2
            V = np.concatenate([V[:half], -V[half:]], axis=0)
        return V
    elif mode == "EVs":
        _, V = smallest_eigpairs_nonhermitian(
            op.matvec, mvQ, op.n, k, rdtype=rdtype, seed=seed,
            degree=cfg.chebyshev_degree, rounds=cfg.subspace_iters,
        )
        return V
    raise ValueError(f"unknown test_vectors_type {mode!r}")


def setup_hierarchy(
    op0,
    cfg: TraceConfig,
    *,
    key=None,  # retained for API compatibility; seeding is cfg.seed-derived
) -> Hierarchy:
    """Build the multigrid hierarchy for the fine operator op0
    (StencilOperator or PairStencilOperator)."""
    if isinstance(op0, StencilOperator):
        op0 = pair_operator(op0)
    rdtype = op0.dtype
    dof = list(cfg.dof)
    aggrs = list(cfg.aggrs)
    max_levels = int(cfg.max_nr_levels)
    if dof[0] != 2:
        raise ValueError("dof[0] must be 2 (spin components)")
    if cfg.accuracy_mg_eigvs not in ("low", "high"):
        # reference raises for unknown accuracy too (multigrid.py:164-171)
        raise ValueError("<accuracy_mg_eigvs> does not have a possible value.")
    eig_tol = 1.0e-3 if cfg.accuracy_mg_eigvs == "low" else 1.0e-9

    levels: List[MGLevel] = []
    cur_op = op0
    # level-0 displacement shift (reference: multigrid.py:148-150)
    perm_shift = 2 * cfg.nt * cfg.x_displacement if cfg.use_permuted else 0

    for i in range(max_levels - 1):
        L = aggrs[i] * dof[i]
        phase_period = dof[i] if i == 0 else dof[i] // 2
        k = dof[i + 1] // 2
        tv = _test_vectors(cur_op, k, cfg, cfg.seed + 977 * i, eig_tol)
        P = build_P_blocks(tv, L, phase_period, rdtype)
        C = galerkin_coarse(cur_op, P, rdtype)
        levels.append(MGLevel(op=cur_op, P=P, perm_shift=perm_shift))
        # coarse-level shift (reference: multigrid.py:321-326)
        perm_shift = (perm_shift // L) * dof[i + 1] if cfg.use_permuted else 0
        is_coarsest = i + 1 == max_levels - 1
        cur_op = None
        if not is_coarsest and cfg.coarse_format == "auto":
            dc = 2 * (dof[i + 1] // 2)
            cur_op = block_stencil_from_dense(C, dc, rdtype)
        if cur_op is None:
            cur_op = DenseOperator(
                mat=CP(
                    jnp.asarray(C.real.astype(np.dtype(rdtype))),
                    jnp.asarray(C.imag.astype(np.dtype(rdtype))),
                )
            )
        if is_coarsest:
            coarsest_dense = C

    levels.append(MGLevel(op=cur_op, P=None, perm_shift=perm_shift))
    Cinv = np.linalg.inv(coarsest_dense)
    coarsest_inv = CP(
        jnp.asarray(Cinv.real.astype(np.dtype(rdtype))),
        jnp.asarray(Cinv.imag.astype(np.dtype(rdtype))),
    )
    hier = Hierarchy(levels=tuple(levels), coarsest_inv=coarsest_inv)
    if cfg.check_quality_MG:
        for name, val in check_quality(hier).items():
            print(f"\t{name} = {val:.3e}")
    return hier


def check_quality(hier: Hierarchy) -> Dict[str, float]:
    """The reference's opt-in invariant checks (multigrid.py:282-316):
    orthonormality ||RP - I||_F, gamma3-compatibility of P, Hermiticity of
    A_{l+1} and gamma3*A_{l+1} (host)."""
    out: Dict[str, float] = {}
    for i, lev in enumerate(hier.levels[:-1]):
        b = cplx.to_complex(lev.P.blocks)
        na, L, dc = b.shape
        gram = np.einsum("alk,alm->akm", np.conj(b), b)
        eye = np.eye(dc)
        out[f"orthonormality of P at level {i}"] = float(
            np.sqrt(np.sum(np.abs(gram - eye[None]) ** 2))
        )
        # gamma3-compat: strips never straddle the spin half, and the coarse
        # layout is aggregate-major, so fine and coarse per-strip signs agree
        fine_sign = np.where(np.arange(na) < na // 2, 1.0, -1.0)
        coarse_sign = fine_sign
        mism = (fine_sign - coarse_sign)[:, None, None] * b
        out[f"g3-compatibility at level {i}"] = float(
            np.sqrt(np.sum(np.abs(mism) ** 2))
        )
        Ac = hier.levels[i + 1].op.complex_matrix()
        out[f"hermiticity of A at level {i+1}"] = float(
            np.linalg.norm(Ac - Ac.conj().T)
        )
        half = Ac.shape[0] // 2
        g3Ac = np.concatenate([Ac[:half], -Ac[half:]], axis=0)
        out[f"hermiticity of g3*A at level {i+1}"] = float(
            np.linalg.norm(g3Ac - g3Ac.conj().T)
        )
    return out
