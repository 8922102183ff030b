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
    reshape + QR);
  * R = P^H (multigrid.py:267-274), Galerkin A_{i+1} = R A_i P
    (multigrid.py:276), dense coarsest inverse (multigrid.py:341-344);
  * per-level displacement shifts for the permuted observable
    (multigrid.py:141-155, 318-331).

The per-aggregate QR is mathematically identical to the reference's
classical Gram--Schmidt: both produce the unique orthonormal basis with
upper-triangular change-of-basis and positive-real diagonal.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deflatedmlmc_schwinger_tpu.config import TraceConfig
from deflatedmlmc_schwinger_tpu.mg.hierarchy import (
    BlockProlongator,
    DenseOperator,
    Hierarchy,
    MGLevel,
)
from deflatedmlmc_schwinger_tpu.ops.dirac import StencilOperator, gamma3
from deflatedmlmc_schwinger_tpu.solvers.eigs import (
    chebyshev_filtered_smallest,
    smallest_eigpairs_nonhermitian,
)


def build_P_blocks(tv: jnp.ndarray, L: int, phase_period: int) -> BlockProlongator:
    """Build the block prolongator from test vectors tv (n, k)."""
    n, k = tv.shape
    if n % L:
        raise ValueError(f"lattice size {n} not divisible by aggregate size {L}")
    na = n // L
    T = tv.reshape(na, L, k)
    pos = np.arange(L)
    g0 = np.where((pos % phase_period) < (phase_period // 2))[0]
    g1 = np.where((pos % phase_period) >= (phase_period // 2))[0]
    blocks = jnp.zeros((na, L, 2 * k), dtype=tv.dtype)
    for idx, off in ((g0, 0), (g1, k)):
        sub = T[:, idx, :]                      # (na, L/2, k)
        Q, R = jnp.linalg.qr(sub)
        d = jnp.diagonal(R, axis1=-2, axis2=-1)  # (na, k)
        phase = jnp.where(jnp.abs(d) > 0, d / jnp.maximum(jnp.abs(d), 1e-300), 1.0)
        Q = Q * jnp.conj(phase)[:, None, :]
        blocks = blocks.at[:, idx, off : off + k].set(Q)
    return BlockProlongator(blocks=blocks)


def galerkin_coarse(op, P: BlockProlongator) -> jnp.ndarray:
    """Dense coarse operator C = P^H A P via dc batched applications.

    Columns are processed in within-aggregate-index groups: for fixed c the
    basis vectors {P e_{(j,c)}}_j have disjoint support, so one (na, n) batch
    matvec produces a full column stripe of C.
    """
    na, L, dc = P.blocks.shape
    n = na * L
    nc = na * dc
    C = jnp.zeros((nc, nc), dtype=P.blocks.dtype)
    ar = jnp.arange(na)
    for c in range(dc):
        X = jnp.zeros((na, na, L), dtype=P.blocks.dtype)
        X = X.at[ar, ar, :].set(P.blocks[:, :, c])
        X = X.reshape(na, n)
        Y = op.matvec(X)                 # (na, n)
        RY = P.apply_adjoint(Y)          # (na, nc) ; row j = C[:, j*dc+c]
        C = C.at[:, c::dc].set(RY.T)
    return C


def _make_matvec_Q(op) -> Callable:
    return lambda v: gamma3(op.matvec(v))


def _test_vectors(op, k: int, cfg: TraceConfig, key, tol: float) -> jnp.ndarray:
    """Near-kernel test vectors of the level operator (reference modes
    'EVs' | 'LSVs' | 'RSVs', multigrid.py:159-188)."""
    mode = cfg.test_vectors_type
    dtype = op.dtype
    mvQ = _make_matvec_Q(op)
    if mode in ("RSVs", "LSVs"):
        res = chebyshev_filtered_smallest(
            mvQ, op.n, k, dtype=dtype, key=key,
            degree=cfg.chebyshev_degree, rounds=cfg.subspace_iters, tol=tol,
        )
        V = res.vectors
        if mode == "LSVs":
            V = gamma3(V.T).T
        return V
    elif mode == "EVs":
        _, V = smallest_eigpairs_nonhermitian(
            op.matvec, mvQ, op.n, k, dtype=dtype, key=key,
            degree=cfg.chebyshev_degree, rounds=cfg.subspace_iters,
        )
        return V
    raise ValueError(f"unknown test_vectors_type {mode!r}")


def setup_hierarchy(
    op0: StencilOperator,
    cfg: TraceConfig,
    *,
    key: Optional[jax.Array] = None,
) -> Hierarchy:
    """Build the multigrid hierarchy for the fine operator op0."""
    if key is None:
        key = jax.random.key(cfg.seed)
    dof = list(cfg.dof)
    aggrs = list(cfg.aggrs)
    max_levels = int(cfg.max_nr_levels)
    if dof[0] != 2:
        raise ValueError("dof[0] must be 2 (spin components)")
    eig_tol = 1.0e-3 if cfg.accuracy_mg_eigvs == "low" else 1.0e-9
    if cfg.accuracy_mg_eigvs not in ("low", "high"):
        # reference raises for unknown accuracy too (multigrid.py:164-171)
        raise ValueError("<accuracy_mg_eigvs> does not have a possible value.")

    levels: List[MGLevel] = []
    cur_op = op0
    # level-0 displacement shift (reference: multigrid.py:148-150)
    perm_shift = 2 * cfg.nt * cfg.x_displacement if cfg.use_permuted else 0

    for i in range(max_levels - 1):
        L = aggrs[i] * dof[i]
        phase_period = dof[i] if i == 0 else dof[i] // 2
        k = dof[i + 1] // 2
        tv = _test_vectors(cur_op, k, cfg, jax.random.fold_in(key, i), eig_tol)
        P = build_P_blocks(tv, L, phase_period)
        C = galerkin_coarse(cur_op, P)
        levels.append(MGLevel(op=cur_op, P=P, perm_shift=perm_shift))
        # coarse-level shift (reference: multigrid.py:321-326)
        perm_shift = (perm_shift // L) * dof[i + 1] if cfg.use_permuted else 0
        cur_op = DenseOperator(mat=C)

    levels.append(MGLevel(op=cur_op, P=None, perm_shift=perm_shift))
    coarsest_inv = jnp.linalg.inv(cur_op.mat)
    hier = Hierarchy(levels=tuple(levels), coarsest_inv=coarsest_inv)
    if cfg.check_quality_MG:
        for name, val in check_quality(hier).items():
            print(f"\t{name} = {val:.3e}")
    return hier


def check_quality(hier: Hierarchy) -> Dict[str, float]:
    """The reference's opt-in invariant checks (multigrid.py:282-316):
    orthonormality ||RP - I||_F, gamma3-compatibility of P, Hermiticity of
    A_{l+1} and gamma3*A_{l+1}."""
    out: Dict[str, float] = {}
    for i, lev in enumerate(hier.levels[:-1]):
        P = lev.P
        na, L, dc = P.blocks.shape
        # RP per aggregate: (dc, dc) gram of each block
        gram = jnp.einsum("alk,alm->akm", jnp.conj(P.blocks), P.blocks)
        eye = jnp.eye(dc, dtype=P.blocks.dtype)
        out[f"orthonormality of P at level {i}"] = float(
            jnp.sqrt(jnp.sum(jnp.abs(gram - eye[None]) ** 2))
        )
        # gamma3-compatibility: strips never straddle the spin half, so
        # g3 P - P g3c is exactly the per-strip sign mismatch
        n = na * L
        fine_sign = np.where(np.arange(na) < na // 2, 1.0, -1.0)  # per strip
        coarse_sign = fine_sign  # coarse layout is aggregate-major
        mism = jnp.asarray((fine_sign - coarse_sign))[:, None, None] * P.blocks
        out[f"g3-compatibility at level {i}"] = float(
            jnp.sqrt(jnp.sum(jnp.abs(mism) ** 2))
        )
        Ac = hier.levels[i + 1].op.mat
        out[f"hermiticity of A at level {i+1}"] = float(
            jnp.linalg.norm(Ac - Ac.conj().T)
        )
        g3Ac = jnp.concatenate(
            [Ac[: Ac.shape[0] // 2], -Ac[Ac.shape[0] // 2 :]], axis=0
        )
        out[f"hermiticity of g3*A at level {i+1}"] = float(
            jnp.linalg.norm(g3Ac - g3Ac.conj().T)
        )
    return out
