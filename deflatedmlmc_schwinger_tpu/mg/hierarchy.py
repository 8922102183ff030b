"""Containers for the multigrid hierarchy (the reference's LevelML/SimpleML,
multigrid.py:26-48, re-designed as JAX pytrees).

Level operators:
  * level 0: the 9-point StencilOperator (ops/dirac.py);
  * coarse levels: DenseOperator -- coarse matrices are small (8192^2 and
    below for the shipped configs) and a dense batched matvec runs on the MXU.

Prolongators are stored as per-aggregate dense blocks (n_aggr, L, 2k):
aggregation is a partition of the flat index space into contiguous strips of
length L that never straddle the spin boundary, so P is block-diagonal over
strips and applying P / R = P^H is one batched einsum -- there is no
gather/scatter and no CSR anywhere on device (the reference's Python
quad-loop P assembly + CGS is multigrid.py:192-259).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DenseOperator:
    """Dense coarse-level operator; matvec on (..., n) batches uses the MXU."""

    mat: jnp.ndarray  # (n, n)

    @property
    def n(self) -> int:
        return self.mat.shape[0]

    @property
    def dtype(self):
        return self.mat.dtype

    def matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        return v @ self.mat.T


@struct.dataclass
class BlockProlongator:
    """Aggregation prolongator as dense per-aggregate blocks.

    blocks[j] is the (L, 2k) orthonormal-column block of aggregate j; the
    coarse index layout is j*(2k) + g*k + c (aggregate-major, matching the
    reference's jj_ptr = j*dofip1*2 + g*dofip1 + k, multigrid.py:214,226).
    """

    blocks: jnp.ndarray  # (n_aggr, L, 2k)

    @property
    def n_fine(self) -> int:
        return self.blocks.shape[0] * self.blocks.shape[1]

    @property
    def n_coarse(self) -> int:
        return self.blocks.shape[0] * self.blocks.shape[2]

    def apply(self, y: jnp.ndarray) -> jnp.ndarray:
        """P @ y for flat coarse vectors y of shape (..., n_coarse)."""
        na, L, dc = self.blocks.shape
        ya = y.reshape(y.shape[:-1] + (na, dc))
        out = jnp.einsum("alk,...ak->...al", self.blocks, ya)
        return out.reshape(y.shape[:-1] + (na * L,))

    def apply_adjoint(self, x: jnp.ndarray) -> jnp.ndarray:
        """R @ x = P^H @ x for flat fine vectors x of shape (..., n_fine)."""
        na, L, dc = self.blocks.shape
        xa = x.reshape(x.shape[:-1] + (na, L))
        out = jnp.einsum("alk,...al->...ak", jnp.conj(self.blocks), xa)
        return out.reshape(x.shape[:-1] + (na * dc,))

    def to_dense(self) -> jnp.ndarray:
        """Materialize P as a dense (n_fine, n_coarse) matrix (tests only)."""
        import numpy as np

        na, L, dc = self.blocks.shape
        P = np.zeros((na * L, na * dc), dtype=self.blocks.dtype)
        b = np.asarray(self.blocks)
        for j in range(na):
            P[j * L : (j + 1) * L, j * dc : (j + 1) * dc] = b[j]
        return jnp.asarray(P)


@struct.dataclass
class MGLevel:
    """One level: its operator, the prolongator to the next coarser level,
    and the displacement shift for the permuted (displaced-trace) observable."""

    op: Any                                  # StencilOperator | DenseOperator
    P: Optional[BlockProlongator]            # None on the coarsest level
    perm_shift: int = struct.field(pytree_node=False, default=0)

    @property
    def n(self) -> int:
        return self.op.n


@struct.dataclass
class Hierarchy:
    levels: Tuple[MGLevel, ...]
    coarsest_inv: jnp.ndarray  # dense inverse of the coarsest operator

    @property
    def nr_levels(self) -> int:
        return len(self.levels)

    def sizes(self) -> Tuple[int, ...]:
        return tuple(lev.n for lev in self.levels)
