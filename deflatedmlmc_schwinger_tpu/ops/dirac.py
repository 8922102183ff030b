"""The Wilson--Dirac 9-point stencil operator as dense coefficient fields.

The reference stores D as a scipy CSR matrix and multiplies with native SpMV
(reference: multigrid.py:552-557 and every ``A*x`` site). Every nonzero of the
Schwinger matrices lies on one of 9 lattice offsets per row -- diagonal + 4
same-spin nearest neighbors + 4 opposite-spin nearest neighbors, with periodic
wrap (verified empirically for both shipped .mat files; see
io/stencil.py). The TPU-native representation is therefore a dense complex
coefficient tensor

    C[s_out, s_in, tap, x, t]     shape (2, 2, 5, X, T)

with taps ((dx, dt)) = ((0,0), (0,1), (0,-1), (1,0), (-1,0)); the cross-spin
diagonal tap is structurally zero. The matvec is 5 rolled reads fused with a
(2x2 spin) contraction -- pure VPU work that XLA fuses into a handful of
elementwise kernels, batched over any number of probe vectors at once.

Vector layout matches the reference's spin-major flat indexing
(index = spin*(N/2) + x*nt + t, reference: gateway.py:159, multigrid.py:144-149):
flat vectors of length N = 2*X*T reshape to (..., 2, X, T) with C order.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

# (dx, dt) offsets; tap 0 is the on-site term.
TAPS: Tuple[Tuple[int, int], ...] = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))


@struct.dataclass
class StencilOperator:
    """9-point gauged stencil on the (spin=2, X, T) lattice.

    ``coeffs`` has shape (2, 2, 5, X, T): out-spin, in-spin, tap, x, t.
    """

    coeffs: jnp.ndarray
    nx: int = struct.field(pytree_node=False, default=0)
    nt: int = struct.field(pytree_node=False, default=0)

    @property
    def n(self) -> int:
        return 2 * self.nx * self.nt

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.coeffs.dtype

    def matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        """Apply to flat vectors v of shape (..., N)."""
        return stencil_matvec(self.coeffs, v, self.nx, self.nt)

    def to_grid(self, v: jnp.ndarray) -> jnp.ndarray:
        return v.reshape(v.shape[:-1] + (2, self.nx, self.nt))

    def from_grid(self, g: jnp.ndarray) -> jnp.ndarray:
        return g.reshape(g.shape[:-3] + (2 * self.nx * self.nt,))


def stencil_matvec(coeffs: jnp.ndarray, v: jnp.ndarray, nx: int, nt: int) -> jnp.ndarray:
    """y = D @ v for flat v of shape (..., 2*nx*nt).

    y[s,x,t] = sum_{s',k} C[s,s',k,x,t] * v[s', (x+dx_k)%nx, (t+dt_k)%nt].
    """
    batch_shape = v.shape[:-1]
    g = v.reshape(batch_shape + (2, nx, nt))
    out = jnp.zeros_like(g)
    for k, (dx, dt) in enumerate(TAPS):
        shifted = g
        if dx:
            shifted = jnp.roll(shifted, shift=-dx, axis=-2)
        if dt:
            shifted = jnp.roll(shifted, shift=-dt, axis=-1)
        # out[..., s, x, t] += sum_{s'} C[s, s', k, x, t] * shifted[..., s', x, t]
        out = out + jnp.einsum("abxt,...bxt->...axt", coeffs[:, :, k], shifted)
    return out.reshape(v.shape)


def gamma3(v: jnp.ndarray) -> jnp.ndarray:
    """Apply gamma_3 = diag(+I, -I) on the two spin halves of flat vectors.

    Reference: multigrid.py:130-133 builds this diag at every level; here it is
    an index-free sign flip of the second half (valid at every level because
    aggregates never straddle the spin boundary -- see mg/setup.py).
    """
    half = v.shape[-1] // 2
    return jnp.concatenate([v[..., :half], -v[..., half:]], axis=-1)


def shift_rows_up(v: jnp.ndarray, d: int) -> jnp.ndarray:
    """(Pi v)[i] = v[(i+d) % N] -- the reference's Pperm "rows upwards"
    cyclic displacement operator (multigrid.py:141-155)."""
    return jnp.roll(v, shift=-d, axis=-1)


def shift_rows_down(v: jnp.ndarray, d: int) -> jnp.ndarray:
    """(Pi^T v)[i] = v[(i-d) % N] (reference: utils.py:232 ``Pperm.transpose()*x``)."""
    return jnp.roll(v, shift=d, axis=-1)
