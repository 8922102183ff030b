"""Pallas TPU kernel for the fine-level Wilson--Dirac 9-point stencil matvec.

The stencil matvec is hot loop #1 (SURVEY.md section 3.3: fine-level SpMV
inside every smoother application and residual of every V-cycle; reference
substrate: scipy CSR SpMV, multigrid.py:552-557). The XLA fallback path
(ops/dirac.py) expresses it as 5 rolled reads + 36 real multiply-add fields,
which XLA fuses into a few elementwise kernels but may re-read the shifted
operand from HBM per tap. This kernel performs the whole application in one
VMEM-resident pass: the probe block and the 20 complex coefficient fields are
read from HBM exactly once and the output written exactly once -- the
memory-bandwidth speed-of-light for this op (arithmetic intensity ~4.5
flops/byte at batch 8, firmly bandwidth-bound).

Layout: grid over probe-batch blocks; per step the block (Bb, 2, X, T) sits
in VMEM ((X, T) are the sublane/lane dims -- T is a multiple of 128 for every
production lattice) together with the full coefficient tensor
(2, 2, 5, X, T) as (re, im) pairs. Neighbor reads are static circular shifts
implemented with two-slice concatenation (loop-free, Mosaic-friendly).

Used automatically by PairStencilOperator.matvec on the TPU backend when the
lattice is tile-aligned; ops/dirac.py remains the oracle and the CPU path.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deflatedmlmc_schwinger_tpu.ops.cplx import CP

# (dx, dt) offsets; tap 0 is the on-site term (ops/dirac.py TAPS).
TAPS: Tuple[Tuple[int, int], ...] = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))

# Per-probe-block VMEM budget (bytes) for picking the batch block size; the
# coefficient tensor (full) rides along on top of this. Mosaic's live set is
# several times the in+out block (double-buffered operands plus the
# shifted-read temporaries and the stacked output), so the kernel declares
# its own vmem_limit_bytes (v5e has 128 MB VMEM; the default scoped limit of
# 16 MB rejects production batches: measured 18.5-22 MB peaks at bb=8..16).
_VMEM_BUDGET = 4 * 1024 * 1024
_VMEM_LIMIT = 96 * 1024 * 1024


def _shift(x: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """Circular shift so that out[i] = x[(i + d) % n] along ``axis``
    (equivalent to jnp.roll(x, -d, axis)), as a two-slice concat."""
    if d == 0:
        return x
    n = x.shape[axis]
    d = d % n
    lo = jax.lax.slice_in_dim(x, d, n, axis=axis)
    hi = jax.lax.slice_in_dim(x, 0, d, axis=axis)
    return jnp.concatenate([lo, hi], axis=axis)


def _stencil_kernel(cr_ref, ci_ref, vr_ref, vi_ref, yr_ref, yi_ref):
    """One batch block: y[s,x,t] = sum_{s',k} C[s,s',k,x,t] v[s',x+dx,t+dt]."""
    vr = vr_ref[:]  # (Bb, 2, X, T)
    vi = vi_ref[:]
    out_r = [None, None]
    out_i = [None, None]
    for k, (dx, dt) in enumerate(TAPS):
        sr = _shift(_shift(vr, dx, 2), dt, 3)
        si = _shift(_shift(vi, dx, 2), dt, 3)
        for a in range(2):
            for b in range(2):
                if a != b and k == 0:
                    continue  # cross-spin diagonal structurally zero
                cr = cr_ref[a, b, k]  # (X, T)
                ci = ci_ref[a, b, k]
                vbr = sr[:, b]  # (Bb, X, T)
                vbi = si[:, b]
                tr = cr * vbr - ci * vbi
                ti = cr * vbi + ci * vbr
                out_r[a] = tr if out_r[a] is None else out_r[a] + tr
                out_i[a] = ti if out_i[a] is None else out_i[a] + ti
    yr_ref[:] = jnp.stack(out_r, axis=1)
    yi_ref[:] = jnp.stack(out_i, axis=1)


def _batch_block(B: int, nx: int, nt: int, itemsize: int) -> int:
    """Largest divisor of B whose in+out block fits the VMEM budget."""
    per_probe = 2 * nx * nt * itemsize * 2 * 2  # spin * re/im * in+out
    cap = max(1, _VMEM_BUDGET // per_probe)
    bb = min(B, cap)
    while B % bb:
        bb -= 1
    return bb


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _stencil_pallas_call(coeffs: CP, v: CP, nx: int, nt: int, interpret: bool) -> CP:
    B = v.re.shape[0]
    bb = _batch_block(B, nx, nt, v.re.dtype.itemsize)
    cspec = pl.BlockSpec(
        (2, 2, 5, nx, nt), lambda i: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    vspec = pl.BlockSpec(
        (bb, 2, nx, nt), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    flops = B * 5 * 4 * nx * nt * 8  # ~8 real flops per (tap, spin-pair) site
    bytes_acc = (B * 2 * 2 * 2 + 2 * 2 * 5 * 2) * nx * nt * v.re.dtype.itemsize
    yr, yi = pl.pallas_call(
        _stencil_kernel,
        grid=(B // bb,),
        in_specs=[cspec, cspec, vspec, vspec],
        out_specs=[vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, 2, nx, nt), v.re.dtype),
            jax.ShapeDtypeStruct((B, 2, nx, nt), v.im.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(coeffs.re, coeffs.im, v.re, v.im)
    return CP(yr, yi)


def stencil_matvec_pallas(
    coeffs: CP, v: CP, nx: int, nt: int, *, interpret: bool = False
) -> CP:
    """y = D @ v for flat pair vectors v of shape (..., 2*nx*nt).

    Semantics identical to ops/dirac.py::PairStencilOperator.matvec (the
    oracle used by tests/test_pallas.py)."""
    batch = v.re.shape[:-1]
    B = 1
    for s in batch:
        B *= s
    g = v.reshape((B, 2, nx, nt))
    y = _stencil_pallas_call(coeffs, g, nx, nt, interpret)
    return y.reshape(batch + (2 * nx * nt,))


def pallas_available(nx: int, nt: int, backend: str | None = None) -> bool:
    """The kernel path is used on TPU for tile-aligned lattices (T a multiple
    of the 128-lane width, X of the 8-sublane height: 128^2 and up);
    DMLMC_PALLAS=0 disables, =1 forces (interpreted off-TPU, for debugging)."""
    env = os.environ.get("DMLMC_PALLAS", "").strip()
    if env == "0":
        return False
    if nt % 128 or nx % 8:
        return False
    if env == "1":
        return True
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu"
