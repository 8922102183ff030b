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


def _apply_taps(cr_ref, ci_ref, vr, vi):
    """y[s,x,t] = sum_{s',k} C[s,s',k,x,t] v[s',x+dx,t+dt] on one VMEM block
    (Bb, 2, X, T); returns the stacked (yr, yi). Shared by every kernel so the
    fused smoother/residual kernels apply the operator without leaving VMEM."""
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
    return jnp.stack(out_r, axis=1), jnp.stack(out_i, axis=1)


def _stencil_kernel(cr_ref, ci_ref, vr_ref, vi_ref, yr_ref, yi_ref):
    """One batch block: y = A v."""
    yr, yi = _apply_taps(cr_ref, ci_ref, vr_ref[:], vi_ref[:])
    yr_ref[:] = yr
    yi_ref[:] = yi


def _residual_kernel(cr_ref, ci_ref, br_ref, bi_ref, xr_ref, xi_ref,
                     rr_ref, ri_ref):
    """One batch block: r = b - A x, a single VMEM pass (the unfused form is
    one stencil launch plus an HBM round-trip for the subtraction)."""
    yr, yi = _apply_taps(cr_ref, ci_ref, xr_ref[:], xi_ref[:])
    rr_ref[:] = br_ref[:] - yr
    ri_ref[:] = bi_ref[:] - yi


def _poly_kernel(roots, with_residual, cr_ref, ci_ref, rr_ref, ri_ref,
                 *out_refs):
    """One batch block of the GMRES-polynomial smoother (mg/cycle.py
    poly_smoother): x = p(A) r via the residual recurrence

        cur_0 = r;  step_k = cur_k / theta_k;  x += step_k;
        cur_{k+1} = cur_k - A step_k

    entirely in VMEM -- the unfused form launches one stencil kernel plus
    ~3 HBM-round-trip elementwise passes per root. ``cur`` after the last
    update IS the smoothed residual r - A x; ``with_residual`` keeps the
    final A application and writes it (the V-cycle's descent needs it),
    otherwise the last application is skipped entirely (m-1 applies)."""
    cur_r = rr_ref[:]
    cur_i = ri_ref[:]
    xr = None
    xi = None
    for k, th in enumerate(roots):
        inv = 1.0 / th
        ir, ii = float(inv.real), float(inv.imag)
        sr = ir * cur_r - ii * cur_i
        si = ir * cur_i + ii * cur_r
        xr = sr if xr is None else xr + sr
        xi = si if xi is None else xi + si
        if k == len(roots) - 1 and not with_residual:
            break
        ar, ai = _apply_taps(cr_ref, ci_ref, sr, si)
        cur_r = cur_r - ar
        cur_i = cur_i - ai
    out_refs[0][:] = xr
    out_refs[1][:] = xi
    if with_residual:
        out_refs[2][:] = cur_r
        out_refs[3][:] = cur_i


def _batch_block(B: int, nx: int, nt: int, itemsize: int) -> int:
    """Largest divisor of B whose in+out block fits the VMEM budget."""
    per_probe = 2 * nx * nt * itemsize * 2 * 2  # spin * re/im * in+out
    cap = max(1, _VMEM_BUDGET // per_probe)
    bb = min(B, cap)
    while B % bb:
        bb -= 1
    return bb


def _grid_call(kernel, coeffs: CP, fields, nx: int, nt: int, n_out: int,
               n_applies: int, interpret: bool):
    """Launch ``kernel`` over probe-batch blocks: the coefficient tensor rides
    whole in VMEM, every field/output is blocked (bb, 2, X, T). ``fields`` is
    a flat list of real arrays (re/im interleaved); returns ``n_out`` arrays."""
    B = fields[0].shape[0]
    rdtype = fields[0].dtype
    bb = _batch_block(B, nx, nt, rdtype.itemsize)
    cspec = pl.BlockSpec(
        (2, 2, 5, nx, nt), lambda i: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    vspec = pl.BlockSpec(
        (bb, 2, nx, nt), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    flops = n_applies * B * 5 * 4 * nx * nt * 8  # ~8 real flops/(tap, spin-pair)
    bytes_acc = (
        B * 2 * (len(fields) + n_out) + 2 * 2 * 5 * 2
    ) * nx * nt * rdtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[cspec, cspec] + [vspec] * len(fields),
        out_specs=[vspec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((B, 2, nx, nt), rdtype)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(coeffs.re, coeffs.im, *fields)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _stencil_pallas_call(coeffs: CP, v: CP, nx: int, nt: int, interpret: bool) -> CP:
    yr, yi = _grid_call(
        _stencil_kernel, coeffs, [v.re, v.im], nx, nt, 2, 1, interpret
    )
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


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _residual_pallas_call(coeffs: CP, b: CP, x: CP, nx: int, nt: int,
                          interpret: bool) -> CP:
    rr, ri = _grid_call(
        _residual_kernel, coeffs, [b.re, b.im, x.re, x.im], nx, nt, 2, 1,
        interpret,
    )
    return CP(rr, ri)


def stencil_residual_pallas(
    coeffs: CP, b: CP, x: CP, nx: int, nt: int, *, interpret: bool = False
) -> CP:
    """r = b - A x for flat pair vectors (..., 2*nx*nt), one fused pass."""
    batch = b.re.shape[:-1]
    B = 1
    for s in batch:
        B *= s
    r = _residual_pallas_call(
        coeffs, b.reshape((B, 2, nx, nt)), x.reshape((B, 2, nx, nt)),
        nx, nt, interpret,
    )
    return r.reshape(batch + (2 * nx * nt,))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _poly_pallas_call(coeffs: CP, r: CP, roots, with_residual: bool,
                      nx: int, nt: int, interpret: bool):
    kernel = functools.partial(_poly_kernel, roots, with_residual)
    n_out = 4 if with_residual else 2
    n_applies = len(roots) if with_residual else len(roots) - 1
    out = _grid_call(
        kernel, coeffs, [r.re, r.im], nx, nt, n_out, n_applies, interpret
    )
    if with_residual:
        return CP(out[0], out[1]), CP(out[2], out[3])
    return CP(out[0], out[1]), None


def stencil_poly_smooth_pallas(
    coeffs: CP, r: CP, roots, nx: int, nt: int, *,
    with_residual: bool = False, interpret: bool = False,
):
    """x = p(A) r with p the fixed GMRES residual-polynomial inverse
    (mg/cycle.py poly_smoother), every root application fused in VMEM.

    Returns (x, r - A x) when ``with_residual`` (the final smoothed residual
    falls out of the recurrence for free), else (x, None) -- skipping the
    last operator application entirely."""
    batch = r.re.shape[:-1]
    B = 1
    for s in batch:
        B *= s
    roots = tuple(complex(t) for t in roots)
    x, cur = _poly_pallas_call(
        coeffs, r.reshape((B, 2, nx, nt)), roots, bool(with_residual),
        nx, nt, interpret,
    )
    x = x.reshape(batch + (2 * nx * nt,))
    if cur is not None:
        cur = cur.reshape(batch + (2 * nx * nt,))
    return x, cur


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
