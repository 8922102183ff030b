"""Round-4: instrument the Hutchinson deflation setup (r3: 37 s of the 73 s
end-to-end) -- per-round timing of the inverse subspace iteration, split into
the batched MG solve vs the Ritz machinery (host round-trips), plus the
correction solve. Mirrors trace/deflation.py + solvers/eigs.py line-for-line.
"""

import os
import sys
import time

# NOTE: use sys.path, not PYTHONPATH -- setting PYTHONPATH breaks the axon
# TPU plugin registration in this image (backend 'axon' then fails to load)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from deflatedmlmc_schwinger_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

import scipy.linalg as sla

from deflatedmlmc_schwinger_tpu.gateway import set_params
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.cplx import CP
from deflatedmlmc_schwinger_tpu.ops.dirac import (
    gamma3_pair,
    pair_operator,
    shift_rows_down_pair,
    shift_rows_up_pair,
)
from deflatedmlmc_schwinger_tpu.solvers.eigs import (
    _harmonic_small_solve,
    _ritz_kernels_factory,
    _to_pair_rows,
    _orth,
)

cfg = set_params("schwinger128")

t0 = time.time()
op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                      dtype=np.complex64)
hier = setup_hierarchy(op, cfg)
op = pair_operator(op)
jax.block_until_ready(hier.coarsest_inv.re)
print(f"setup {time.time()-t0:.1f}s", flush=True)
solver = MGSolver(hier, cfg.solver)

rdtype = op.dtype
k = int(cfg.nr_deflat_vctrs)
m = int(cfg.defl_buffer)
mvQ = jax.jit(lambda v: gamma3_pair(op.matvec(v)))
solve_tol = cfg.solver.effective_tol(cfg.defl_eigvs_tol_Hutch, jnp.complex64)
print(f"k={k} m={m} solve_tol={solve_tol}", flush=True)


def apply_Qinv(v):
    return solver.solve(gamma3_pair(v), solve_tol).x


def sync(x):
    jax.block_until_ready(x.re if isinstance(x, CP) else x)


t0 = time.time()
rng = np.random.default_rng(cfg.seed + 101)
V = rng.standard_normal((op.n, m)) + 1j * rng.standard_normal((op.n, m))
V = _orth(V)
Vd = _to_pair_rows(V.T, rdtype)
sync(Vd)
print(f"init+orth+upload {time.time()-t0:.2f}s", flush=True)

gram, project, recombine = _ritz_kernels_factory(mvQ)
eps = 1e3 * np.finfo(np.dtype(rdtype)).eps


def orth_T(Vd):
    G = cplx.to_complex(gram(Vd))
    Gs = 0.5 * (G + G.conj().T)
    scale = float(np.real(np.trace(Gs))) / m
    L = np.linalg.cholesky(Gs + (eps * scale) * np.eye(m))
    return sla.solve_triangular(L.conj().T, np.eye(m), lower=False)


for r in range(int(cfg.defl_subspace_rounds)):
    t0 = time.time()
    Vd = apply_Qinv(Vd)
    sync(Vd)
    t1 = time.time()
    T = orth_T(Vd)
    t2 = time.time()
    W, U, Ad, Bd = project(Vd, _to_pair_rows(T, rdtype))
    A_h = cplx.to_complex(Ad)
    B_h = cplx.to_complex(Bd)
    t3 = time.time()
    Y = _harmonic_small_solve(A_h, B_h, eps)
    t4 = time.time()
    Vd, _, theta_d, res_d = recombine(W, U, _to_pair_rows(Y, rdtype))
    res = np.asarray(res_d, dtype=np.float64)
    t5 = time.time()
    print(
        f"round {r}: solve {t1-t0:.2f}s  gram/chol {t2-t1:.2f}s  "
        f"project {t3-t2:.2f}s  small_solve {t4-t3:.2f}s  "
        f"recombine+res {t5-t4:.2f}s  total {t5-t0:.2f}s  "
        f"max_res[:k]={float(np.max(res[:k])):.2e}",
        flush=True,
    )

t0 = time.time()
W, U, Ad, _ = project(Vd, _to_pair_rows(orth_T(Vd), rdtype))
M = cplx.to_complex(Ad)
M = 0.5 * (M + M.conj().T)
mu, Z = np.linalg.eigh(M)
order = np.argsort(np.abs(mu))
Vd, _, theta_d, res_d = recombine(W, U, _to_pair_rows(Z[:, order], rdtype))
theta = np.asarray(theta_d, dtype=np.float64)[:k]
Vr = Vd[:k]
sync(Vr)
print(f"final RR {time.time()-t0:.2f}s", flush=True)

# correction solve (trace/deflation.py correction_mode='solve')
t0 = time.time()
sgn = jnp.asarray(np.sign(theta).astype(np.dtype(rdtype)))[:, None]
Ur = cplx.scale_real(gamma3_pair(Vr), sgn)
d = hier.levels[0].perm_shift
if cfg.use_permuted and d:
    Ur = shift_rows_up_pair(Ur, d)
rhs = Ur
if cfg.use_permuted and d:
    rhs = shift_rows_down_pair(rhs, d)
fn_tol = cfg.solver.effective_tol(cfg.function_tol, jnp.complex64)
Zs = solver.solve(rhs, fn_tol).x
diag = cplx.cdot(Ur, Zs[:k])
tr1 = complex(float(jnp.sum(diag.re)) + 1j * float(jnp.sum(diag.im)))
print(f"correction solve {time.time()-t0:.2f}s  tr1={tr1:.4f}", flush=True)
