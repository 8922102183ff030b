"""Round-5: phase-by-phase timing of hutchinson_deflation at the current
flagship config (mirrors trace/deflation.py structure)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from deflatedmlmc_schwinger_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp
from deflatedmlmc_schwinger_tpu.config import SolverConfig
from deflatedmlmc_schwinger_tpu.gateway import set_params
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.cplx import CP
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator, gamma3_pair, shift_rows_up_pair, shift_rows_down_pair
from deflatedmlmc_schwinger_tpu.solvers.eigs import inverse_iteration_smallest_device

cfg = set_params("schwinger128")
t0=time.time()
op0, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims, dtype=np.complex64)
hier = setup_hierarchy(op0, cfg)
op = pair_operator(op0)
jax.block_until_ready(hier.coarsest_inv.re)
print(f"setup {time.time()-t0:.1f}s", flush=True)
solver = MGSolver(hier, cfg.solver)
basis_solver = MGSolver(hier, cfg.defl_solver)
rdtype = op.dtype
k = int(cfg.nr_deflat_vctrs); m = int(cfg.defl_buffer)
mvQ = jax.jit(lambda v: gamma3_pair(op.matvec(v)))
solve_tol = cfg.solver.effective_tol(cfg.defl_eigvs_tol_Hutch, jnp.complex64)

calls = []
def apply_Qinv(v):
    t=time.time()
    r = basis_solver.solve(gamma3_pair(v), solve_tol)
    jax.block_until_ready(r.x.re)
    it = int(np.max(np.asarray(r.iters)))
    calls.append((time.time()-t, it))
    return r.x

t0=time.time()
eig = inverse_iteration_smallest_device(mvQ, apply_Qinv, op.n, k, rdtype=rdtype,
    seed=cfg.seed+101, rounds=int(cfg.defl_subspace_rounds),
    tol=cfg.defl_eigvs_tol_Hutch, buffer=m)
jax.block_until_ready(eig.vectors.re)
t_inv = time.time()-t0
print(f"inverse iteration total {t_inv:.1f}s; per-solve: {[(round(s,2),it) for s,it in calls]}", flush=True)

theta = eig.values; Vr = eig.vectors
sgn = jnp.asarray(np.sign(theta).astype(np.float32))[:, None]
Ur = cplx.scale_real(gamma3_pair(Vr), sgn)
d = hier.levels[0].perm_shift
Ur2 = shift_rows_up_pair(Ur, d)
rhs = shift_rows_down_pair(Ur2, d)
t0=time.time()
res = basis_solver.solve(rhs, cfg.function_tol)
jax.block_until_ready(res.x.re)
it = int(np.max(np.asarray(res.iters))); st=int(np.sum(np.asarray(res.stalled)))
print(f"correction solve {time.time()-t0:.1f}s iters={it} stalled={st}", flush=True)
# compare: correction through the DEEP sampling solver
t0=time.time()
res2 = solver.solve(rhs, cfg.function_tol)
jax.block_until_ready(res2.x.re)
it2 = int(np.max(np.asarray(res2.iters))); st2=int(np.sum(np.asarray(res2.stalled)))
print(f"correction via si=16 solver {time.time()-t0:.1f}s iters={it2} stalled={st2}", flush=True)
