"""Round-5: tr1 correction quality vs solver profile + refinement.
The G102 trace lands consistently ~+0.45 high in Im (1.2 sigma) across
stopping points; if tr1 carries an f32/stall bias, refinement shows it."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from deflatedmlmc_schwinger_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp
from deflatedmlmc_schwinger_tpu.utils.tunnel import warm_transfers
warm_transfers()
from deflatedmlmc_schwinger_tpu.config import SolverConfig
from deflatedmlmc_schwinger_tpu.gateway import set_params
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator, gamma3_pair, shift_rows_up_pair, shift_rows_down_pair
from deflatedmlmc_schwinger_tpu.solvers.eigs import inverse_iteration_smallest_device
from deflatedmlmc_schwinger_tpu.trace.deflation import solve_refined_host

cfg = set_params("schwinger128")
op0, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims, dtype=np.complex64)
hier = setup_hierarchy(op0, cfg)
op = pair_operator(op0)
jax.block_until_ready(hier.coarsest_inv.re)
solver = MGSolver(hier, cfg.solver)          # si=16
basis_solver = MGSolver(hier, cfg.defl_solver)  # si=4
rdtype = op.dtype
k = int(cfg.nr_deflat_vctrs); m = int(cfg.defl_buffer)
mvQ = jax.jit(lambda v: gamma3_pair(op.matvec(v)))
solve_tol = cfg.solver.effective_tol(cfg.defl_eigvs_tol_Hutch, jnp.complex64)
apply_Qinv = lambda v: basis_solver.solve(gamma3_pair(v), solve_tol).x
t0=time.time()
eig = inverse_iteration_smallest_device(mvQ, apply_Qinv, op.n, k, rdtype=rdtype,
    seed=cfg.seed+101, rounds=int(cfg.defl_subspace_rounds),
    tol=cfg.defl_eigvs_tol_Hutch, buffer=m)
print(f"basis {time.time()-t0:.1f}s", flush=True)
theta = eig.values; Vr = eig.vectors
sgn = jnp.asarray(np.sign(theta).astype(np.float32))[:, None]
Ur = cplx.scale_real(gamma3_pair(Vr), sgn)
d = hier.levels[0].perm_shift
Ur = shift_rows_up_pair(Ur, d)
rhs = shift_rows_down_pair(Ur, d)
Uh = (np.asarray(Ur.re, np.float64) + 1j*np.asarray(Ur.im, np.float64))

for name, slv, steps in [("si4", basis_solver, 0), ("si4+r1", basis_solver, 1),
                          ("si4+r2", basis_solver, 2), ("si16", solver, 0),
                          ("si16+r1", solver, 1)]:
    t0=time.time()
    Z, stalled = solve_refined_host(slv, op, rhs, cfg.function_tol, steps, int(cfg.probe_batch))
    tr1 = complex(np.sum(np.conj(Uh) * Z))
    print(f"{name:8s}: tr1 {tr1:.6f}  stalled={int(np.sum(stalled))}  {time.time()-t0:.1f}s", flush=True)
