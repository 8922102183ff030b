import time, sys
import numpy as np
from deflatedmlmc_schwinger_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp
from deflatedmlmc_schwinger_tpu.config import SolverConfig, TraceConfig
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.trace import hutchinson
from deflatedmlmc_schwinger_tpu.utils.timer import PhaseTimer

cfg = TraceConfig(
    matrix="schwinger128.mat", mass=-0.1320, latt_dims=(128,128),
    trace_tol=1e-2, max_nr_levels=4, aggrs=(16,4,4), dof=(2,8,8,8),
    accuracy_mg_eigvs="low", test_vectors_type="RSVs", nr_deflat_vctrs=8,
    use_permuted=True, x_displacement=2, chebyshev_degree=60, subspace_iters=8,
    probe_batch=128, dtype=jnp.complex64,
    solver=SolverConfig(restart=40, smoother="poly"), function_tol=5e-4)

t0=time.time()
op,_ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims, dtype=np.complex64)
print(f"load: {time.time()-t0:.1f}s", flush=True)
t1=time.time()
hier = setup_hierarchy(op, cfg)
jax.block_until_ready(hier.coarsest_inv.re)
print(f"setup: {time.time()-t1:.1f}s", flush=True)
op = pair_operator(op)
solver = MGSolver(hier, cfg.solver)
timer = PhaseTimer()
t2=time.time()
result = hutchinson(op, cfg, solver=solver, verbose=True, timer=timer)
t3=time.time()
tr = result["trace"]
print(f"hutchinson: {t3-t2:.1f}s  total: {t3-t0:.1f}s  n={result['nr_ests']}  trace={tr:.4f}", flush=True)
print(str(timer), flush=True)
