import time, sys
import numpy as np
from deflatedmlmc_schwinger_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp
from deflatedmlmc_schwinger_tpu.config import SolverConfig, TraceConfig
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.trace import mlmc
from deflatedmlmc_schwinger_tpu.utils.timer import PhaseTimer

ORACLE = -8.748242701374695 + 50.215154098005584j
cfg = TraceConfig(
    matrix="schwinger128.mat", mass=-0.1320, latt_dims=(128,128),
    trace_tol=1e-2, max_nr_levels=4, aggrs=(16,4,4), dof=(2,8,8,8),
    accuracy_mg_eigvs="low", test_vectors_type="RSVs",
    nr_deflat_vctrs=8, defl_eigvs_tol_Hutch=1e-4,
    mlmc_deflat_vctrs=(0,0,0), mlmc_levels_to_skip=(1,),
    use_permuted=True, x_displacement=2, chebyshev_degree=60, subspace_iters=8,
    probe_batch=128, dtype=jnp.complex64, mlmc_schedule="adaptive",
    solver=SolverConfig(restart=40, smoother="poly"), function_tol=5e-4)

t0=time.time()
op,_ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims, dtype=np.complex64)
timer = PhaseTimer()
res = mlmc(op, cfg, timer=timer, verbose=True)
wall = time.time()-t0
tr = res["trace"]
rel = abs(tr - ORACLE)/abs(ORACLE)
print(f"MLMC wall {wall:.1f}s trace={tr:.4f} rel_err={rel:.4f} agg_stderr={res['std_dev']:.3f}", flush=True)
print(str(timer), flush=True)
