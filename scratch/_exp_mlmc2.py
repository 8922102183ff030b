import faulthandler, time, sys
faulthandler.dump_traceback_later(560, exit=True)
import numpy as np
from deflatedmlmc_schwinger_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp
from deflatedmlmc_schwinger_tpu.config import SolverConfig, TraceConfig
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.trace.deflation import Deflation, mlmc_level_deflation
from deflatedmlmc_schwinger_tpu.trace.mlmc import mlmc_step_batch, bblock_matrix
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source
from deflatedmlmc_schwinger_tpu.ops import cplx

cfg = TraceConfig(
    matrix="schwinger128.mat", mass=-0.1320, latt_dims=(128,128),
    trace_tol=1e-2, max_nr_levels=4, aggrs=(16,4,4), dof=(2,8,8,8),
    accuracy_mg_eigvs="low", test_vectors_type="RSVs",
    nr_deflat_vctrs=8, defl_eigvs_tol_Hutch=1e-4,
    mlmc_deflat_vctrs=(0,0,0), mlmc_levels_to_skip=(1,),
    use_permuted=True, x_displacement=2, chebyshev_degree=60, subspace_iters=8,
    probe_batch=128, dtype=jnp.complex64,
    solver=SolverConfig(restart=40, smoother="poly"), function_tol=5e-4)

t0=time.time()
op,_ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims, dtype=np.complex64)
hier = setup_hierarchy(op, cfg); jax.block_until_ready(hier.coarsest_inv.re)
print(f"setup {time.time()-t0:.1f}s", flush=True)
pop = pair_operator(op)
solver = MGSolver(hier, cfg.solver)
skip = True
nodefl = Deflation(U=None, tr1=0.0+0.0j)
for lev in (0, 2):
    probes = make_probe_source("jax", cfg.seed + lev)
    n_l = hier.levels[lev].n
    es_all = []
    for b in range(3):
        t=time.time()
        es, it1, it2, coarse = mlmc_step_batch(solver, cfg, lev, nodefl,
                                               probes(b*128, 128, n_l, jnp.float32), skip)
        es_all.append(np.asarray(es))
        print(f"level {lev} batch {b}: {time.time()-t:.1f}s iters~{int(np.max(it1))}", flush=True)
    es = np.concatenate(es_all)
    dev = float(np.sqrt(np.mean(np.abs(es - es.mean())**2)))
    print(f"level {lev}: dev {dev:.3f}  mean {complex(es.mean()):.4f}", flush=True)
# coarsest exact
t=time.time()
M = cplx.to_complex(hier.coarsest_inv)
Bc = bblock_matrix(hier, hier.nr_levels-1)
M2 = np.roll(M @ Bc, hier.levels[-1].perm_shift, axis=0)
print(f"coarsest exact {time.time()-t:.1f}s trace {complex(np.trace(M2)):.4f}", flush=True)
