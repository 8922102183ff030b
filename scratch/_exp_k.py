import time, sys
import numpy as np
from deflatedmlmc_schwinger_tpu.utils import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp
from deflatedmlmc_schwinger_tpu.config import SolverConfig, TraceConfig
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.trace.deflation import hutchinson_deflation
from deflatedmlmc_schwinger_tpu.trace.hutchinson import hutchinson_step_batch
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source

base = TraceConfig(
    matrix="schwinger128.mat", mass=-0.1320, latt_dims=(128,128),
    trace_tol=1e-2, max_nr_levels=4, aggrs=(16,4,4), dof=(2,8,8,8),
    accuracy_mg_eigvs="low", test_vectors_type="RSVs",
    use_permuted=True, x_displacement=2, chebyshev_degree=60, subspace_iters=8,
    probe_batch=128, dtype=jnp.complex64, defl_eigvs_tol_Hutch=1e-4,
    solver=SolverConfig(restart=40, smoother="poly"), function_tol=5e-4)

op,_ = load_operator(base.matrix, base.mass, latt_dims=base.latt_dims, dtype=np.complex64)
t=time.time(); hier = setup_hierarchy(op, base); jax.block_until_ready(hier.coarsest_inv.re)
print(f"setup {time.time()-t:.1f}s", flush=True)
op = pair_operator(op)
solver = MGSolver(hier, base.solver)
probes = make_probe_source("jax", 51234)
for k, rounds in ((64, 4), (96, 4), (128, 4), (128, 6)):
    cfg = base.replace(nr_deflat_vctrs=k, defl_subspace_rounds=rounds)
    t=time.time()
    defl = hutchinson_deflation(op, solver, cfg)
    jax.block_until_ready(defl.U.re)
    t_defl = time.time()-t
    es_all = []
    t=time.time()
    for b in range(4):
        X = probes(b*128, 128, op.n, jnp.float32)
        es, _ = hutchinson_step_batch(op, solver, cfg, defl, X)
        es_all.append(es)
    t_samp = time.time()-t
    es = np.concatenate(es_all)
    dev = float(np.sqrt(np.mean(np.abs(es - es.mean())**2)))
    est = complex(es.mean()) + defl.tr1
    # projected honest time-to-1%: n = (dev/0.51)^2 at 512/t_samp solves/s
    n_need = (dev/0.51)**2
    proj = t_defl + n_need * t_samp/512
    print(f"k={k:3d} r={rounds}: defl {t_defl:6.1f}s dev {dev:7.2f} est {est:.3f} "
          f"rate {512/t_samp:.0f}/s  proj_1pct {proj:.0f}s", flush=True)
