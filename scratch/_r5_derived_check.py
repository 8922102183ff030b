"""Round-5: verify MGSolver.derived() kills the per-call retrace/re-load in
deflation setup -- hutchinson_deflation called twice in one process should
pay program loads once (call 1) and pure compute after (call 2)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from deflatedmlmc_schwinger_tpu.utils import jaxcache
jaxcache.enable()
import jax
from deflatedmlmc_schwinger_tpu.gateway import set_params
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.trace.deflation import hutchinson_deflation

cfg = set_params("schwinger128")
t0 = time.time()
op0, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                       dtype=np.complex64)
hier = setup_hierarchy(op0, cfg)
op = pair_operator(op0)
jax.block_until_ready(hier.coarsest_inv.re)
print(f"setup {time.time()-t0:.1f}s", flush=True)
solver = MGSolver(hier, cfg.solver)
for i in range(3):
    t0 = time.time()
    defl = hutchinson_deflation(op, solver, cfg)
    jax.block_until_ready(defl.U.re)
    print(f"call {i}: {time.time()-t0:.1f}s  tr1={defl.tr1:.6f}", flush=True)
