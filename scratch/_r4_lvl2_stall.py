"""Round-4: why do level-2 (2048^2) solves stall at tol 5e-4 in f32?

Solve random batches at each level and print achieved relative residuals,
iteration counts and restart cycles, for poly and gmres smoothers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from deflatedmlmc_schwinger_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from deflatedmlmc_schwinger_tpu.config import SolverConfig
from deflatedmlmc_schwinger_tpu.gateway import set_params
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops.cplx import CP
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source

cfg = set_params("schwinger128")
op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                      dtype=np.complex64)
hier = setup_hierarchy(op, cfg)
jax.block_until_ready(hier.coarsest_inv.re)
print(f"sizes={hier.sizes()}", flush=True)

probes = make_probe_source("jax", 99)
for smoother in ("poly", "gmres"):
    solver = MGSolver(hier, SolverConfig(restart=40, smoother=smoother))
    for lev in (0, 1, 2):
        n_l = hier.levels[lev].n
        X = probes(0, 32, n_l, jnp.float32)
        t = time.time()
        res = solver.solve(X, 5e-4, level=lev)
        rr = np.asarray(res.resnorm / res.bnorm)
        print(
            f"{smoother} level {lev}: relres min/med/max = "
            f"{rr.min():.2e}/{np.median(rr):.2e}/{rr.max():.2e}  "
            f"stalled {int(np.sum(np.asarray(res.stalled)))}/32  "
            f"iters_max {int(np.max(np.asarray(res.iters)))} "
            f"cycles {int(res.cycles)}  {time.time()-t:.1f}s",
            flush=True,
        )
