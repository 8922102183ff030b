"""Round-5: extend the smoother-depth/restart sweep (take 3 showed
smooth_iters 4->8 buys +23% solve throughput at tol 5e-4)."""
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
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source

cfg = set_params("schwinger128")
op0, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims, dtype=np.complex64)
hier = setup_hierarchy(op0, cfg)
jax.block_until_ready(hier.coarsest_inv.re)
B = int(cfg.probe_batch)
probes = make_probe_source("jax", 7)
X = probes(0, B, hier.levels[0].n, jnp.float32)

def solve_time(sc, tol=5e-4, reps=2):
    s = MGSolver(hier, sc)
    r = s.solve(X, tol); jax.block_until_ready(r.x.re)
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); r = s.solve(X, tol); jax.block_until_ready(r.x.re)
        best = min(best, time.time() - t0)
    it = int(np.max(np.asarray(r.iters)))
    rr = float(np.max(np.asarray(r.resnorm / r.bnorm)))
    st = int(np.sum(np.asarray(r.stalled)))
    return best, it, rr, st

for si in (8, 10, 12, 16):
    for restart in (24, 32, 40):
        dt, it, rr, st = solve_time(SolverConfig(restart=restart, smoother="poly", smooth_iters=si))
        print(f"si={si:2d} restart={restart:2d}: {dt*1e3:7.1f} ms iters={it:4d} "
              f"relres={rr:.2e} stalled={st} -> {B/dt:.0f} solves/s", flush=True)
