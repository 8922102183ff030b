"""Round-5 v-cycle attribution, take 3: truncated-cycle differencing.

precond(l) is the V-cycle STARTING at level l; timing each inside the same
fori_loop harness and differencing attributes per-level cost in context
(same program structure, shared overheads cancel). Also sweeps FGMRES
restart and the smoother depth for the optimization candidates from the r4
verdict (item 4)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from deflatedmlmc_schwinger_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
from jax import lax

from deflatedmlmc_schwinger_tpu.config import SolverConfig
from deflatedmlmc_schwinger_tpu.gateway import set_params
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.cplx import CP
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source

cfg = set_params("schwinger128")
op0, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                       dtype=np.complex64)
hier = setup_hierarchy(op0, cfg)
jax.block_until_ready(hier.coarsest_inv.re)
solver = MGSolver(hier, cfg.solver)
B = int(cfg.probe_batch)
levels = hier.levels
print("sizes", hier.sizes(), flush=True)

key = jax.random.PRNGKey(0)


def rand_pair(n):
    k1, k2 = jax.random.split(jax.random.fold_in(key, n))
    return CP(jax.random.normal(k1, (B, n), jnp.float32),
              jax.random.normal(k2, (B, n), jnp.float32))


K = 40


def bench_loop(name, step, x0, reps=3):
    f = jax.jit(lambda v: lax.fori_loop(0, K, lambda i, y: step(y), v))
    jax.block_until_ready(f(x0).re)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(f(x0).re)
        best = min(best, time.time() - t0)
    ms = best / K * 1e3
    print(f"{name:34s} {ms:8.4f} ms", flush=True)
    return ms


bs = [rand_pair(levels[i].n) for i in range(4)]

vc = [bench_loop(f"v-cycle from level {l}", solver.precond(l), bs[l])
      for l in range(3)]
coarsest = bench_loop("coarsest dense apply",
                      lambda y: cplx.matmul_right(y, hier.coarsest_inv), bs[3])
print(f"\nin-context attribution (differences):")
print(f"  level-0 work (smooth+res+P/R): {vc[0]-vc[1]:.3f} ms "
      f"({100*(vc[0]-vc[1])/vc[0]:.0f}%)")
print(f"  level-1 work                : {vc[1]-vc[2]:.3f} ms "
      f"({100*(vc[1]-vc[2])/vc[0]:.0f}%)")
print(f"  level-2 work + coarsest     : {vc[2]:.3f} ms "
      f"({100*vc[2]/vc[0]:.0f}%)  [standalone coarsest {coarsest:.3f}]",
      flush=True)

# ---- full-solve sweeps (deflated-load shapes): restart and smoother ----
probes = make_probe_source("jax", 7)
X = probes(0, B, levels[0].n, jnp.float32)


def solve_time(sc: SolverConfig, tol=5e-4, reps=2):
    s = MGSolver(hier, sc)
    r = s.solve(X, tol)
    jax.block_until_ready(r.x.re)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        r = s.solve(X, tol)
        jax.block_until_ready(r.x.re)
        best = min(best, time.time() - t0)
    it = int(np.max(np.asarray(r.iters)))
    rr = float(np.max(np.asarray(r.resnorm / r.bnorm)))
    return best, it, rr


for restart in (20, 30, 40, 60):
    dt, it, rr = solve_time(SolverConfig(restart=restart, smoother="poly"))
    print(f"restart={restart:3d}: {dt*1e3:7.1f} ms  iters={it:4d} "
          f"relres={rr:.2e}  -> {B/dt:.0f} solves/s", flush=True)
for si in (2, 4, 6, 8):
    dt, it, rr = solve_time(
        SolverConfig(restart=40, smoother="poly", smooth_iters=si))
    print(f"smooth_iters={si}: {dt*1e3:7.1f} ms  iters={it:4d} "
          f"relres={rr:.2e}  -> {B/dt:.0f} solves/s", flush=True)
