"""Round-4 consolidated on-chip measurements (one process, one tunnel
bring-up):

1. f32 probe-solve bias at 128^2: matched probes at the production solve
   tolerance vs the f32 floor; the per-probe difference isolates solver bias
   from Monte-Carlo noise.
2. G301 (generated 256^2): setup wall, probe-solve rate, and a full
   deflated-Hutchinson run to its stopping rule.
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

from deflatedmlmc_schwinger_tpu.gateway import set_params
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.trace import hutchinson
from deflatedmlmc_schwinger_tpu.trace.deflation import hutchinson_deflation
from deflatedmlmc_schwinger_tpu.trace.hutchinson import hutchinson_step_batch
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source
from deflatedmlmc_schwinger_tpu.utils.timer import PhaseTimer
from deflatedmlmc_schwinger_tpu.utils.tunnel import warm_transfers

t0 = time.time()
warm_transfers()
print(f"warm-up {time.time()-t0:.1f}s", flush=True)

# ---- 1. f32 solve-tolerance bias at 128^2 ----
cfg = set_params("schwinger128")
t0 = time.time()
op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                      dtype=np.complex64)
hier = setup_hierarchy(op, cfg)
op = pair_operator(op)
jax.block_until_ready(hier.coarsest_inv.re)
solver = MGSolver(hier, cfg.solver)
defl = hutchinson_deflation(op, solver, cfg)
print(f"[bias] setup+defl {time.time()-t0:.1f}s", flush=True)

B = int(cfg.probe_batch)
N = 4096
probes = make_probe_source("jax", 777)
diffs = []
t0 = time.time()
for start in range(0, N, B):
    X = probes(start, B, op.n, jnp.float32)
    e_l, _, _ = hutchinson_step_batch(op, solver, cfg, defl, X)
    e_t, _, _ = hutchinson_step_batch(
        op, solver, cfg.replace(function_tol=3e-7), defl, X)
    diffs.append(np.asarray(e_l) - np.asarray(e_t))
d = np.concatenate(diffs)
bias = complex(d.mean())
dev_d = float(np.sqrt(np.mean(np.abs(d - d.mean()) ** 2)))
print(
    f"[bias] tol 5e-4 vs floor over {len(d)} matched probes: "
    f"bias {bias:.5f} (|.|={abs(bias):.4f} +- {dev_d/np.sqrt(len(d)):.4f}; "
    f"1pct budget 0.51)  diff_dev {dev_d:.3f}  {time.time()-t0:.1f}s",
    flush=True,
)

del hier, solver, defl, op

# ---- 2. G301: generated 256^2 ----
cfg3 = set_params("schwinger256").replace(
    # tuned like the 128^2 flagship: larger loose deflation basis, full
    # rough batch, f32 solve target, poly smoother, safety margin
    nr_deflat_vctrs=64,
    defl_eigvs_tol_Hutch=1e-2,
    defl_subspace_rounds=5,
    defl_buffer=64,
    rough_batch_full=True,
    stop_safety=0.6,
    probe_batch=64,
    chebyshev_degree=60,
    subspace_iters=8,
    dtype=jnp.complex64,
    function_tol=5e-4,
)
from deflatedmlmc_schwinger_tpu.config import SolverConfig

cfg3 = cfg3.replace(solver=SolverConfig(restart=40, smoother="poly"))

t_all = time.time()
op3, _ = load_operator(cfg3.matrix, cfg3.mass, latt_dims=cfg3.latt_dims,
                       dtype=np.complex64)
t0 = time.time()
hier3 = setup_hierarchy(op3, cfg3)
jax.block_until_ready(hier3.coarsest_inv.re)
setup_s = time.time() - t0
print(f"[g301] mg_setup {setup_s:.1f}s sizes={hier3.sizes()}", flush=True)
solver3 = MGSolver(hier3, cfg3.solver)
pop3 = pair_operator(op3)

# probe-solve rate (undeflated worst case, like the 128^2 bench row)
from deflatedmlmc_schwinger_tpu.ops.dirac import shift_rows_down_pair
from deflatedmlmc_schwinger_tpu.solvers.fgmres import fgmres

B3 = int(cfg3.probe_batch)
pr = make_probe_source("jax", 7)
mv = solver3.matvec(0)
pc = solver3.precond(0)
X = pr(0, B3, pop3.n, jnp.float32)
res = fgmres(mv, X, tol=5e-4, restart=cfg3.solver.restart,
             max_restarts=cfg3.solver.max_restarts, precond=pc)
jax.block_until_ready(res.x.re)   # compile
t0 = time.time()
res = fgmres(mv, pr(B3, B3, pop3.n, jnp.float32), tol=5e-4,
             restart=cfg3.solver.restart,
             max_restarts=cfg3.solver.max_restarts, precond=pc)
jax.block_until_ready(res.x.re)
dt = time.time() - t0
rr = float(np.max(np.asarray(res.resnorm / res.bnorm)))
print(f"[g301] probe solves: {B3/dt:.1f}/s (relres_max {rr:.1e}, "
      f"iters_max {int(np.max(np.asarray(res.iters)))})", flush=True)

timer = PhaseTimer()
t0 = time.time()
r = hutchinson(op3, cfg3, solver=solver3, verbose=False, timer=timer)
wall = time.time() - t0 + setup_s
stderr = r["std_dev"] / max(np.sqrt(r["nr_ests"]), 1)
print(
    f"[g301] hutchinson: wall {wall:.1f}s  trace {r['trace']:.4f}  "
    f"stderr {stderr:.4f}  n {r['nr_ests']}  stalled {r['stalled_rows']}  "
    f"(total incl load {time.time()-t_all:.1f}s)",
    flush=True,
)
print(str(timer), flush=True)
