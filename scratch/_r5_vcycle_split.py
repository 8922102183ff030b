"""Round-5: attribute the V-cycle's 55% of per-iteration time (VERDICT r4
item 4). Times each V-cycle component standalone as its own jitted program at
the flagship shapes (B=128 probes, 128^2 hierarchy 32768->8192->2048->512),
plus the assembled V-cycle and a full solve for cross-checks.

Components:
  fine  : level-0 Pallas fused poly smooth_residual (pre-smoothing step)
  fineR : level-0 Pallas fused residual (post-prolong)
  fineS : level-0 Pallas poly smooth (post-smoothing, no residual)
  l1/l2 : level-1/2 poly smoother (grouped-band matvecs) + residual
  coarse: coarsest dense inverse apply (B,512)@(512,512)
  P/R   : prolongator applications per level
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
from deflatedmlmc_schwinger_tpu.mg.cycle import residual
from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.cplx import CP
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator

cfg = set_params("schwinger128")
op0, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                       dtype=np.complex64)
hier = setup_hierarchy(op0, cfg)
op = pair_operator(op0)
jax.block_until_ready(hier.coarsest_inv.re)
solver = MGSolver(hier, cfg.solver)
sms = solver._smoothers(0)
B = int(cfg.probe_batch)
print("sizes", hier.sizes(), flush=True)

key = jax.random.PRNGKey(0)


def rand_pair(n):
    k1, k2 = jax.random.split(jax.random.fold_in(key, n))
    return CP(jax.random.normal(k1, (B, n), jnp.float32),
              jax.random.normal(k2, (B, n), jnp.float32))


def bench(name, fn, *args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.3f} ms", flush=True)
    return dt


levels = hier.levels
b0 = rand_pair(levels[0].n)
b1 = rand_pair(levels[1].n)
b2 = rand_pair(levels[2].n)
b3 = rand_pair(levels[3].n)
x0 = rand_pair(levels[0].n)

t = {}
t["fine_smooth_res"] = bench("fine smooth_residual", lambda b: sms[0].smooth_residual(levels[0].op.matvec, b), b0)
t["fine_smooth"] = bench("fine smooth", lambda b: sms[0].smooth(levels[0].op.matvec, b), b0)
t["fine_residual"] = bench("fine residual", lambda b, x: residual(levels[0].op, b, x), b0, x0)
t["fine_matvec"] = bench("fine matvec", lambda x: levels[0].op.matvec(x), x0)
t["R0"] = bench("R0 (apply_adjoint)", lambda x: levels[0].P.apply_adjoint(x), b0)
t["P0"] = bench("P0 (apply)", lambda y: levels[0].P.apply(y), b1)
t["l1_smooth_res"] = bench("l1 smooth_residual", lambda b: sms[1].smooth_residual(levels[1].op.matvec, b), b1)
t["l1_smooth"] = bench("l1 smooth", lambda b: sms[1].smooth(levels[1].op.matvec, b), b1)
t["l1_matvec"] = bench("l1 matvec (grouped band)", lambda x: levels[1].op.matvec(x), b1)
t["l1_residual"] = bench("l1 residual", lambda b, x: residual(levels[1].op, b, x), b1, b1)
t["R1"] = bench("R1", lambda x: levels[1].P.apply_adjoint(x), b1)
t["P1"] = bench("P1", lambda y: levels[1].P.apply(y), b2)
t["l2_smooth_res"] = bench("l2 smooth_residual", lambda b: sms[2].smooth_residual(levels[2].op.matvec, b), b2)
t["l2_smooth"] = bench("l2 smooth", lambda b: sms[2].smooth(levels[2].op.matvec, b), b2)
t["l2_matvec"] = bench("l2 matvec (grouped band)", lambda x: levels[2].op.matvec(x), b2)
t["l2_residual"] = bench("l2 residual", lambda b, x: residual(levels[2].op, b, x), b2, b2)
t["R2"] = bench("R2", lambda x: levels[2].P.apply_adjoint(x), b2)
t["P2"] = bench("P2", lambda y: levels[2].P.apply(y), b3)
t["coarsest"] = bench("coarsest dense apply", lambda b: cplx.matmul_right(b, hier.coarsest_inv), b3)

vc = solver.precond(0)
t["vcycle"] = bench("FULL v-cycle", vc, b0, iters=20)

# sum-of-parts model of one v-cycle:
model = (t["fine_smooth_res"] + t["R0"]
         + t["l1_smooth_res"] + t["R1"]
         + t["l2_smooth_res"] + t["R2"]
         + t["coarsest"]
         + t["P2"] + t["l2_residual"] + t["l2_smooth"]
         + t["P1"] + t["l1_residual"] + t["l1_smooth"]
         + t["P0"] + t["fine_residual"] + t["fine_smooth"])
print(f"\nsum-of-parts model: {model:.3f} ms  vs measured v-cycle {t['vcycle']:.3f} ms", flush=True)

# one full solve for the iteration-level cross-check
res = solver.solve(b0, 5e-4)
jax.block_until_ready(res.x.re)
t0 = time.time()
res = solver.solve(b0, 5e-4)
jax.block_until_ready(res.x.re)
dt = time.time() - t0
it = int(np.max(np.asarray(res.iters)))
print(f"solve: {dt*1e3:.1f} ms, iters_max={it}, {dt/it*1e3:.3f} ms/iter, "
      f"vcycle share {t['vcycle']/(dt/it*1e3):.2f}", flush=True)
