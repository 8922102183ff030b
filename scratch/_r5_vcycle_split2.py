"""Round-5 v-cycle attribution, take 2: every component timed INSIDE one
jitted fori_loop (K reps per program) so the ~0.93 ms per-dispatch tunnel
latency (which floored every standalone measurement in take 1 -- sum of
parts 17.4 ms vs a real 3.9 ms v-cycle) cancels out. Shape-changing ops
(P/R) are timed as round-trip pairs."""

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

from deflatedmlmc_schwinger_tpu.gateway import set_params
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.mg.cycle import residual
from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.cplx import CP

cfg = set_params("schwinger128")
op0, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                       dtype=np.complex64)
hier = setup_hierarchy(op0, cfg)
jax.block_until_ready(hier.coarsest_inv.re)
solver = MGSolver(hier, cfg.solver)
sms = solver._smoothers(0)
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
    """Time K applications of shape-preserving `step` inside one program."""
    f = jax.jit(lambda v: lax.fori_loop(0, K, lambda i, y: step(y), v))
    jax.block_until_ready(f(x0).re)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(f(x0).re)
        best = min(best, (time.time() - t0))
    ms = best / K * 1e3
    print(f"{name:30s} {ms:8.4f} ms", flush=True)
    return ms


b0, b1, b2, b3 = (rand_pair(levels[i].n) for i in range(4))

t = {}
# dispatch floor: identity-ish loop (scale to keep it from being DCE'd)
t["floor"] = bench_loop("dispatch floor (scale loop)",
                        lambda y: cplx.scale_real(y, 1.0000001), b3)
t["fine_matvec"] = bench_loop("fine matvec", levels[0].op.matvec, b0)
t["fine_sm_res"] = bench_loop(
    "fine smooth_residual",
    lambda y: sms[0].smooth_residual(levels[0].op.matvec, y)[1], b0)
t["fine_sm"] = bench_loop(
    "fine smooth", lambda y: sms[0].smooth(levels[0].op.matvec, y), b0)
t["fine_res"] = bench_loop(
    "fine residual", lambda y: residual(levels[0].op, b0, y), b0)
t["PR0"] = bench_loop(
    "P0*R0 roundtrip", lambda y: levels[0].P.apply(levels[0].P.apply_adjoint(y)), b0)
t["l1_matvec"] = bench_loop("l1 matvec", levels[1].op.matvec, b1)
t["l1_sm_res"] = bench_loop(
    "l1 smooth_residual",
    lambda y: sms[1].smooth_residual(levels[1].op.matvec, y)[1], b1)
t["l1_sm"] = bench_loop(
    "l1 smooth", lambda y: sms[1].smooth(levels[1].op.matvec, y), b1)
t["l1_res"] = bench_loop(
    "l1 residual", lambda y: residual(levels[1].op, b1, y), b1)
t["PR1"] = bench_loop(
    "P1*R1 roundtrip", lambda y: levels[1].P.apply(levels[1].P.apply_adjoint(y)), b1)
t["l2_matvec"] = bench_loop("l2 matvec", levels[2].op.matvec, b2)
t["l2_sm_res"] = bench_loop(
    "l2 smooth_residual",
    lambda y: sms[2].smooth_residual(levels[2].op.matvec, y)[1], b2)
t["l2_sm"] = bench_loop(
    "l2 smooth", lambda y: sms[2].smooth(levels[2].op.matvec, y), b2)
t["l2_res"] = bench_loop(
    "l2 residual", lambda y: residual(levels[2].op, b2, y), b2)
t["PR2"] = bench_loop(
    "P2*R2 roundtrip", lambda y: levels[2].P.apply(levels[2].P.apply_adjoint(y)), b2)
t["coarsest"] = bench_loop(
    "coarsest dense apply",
    lambda y: cplx.matmul_right(y, hier.coarsest_inv), b3)

vc = solver.precond(0)
t["vcycle"] = bench_loop("FULL v-cycle", vc, b0, reps=3)

fine = t["fine_sm_res"] + t["fine_res"] + t["fine_sm"] + t["PR0"]
l1 = t["l1_sm_res"] + t["l1_res"] + t["l1_sm"] + t["PR1"]
l2 = t["l2_sm_res"] + t["l2_res"] + t["l2_sm"] + t["PR2"]
model = fine + l1 + l2 + t["coarsest"]
print(f"\nmodel {model:.3f} ms vs v-cycle {t['vcycle']:.3f} ms", flush=True)
print(f"  fine level  : {fine:.3f} ms ({100*fine/model:.0f}%)")
print(f"  level 1 8192: {l1:.3f} ms ({100*l1/model:.0f}%)")
print(f"  level 2 2048: {l2:.3f} ms ({100*l2/model:.0f}%)")
print(f"  coarsest 512: {t['coarsest']:.3f} ms ({100*t['coarsest']/model:.0f}%)", flush=True)

# cross-check: full solve per-iteration cost
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source

probes = make_probe_source("jax", 7)
X = probes(0, B, levels[0].n, jnp.float32)
res = solver.solve(X, 5e-4)
jax.block_until_ready(res.x.re)
t0 = time.time()
res = solver.solve(X, 5e-4)
jax.block_until_ready(res.x.re)
dt = time.time() - t0
it = int(np.max(np.asarray(res.iters)))
print(f"\nsolve {dt*1e3:.1f} ms, iters_max={it}, {dt/it*1e3:.3f} ms/iter; "
      f"v-cycle {100*t['vcycle']/(dt/it*1e3):.0f}%  fine stencil "
      f"{100*t['fine_matvec']/(dt/it*1e3):.0f}%  arnoldi+other "
      f"{100*(1 - (t['vcycle']+t['fine_matvec'])/(dt/it*1e3)):.0f}%", flush=True)
