"""Round-5: quantify the deflation-setup reduction (VERDICT r4 item 2).

Sweep (defl_subspace_rounds, defl_warm_filter_degree) on-chip at 128^2 and
measure (a) defl_setup wall seconds, (b) the per-probe deviation of the
resulting deflated estimator over a fixed 2048-probe sample (16 batches of
128), (c) tr1. Baseline r4: rounds=5, no warm filter -> 24.8 s setup at
dev ~73. Target: setup <= 10 s at dev within 5% of 73.
"""

import os
import sys
import time

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
from deflatedmlmc_schwinger_tpu.trace.hutchinson import hutchinson_step_batch
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source
from deflatedmlmc_schwinger_tpu.trace.stats import RunningMoments

cfg = set_params("schwinger128")

t0 = time.time()
op0, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                       dtype=np.complex64)
hier = setup_hierarchy(op0, cfg)
op = pair_operator(op0)
jax.block_until_ready(hier.coarsest_inv.re)
print(f"mg_setup {time.time()-t0:.1f}s", flush=True)
solver = MGSolver(hier, cfg.solver)

B = int(cfg.probe_batch)
NBATCH = int(os.environ.get("NBATCH", "16"))
probes = make_probe_source("jax", cfg.seed)

SWEEP = [
    (5, 0),      # r4 baseline
    (3, 0),
    (2, 0),
    (3, 800),
    (2, 800),
    (2, 400),
    (1, 800),
]
if os.environ.get("SWEEP"):
    SWEEP = [tuple(int(x) for x in t.split(","))
             for t in os.environ["SWEEP"].split(";")]

for rounds, deg in SWEEP:
    c = cfg.replace(defl_subspace_rounds=rounds, defl_warm_filter_degree=deg)
    t0 = time.time()
    defl = hutchinson_deflation(op, solver, c)
    jax.block_until_ready(defl.U.re)
    dt_setup = time.time() - t0
    m = RunningMoments()
    t1 = time.time()
    for i in range(NBATCH):
        X = probes(i * B, B, op.n, op.dtype)
        es, _, _ = hutchinson_step_batch(op, solver, c, defl, X)
        m.update_batch(es)
    dt_samp = time.time() - t1
    print(
        f"rounds={rounds} deg={deg}: setup {dt_setup:.1f}s  dev {m.std_dev:.2f}"
        f"  tr1 {defl.tr1:.4f}  mean {m.mean:.3f}"
        f"  |eig range| [{np.abs(defl.values).min():.2e},"
        f" {np.abs(defl.values).max():.2e}]  samp {dt_samp:.1f}s",
        flush=True,
    )
