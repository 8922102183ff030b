"""Round-4: per-level MLMC statistics on the 128^2 flagship, on-chip.

For the tuned solver profile, measure for each difference level (skip level
1 active, so levels 0 and 2) and for a few deflation variants:
  - per-estimate deviation (4+ batches of 128 -- r3 advisor: 2 batches has a
    4-5% noise floor on the std),
  - batch wall-clock,
plus the exact coarsest trace and the per-level deflation setup cost.  This
feeds the tuned G202 gateway config (VERDICT r4 item #1).
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
from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.trace.deflation import Deflation, mlmc_level_deflation
from deflatedmlmc_schwinger_tpu.trace.mlmc import bblock_matrix, mlmc_step_batch
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source

cfg = set_params("schwinger128")
B = int(cfg.probe_batch)
NBATCH = 4

t0 = time.time()
op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                      dtype=np.complex64)
hier = setup_hierarchy(op, cfg)
jax.block_until_ready(hier.coarsest_inv.re)
print(f"setup {time.time()-t0:.1f}s sizes={hier.sizes()}", flush=True)
pop = pair_operator(op)
solver = MGSolver(hier, cfg.solver)
skip = True
nodefl = Deflation(U=None, tr1=0.0 + 0.0j)


def level_stats(lev, defl, tag):
    probes = make_probe_source("jax", cfg.seed + lev)
    n_l = hier.levels[lev].n
    es_all = []
    times = []
    for b in range(NBATCH):
        t = time.time()
        es, it1, it2, coarse, stall = mlmc_step_batch(
            solver, cfg, lev, defl, probes(b * B, B, n_l, jnp.float32), skip
        )
        es_all.append(np.asarray(es))
        times.append(time.time() - t)
        nst = int(np.sum(stall))
        if nst:
            print(f"  [batch {b}: {nst} stalled rows]", flush=True)
    es = np.concatenate(es_all)
    dev = float(np.sqrt(np.mean(np.abs(es - es.mean()) ** 2)))
    # first batch includes compile; report the rest
    tb = float(np.median(times[1:]))
    print(
        f"level {lev} [{tag}]: dev {dev:8.3f}  mean {complex(es.mean()):.4f}  "
        f"batch {tb:.2f}s ({B/tb:.0f} est/s)  first-batch {times[0]:.2f}s",
        flush=True,
    )
    return dev, tb


# --- undeflated ---
for lev in (0, 2):
    level_stats(lev, nodefl, "k=0")

# --- deflated level 0 (the expensive level): measure setup cost + dev ---
for k in (8, 16):
    t = time.time()
    d0 = mlmc_level_deflation(solver, 0, k, cfg, skip)
    dt = time.time() - t
    print(f"level 0 deflation k={k}: setup {dt:.1f}s  tr1={d0.tr1:.4f}", flush=True)
    level_stats(0, d0, f"k={k}")

# --- exact coarsest ---
t = time.time()
M = cplx.to_complex(hier.coarsest_inv)
Bc = bblock_matrix(hier, hier.nr_levels - 1)
M2 = np.roll(M @ Bc, hier.levels[-1].perm_shift, axis=0)
print(f"coarsest exact {time.time()-t:.1f}s trace {complex(np.trace(M2)):.4f}",
      flush=True)
