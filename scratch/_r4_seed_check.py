"""Round-4: is the persistent ~(+0.46+0.47j) offset of the 128^2 flagship
estimate a seed-specific draw or a systematic bias?

Run the deflated-Hutchinson sampling at FIXED n for several probe seeds
(shared hierarchy + deflation basis): a draw scatters the estimates around
the oracle with spread ~stderr; a bias clusters them off-center.
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
from deflatedmlmc_schwinger_tpu.trace.deflation import hutchinson_deflation
from deflatedmlmc_schwinger_tpu.trace.hutchinson import hutchinson_step_batch
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source
from deflatedmlmc_schwinger_tpu.utils.tunnel import warm_transfers

ORACLE = -8.748242701374695 + 50.215154098005584j
N_FIXED = 16384
SEEDS = (51234, 777, 31415, 271828)

cfg = set_params("schwinger128")
warm_transfers()
t0 = time.time()
op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                      dtype=np.complex64)
hier = setup_hierarchy(op, cfg)
op = pair_operator(op)
jax.block_until_ready(hier.coarsest_inv.re)
solver = MGSolver(hier, cfg.solver)
defl = hutchinson_deflation(op, solver, cfg)
print(f"setup+defl {time.time()-t0:.1f}s  tr1={defl.tr1:.4f}", flush=True)

B = int(cfg.probe_batch)
for seed in SEEDS:
    probes = make_probe_source("jax", seed)
    t0 = time.time()
    es_all = []
    for start in range(0, N_FIXED, B):
        es, _, _ = hutchinson_step_batch(op, solver, cfg, defl,
                                         probes(start, B, op.n, jnp.float32))
        es_all.append(np.asarray(es))
    es = np.concatenate(es_all)
    tr = complex(es.mean()) + defl.tr1
    dev = float(np.sqrt(np.mean(np.abs(es - es.mean()) ** 2)))
    stderr = dev / np.sqrt(len(es))
    off = tr - ORACLE
    print(
        f"seed {seed}: trace {tr:.4f}  offset {off:.4f} (|.|={abs(off):.3f}, "
        f"{abs(off)/stderr:.2f} sigma)  dev {dev:.1f}  {time.time()-t0:.1f}s",
        flush=True,
    )
