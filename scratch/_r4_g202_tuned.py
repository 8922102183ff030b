"""Round-4: tuned G202 (deflated MG-MLMC, 128^2 displaced trace) on-chip.

TPU-native profile: dense-exact level-2 difference + coarsest, dense coarse
apply in the level-0 sampling, level-0 probes deflated with the k=128
Hutchinson basis (exact add-back). Usage:
    python scratch/_r4_g202_tuned.py [max_ests]
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
from deflatedmlmc_schwinger_tpu.trace import mlmc
from deflatedmlmc_schwinger_tpu.utils.timer import PhaseTimer

ORACLE = -8.748242701374695 + 50.215154098005584j

cfg = set_params("schwinger128").replace(
    mlmc_exact_dense_max_n=4096,
    mlmc_fine_deflation=True,
    mlmc_schedule="sequential",
)
if len(sys.argv) > 1:
    cfg = cfg.replace(max_nr_ests=int(sys.argv[1]))

t0 = time.time()
op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                      dtype=np.complex64)
timer = PhaseTimer()
res = mlmc(op, cfg, timer=timer, verbose=True)
wall = time.time() - t0
tr = res["trace"]
rel = abs(tr - ORACLE) / abs(ORACLE)
print(f"\nG202 wall {wall:.1f}s  trace={tr:.4f}  rel_err={rel:.4f}  "
      f"agg_stderr={res['std_dev']:.3f}  stalled={res['stalled_rows']}",
      flush=True)
for i, r in enumerate(res["results"]):
    print(f"  level {i}: n={r['nr_ests']} avg={complex(r['ests_avg']):.4f} "
          f"dev={r['ests_dev']:.3f} iters={r['function_iters']} "
          f"stalled={r['stalled_rows']}", flush=True)
print(str(timer), flush=True)
