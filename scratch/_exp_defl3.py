"""On-chip experiment: cost/quality of the Hutchinson deflation basis vs the
solve tolerance used inside the inverse subspace iteration (round 3 tuning).

For each variant: time hutchinson_deflation, then measure the per-probe
deviation on two 128-probe batches (the quantity that sets nr_ests).

Measurement design note: the deviation estimate from 2x128 probes carries
~4-5% sampling noise on the std itself.  The comparison across variants is
PAIRED (identical counter-keyed probes for every variant), which cancels most
of the probe-sampling noise in the *differences*, but quoted few-percent
deviation gaps (e.g. k=96 vs 128: 71 -> 67) are at the noise floor of the
unpaired std -- re-measure with 4+ batches before treating them as more than
a tie-break."""

import sys
import time

import numpy as np

from deflatedmlmc_schwinger_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from deflatedmlmc_schwinger_tpu.config import SolverConfig, TraceConfig
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.trace.deflation import hutchinson_deflation
from deflatedmlmc_schwinger_tpu.trace.hutchinson import hutchinson_step_batch
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source

BASE = TraceConfig(
    matrix="schwinger128.mat", mass=-0.1320, latt_dims=(128, 128),
    trace_tol=1e-2, max_nr_levels=4, aggrs=(16, 4, 4), dof=(2, 8, 8, 8),
    accuracy_mg_eigvs="low", test_vectors_type="RSVs",
    nr_deflat_vctrs=96, defl_eigvs_tol_Hutch=1e-4, defl_subspace_rounds=5,
    defl_buffer=128, rough_batch_full=True, use_permuted=True,
    x_displacement=2, chebyshev_degree=60, subspace_iters=8, probe_batch=128,
    dtype=jnp.complex64, solver=SolverConfig(restart=40, smoother="poly"),
    function_tol=5e-4,
)

op, _ = load_operator(BASE.matrix, BASE.mass, latt_dims=BASE.latt_dims,
                      dtype=np.complex64)
t0 = time.time()
hier = setup_hierarchy(op, BASE)
op = pair_operator(op)
jax.block_until_ready(hier.coarsest_inv.re)
print(f"setup {time.time()-t0:.1f}s", file=sys.stderr)
solver = MGSolver(hier, BASE.solver)
probes = make_probe_source("jax", BASE.seed)

VARIANTS = [
    ("k=96  1e-2 r5", dict(defl_eigvs_tol_Hutch=1e-2, defl_subspace_rounds=5)),
    ("k=128 1e-2 r5", dict(defl_eigvs_tol_Hutch=1e-2, defl_subspace_rounds=5,
                           nr_deflat_vctrs=128)),
    ("k=192 1e-2 r5", dict(defl_eigvs_tol_Hutch=1e-2, defl_subspace_rounds=5,
                           nr_deflat_vctrs=192, defl_buffer=192)),
    ("k=256 1e-2 r5", dict(defl_eigvs_tol_Hutch=1e-2, defl_subspace_rounds=5,
                           nr_deflat_vctrs=256, defl_buffer=256)),
]

for name, kw in VARIANTS:
    cfg = BASE.replace(**kw)
    t0 = time.time()
    defl = hutchinson_deflation(op, solver, cfg)
    jax.block_until_ready(defl.U.re)
    t_defl = time.time() - t0
    devs = []
    t0 = time.time()
    for s in range(2):
        X = probes(s * 128, 128, op.n, jnp.float32)
        es, _ = hutchinson_step_batch(op, solver, cfg, defl, X)
        devs.append(np.std(es))
    t_samp = time.time() - t0
    dev = float(np.mean(devs))
    print(f"{name:18s} defl={t_defl:6.1f}s dev={dev:7.2f} "
          f"tr1={defl.tr1:.4f} 2batches={t_samp:.2f}s", file=sys.stderr)
