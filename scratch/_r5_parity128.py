"""Round-5: the 128^2 matched-seed parity ARTIFACT (r4 verdict item 5).

Runs BOTH the reference (via tests/refharness.py shims, pure NumPy/SciPy on
this host) and our framework (f64, CPU backend) on the SAME 20-probe NumPy
Rademacher stream for the flagship displaced-trace observable, undeflated
and k=8-deflated, and prints the per-probe agreement + per-sample variance
comparison that docs/PARITY.md records.

CPU-only (several minutes: the reference needs ~10 s per 1e-12 fine solve).
Run: timeout 3000 python scratch/_r5_parity128.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import refharness as rh

from deflatedmlmc_schwinger_tpu.gateway import set_params
from deflatedmlmc_schwinger_tpu.io import load_operator
from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.trace.deflation import (
    Deflation,
    hutchinson_deflation,
)
from deflatedmlmc_schwinger_tpu.trace.hutchinson import hutchinson_step_batch
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source

NPROBES = int(os.environ.get("NPROBES", "20"))
SEED = 31415
MASS = -0.1320

# ---- our side (f64 CPU) ----
cfg = set_params("schwinger128-parity").replace(
    dtype=None,                 # x64 -> complex128
    # ARPACK-grade subspace, CPU-affordable: each inverse round is a
    # 24-row 1e-9 f64 solve (~2-3 min on this 2-core host), and the
    # iteration early-exits on the 1e-9 Ritz-residual tol
    defl_buffer=24, defl_subspace_rounds=10,
)
t0 = time.time()
op0, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                       dtype=cfg.complex_dtype())
hier = setup_hierarchy(op0, cfg)
op = pair_operator(op0)
solver = MGSolver(hier, cfg.solver)
print(f"[ours] setup {time.time()-t0:.1f}s sizes={hier.sizes()}", flush=True)


def ours_estimates(defl, seed):
    probes = make_probe_source("numpy", seed)
    X = probes(0, NPROBES, op.n, op.dtype)
    es, _, _ = hutchinson_step_batch(op, solver, cfg, defl, X)
    return np.asarray(es)


t0 = time.time()
es_ours_undef = ours_estimates(Deflation(U=None, tr1=0.0 + 0.0j), SEED)
print(f"[ours] undeflated {NPROBES} probes {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
defl = hutchinson_deflation(op, solver, cfg)
print(f"[ours] k=8 deflation {time.time()-t0:.1f}s tr1={defl.tr1:.6f}",
      flush=True)
t0 = time.time()
es_ours_def = ours_estimates(defl, SEED + 1)
print(f"[ours] deflated {NPROBES} probes {time.time()-t0:.1f}s", flush=True)

# ---- reference side ----
A = rh.load_matrix("schwinger128.mat", MASS)
params = rh.params_128_parity(function_tol=1e-12)
t0 = time.time()
mg = rh.build_mg(A, params)
print(f"[ref] mg setup {time.time()-t0:.1f}s", flush=True)
ref = rh.load_reference()
t0 = time.time()
Vx, tr1_ref = ref["utils"].deflation_pre_computations(
    A, 8, 1e-9, "hutchinson", mg.timer, params, mg
)
print(f"[ref] k=8 deflation {time.time()-t0:.1f}s tr1={tr1_ref:.6f}", flush=True)

t0 = time.time()
es_ref_undef, _ = rh.hutch_probes(mg, A, params, NPROBES, SEED, k=0)
print(f"[ref] undeflated {NPROBES} probes {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
es_ref_def, _ = rh.hutch_probes(mg, A, params, NPROBES, SEED + 1, Vx=Vx, k=8)
print(f"[ref] deflated {NPROBES} probes {time.time()-t0:.1f}s", flush=True)

# ---- comparison ----
def report(tag, ours, refv):
    scale = np.abs(refv).max()
    d = np.abs(ours - refv)
    print(f"\n{tag}: max|diff| {d.max():.3e} ({d.max()/scale:.2e} of scale "
          f"{scale:.1f});  per-probe rel diffs {np.round(d/scale, 9)[:5]} ...")
    vo, vr = np.var(ours), np.var(refv)
    print(f"{tag}: per-sample variance ours {vo:.3f} vs reference {vr:.3f} "
          f"(ratio {vo/max(vr,1e-300):.6f})")
    return d.max() / scale, vo, vr


r_u, vo_u, vr_u = report("undeflated", es_ours_undef, es_ref_undef)
r_d, vo_d, vr_d = report("deflated k=8", es_ours_def, es_ref_def)
print(f"\ntr1 ours {defl.tr1:.8f} vs ref {tr1_ref:.8f} "
      f"(|diff| {abs(defl.tr1-tr1_ref):.2e})")
print("\nmean est (undef) ours", np.mean(es_ours_undef),
      "ref", np.mean(es_ref_undef))

# record the artifact for docs/PARITY.md and the bench extra field
import json

artifact = dict(
    lattice="schwinger128 (displaced, x_disp=2, m=-0.1320)",
    nprobes=NPROBES,
    seed_undeflated=SEED,
    seed_deflated=SEED + 1,
    per_probe_max_rel_diff_undeflated=float(r_u),
    per_probe_max_rel_diff_deflated_k8=float(r_d),
    per_sample_variance_ours_undeflated=float(vo_u),
    per_sample_variance_ref_undeflated=float(vr_u),
    per_sample_variance_ours_deflated_k8=float(vo_d),
    per_sample_variance_ref_deflated_k8=float(vr_d),
    tr1_ours=[float(defl.tr1.real), float(defl.tr1.imag)],
    tr1_ref=[float(np.real(tr1_ref)), float(np.imag(tr1_ref))],
    note="matched-seed NumPy Rademacher stream; both sides solve at 1e-12 "
         "in f64 on this host; produced by scratch/_r5_parity128.py",
)
out_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "PARITY_MATCHED.json")
with open(out_path, "w") as f:
    json.dump(artifact, f, indent=1)
print(f"\nwrote {out_path}")
