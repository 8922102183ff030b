"""Benchmark: batched deflated-Hutchinson probe solves on the 128^2 Schwinger
lattice, single chip.

Headline metric (BASELINE.md): the reference does one fine-level
MG-preconditioned probe solve in ~10.4 s on one CPU core (0.096
probe-solves/sec/core, G202 rough-trace measurement). Here a whole probe
batch is solved in one batched MG-FGMRES call on the TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/0.096}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_SOLVES_PER_SEC = 0.096  # BASELINE.md, measured on the reference


def main() -> None:
    from deflatedmlmc_schwinger_tpu.utils import jaxcache

    jaxcache.enable()

    import jax
    import jax.numpy as jnp

    from deflatedmlmc_schwinger_tpu.config import TraceConfig
    from deflatedmlmc_schwinger_tpu.io import load_operator
    from deflatedmlmc_schwinger_tpu.mg import MGSolver, setup_hierarchy
    from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator, shift_rows_down_pair
    from deflatedmlmc_schwinger_tpu.solvers.fgmres import fgmres
    from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source

    from deflatedmlmc_schwinger_tpu.config import SolverConfig

    # tuned on-chip (see git history): 8 CheFSI rounds halve the outer
    # iteration count vs 4; restart=40 cuts another ~20%; batch 64 is the
    # throughput sweet spot for this lattice size
    cfg = TraceConfig(
        matrix="schwinger128.mat",
        mass=-0.1320,
        latt_dims=(128, 128),
        max_nr_levels=4,
        aggrs=(4 * 4, 2 * 2, 2 * 2),
        dof=(2, 8, 8, 8),
        accuracy_mg_eigvs="low",
        test_vectors_type="RSVs",
        use_permuted=True,
        x_displacement=2,
        chebyshev_degree=60,
        subspace_iters=8,
        dtype=jnp.complex64,
        solver=SolverConfig(restart=40, smoother="poly"),
    )
    t0 = time.time()
    op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                          dtype=np.complex64)
    op = pair_operator(op)
    hier = setup_hierarchy(op, cfg)
    solver = MGSolver(hier, cfg.solver)
    mv = solver.matvec(0)
    pc = solver.precond(0)
    setup_s = time.time() - t0
    print(f"# setup: {setup_s:.1f}s  sizes={hier.sizes()}", file=sys.stderr)

    B = 128  # measured sweet spot (64: 65 solves/s, 128: 87, 256: 79)
    # attainable complex64 residual is eps*kappa ~ 1e-4 for this operator
    # (measured stall at 3.3e-4 with 10 restarts); the trace needs only 1e-2,
    # so 5e-4 is the honest f32 solve target -- tighter only burns restarts
    tol = 5e-4
    probes = make_probe_source("jax", 7)
    d = hier.levels[0].perm_shift

    def one_batch(start):
        X = probes(start, B, op.n, jnp.float32)
        Xd = shift_rows_down_pair(X, d)
        res = fgmres(mv, Xd, tol=tol, restart=cfg.solver.restart,
                     max_restarts=cfg.solver.max_restarts, precond=pc)
        return res

    # warmup/compile
    t0 = time.time()
    res = one_batch(0)
    jax.block_until_ready(res.x.re)
    compile_s = time.time() - t0
    relres = np.asarray(res.resnorm / res.bnorm)
    iters = np.asarray(res.iters)
    print(
        f"# warmup(+compile): {compile_s:.1f}s  iters={iters.min()}..{iters.max()} "
        f"relres_max={relres.max():.2e}",
        file=sys.stderr,
    )

    from deflatedmlmc_schwinger_tpu.utils.profiling import maybe_trace

    reps = 4
    t0 = time.time()
    with maybe_trace():  # DMLMC_PROFILE=<dir> captures an XLA trace
        for r in range(1, reps + 1):
            res = one_batch(r * B)
        jax.block_until_ready(res.x.re)
    dt = time.time() - t0
    solves_per_sec = reps * B / dt
    print(
        f"# {reps} batches x {B} probes in {dt:.2f}s -> "
        f"{solves_per_sec:.2f} solves/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            dict(
                metric="probe_solves_per_sec_per_chip_schwinger128",
                value=round(solves_per_sec, 3),
                unit="probe-solves/s",
                vs_baseline=round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 1),
            )
        )
    )


if __name__ == "__main__":
    main()
