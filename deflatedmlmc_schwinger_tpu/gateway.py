"""Experiment gateway: named configurations and G1xx/G2xx wrappers
(reference: gateway.py:10-169).

Known reference defect handled here (SURVEY.md section 2.1): the shipped
schwinger16 param set is missing several required keys and its dof=[2,2,2]
hierarchy has a singular coarsest operator. This gateway ships the repaired
16^2 configuration (dof=(2,4,4), missing knobs filled from the 128^2 set,
use_permuted=False) -- the same repair the survey used to measure
BASELINE.md.
"""

from __future__ import annotations

from deflatedmlmc_schwinger_tpu.config import SolverConfig, TraceConfig
from deflatedmlmc_schwinger_tpu.examples import EXAMPLE_001, EXAMPLE_002


def set_params(example_name: str) -> TraceConfig:
    if example_name == "schwinger16":
        # reference: gateway.py:65-96 (repaired)
        return TraceConfig(
            matrix="schwinger16.mat",
            problem_name="schwinger",
            mass=-1.00690114 * 0.99,
            latt_dims=(16, 16),
            trace_tol=1.0e-2,
            max_nr_levels=3,
            coarsest_level_directly=True,
            accuracy_mg_eigvs="low",
            nr_deflat_vctrs=64,
            mlmc_deflat_vctrs=(16, 16),
            mlmc_levels_to_skip=(1,),
            aggrs=(2 * 2, 2 * 2),
            dof=(2, 4, 4),          # shipped (2,2,2) coarsest is singular
            defl_type="exact",
            defl_eigvs_tol_Hutch=1.0e-9,
            defl_eigvs_tol_MLMC=1.0e-1,
            diff_lev_op_tol=1.0e-3,
            use_permuted=False,
            x_displacement=0,
            check_quality_MG=False,
            test_vectors_type="EVs",
            seed=51234,
        )
    elif example_name == "schwinger128":
        # reference: gateway.py:98-166; for m0=-0.1320, permuted, x_disp=2 the
        # exact displaced trace is -8.748242701374695+50.215154098005584j.
        #
        # This is the TUNED on-chip profile -- the exact configuration the
        # published bench numbers come from (bench.py imports it); `python
        # main.py G102` / `G202` therefore reproduce BENCH_r*.json.  For a
        # matched-seed reference-fidelity run (EVs/'high'/k=8/tol 1e-12) use
        # 'schwinger128-parity' below.  Every knob that deviates from the
        # reference carries its on-chip measurement:
        import jax.numpy as jnp

        return TraceConfig(
            matrix="schwinger128.mat",
            problem_name="schwinger",
            mass=-0.1320,
            latt_dims=(128, 128),
            trace_tol=1.0e-2,
            aggrs=(4 * 4, 2 * 2, 2 * 2),
            dof=(2, 8, 8, 8),
            max_nr_levels=4,
            coarsest_level_directly=True,
            # 'low' + RSVs: hierarchy quality is statistically identical for
            # the estimator (r2 measurement) at a fraction of the setup cost
            accuracy_mg_eigvs="low",
            check_quality_MG=False,
            test_vectors_type="RSVs",
            mlmc_levels_to_skip=(1,),
            # 128 deflation vectors from a LOOSE-tolerance inverse iteration:
            # measured on-chip (r3), k=8->64 at 1e-4 cuts the per-probe
            # deviation 167->81 (so ~4x fewer probes); k 96->128 cuts it
            # 71->67 for free, and 1e-4 -> 1e-2 basis solves cut the setup
            # 39 s -> 14 s at IDENTICAL deviation (inexact inverse iteration
            # needs only ~1e-2 per round; k>=192 hits the bulk-variance floor
            # ~62 and pays new program shapes).  tr1 stays exact for any
            # basis quality (correction_mode='solve').
            nr_deflat_vctrs=128,
            defl_eigvs_tol_Hutch=1.0e-2,
            # r5 on-chip sweep (scratch/_r5_defl_warm.py): rounds 5 -> 3
            # cuts defl_setup ~25 s -> 8.7 s at dev 69.4 vs 68.7 (a ~2%
            # sample surcharge); rounds=2 saves 2 s more but costs 5% dev.
            # A Chebyshev warm-filter start (defl_warm_filter_degree) was
            # measured COUNTERPRODUCTIVE here: it hands the first inverse
            # round near-kernel-saturated right-hand sides (setup 42 s) and
            # worsens dev -- keep it off with an MG-driven iteration.
            # (The 8.7 s is warm-process compute; a fresh process pays
            # ~10-15 s more of one-time program loads/tracing in this
            # phase, tunnel-dependent: bench r5 measured defl_setup
            # 21-24 s cold-process, while repeated deflation calls in one
            # process run at 6.5-9.4 s via mg/cycle.py MGSolver.derived.)
            defl_subspace_rounds=3,
            # defl_buffer=probe_batch makes every setup solve reuse the
            # sampling batch's XLA program -- zero extra executable loads on
            # the tunneled chip (tradeoff note: config.py defl_buffer)
            defl_buffer=128,
            mlmc_deflat_vctrs=(0, 0, 0),
            defl_type="exact",
            defl_eigvs_tol_MLMC=1.0e-1,
            diff_lev_op_tol=1.0e-3,
            # G202 (MLMC) profile, measured on-chip r4: levels at or below
            # 4096 unknowns are computed exactly (dense f64 on host) -- the
            # f32 iterative coarse solves floor at ~1e-2 relative residual,
            # and dense levels contribute zero variance; the level-0
            # difference probes reuse the k=128 gamma3 basis with an exact
            # one-batch add-back, which cut the level-0 deviation 841 -> 73
            # (undeflated estimates carry O(100) f32 solve noise from
            # 1/|lambda_min|-sized solutions). The level-0 coarse solve
            # applies the precomputed dense level-2 inverse on the MXU.
            mlmc_exact_dense_max_n=4096,
            mlmc_fine_deflation=True,
            # average the whole padded rough batch: the reference's 5-probe
            # rough trace scatters by +-75%, turning the "1%" stopping target
            # into 0.5-4% actual error (r2 published 3%); 128 rough probes
            # cost the same wall clock and pin the target at the true 1%
            rough_batch_full=True,
            # stop at 0.7x the target stderr: the realized |error| of an
            # unbiased complex estimate is Rayleigh-distributed, so stopping
            # AT the target fails the contract with probability 1/e = 37%,
            # at 0.8x still 21%, at 0.7x ~13%, at 0.6x ~6% (r4 seed sweep:
            # 4 independent probe streams landed at 0.3-1.4 sigma scattered
            # AROUND the oracle -- a draw, not a bias). r4 shipped 0.6,
            # whose ~2.8x sample surcharge swallowed that round's solver
            # gains (r4 verdict weak #1); r5 ships 0.7 + the confirmation
            # batch (stop_confirm) and verifies the realized error against
            # the recorded oracle in the bench (BENCH_r05).
            stop_safety=0.7,
            stop_confirm=True,
            use_permuted=True,
            x_displacement=2,
            seed=51234,
            # TPU throughput knobs (measured on-chip: restart 40 + batch 128
            # is the 128^2 sweet spot, ~2700x the reference's probe rate)
            probe_batch=128,
            chebyshev_degree=60,
            subspace_iters=8,
            dtype=jnp.complex64,
            # smoother depth 16 (r5 sweep, scratch/_r5_smoother_sweep.py):
            # deeper GMRES-poly smoothing trades cheap in-VMEM stencil work
            # for outer Arnoldi iterations -- si 4 -> 16 cuts iters_max
            # 108 -> 33 and lifts undeflated probe throughput 254 -> 390
            # solves/s at tol 5e-4 (restart 40; relres certified, 0 stalls).
            # The v-cycle attribution behind it: level-0 smoother+residual
            # is 59% of the cycle and the whole poly recurrence runs fused
            # in VMEM (ops/pallas_stencil.py), so deepening it is nearly
            # free HBM-wise while each saved outer iteration removes a
            # full V-cycle + Arnoldi step.
            solver=SolverConfig(restart=40, smoother="poly", smooth_iters=16),
            # deflation setup keeps the shallow r4 profile: its near-kernel
            # solves are stall-cutoff-bound, so their cost scales with the
            # per-iteration price -- at si=16 defl_setup measured ~24 s vs
            # 8.7 s with this profile (config.py defl_solver)
            defl_solver=SolverConfig(restart=40, smoother="poly"),
            # sampling solves at the bias-bounded f32 target instead of the
            # c64 floor (3e-7): tests/test_bias.py measures the trace bias of
            # 5e-4-tolerance solves at ~1e-3 of |trace| -- an order of
            # magnitude under the 1% budget -- and solves at the floor cost
            # 2.5x more wall clock (they run past the stall cutoff; measured
            # on-chip r3)
            function_tol=5.0e-4,
        )
    elif example_name == "schwinger128-parity":
        # reference-fidelity variant of the 128^2 config for matched-seed
        # validation runs: EVs at 'high' eigensolver accuracy, k=8 deflation
        # at 1e-9, solves at 1e-12 (clipped to the dtype's residual floor),
        # reference rough trace and stopping rule (reference: gateway.py:98-166)
        return TraceConfig(
            matrix="schwinger128.mat",
            problem_name="schwinger",
            mass=-0.1320,
            latt_dims=(128, 128),
            trace_tol=1.0e-2,
            aggrs=(4 * 4, 2 * 2, 2 * 2),
            dof=(2, 8, 8, 8),
            max_nr_levels=4,
            coarsest_level_directly=True,
            accuracy_mg_eigvs="high",
            check_quality_MG=False,
            test_vectors_type="EVs",
            mlmc_levels_to_skip=(1,),
            nr_deflat_vctrs=8,
            mlmc_deflat_vctrs=(0, 0, 0),
            defl_type="exact",
            defl_eigvs_tol_Hutch=1.0e-9,
            defl_eigvs_tol_MLMC=1.0e-1,
            diff_lev_op_tol=1.0e-3,
            use_permuted=True,
            x_displacement=2,
            seed=51234,
            function_tol=1.0e-12,
            probe_batch=128,
            solver=SolverConfig(restart=40, smoother="poly"),
        )
    elif example_name == "schwinger256":
        # scale-out config (BASELINE.json #4): generated quenched 256^2 gauge
        # configuration, 3-level hierarchy, one chip. Re-tuned r5 for setup
        # economics (the r4 run spent 56 of its 63.7 s in setup): at
        # mass -0.10 the operator sits far from criticality, the estimator
        # stops at the minimum sample count with stderr ~23x tighter than
        # the 1% target, so a deflation basis buys NOTHING -- k=0 deletes
        # the whole 28 s defl_setup -- and hierarchy quality only nudges an
        # already-small solver iteration count, so the host CheFSI runs 3
        # rounds at degree 30 instead of flagship effort (r4's 27.5 s
        # mg_setup was flagship-sized for a run that needs none of it).
        import jax.numpy as jnp

        return TraceConfig(
            matrix="generated:256x256:beta=5.0:seed=8",
            problem_name="schwinger",
            mass=-0.10,
            latt_dims=(256, 256),
            trace_tol=1.0e-2,
            aggrs=(8 * 8, 4 * 4),
            dof=(2, 8, 8),
            max_nr_levels=3,
            coarsest_level_directly=True,
            accuracy_mg_eigvs="low",
            test_vectors_type="RSVs",
            mlmc_levels_to_skip=(),
            nr_deflat_vctrs=0,
            defl_eigvs_tol_Hutch=1.0e-2,
            mlmc_deflat_vctrs=(0, 0),
            defl_type="exact",
            defl_eigvs_tol_MLMC=1.0e-1,
            diff_lev_op_tol=1.0e-3,
            rough_batch_full=True,
            stop_safety=0.7,
            stop_confirm=True,
            use_permuted=False,
            x_displacement=0,
            check_quality_MG=False,
            seed=51234,
            probe_batch=64,
            chebyshev_degree=30,
            subspace_iters=3,
            dtype=jnp.complex64,
            solver=SolverConfig(restart=40, smoother="poly"),
            function_tol=5.0e-4,
        )
    elif example_name == "schwinger512":
        # scale-out config (BASELINE.json #5): 512^2 lattice (beyond the
        # reference's largest), single chip or Hutchinson probes sharded
        # over the 'samples' mesh axis when more devices exist. Tuned r5
        # with the same setup economics as 256^2 (k=0 deflation, light
        # CheFSI): far from criticality the run stops at the minimum sample
        # count, so wall time IS setup time. probe_batch 16 keeps the
        # restart-40 Krylov pair buffers at ~2.7 GB (40 * 16 * n * 8 B).
        import jax.numpy as jnp

        return TraceConfig(
            matrix="generated:512x512:beta=5.0:seed=9",
            problem_name="schwinger",
            mass=-0.10,
            latt_dims=(512, 512),
            trace_tol=1.0e-2,
            aggrs=(8 * 8, 4 * 4, 2 * 2),
            dof=(2, 8, 8, 8),
            max_nr_levels=4,
            coarsest_level_directly=True,
            accuracy_mg_eigvs="low",
            test_vectors_type="RSVs",
            mlmc_levels_to_skip=(),
            nr_deflat_vctrs=0,
            defl_eigvs_tol_Hutch=1.0e-2,
            mlmc_deflat_vctrs=(0, 0, 0),
            defl_type="exact",
            defl_eigvs_tol_MLMC=1.0e-1,
            diff_lev_op_tol=1.0e-3,
            rough_batch_full=True,
            stop_safety=0.7,
            stop_confirm=True,
            use_permuted=False,
            x_displacement=0,
            check_quality_MG=False,
            seed=51234,
            probe_batch=16,
            chebyshev_degree=30,
            subspace_iters=3,
            dtype=jnp.complex64,
            solver=SolverConfig(restart=40, smoother="poly"),
            function_tol=5.0e-4,
        )
    raise Exception(f"unknown experiment name {example_name!r}")


def G101():
    """Deflated Hutchinson, Schwinger 16^2 (reference: gateway.py:10-17)."""
    cfg = set_params("schwinger16").replace(function_tol=1e-12)
    return EXAMPLE_001(cfg)


def G201():
    """Deflated MLMC, Schwinger 16^2 (reference: gateway.py:24-31)."""
    cfg = set_params("schwinger16").replace(function_tol=1e-12)
    return EXAMPLE_002(cfg)


def G102():
    """Deflated Hutchinson, Schwinger 128^2 (reference: gateway.py:38-45).

    Runs the tuned on-chip profile (the published bench configuration;
    bench.py imports the same config, so this reproduces BENCH_r*.json)."""
    return EXAMPLE_001(set_params("schwinger128"))


def G202():
    """Deflated MLMC, Schwinger 128^2 (reference: gateway.py:52-59).

    Runs the tuned on-chip profile (same config as the bench's G202 row)."""
    return EXAMPLE_002(set_params("schwinger128"))


def G301():
    """Deflated Hutchinson on a generated 256^2 quenched config, one host
    (scale-out beyond the reference; BASELINE.json config #4). Runs the
    tuned on-chip profile (the bench's G301 row)."""
    return EXAMPLE_001(set_params("schwinger256"))


def G302():
    """Deflated Hutchinson on a generated 512^2 quenched config with probe
    batches sharded over all available chips (BASELINE.json config #5).

    Multi-process: launch one process per host with
    JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID set; the
    estimator assembles the global mesh, replicates the hierarchy, shards
    probe batches globally, and gathers estimates in deterministic sample
    order on every process (tests/test_multiprocess.py proves bit-identical
    results across processes). Set DMLMC_X_SHARDS=k to additionally
    domain-decompose the 512^2 lattice over k chips per probe group
    (parallel/sharded_solve.py)."""
    import os

    from deflatedmlmc_schwinger_tpu.io import load_operator
    from deflatedmlmc_schwinger_tpu.parallel import initialize, make_mesh
    from deflatedmlmc_schwinger_tpu.reporting import print_post_results, result_to_json
    from deflatedmlmc_schwinger_tpu.trace import hutchinson

    initialize()
    cfg = set_params("schwinger512")
    import jax

    ndev = len(jax.devices())
    xs = int(os.environ.get("DMLMC_X_SHARDS", "1"))
    if xs > 1 and ndev % xs == 0:
        mesh = make_mesh((ndev // xs, xs), ("samples", "x"))
    elif ndev > 1:
        mesh = make_mesh()  # all devices on the 'samples' axis
    else:
        mesh = None         # single chip: skip the mesh machinery entirely
    if mesh is not None:
        nshards = mesh.shape[cfg.sample_axis]
        if cfg.probe_batch % nshards:
            cfg = cfg.replace(
                probe_batch=nshards * max(1, cfg.probe_batch // nshards)
            )
    op, _ = load_operator(cfg.matrix, cfg.mass, latt_dims=cfg.latt_dims,
                          dtype=cfg.complex_dtype())
    result = hutchinson(op, cfg, mesh=mesh)
    print_post_results(cfg, result, "hutchinson")
    print(result_to_json(cfg, result, "hutchinson"))
    return result
