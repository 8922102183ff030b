"""Multi-host orchestration (SURVEY.md P5) and device-side statistics
reductions (SURVEY.md section 2.3: variance-weighted trace reduction).

The reference is single-process, single-core (main.py:15,20); here the
estimators scale across hosts with the standard JAX single-controller SPMD
recipe: ``jax.distributed.initialize`` once per process, one global mesh over
all chips, probe batches sharded over the 'samples' axis, and scalar
statistics merged with the Chan parallel-moments update -- either on device
(``psum_moments``, for shard_map program regions) or across processes on the
host (``allgather_moments``).

Because probes are counter-keyed (trace/probes.py), the estimate is invariant
to the process count and mesh shape; a host that dies and rejoins replays its
sample indices idempotently (SURVEY.md section 5.3).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deflatedmlmc_schwinger_tpu.trace.stats import RunningMoments


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-process JAX from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); no-op in
    single-process runs. Returns the process index."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and (num_processes or 1) == 1:
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def global_values(a) -> np.ndarray:
    """Full host value of a (possibly multi-process global) jax array, on
    EVERY process, in deterministic global sample order.

    Single-process arrays are just pulled; multi-process global arrays are
    assembled with a process allgather (the SURVEY section 5.8
    'deterministic sample-order gather': every process sees the identical
    estimate stream, so moments, stopping decisions and logs are
    bit-identical across processes with no further reduction)."""
    if getattr(a, "is_fully_addressable", True):
        return np.asarray(a)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(a, tiled=True))


def shard_global_batch(x, mesh, axis: str = "samples"):
    """Multi-process variant of mesh.shard_batch: build a GLOBAL array for a
    mesh spanning several processes from the locally computed batch (probes
    are counter-keyed, so every process holds the identical host value)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deflatedmlmc_schwinger_tpu.ops.cplx import CP

    def put(a):
        nd = a.ndim
        sharding = NamedSharding(mesh, P(axis, *([None] * (nd - 1))))
        host = np.asarray(a)
        return jax.make_array_from_callback(host.shape, sharding,
                                            lambda idx: host[idx])

    if isinstance(x, CP):
        return CP(put(x.re), put(x.im))
    return put(x)


def moments_parts(es_re: jnp.ndarray, es_im: jnp.ndarray):
    """Per-shard raw moment sums (count, sum, sum|e|^2) of a batch of
    estimates -- the additive (psum-able) form of RunningMoments."""
    cnt = jnp.asarray(es_re.size, es_re.dtype)
    s_re = jnp.sum(es_re)
    s_im = jnp.sum(es_im)
    sq = jnp.sum(es_re * es_re + es_im * es_im)
    return cnt, s_re, s_im, sq


def psum_moments(es_re, es_im, axis_name: str):
    """Device-side moment reduction over a mesh axis (inside shard_map):
    returns (count, mean_re, mean_im, m2) where m2 = sum |e - mean|^2.

    Raw sums are additive, so one psum of (n, sum, sum_sq) is exactly the
    Chan merge of all shards."""
    cnt, s_re, s_im, sq = moments_parts(es_re, es_im)
    cnt = jax.lax.psum(cnt, axis_name)
    s_re = jax.lax.psum(s_re, axis_name)
    s_im = jax.lax.psum(s_im, axis_name)
    sq = jax.lax.psum(sq, axis_name)
    mean_re = s_re / cnt
    mean_im = s_im / cnt
    # the raw-sum form sq - |mean|^2 n cancels catastrophically in f32 when
    # |mean| >> std; clamp so downstream sqrt() never sees a negative m2
    m2 = jnp.maximum(sq - (mean_re * mean_re + mean_im * mean_im) * cnt, 0.0)
    return cnt, mean_re, mean_im, m2


def allgather_moments(local: RunningMoments) -> RunningMoments:
    """Merge per-process RunningMoments across all JAX processes (host path,
    DCN). Single-process: returns ``local`` unchanged."""
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    parts = np.array(
        [
            float(local.count),
            local.mean.real,
            local.mean.imag,
            float(local.m2),
        ]
    )
    # raw-sum form is additive across processes
    parts[1] *= parts[0]
    parts[2] *= parts[0]
    parts[3] += (
        (parts[1] ** 2 + parts[2] ** 2) / parts[0] if parts[0] else 0.0
    )
    gathered = np.asarray(multihost_utils.process_allgather(parts))
    tot = gathered.sum(axis=0)
    n = tot[0]
    if n == 0:
        return RunningMoments()
    mean = complex(tot[1] / n, tot[2] / n)
    m2 = float(tot[3] - (abs(mean) ** 2) * n)
    return RunningMoments(count=int(n), mean=mean, m2=max(m2, 0.0))
