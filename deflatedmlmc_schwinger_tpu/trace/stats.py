"""Running sample statistics and the reference's stopping rule.

The reference recomputes mean/stddev over all samples each iteration
(stoch_trace.py:143-147): dev = sqrt(mean |e - mean|^2) (population form),
stop when n >= 6 and dev/sqrt(n) < tol_target. Here samples arrive in
batches; moments merge with the Chan/Welford parallel update, which is also
the shape of the cross-device psum reduction (SURVEY.md section 2.3 P1).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class RunningMoments:
    count: int = 0
    mean: complex = 0.0 + 0.0j
    m2: float = 0.0  # sum |e - mean|^2

    def update_batch(self, es: np.ndarray) -> None:
        es = np.asarray(es).ravel()
        nb = es.size
        if nb == 0:
            return
        bmean = complex(es.mean())
        bm2 = float(np.sum(np.abs(es - bmean) ** 2))
        if self.count == 0:
            self.count, self.mean, self.m2 = nb, bmean, bm2
            return
        na = self.count
        delta = bmean - self.mean
        tot = na + nb
        self.mean = self.mean + delta * (nb / tot)
        self.m2 = self.m2 + bm2 + (abs(delta) ** 2) * na * nb / tot
        self.count = tot

    @property
    def std_dev(self) -> float:
        """Population standard deviation sqrt(m2/n) (stoch_trace.py:145)."""
        return float(np.sqrt(self.m2 / self.count)) if self.count else 0.0

    @property
    def error_est(self) -> float:
        """Standard error dev/sqrt(n) (stoch_trace.py:147)."""
        return self.std_dev / np.sqrt(self.count) if self.count else np.inf

    def merge(self, other: "RunningMoments") -> "RunningMoments":
        out = RunningMoments(self.count, self.mean, self.m2)
        if other.count:
            na, nb = out.count, other.count
            if na == 0:
                return RunningMoments(other.count, other.mean, other.m2)
            delta = other.mean - out.mean
            tot = na + nb
            out.mean = out.mean + delta * (nb / tot)
            out.m2 = out.m2 + other.m2 + (abs(delta) ** 2) * na * nb / tot
            out.count = tot
        return out


def should_stop(m: RunningMoments, tol_target: float, min_samples: int) -> bool:
    """Reference break condition (stoch_trace.py:153: i>=5 i.e. n>=6)."""
    return bool(m.count >= min_samples and m.error_est < tol_target)


class ConfirmedStop:
    """Two-pass stopping guard (config.py stop_confirm).

    Wraps the per-check stop condition: with ``enabled`` the loop stops only
    when the condition holds on two checks separated by at least one
    additional batch of samples (the first crossing ARMS the stop; any
    intervening failure disarms it). This guards against stopping on a
    transiently UNDERESTIMATED std_dev -- the sample deviation of n draws
    has O(1/sqrt(n)) relative noise, so a small-n run can cross the
    threshold on a lucky batch and stop a factor early. What it does NOT
    change: the Rayleigh tail of the realized |error| at the final stderr.
    That tail is governed solely by stop_safety (P(|err| > tol) =
    exp(-(tol/stderr)^2) for a complex-Gaussian estimate), because the
    accumulated mean barely moves over one confirmation batch -- two checks
    of the same mean are not independent draws of the final error. See the
    stop_safety discussion in config.py for the measured contract margins.
    """

    def __init__(self, enabled: bool):
        self.enabled = bool(enabled)
        self._armed_at: Optional[int] = None

    def __call__(self, condition_ok: bool, count: int) -> bool:
        if not condition_ok:
            self._armed_at = None
            return False
        if not self.enabled:
            return True
        if self._armed_at is None:
            self._armed_at = int(count)
            return False
        return int(count) > self._armed_at


def check_stalled(nstalled: int, nsamples: int, max_frac: float, where: str) -> None:
    """Raise when the running fraction of stalled (under-solved) probe rows
    exceeds ``max_frac`` -- stalled rows carry solver bias the stopping rule
    cannot see (config.py max_stalled_frac)."""
    if nsamples > 0 and nstalled > max_frac * nsamples:
        raise RuntimeError(
            f"{where}: {nstalled}/{nsamples} probe solves stalled above the "
            f"requested tolerance (max_stalled_frac={max_frac}). The trace "
            "estimate would be biased by under-solved probes; loosen "
            "function_tol toward the dtype's attainable residual floor "
            "(SolverConfig.tol_floor), raise restart/max_restarts, or relax "
            "max_stalled_frac if the bias is separately bounded."
        )


# ---- device-resident stopping state (SURVEY.md section 5.8 item (d)) -------
#
# The estimator loops solve a probe batch per iteration; pulling the (B,)
# estimate array to the host every batch forces a device sync and ships data
# the stopping rule does not need.  DeviceMoments keeps (count, mean, m2) as
# device scalars, merges each batch with the same Chan update as
# RunningMoments, and evaluates the stopping predicate on device -- only ONE
# bool crosses the host link per batch.  Used on the single-process,
# non-checkpointing path; the host RunningMoments path remains for
# checkpoint persistence and multi-process gathers (which need the estimates
# on the host anyway).

from typing import NamedTuple  # noqa: E402


class DeviceMoments(NamedTuple):
    count: object   # () f32/f64
    mean_re: object
    mean_im: object
    m2: object
    iters: object   # accumulated solver iterations (device scalar)


def device_moments_init(rdtype):
    import jax.numpy as jnp

    z = jnp.zeros((), rdtype)
    return DeviceMoments(z, z, z, z, z)


def device_moments_update(dm: DeviceMoments, es_re, es_im, iters) -> DeviceMoments:
    """Chan-merge a batch of estimates into the device moments (jit-safe;
    identical arithmetic to RunningMoments.update_batch)."""
    import jax.numpy as jnp

    nb = jnp.asarray(es_re.size, es_re.dtype)
    bre = jnp.mean(es_re)
    bim = jnp.mean(es_im)
    bm2 = jnp.sum((es_re - bre) ** 2 + (es_im - bim) ** 2)
    na = dm.count
    tot = na + nb
    dre = bre - dm.mean_re
    dim = bim - dm.mean_im
    f = jnp.where(na > 0, nb / tot, 1.0)
    mean_re = jnp.where(na > 0, dm.mean_re + dre * f, bre)
    mean_im = jnp.where(na > 0, dm.mean_im + dim * f, bim)
    m2 = jnp.where(
        na > 0, dm.m2 + bm2 + (dre * dre + dim * dim) * na * nb / tot, bm2
    )
    return DeviceMoments(tot, mean_re, mean_im, m2,
                         dm.iters + jnp.sum(iters).astype(dm.iters.dtype))


def device_should_stop(dm: DeviceMoments, tol_target: float, min_samples: int):
    """Device bool: n >= min_samples and sqrt(m2/n)/sqrt(n) < tol_target."""
    import jax.numpy as jnp

    err = jnp.sqrt(dm.m2 / jnp.maximum(dm.count, 1.0)) / jnp.sqrt(
        jnp.maximum(dm.count, 1.0)
    )
    return jnp.logical_and(dm.count >= min_samples, err < tol_target)


def device_stop_and_stalled(dm: DeviceMoments, tol_target, min_samples,
                            stalled_acc):
    """Packed per-batch device scalars for the device-resident loop: a (2,)
    int32 [stop_flag, stalled_row_count] -- the single host fetch per batch
    carries both the stopping decision and the stall-policy counter."""
    import jax.numpy as jnp

    stop = device_should_stop(dm, tol_target, min_samples)
    return jnp.stack([stop.astype(jnp.int32), stalled_acc.astype(jnp.int32)])


def device_moments_to_host(dm: DeviceMoments) -> RunningMoments:
    return RunningMoments(
        count=int(np.asarray(dm.count)),
        mean=complex(float(np.asarray(dm.mean_re)), float(np.asarray(dm.mean_im))),
        m2=float(np.asarray(dm.m2)),
    )
