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
