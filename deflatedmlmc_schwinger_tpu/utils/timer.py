"""Phase timing (the reference's CustomTimer, utils.py:366-445, redesigned).

The reference's timer is single-slot and raises on nesting; on an async
device wall-clocking individual matvecs is meaningless anyway. PhaseTimer
times coarse host-visible phases (setup, deflation setup, rough trace,
sampling) with explicit device synchronization, and supports nesting.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

import jax
import jax.numpy as jnp


def _device_sync():
    # ops execute in submission order per device, so blocking on a fresh
    # trivial computation drains the queue
    jax.block_until_ready(jnp.zeros(()))


class PhaseTimer:
    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextmanager
    def phase(self, name: str):
        if self.sync:
            _device_sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                _device_sync()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()

    def __str__(self) -> str:
        lines = ["\nTimings specific to computations:"]
        for name in sorted(self.totals):
            lines.append(
                f" -- {name} : {self.totals[name]:.4f} s ({self.counts[name]} calls)"
            )
        lines.append(f" -- accumulated time : {sum(self.totals.values()):.4f} s")
        return "\n".join(lines)
