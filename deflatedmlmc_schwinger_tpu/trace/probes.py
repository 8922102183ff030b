"""Rademacher probe generation.

Two sources:
  * 'jax' (production): counter-based keys -- probe s is a pure function of
    (seed, s), so estimates are independent of batch size and mesh sharding
    (stronger reproducibility than the reference's sequential MT19937 stream,
    SURVEY.md section 2.2 N8);
  * 'numpy' (validation): the reference's exact stream
    ``np.random.randint(2, size=n)*2-1`` (utils.py:213-216) drawn from a host
    Generator seeded like gateway.py:67,106 -- enables matched-seed comparison
    against the NumPy/SciPy reference.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def jax_probe_batch(base_key, start: int, batch: int, n: int, dtype) -> jnp.ndarray:
    """Probes for global sample indices [start, start+batch) as (B, n)."""

    def one(s):
        k = jax.random.fold_in(base_key, s)
        bits = jax.random.bernoulli(k, 0.5, (n,))
        return jnp.where(bits, 1.0, -1.0).astype(dtype)

    idx = start + jnp.arange(batch)
    return jax.vmap(one)(idx)


class NumpyProbeStream:
    """Sequential host-side Rademacher stream matching the reference.

    The reference seeds the global NumPy RNG (np.random.seed) and draws
    ``np.random.randint(2, size=n)`` per probe; we reproduce that exact
    sequence with a private RandomState.
    """

    def __init__(self, seed: int):
        self.state = np.random.RandomState(seed)

    def __call__(self, batch: int, n: int, dtype) -> jnp.ndarray:
        out = np.empty((batch, n), dtype=np.int64)
        for b in range(batch):
            out[b] = self.state.randint(2, size=n) * 2 - 1
        return jnp.asarray(out.astype(np.dtype(dtype)))


def make_probe_source(source: str, seed: int, base_key=None) -> Callable:
    """Returns f(start, batch, n, dtype) -> (B, n) probe matrix."""
    if source == "jax":
        key = base_key if base_key is not None else jax.random.key(seed)
        return lambda start, batch, n, dtype: jax_probe_batch(key, start, batch, n, dtype)
    if source == "numpy":
        stream = NumpyProbeStream(seed)
        return lambda start, batch, n, dtype: stream(batch, n, dtype)
    raise ValueError(f"unknown probe source {source!r}")
