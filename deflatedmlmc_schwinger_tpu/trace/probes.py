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


def jax_probe_batch(base_key, start: int, batch: int, n: int, rdtype):
    """Probes for global sample indices [start, start+batch) as a (B, n)
    CP pair (imaginary part zero -- Rademacher probes are real)."""
    from deflatedmlmc_schwinger_tpu.ops.cplx import CP

    def one(s):
        k = jax.random.fold_in(base_key, s)
        bits = jax.random.bernoulli(k, 0.5, (n,))
        return jnp.where(bits, 1.0, -1.0).astype(rdtype)

    idx = start + jnp.arange(batch)
    re = jax.vmap(one)(idx)
    return CP(re, jnp.zeros_like(re))


class NumpyProbeStream:
    """Sequential host-side Rademacher stream matching the reference.

    The reference seeds the global NumPy RNG (np.random.seed) and draws
    ``np.random.randint(2, size=n)`` per probe; we reproduce that exact
    sequence with a private RandomState.
    """

    def __init__(self, seed: int):
        self.state = np.random.RandomState(seed)

    def __call__(self, batch: int, n: int, rdtype):
        from deflatedmlmc_schwinger_tpu.ops.cplx import CP

        out = np.empty((batch, n), dtype=np.int64)
        for b in range(batch):
            out[b] = self.state.randint(2, size=n) * 2 - 1
        re = jnp.asarray(out.astype(np.dtype(rdtype)))
        return CP(re, jnp.zeros_like(re))


def make_probe_source(source: str, seed: int, base_key=None) -> Callable:
    """Returns f(start, batch, n, rdtype) -> (B, n) CP probe pair."""
    if source == "jax":
        key = base_key if base_key is not None else jax.random.key(seed)
        return lambda start, batch, n, rdtype: jax_probe_batch(key, start, batch, n, rdtype)
    if source == "numpy":
        stream = NumpyProbeStream(seed)
        return lambda start, batch, n, rdtype: stream(batch, n, rdtype)
    raise ValueError(f"unknown probe source {source!r}")
