"""Device-link warm-up for tunneled single-chip backends.

The axon TPU in this environment is reached through a port-relay tunnel.
Measured behavior (r4): the FIRST device->host fetch a process issues is
serviced extremely slowly -- 33 s to 560+ s for a 4-BYTE scalar, independent
of transfer size (a one-time bring-up of the reverse channel) -- while every
subsequent fetch runs at 16-70 MB/s.  Estimator phases and benchmarks must
not pay that bring-up inside a timed region, so they call
``warm_transfers()`` once up front: it fetches a single scalar and absorbs
the cost where it is visible and attributable.

On a local backend (CPU tests, real co-located TPU) the warm-up fetch costs
microseconds, so calling it unconditionally is safe.
"""

from __future__ import annotations

_warmed = False


def warm_transfers() -> None:
    """Issue one tiny device->host fetch (idempotent per process)."""
    global _warmed
    if _warmed:
        return
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros((1,), jnp.float32))
    _warmed = True
