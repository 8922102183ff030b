"""Persistent XLA compilation cache.

Setup compiles ~15 distinct programs (per-level eigensolver filters, Galerkin
batches, the preconditioned FGMRES); on a tunneled TPU each compile costs
tens of seconds, so cold-start setup is compile-bound (measured 1129 s for
the 128^2 hierarchy vs ~4 s of actual compute). The on-disk cache makes every
run after the first reuse those executables.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    ACCELERATOR backends only. XLA:CPU persists ahead-of-time executables
    specialized to the compiling host's CPU features; deserializing them is
    unreliable in this image (the loader warns about machine-feature
    mismatches and sporadically SEGFAULTS mid-run -- observed r4 twice,
    both inside compilation_cache.get_executable_and_time on CPU, even with
    a freshly written same-machine cache). CPU compiles are seconds, so the
    persistent cache buys little there anyway; the in-memory jit cache
    still covers each process. The cache matters on the tunneled TPU,
    where each cold compile costs tens of seconds -- and TPU artifacts are
    target-code for the accelerator, not host-CPU AOT, so loading them is
    safe."""
    import jax

    if jax.default_backend() == "cpu":
        return
    if cache_dir is None:
        cache_dir = os.environ.get(
            "DMLMC_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
