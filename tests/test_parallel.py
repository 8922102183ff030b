"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md section 4:
mesh-shape invariance via counter-based keys; sharded solves; graft entry)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deflatedmlmc_schwinger_tpu.parallel import make_mesh, shard_batch
from deflatedmlmc_schwinger_tpu.trace.probes import make_probe_source


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_probe_counter_invariance():
    """Probe s depends only on (seed, s) -- not on batching."""
    src = make_probe_source("jax", 42)
    full = np.asarray(src(0, 8, 64, jnp.float64).re)
    a = np.asarray(src(0, 3, 64, jnp.float64).re)
    b = np.asarray(src(3, 5, 64, jnp.float64).re)
    np.testing.assert_array_equal(full, np.concatenate([a, b], axis=0))


def test_numpy_probe_stream_matches_reference():
    """The 'numpy' source reproduces np.random.seed + randint exactly."""
    src = make_probe_source("numpy", 123456)
    got = np.asarray(src(0, 2, 32, np.float64).re)
    np.random.seed(123456)
    want = np.stack(
        [np.random.randint(2, size=32) * 2 - 1 for _ in range(2)]
    ).astype(np.float64)
    np.testing.assert_array_equal(got, want)


def test_sharded_step_matches_unsharded(op16):
    """The batched solve is invariant to sample-axis sharding."""
    from deflatedmlmc_schwinger_tpu.ops import cplx
    from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
    from deflatedmlmc_schwinger_tpu.solvers.fgmres import fgmres

    op, A = op16
    pop = pair_operator(op)
    src = make_probe_source("jax", 7)
    X = src(0, 8, op.n, jnp.float64)
    res_plain = fgmres(pop.matvec, X, tol=1e-8, restart=40, max_restarts=20)
    mesh = make_mesh((8,), ("samples",))
    Xs = shard_batch(X, mesh, "samples")
    res_shard = fgmres(pop.matvec, Xs, tol=1e-8, restart=40, max_restarts=20)
    np.testing.assert_allclose(
        cplx.to_complex(res_plain.x), cplx.to_complex(res_shard.x), rtol=1e-8, atol=1e-10
    )


def test_lattice_sharded_matvec(op16):
    """Stencil matvec with the lattice sharded over 'x' (halo exchange by
    XLA collective-permute) equals the replicated result."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from deflatedmlmc_schwinger_tpu.ops.dirac import stencil_matvec

    op, A = op16
    mesh = make_mesh((2, 4), ("samples", "x"))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((4, op.n)) + 1j * rng.standard_normal((4, op.n)))
    want = np.asarray(op.matvec(X))
    coeffs = jax.device_put(
        op.coeffs, NamedSharding(mesh, P(None, None, None, "x", None))
    )
    Xg = jax.device_put(
        X.reshape(4, 2, op.nx, op.nt),
        NamedSharding(mesh, P("samples", None, "x", None)),
    )

    @jax.jit
    def f(c, g):
        return stencil_matvec(c, g.reshape(g.shape[0], -1), op.nx, op.nt)

    got = np.asarray(f(coeffs, Xg))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_smoke():
    """entry() returns a jittable fn; compile-check on a tiny abstract eval."""
    import __graft_entry__ as g

    fn, args = g.entry()
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape == (2, args[0].shape[0])
