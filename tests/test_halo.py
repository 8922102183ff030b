"""shard_map halo-exchange stencil (parallel/halo.py) vs the replicated
oracle, and the device-side moment reductions (parallel/distributed.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deflatedmlmc_schwinger_tpu.ops import cplx
from deflatedmlmc_schwinger_tpu.ops.cplx import CP
from deflatedmlmc_schwinger_tpu.ops.dirac import pair_operator
from deflatedmlmc_schwinger_tpu.parallel import (
    halo_matvec,
    make_mesh,
    psum_moments,
    shard_coeffs,
)
from deflatedmlmc_schwinger_tpu.trace.stats import RunningMoments


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (8, 1)])
def test_halo_matvec_matches_oracle(op16, mesh_shape):
    op, _ = op16
    pop = pair_operator(op)
    mesh = make_mesh(mesh_shape, ("samples", "x"))
    rng = np.random.default_rng(3)
    B = 8
    Z = rng.standard_normal((B, op.n)) + 1j * rng.standard_normal((B, op.n))
    want = cplx.to_complex(pop.matvec(cplx.from_complex(Z)))

    pop_sh = shard_coeffs(pop, mesh, "x")
    mv = halo_matvec(pop_sh, mesh, x_axis="x", sample_axis="samples")
    from jax.sharding import NamedSharding, PartitionSpec as P

    g = cplx.from_complex(Z.reshape(B, 2, op.nx, op.nt))
    g = jax.device_put(
        g, NamedSharding(mesh, P("samples", None, "x", None))
    )
    got = mv(g)
    got = cplx.to_complex(got).reshape(B, op.n)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_halo_matvec_in_jit_loop(op16):
    """The halo matvec composes under jit with a scan (solver-style reuse)."""
    op, _ = op16
    pop = pair_operator(op)
    mesh = make_mesh((1, 8), ("samples", "x"))
    pop_sh = shard_coeffs(pop, mesh, "x")
    mv = halo_matvec(pop_sh, mesh)
    rng = np.random.default_rng(5)
    Z = rng.standard_normal((2, op.n)) + 1j * rng.standard_normal((2, op.n))
    g = cplx.from_complex(Z.reshape(2, 2, op.nx, op.nt))
    from jax.sharding import NamedSharding, PartitionSpec as P

    g = jax.device_put(g, NamedSharding(mesh, P("samples", None, "x", None)))

    y = mv(mv(g))  # D^2 z
    want = pop.matvec(pop.matvec(cplx.from_complex(Z)))
    np.testing.assert_allclose(
        cplx.to_complex(y).reshape(2, op.n),
        cplx.to_complex(want),
        rtol=1e-11,
        atol=1e-11,
    )


def test_psum_moments_matches_host_merge():
    """Device psum reduction over 'samples' == host RunningMoments."""
    rng = np.random.default_rng(11)
    es = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    mesh = make_mesh((8,), ("samples",))
    er = jnp.asarray(es.real).reshape(8, 2)
    ei = jnp.asarray(es.imag).reshape(8, 2)

    f = jax.jit(
        jax.shard_map(
            lambda a, b: psum_moments(a, b, "samples"),
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec("samples", None),) * 2,
            out_specs=jax.sharding.PartitionSpec(),
        )
    )
    cnt, mre, mim, m2 = f(er, ei)
    ref = RunningMoments()
    ref.update_batch(es)
    assert int(cnt) == 16
    np.testing.assert_allclose(complex(float(mre), float(mim)), ref.mean, rtol=1e-12)
    np.testing.assert_allclose(float(m2), ref.m2, rtol=1e-10)


def test_allgather_moments_single_process_identity():
    from deflatedmlmc_schwinger_tpu.parallel import allgather_moments

    m = RunningMoments()
    m.update_batch(np.array([1 + 1j, 2 - 1j, 0.5j]))
    out = allgather_moments(m)
    assert out.count == m.count and out.mean == m.mean and out.m2 == m.m2
