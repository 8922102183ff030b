"""Native C++ host library tests (MAT5 reader + CSR kernels vs scipy)."""

import numpy as np
import pytest
import scipy.io as sio
import scipy.sparse as sp

from deflatedmlmc_schwinger_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


@pytest.mark.parametrize("name", ["schwinger16.mat", "schwinger128.mat"])
def test_mat5_reader_bit_exact(name):
    path = f"/root/reference/{name}"
    A_native = native.load_mat_sparse(path, "S")
    A_scipy = sio.loadmat(path)["S"].tocsc()
    assert A_native.shape == A_scipy.shape
    assert A_native.nnz == A_scipy.nnz
    assert abs(A_native - A_scipy).max() == 0.0


def test_mat5_reader_missing_var():
    with pytest.raises(RuntimeError, match="not found"):
        native.load_mat_sparse("/root/reference/schwinger16.mat", "NOPE")


def test_native_csr_matvec(op16):
    _, A = op16
    csr = native.NativeCSR(A)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, A.shape[0])) + 1j * rng.standard_normal((4, A.shape[0]))
    y = csr.matvec(x)
    np.testing.assert_allclose(y, (A @ x.T).T, rtol=1e-14, atol=1e-14)
    # single-vector form
    y1 = csr.matvec(x[0])
    np.testing.assert_allclose(y1, A @ x[0], rtol=1e-14)
