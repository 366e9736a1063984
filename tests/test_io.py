"""Native MatrixMarket parser vs scipy across formats/fields/symmetries."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.io import mmread, mmwrite

from feast_tpu import io as fio


def _roundtrip(tmp_path, A, name, **kw):
    p = str(tmp_path / f"{name}.mtx")
    mmwrite(p, A, **kw)
    got = fio.read_matrix_market(p, out="dense")
    ref = mmread(p)
    ref = np.asarray(ref.todense() if sp.issparse(ref) else ref,
                     dtype=np.complex128)
    np.testing.assert_array_equal(got, ref)


def test_native_builds():
    assert fio._native_mmio() is not None, "C++ mmio failed to build"


def test_coordinate_real(tmp_path):
    rng = np.random.default_rng(0)
    A = sp.random(20, 20, density=0.2, random_state=1)
    _roundtrip(tmp_path, A, "real")


def test_coordinate_complex(tmp_path):
    rng = np.random.default_rng(1)
    d = sp.random(15, 15, density=0.3, random_state=2)
    A = d + 1j * sp.random(15, 15, density=0.3, random_state=3)
    _roundtrip(tmp_path, sp.coo_matrix(A), "complex")


def test_coordinate_symmetric(tmp_path):
    A = sp.random(12, 12, density=0.3, random_state=4)
    A = A + A.T
    _roundtrip(tmp_path, sp.coo_matrix(A), "sym", symmetry="symmetric")


def test_coordinate_skew(tmp_path):
    A = sp.random(10, 10, density=0.3, random_state=5)
    A = A - A.T
    _roundtrip(tmp_path, sp.coo_matrix(A), "skew", symmetry="skew-symmetric")


def test_coordinate_hermitian(tmp_path):
    d = sp.random(10, 10, density=0.3, random_state=6)
    A = (d + 1j * sp.random(10, 10, density=0.3, random_state=7)).toarray()
    A = A + A.conj().T
    _roundtrip(tmp_path, sp.coo_matrix(A), "herm", symmetry="hermitian")


def test_array_dense(tmp_path):
    rng = np.random.default_rng(8)
    A = rng.standard_normal((7, 5))
    _roundtrip(tmp_path, A, "dense")


def test_pattern(tmp_path):
    # pattern matrices: all stored entries are 1
    A = sp.random(9, 9, density=0.3, random_state=9)
    p = str(tmp_path / "pat.mtx")
    mmwrite(p, sp.coo_matrix(A), field="pattern")
    got = fio.read_matrix_market(p, out="dense")
    ref = (np.asarray(A.todense()) != 0).astype(np.complex128)
    np.testing.assert_array_equal(got, ref)


def test_outputs(tmp_path):
    A = sp.random(8, 8, density=0.4, random_state=10)
    p = str(tmp_path / "o.mtx")
    mmwrite(p, A)
    s = fio.read_matrix_market(p, out="scipy")
    assert sp.issparse(s)
    c = fio.read_matrix_market(p, out="csr")
    from feast_tpu.ops.sparse import CSR
    assert isinstance(c, CSR)
    d = fio.read_matrix_market(p, out="dense")
    np.testing.assert_allclose(np.asarray(s.todense()), d)
