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


def test_array_symmetric(tmp_path):
    """Array-format symmetric files store only the lower triangle
    (n(n+1)/2 values) — regression for the nnz=nrows*ncols bug."""
    rng = np.random.default_rng(9)
    A = rng.standard_normal((9, 9))
    A = A + A.T
    _roundtrip(tmp_path, A, "arr_sym", symmetry="symmetric")


def test_array_hermitian(tmp_path):
    rng = np.random.default_rng(10)
    A = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    A = A + A.conj().T
    _roundtrip(tmp_path, A, "arr_herm", symmetry="hermitian")


def test_array_skew(tmp_path):
    """Skew-symmetric array files omit the diagonal: n(n-1)/2 values."""
    rng = np.random.default_rng(11)
    A = rng.standard_normal((7, 7))
    A = A - A.T
    _roundtrip(tmp_path, A, "arr_skew", symmetry="skew-symmetric")


def test_crlf_line_endings(tmp_path):
    """CRLF files must tokenize identically to LF files (the symmetry
    header token must not keep a trailing \\r)."""
    A = sp.random(11, 11, density=0.3, random_state=12)
    A = sp.coo_matrix(A + A.T)
    p_lf = str(tmp_path / "lf.mtx")
    mmwrite(p_lf, A, symmetry="symmetric")
    raw = open(p_lf, "rb").read().replace(b"\n", b"\r\n")
    p_crlf = str(tmp_path / "crlf.mtx")
    open(p_crlf, "wb").write(raw)
    got = fio.read_matrix_market(p_crlf, out="dense")
    ref = np.asarray(mmread(p_lf).todense(), dtype=np.complex128)
    np.testing.assert_array_equal(got, ref)


def test_scipy_fallback_on_native_error(tmp_path, monkeypatch):
    """If the native reader raises on a valid file, read_matrix_market must
    fall back to scipy instead of propagating."""
    A = sp.random(6, 6, density=0.5, random_state=13)
    p = str(tmp_path / "ok.mtx")
    mmwrite(p, A)

    class Broken:
        @staticmethod
        def read(path):
            raise ValueError("simulated native parse failure")

    monkeypatch.setattr(fio, "_NATIVE", Broken)
    monkeypatch.setattr(fio, "_NATIVE_TRIED", True)
    got = fio.read_matrix_market(p, out="dense")
    ref = np.asarray(mmread(p).todense(), dtype=np.complex128)
    np.testing.assert_array_equal(got, ref)
