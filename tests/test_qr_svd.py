"""CholeskyQR2/3, Householder QR, and Jacobi SVD vs numpy ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feast_tpu import cx
from feast_tpu.ops import qr as fqr
from feast_tpu.ops import svd as fsvd


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


@pytest.mark.parametrize("n,m", [(50, 8), (200, 30), (64, 64)])
def test_cholqr2(n, m):
    rng = np.random.default_rng(n + m)
    a = _rand_c(rng, n, m)
    Q, R = jax.jit(fqr.cholqr2)(cx.from_numpy(a))
    Qn, Rn = cx.to_numpy(Q), cx.to_numpy(R)
    assert np.abs(Qn.conj().T @ Qn - np.eye(m)).max() < 1e-13
    assert np.abs(Qn @ Rn - a).max() < 1e-12 * np.linalg.norm(a)
    # R upper triangular
    assert np.abs(np.tril(Rn, -1)).max() < 1e-12


def _graded(rng, n, m, lo):
    u, _ = np.linalg.qr(_rand_c(rng, n, m))
    v, _ = np.linalg.qr(_rand_c(rng, m, m))
    return u @ np.diag(np.logspace(0, lo, m)) @ v.conj().T


def test_cholqr3_ill_conditioned():
    rng = np.random.default_rng(2)
    a = _graded(rng, 100, 10, -12)
    Q, _ = jax.jit(fqr.cholqr3)(cx.from_numpy(a))
    Qn = cx.to_numpy(Q)
    assert np.abs(Qn.conj().T @ Qn - np.eye(10)).max() < 1e-12


def test_householder_qr():
    rng = np.random.default_rng(3)
    a = _graded(rng, 100, 10, -12)
    Q, R = jax.jit(fqr.householder_qr)(cx.from_numpy(a))
    Qn, Rn = cx.to_numpy(Q), cx.to_numpy(R)
    assert np.abs(Qn.conj().T @ Qn - np.eye(10)).max() < 1e-13
    assert np.abs(Qn @ Rn - a).max() < 1e-13


@pytest.mark.parametrize("n,m", [(100, 31), (16, 16), (25, 25), (40, 12)])
def test_svd_matches_numpy(n, m):
    rng = np.random.default_rng(n * m)
    a = _rand_c(rng, n, m)
    U, s, Vh = jax.jit(fsvd.svd)(cx.from_numpy(a))
    Un, sn, Vhn = cx.to_numpy(U), np.asarray(s), cx.to_numpy(Vh)
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.abs(sn - sref).max() < 1e-12 * sref[0]
    assert np.abs(Un @ np.diag(sn) @ Vhn - a).max() < 1e-12 * sref[0]
    assert np.abs(Un.conj().T @ Un - np.eye(len(sn))).max() < 1e-12
    assert np.abs(Vhn @ Vhn.conj().T - np.eye(len(sn))).max() < 1e-12


def test_svd_rank_deficient():
    rng = np.random.default_rng(9)
    a = _rand_c(rng, 50, 4) @ _rand_c(rng, 4, 12)  # rank 4
    U, s, Vh = fsvd.svd(cx.from_numpy(a))
    sn = np.asarray(s)
    assert (sn[4:] < 1e-12 * sn[0]).all()
    sref = np.linalg.svd(a, compute_uv=False)
    assert np.abs(sn[:4] - sref[:4]).max() < 1e-12 * sref[0]


def test_svd_direct_relative_accuracy():
    # direct one-sided Jacobi keeps relative accuracy of small sigmas down to
    # sigma/sigma_max ~ 1e-8 (forming the test matrix in f64 already perturbs
    # tinier sigmas by eps*kappa, so no method can be checked below that).
    rng = np.random.default_rng(11)
    a = _graded(rng, 80, 10, -8)
    U, s, Vh = fsvd.svd(cx.from_numpy(a), reduce="direct")
    sref = np.linalg.svd(a, compute_uv=False)
    rel = np.abs(np.asarray(s) - sref) / sref
    assert rel.max() < 1e-7
    Un = cx.to_numpy(U)
    assert np.abs(Un @ np.diag(np.asarray(s)) @ cx.to_numpy(Vh) - a).max() < 1e-13


def test_svd_extreme_scale_columns():
    """Columns spanning ~16 orders of magnitude: exercises the Jacobi
    big-tau clamp (tau^2 overflows the TPU f64 emulation's f32 exponent
    range — the r2 on-chip NaN) and the deficient-pivot Cholesky path."""
    from feast_tpu.ops import svd as svdmod

    rng = np.random.default_rng(31)
    n, m = 60, 12
    U0, _ = np.linalg.qr(rng.standard_normal((n, n)))
    sigmas = np.logspace(0, -16, m)
    A = (U0[:, :m] * sigmas[None, :]) @ np.linalg.qr(
        rng.standard_normal((m, m)))[0]
    Ac = cx.from_numpy(A.astype(np.complex128), jnp.float64)
    U, s, Vh = svdmod.svd(Ac)
    s = np.asarray(s)
    assert np.isfinite(s).all()
    assert np.isfinite(cx.to_numpy(U)).all()
    assert np.isfinite(cx.to_numpy(Vh)).all()
    ref = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(s[:6], ref[:6], rtol=5e-10)
    # reconstruction to absolute eps*sigma_max
    rec = cx.to_numpy(U) * s[None, :] @ cx.to_numpy(Vh)
    assert np.abs(rec - A).max() < 1e-13


def test_cholesky_rank_deficient_stays_finite():
    """Gram of a rank-deficient block: the semidefinite pivot convention
    must keep everything finite (TPU f64-emulation overflow regression)."""
    from feast_tpu.ops import qr as qrmod

    rng = np.random.default_rng(32)
    n, m, r = 80, 24, 7
    A = (rng.standard_normal((n, r)) @ rng.standard_normal((r, m))
         + 1j * rng.standard_normal((n, r)) @ rng.standard_normal((r, m)))
    Ac = cx.from_numpy(A, jnp.float64)
    G = cx.cmatmul(Ac.H, Ac)
    L = qrmod.cholesky(G)
    Ln = cx.to_numpy(L)
    Gn = cx.to_numpy(G)
    assert np.isfinite(Ln).all()
    # junk-pivot amplification is bounded by the factor invariant
    # |L[i,k]| <= 2 sqrt(max G_ii) — no cascade into overflow
    assert np.abs(Ln).max() <= 2.01 * np.sqrt(np.abs(np.diag(Gn)).max())
    # the numerically well-defined leading (2r x 2r) block reconstructs
    # (complex rank of A is 2r: independent real/imag factors)
    k = 2 * r
    err = np.abs((Ln @ Ln.conj().T)[:k, :k] - Gn[:k, :k]).max()
    assert err < 1e-8 * np.abs(Gn).max()
