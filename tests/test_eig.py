"""On-device complex Schur/eig vs numpy (LAPACK) ground truth."""

import jax
import numpy as np
import pytest

from feast_tpu import cx
from feast_tpu.ops import eig as feig


def _rand_c(n, m=None, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    m = m or n
    return scale * (rng.standard_normal((n, m)) + 1j * rng.standard_normal((n, m)))


@pytest.mark.parametrize("n,seed", [(4, 0), (8, 1), (16, 2), (32, 3)])
def test_schur_reconstructs(n, seed):
    a = _rand_c(n, seed=seed)
    A = cx.from_numpy(a)
    T, Z = jax.jit(feig.schur)(A)
    Tn, Zn = cx.to_numpy(T), cx.to_numpy(Z)
    # unitary
    np.testing.assert_allclose(Zn.conj().T @ Zn, np.eye(n), atol=1e-12)
    # triangular
    assert np.max(np.abs(np.tril(Tn, -1))) < 1e-11 * np.linalg.norm(a)
    # similarity
    np.testing.assert_allclose(Zn @ Tn @ Zn.conj().T, a, atol=1e-11)


@pytest.mark.parametrize("n,seed", [(4, 0), (8, 1), (16, 2), (32, 3), (50, 4)])
def test_eigenvalues_match_numpy(n, seed):
    a = _rand_c(n, seed=seed)
    w, V = jax.jit(feig.eig)(cx.from_numpy(a))
    wn = np.sort_complex(cx.to_numpy(CXw := w))
    ref = np.sort_complex(np.linalg.eigvals(a))
    np.testing.assert_allclose(wn, ref, atol=1e-10 * np.linalg.norm(a))


@pytest.mark.parametrize("n,seed", [(8, 1), (24, 5)])
def test_eigenvectors_residual(n, seed):
    a = _rand_c(n, seed=seed)
    w, V = jax.jit(feig.eig)(cx.from_numpy(a))
    wn, Vn = cx.to_numpy(w), cx.to_numpy(V)
    res = np.linalg.norm(a @ Vn - Vn * wn[None, :], axis=0)
    assert np.max(res) < 1e-10 * np.linalg.norm(a)


def test_real_matrix_complex_pairs():
    # real nonsymmetric matrix: complex-conjugate eigenvalue pairs.
    # sort_complex is unstable for conjugate pairs whose real parts differ by
    # eps noise, so compare via optimal matching instead.
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(7)
    a = rng.standard_normal((12, 12))
    w, V = jax.jit(feig.eig)(cx.from_numpy(a.astype(np.complex128)))
    wn = cx.to_numpy(w)
    ref = np.linalg.eigvals(a)
    cost = np.abs(wn[:, None] - ref[None, :])
    r, c = linear_sum_assignment(cost)
    assert cost[r, c].max() < 1e-10 * np.linalg.norm(a)


def test_diagonal_matrix():
    d = np.diag(np.arange(1.0, 11.0)).astype(np.complex128)
    w, V = feig.eig(cx.from_numpy(d))
    wn = np.sort(cx.to_numpy(w).real)
    np.testing.assert_allclose(wn, np.arange(1.0, 11.0), atol=1e-12)


def test_defective_jordan_block():
    # J(0) 2x2 Jordan block plus small perturbation: eigenvalues near 0
    j = np.array([[0, 1], [1e-12, 0]], dtype=np.complex128)
    w, _ = feig.eig(cx.from_numpy(j))
    assert np.max(np.abs(cx.to_numpy(w))) < 1e-5


def test_clustered_eigenvalues():
    rng = np.random.default_rng(11)
    q, _ = np.linalg.qr(_rand_c(16, seed=11))
    lam = np.concatenate([np.full(8, 2.0 + 0j), 2.0 + 1e-6 * (rng.standard_normal(8) + 1j * rng.standard_normal(8))])
    a = q @ np.diag(lam) @ q.conj().T
    w, _ = feig.eig(cx.from_numpy(a))
    wn = np.sort_complex(cx.to_numpy(w))
    ref = np.sort_complex(lam)
    np.testing.assert_allclose(wn, ref, atol=1e-8)


def test_eigh_embedding():
    """Hermitian eigh via the real-symmetric embedding (ops/eigh.py)."""
    from feast_tpu.ops.eigh import eigh_cx

    rng = np.random.default_rng(0)
    for n in (8, 32):
        a = _rand_c(n, seed=n)
        H = (a + a.conj().T) / 2
        w, V = jax.jit(eigh_cx)(cx.from_numpy(H))
        wn, Vn = np.asarray(w), cx.to_numpy(V)
        np.testing.assert_allclose(np.sort(wn), np.linalg.eigvalsh(H),
                                   atol=1e-12 * n)
        assert np.linalg.norm(H @ Vn - Vn * wn[None, :], axis=0).max() < 1e-12 * n
        assert np.abs(Vn.conj().T @ Vn - np.eye(n)).max() < 1e-12 * n


def test_eigh_embedding_degenerate():
    from feast_tpu.ops.eigh import eigh_cx

    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(_rand_c(12, seed=5))
    lam = np.array([1.0] * 3 + [2.0] * 4 + list(np.arange(3.0, 8.0)))
    H = q @ np.diag(lam) @ q.conj().T
    H = (H + H.conj().T) / 2
    w, V = eigh_cx(cx.from_numpy(H))
    Vn, wn = cx.to_numpy(V), np.asarray(w)
    assert np.linalg.norm(H @ Vn - Vn * wn[None, :], axis=0).max() < 1e-12
    assert np.abs(Vn.conj().T @ Vn - np.eye(12)).max() < 1e-12


def test_feast_hermitian_fast_path():
    import feast_tpu as ft
    from feast_tpu import problems

    rng = np.random.default_rng(1)
    L = problems.laplacian_1d(100)
    X0 = rng.standard_normal((100, 15)) + 1j * rng.standard_normal((100, 15))
    out = ft.feast(L, X0, c=0.05 + 0j, r=0.05, nodes=8, iters=30, tol=1e-14,
                   hermitian=True)
    lam, _, r = out.filtered()
    assert len(lam) == 10 and r.max() < 1e-14
    outg = ft.gen_feast(L, np.eye(100, dtype=np.complex128), X0,
                        c=0.05 + 0j, r=0.05, nodes=8, iters=30, tol=1e-14,
                        pencil="hermitian")
    lamg, _, rg = outg.filtered()
    np.testing.assert_allclose(np.sort(lamg.real), np.sort(lam.real),
                               atol=1e-12)


def test_eigh_embedding_triple_degenerate():
    """Hermitian matrix with a 4-fold degenerate eigenvalue: the embedding
    repair must yield independent, orthonormal eigenvectors for the whole
    cluster (the r1 heuristic only handled 2-clusters)."""
    rng = np.random.default_rng(21)
    n = 12
    # random unitary (complex) via QR of a random matrix
    Z = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Uq, _ = np.linalg.qr(Z)
    w_true = np.concatenate([np.full(4, 2.5), np.array([1.0, 3.0]),
                             np.linspace(4, 9, n - 6)])
    H = (Uq * w_true[None, :]) @ Uq.conj().T
    H = (H + H.conj().T) / 2
    import jax.numpy as jnp
    from feast_tpu.ops import eigh as eighmod
    Hc = cx.from_numpy(H, jnp.float64)
    w, V = eighmod.eigh_cx(Hc)
    w = np.asarray(w)
    np.testing.assert_allclose(np.sort(w), np.sort(w_true), atol=1e-10)
    Vn = cx.to_numpy(V)
    # orthonormal (full rank — no colinear collapse inside the cluster)
    np.testing.assert_allclose(Vn.conj().T @ Vn, np.eye(n), atol=1e-8)
    # eigen-residuals
    R = H @ Vn - Vn * w[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-9


def test_rq_refine_clustered_drift():
    """Rayleigh-quotient refinement scrubs the first-order eigenvalue drift
    on clustered non-normal spectra (the regime where late FEAST reduced
    pencils sit).  Refined values must beat the raw Schur diagonals and
    reach near-machine accuracy; the unrefined path stays available."""
    rng = np.random.default_rng(7)
    n, sep = 32, 1e-5
    lam = np.concatenate([
        1.0 + sep * np.arange(6) + 1j * sep * rng.standard_normal(6),
        3.0 + rng.standard_normal(n - 6) + 1j * rng.standard_normal(n - 6)])
    X = _rand_c(n, seed=7) + 3 * np.eye(n)
    a = X @ np.diag(lam) @ np.linalg.inv(X)

    def max_err(w):
        wd = cx.to_numpy(w)
        err, pool = 0.0, list(lam)
        for v in wd:
            i = int(np.argmin(np.abs(np.array(pool) - v)))
            err = max(err, abs(pool[i] - v) / max(abs(pool[i]), 1.0))
            pool.pop(i)
        return err

    Ax = cx.from_numpy(a)
    e_raw = max_err(feig.eig(Ax, refine_rq=False)[0])
    e_rq = max_err(feig.eig(Ax)[0])
    assert e_rq < 5e-14
    # refinement never makes things materially worse (both may sit at noise)
    assert e_rq <= max(e_raw * 2, 5e-14)


def test_tri_unit_inv():
    """tri_unit_inv inverts the unit upper-triangular eigenvector matrix."""
    T, _ = feig.schur(cx.from_numpy(_rand_c(12, seed=3)))
    Y = feig.tri_eigvecs(T)
    Xi = feig.tri_unit_inv(Y)
    P = cx.to_numpy(Xi @ Y)
    np.testing.assert_allclose(P, np.eye(12), atol=1e-12)


def test_gen_eig_pencil_rq_clustered():
    """The pencil two-sided RQ refinement (gen_eig refine_rq) reaches
    near-machine eigenvalue accuracy on a clustered non-normal pencil —
    the late-FEAST reduced-pencil regime where the raw B^{-1}A reduction
    drifts (VERDICT r2 weak #5 / rr_bisect3 eig_err)."""
    rng = np.random.default_rng(7)
    n, sep = 32, 1e-5
    lam = np.concatenate([
        1.0 + sep * np.arange(6) + 1j * sep * rng.standard_normal(6),
        3.0 + rng.standard_normal(n - 6) + 1j * rng.standard_normal(n - 6)])
    X = _rand_c(n, seed=7) / np.sqrt(n) + 3 * np.eye(n)
    B = np.eye(n) + 0.3 * _rand_c(n, seed=8) / np.sqrt(n)
    A = B @ X @ np.diag(lam) @ np.linalg.inv(X)

    def max_err(wd):
        err, pool = 0.0, list(lam)
        for v in wd:
            i = int(np.argmin(np.abs(np.array(pool) - v)))
            err = max(err, abs(pool[i] - v) / max(abs(pool[i]), 1.0))
            pool.pop(i)
        return err

    Ax, Bx = cx.from_numpy(A), cx.from_numpy(B)
    e_raw = max_err(cx.to_numpy(feig.gen_eig(Ax, Bx, refine_rq=False)[0]))
    w, V = feig.gen_eig(Ax, Bx)
    e_rq = max_err(cx.to_numpy(w))
    assert e_rq < 5e-14
    assert e_rq <= max(e_raw * 2, 5e-14)
    # refined eigenvectors still satisfy the pencil
    R = (A @ cx.to_numpy(V) - B @ cx.to_numpy(V) * cx.to_numpy(w)[None, :])
    assert np.linalg.norm(R, axis=0).max() < 1e-12


def test_indep_guard_rejects_collapsed_basis():
    """ADVICE r4: the mixed-eig acceptance guard must also reject a basis
    whose polish collapsed two cluster columns onto one eigenvector (every
    per-column residual can still pass)."""
    rng = np.random.default_rng(7)
    n = 12
    V = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    V /= np.linalg.norm(V, axis=0)
    Vx = cx.from_numpy(V)
    assert bool(feig._indep_ok(Vx))
    # collapse: column 3 := column 2 (unit norm preserved)
    Vc = V.copy()
    Vc[:, 3] = Vc[:, 2]
    assert not bool(feig._indep_ok(cx.from_numpy(Vc)))
    # near-collapse below the floor is rejected too
    Vn = V.copy()
    Vn[:, 3] = Vn[:, 2] + 1e-9 * Vn[:, 3]
    Vn /= np.linalg.norm(Vn, axis=0)
    assert not bool(feig._indep_ok(cx.from_numpy(Vn)))
    # orthonormal basis passes with margin
    Q, _ = np.linalg.qr(V)
    assert bool(feig._indep_ok(cx.from_numpy(Q)))
