"""On-device complex QZ (generalized Schur) vs scipy ground truth."""

import jax
import numpy as np
import pytest
import scipy.linalg as sla
from scipy.optimize import linear_sum_assignment

from feast_tpu import cx
from feast_tpu.ops import qz as qzmod


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_hessenberg_triangular_reduction():
    rng = np.random.default_rng(0)
    n = 12
    a, b = _rand_c(rng, n, n), _rand_c(rng, n, n)
    H, T, Q, Z = jax.jit(qzmod.hessenberg_triangular)(
        cx.from_numpy(a), cx.from_numpy(b))
    Hn, Tn, Qn, Zn = map(cx.to_numpy, (H, T, Q, Z))
    assert np.abs(np.tril(Hn, -2)).max() < 1e-13
    assert np.abs(np.tril(Tn, -1)).max() < 1e-13
    assert np.abs(Qn.conj().T @ Qn - np.eye(n)).max() < 1e-13
    assert np.abs(Qn @ Hn @ Zn.conj().T - a).max() < 1e-12
    assert np.abs(Qn @ Tn @ Zn.conj().T - b).max() < 1e-12


@pytest.mark.parametrize("n,seed", [(6, 0), (12, 1), (24, 2), (40, 3)])
def test_qz_eigenvalues_and_vectors(n, seed):
    rng = np.random.default_rng(seed)
    a, b = _rand_c(rng, n, n), _rand_c(rng, n, n)
    alpha, beta, V = jax.jit(qzmod.gen_eig_qz)(cx.from_numpy(a),
                                               cx.from_numpy(b))
    lam = cx.to_numpy(alpha) / cx.to_numpy(beta)
    ref = sla.eigvals(a, b)
    cost = np.abs(lam[:, None] - ref[None, :])
    r_, c_ = linear_sum_assignment(cost)
    scale = np.linalg.norm(a) + np.linalg.norm(b)
    assert cost[r_, c_].max() < 1e-11 * scale
    Vn = cx.to_numpy(V)
    res = np.linalg.norm(a @ Vn - b @ Vn @ np.diag(lam), axis=0)
    assert res.max() < 1e-11 * scale


def test_qz_schur_form():
    rng = np.random.default_rng(5)
    n = 16
    a, b = _rand_c(rng, n, n), _rand_c(rng, n, n)
    S, T, Q, Z = jax.jit(qzmod.qz)(cx.from_numpy(a), cx.from_numpy(b))
    Sn, Tn, Qn, Zn = map(cx.to_numpy, (S, T, Q, Z))
    assert np.abs(np.tril(Sn, -1)).max() < 1e-11 * np.linalg.norm(a)
    assert np.abs(np.tril(Tn, -1)).max() < 1e-11 * np.linalg.norm(b)
    np.testing.assert_allclose(Qn @ Sn @ Zn.conj().T, a,
                               atol=1e-11 * np.linalg.norm(a))
    np.testing.assert_allclose(Qn @ Tn @ Zn.conj().T, b,
                               atol=1e-11 * np.linalg.norm(b))


def test_qz_singular_B_infinite_eigenvalue():
    """The capability gen_eig (B^{-1}A) cannot provide: a singular B gives an
    infinite eigenvalue, cleanly flagged by beta ~ 0 (scipy reports it as a
    ~1e15 junk float instead)."""
    rng = np.random.default_rng(7)
    n = 8
    a = _rand_c(rng, n, n)
    b = _rand_c(rng, n, n)
    b[0, :] = 0.0
    alpha, beta, V = jax.jit(qzmod.gen_eig_qz)(cx.from_numpy(a),
                                               cx.from_numpy(b))
    al, be = cx.to_numpy(alpha), cx.to_numpy(beta)
    finite = np.abs(be) > 1e-8 * np.abs(al)
    assert finite.sum() == n - 1
    ref = sla.eigvals(a, b)
    ref_f = np.sort_complex(ref[np.abs(ref) < 1e8])
    got = np.sort_complex((al / be)[finite])
    assert len(got) == len(ref_f)
    np.testing.assert_allclose(got, ref_f, atol=1e-10 * np.linalg.norm(a))


def test_qz_matches_gen_eig_on_nice_pencil():
    from feast_tpu.ops import eig as eigmod

    rng = np.random.default_rng(9)
    n = 10
    a = _rand_c(rng, n, n)
    b = _rand_c(rng, n, n) + 4.0 * np.eye(n)  # well-conditioned B
    alpha, beta, _ = qzmod.gen_eig_qz(cx.from_numpy(a), cx.from_numpy(b))
    lam_qz = np.sort_complex(cx.to_numpy(alpha) / cx.to_numpy(beta))
    w, _ = eigmod.gen_eig(cx.from_numpy(a), cx.from_numpy(b))
    lam_ge = np.sort_complex(cx.to_numpy(w))
    cost = np.abs(lam_qz[:, None] - lam_ge[None, :])
    r_, c_ = linear_sum_assignment(cost)
    assert cost[r_, c_].max() < 1e-11


def test_qz_pencil_rq_refinement_clustered():
    """gen_eig_qz's division-free (alpha, beta) <- (u^H A v, u^H B v)
    refinement on a clustered pencil: must reach near-machine accuracy and
    never degrade the raw QZ diagonals (kappa guard)."""
    rng = np.random.default_rng(3)
    n, sep = 24, 1e-6
    lam = np.concatenate([
        2.0 + sep * np.arange(5) * (1 + 1j),
        -1.0 + rng.standard_normal(n - 5) + 1j * rng.standard_normal(n - 5)])
    X = _rand_c(rng, n, n) / np.sqrt(n) + 2.5 * np.eye(n)
    B = np.eye(n) + 0.25 * _rand_c(rng, n, n) / np.sqrt(n)
    A = B @ X @ np.diag(lam) @ np.linalg.inv(X)

    def max_err(wd):
        err, pool = 0.0, list(lam)
        for v in wd:
            i = int(np.argmin(np.abs(np.array(pool) - v)))
            err = max(err, abs(pool[i] - v) / max(abs(pool[i]), 1.0))
            pool.pop(i)
        return err

    Ax, Bx = cx.from_numpy(A), cx.from_numpy(B)
    a0, b0, _ = qzmod.gen_eig_qz(Ax, Bx, refine_rq=False)
    a1, b1, _ = qzmod.gen_eig_qz(Ax, Bx)
    e_raw = max_err(cx.to_numpy(a0) / cx.to_numpy(b0))
    e_rq = max_err(cx.to_numpy(a1) / cx.to_numpy(b1))
    assert e_rq < 5e-13
    assert e_rq <= max(e_raw * 2, 5e-13)


def test_qz_rq_keeps_infinite_eigenvalues():
    """Refinement must not destroy the beta ~ 0 encoding of infinite
    eigenvalues on a singular-B pencil."""
    rng = np.random.default_rng(11)
    n = 8
    A = _rand_c(rng, n, n)
    B = _rand_c(rng, n, n)
    B[:, -2:] = 0.0  # rank n-2: two infinite eigenvalues
    al, be, V = qzmod.gen_eig_qz(cx.from_numpy(A), cx.from_numpy(B))
    alpha, beta = cx.to_numpy(al), cx.to_numpy(be)
    scale = np.sqrt(np.abs(alpha) ** 2 + np.abs(beta) ** 2)
    n_inf = int((np.abs(beta) / scale < 1e-8).sum())
    assert n_inf == 2
    # finite pairs match scipy
    fin = np.abs(beta) / scale >= 1e-8
    got = np.sort_complex(alpha[fin] / beta[fin])
    ref = sla.eigvals(A, B)
    ref = np.sort_complex(ref[np.isfinite(ref)])
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)
