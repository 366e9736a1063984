"""Batched Krylov solvers, CSR SpMM, and the inexact FEAST drivers."""

import jax
import numpy as np
import pytest
import scipy.sparse as sp

import feast_tpu as ft
from feast_tpu import cx
from feast_tpu.ops import krylov, sparse as spmod


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_bicgstab_dense():
    rng = np.random.default_rng(0)
    n, m = 80, 6
    A = np.diag(np.arange(1.0, n + 1.0)).astype(np.complex128) \
        + 0.3 * _rand_c(rng, n, n)
    B = _rand_c(rng, n, m)
    Ac = cx.from_numpy(A)
    out = jax.jit(lambda b: krylov.bicgstab(
        lambda X: cx.cmatmul(Ac, X), b, tol=1e-10, maxiter=2000))(
            cx.from_numpy(B))
    X = cx.to_numpy(out.x)
    assert np.linalg.norm(A @ X - B) / np.linalg.norm(B) < 1e-9
    assert np.asarray(out.converged).all()


def test_gmres_dense():
    rng = np.random.default_rng(1)
    n, m = 60, 4
    A = np.diag(np.arange(1.0, n + 1.0)).astype(np.complex128) \
        + 0.3 * _rand_c(rng, n, n)
    B = _rand_c(rng, n, m)
    Ac = cx.from_numpy(A)
    out = jax.jit(lambda b: krylov.gmres(
        lambda X: cx.cmatmul(Ac, X), b, tol=1e-10, restart=40))(
            cx.from_numpy(B))
    X = cx.to_numpy(out.x)
    assert np.linalg.norm(A @ X - B) / np.linalg.norm(B) < 1e-9


def test_csr_matvec_matches_dense():
    rng = np.random.default_rng(2)
    n = 50
    Ad = sp.random(n, n, density=0.1, random_state=3,
                   dtype=np.float64).toarray() \
        + 1j * sp.random(n, n, density=0.1, random_state=4,
                         dtype=np.float64).toarray()
    A = spmod.CSR.from_scipy(sp.csr_matrix(Ad))
    X = _rand_c(rng, n, 7)
    got = cx.to_numpy(A.matvec(cx.from_numpy(X)))
    np.testing.assert_allclose(got, Ad @ X, atol=1e-13)
    d = cx.to_numpy(A.diagonal())
    np.testing.assert_allclose(d, np.diag(Ad), atol=1e-15)


def test_dia_matvec_matches_dense():
    rng = np.random.default_rng(5)
    n = 64
    # banded non-symmetric complex: offsets {-3, -1, 0, 2}
    diags = [_rand_c(rng, n) for _ in range(4)]
    Ad = sp.diags(
        [diags[0][:n - 3], diags[1][:n - 1], diags[2], diags[3][:n - 2]],
        [-3, -1, 0, 2]).toarray()
    A = spmod.DIA.from_scipy(sp.csr_matrix(Ad))
    assert sorted(A.offsets) == [-3, -1, 0, 2]
    X = _rand_c(rng, n, 7)
    got = cx.to_numpy(A.matvec(cx.from_numpy(X)))
    np.testing.assert_allclose(got, Ad @ X, atol=1e-13)
    np.testing.assert_allclose(cx.to_numpy(A.diagonal()), np.diag(Ad),
                               atol=1e-15)
    np.testing.assert_allclose(cx.to_numpy(A.todense()), Ad, atol=1e-15)
    # jit with DIA as an argument (pytree with static offsets)
    got2 = cx.to_numpy(jax.jit(lambda M, X: M.matvec(X))(
        A, cx.from_numpy(X)))
    np.testing.assert_allclose(got2, Ad @ X, atol=1e-13)


def test_dia_rectangular_and_from_csr():
    rng = np.random.default_rng(6)
    n, m = 40, 56  # rectangular: offsets reach past the square part
    Ad = np.zeros((n, m), dtype=np.complex128)
    for off in (-2, 0, 13, 20):
        i = np.arange(max(0, -off), min(n, m - off))
        Ad[i, i + off] = _rand_c(rng, len(i))
    A = spmod.DIA.from_scipy(sp.csr_matrix(Ad))
    X = _rand_c(rng, m, 5)
    np.testing.assert_allclose(cx.to_numpy(A.matvec(cx.from_numpy(X))),
                               Ad @ X, atol=1e-13)
    # CSR -> DIA roundtrip
    A2 = spmod.DIA.from_csr(spmod.CSR.from_scipy(sp.csr_matrix(Ad)))
    np.testing.assert_allclose(cx.to_numpy(A2.matvec(cx.from_numpy(X))),
                               Ad @ X, atol=1e-13)


def test_as_operator_picks_dia_for_banded():
    n = 200
    L = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    op = spmod.as_operator(L)
    assert isinstance(op, spmod.DIA)
    R = sp.random(n, n, density=0.05, random_state=0,
                  dtype=np.float64).astype(np.complex128).tocsr()
    # random pattern must NOT go DIA; the r3 unstructured path prefers the
    # gather-free BELL layout when its block fill is acceptable, CSR as the
    # last resort
    assert isinstance(spmod.as_operator(R), (spmod.BELL, spmod.CSR))
    assert not isinstance(spmod.as_operator(R), spmod.DIA)


@pytest.mark.slow
def test_feast_iterative_accepts_dia():
    """Same slice as the CSR test above, but fed a pre-built DIA operator —
    the driver must route SpMMs through the shifted-slice path."""
    rng = np.random.default_rng(0)
    n = 300
    L = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    op = spmod.as_operator(L)
    assert isinstance(op, spmod.DIA)
    X0 = _rand_c(rng, n, 24)
    out = ft.feast_iterative(op, None, X0, c=0.02 + 0j, r=0.02, nodes=8,
                             iters=25, tol=1e-9)
    lam, _, r = out.filtered()
    exact = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1))
    want = np.sort(exact[(exact > 0.0) & (exact < 0.04)])
    assert len(lam) == len(want)
    assert r.max() < 1e-9
    np.testing.assert_allclose(np.sort(lam.real), want, atol=1e-10)


def test_jacobi_preconditioned_shifted_solve():
    rng = np.random.default_rng(5)
    n = 200
    L = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    A = spmod.CSR.from_scipy(L)
    z = cx.as_cx(3.0 + 0.5j)
    mv = spmod.shifted_matvec(A, None, z)
    M = spmod.jacobi_preconditioner(A, None, z)
    B = cx.from_numpy(_rand_c(rng, n, 3))
    out = krylov.bicgstab(mv, B, tol=1e-10, maxiter=2000, M=M)
    X = cx.to_numpy(out.x)
    Ld = L.toarray()
    S = Ld - (3.0 + 0.5j) * np.eye(n)
    assert np.linalg.norm(S @ X - cx.to_numpy(B)) < 1e-8


def test_ifeast_reference_parity():
    rng = np.random.default_rng(0)
    A = np.diag(np.arange(1.0, 26.0)).astype(np.complex128)
    X0 = _rand_c(rng, 25, 5)
    out = ft.ifeast(A, X0, nodes=8, iters=10, c=1.5 + 0j, r=2.0, tol=1e-10)
    lam, _, r = out.filtered()
    np.testing.assert_allclose(np.sort(lam.real), [1, 2, 3], atol=1e-8)


@pytest.mark.slow
def test_feast_iterative_sparse_laplacian_slice():
    rng = np.random.default_rng(0)
    n = 400
    L = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    X0 = _rand_c(rng, n, 32)
    out = ft.feast_iterative(L, None, X0, c=0.02 + 0j, r=0.02, nodes=8,
                             iters=25, tol=1e-9)
    lam, _, r = out.filtered()
    exact = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1))
    want = np.sort(exact[(exact > 0.0) & (exact < 0.04)])
    assert len(lam) == len(want)
    assert r.max() < 1e-9
    np.testing.assert_allclose(np.sort(lam.real), want, atol=1e-10)


def test_mixed_prec_iterative_refinement_full_accuracy():
    # f32 LU + f64 IR must reach the same residual floor as full f64
    rng = np.random.default_rng(0)
    A = np.diag(np.arange(1.0, 26.0)).astype(np.complex128)
    X0 = _rand_c(rng, 25, 5)
    out = ft.feast(A, X0, c=1.5 + 0j, r=2.0, nodes=8, mixed_prec=True,
                   tol=1e-12, iters=15)
    lam, _, r = out.filtered()
    assert out.converged
    np.testing.assert_allclose(np.sort(lam.real), [1, 2, 3], atol=1e-10)
    assert r.max() < 1e-12


def test_bicgstab_l():
    """BiCGStab(l) — the reference's actual solver (`bicgstabl`)."""
    rng = np.random.default_rng(4)
    n, m = 120, 5
    A = np.diag(np.arange(1.0, n + 1.0)).astype(np.complex128) \
        + 0.4 * _rand_c(rng, n, n)
    B = _rand_c(rng, n, m)
    Ac = cx.from_numpy(A)
    mv = lambda X: cx.cmatmul(Ac, X)
    for ell in (2, 4):
        out = jax.jit(lambda b: krylov.bicgstab_l(
            mv, b, ell=ell, tol=1e-10, maxiter=500))(cx.from_numpy(B))
        X = cx.to_numpy(out.x)
        assert np.linalg.norm(A @ X - B) / np.linalg.norm(B) < 1e-9
        assert np.asarray(out.converged).all()
    # warm start + right preconditioning (true-coordinate x0)
    d = np.diag(A)
    Mi = cx.from_numpy(1.0 / d)
    prec = lambda X: cx.CX(X.re * Mi.re[:, None] - X.im * Mi.im[:, None],
                           X.re * Mi.im[:, None] + X.im * Mi.re[:, None])
    xstar = np.linalg.solve(A, B)
    x0 = cx.from_numpy(xstar + 0.01 * _rand_c(rng, n, m))
    out = krylov.bicgstab_l(mv, cx.from_numpy(B), x0=x0, ell=2, tol=1e-10,
                            maxiter=500, M=prec)
    X = cx.to_numpy(out.x)
    assert np.linalg.norm(A @ X - B) / np.linalg.norm(B) < 1e-9
    assert int(out.iters) <= 10  # warm start pays off


@pytest.mark.slow
def test_feast_iterative_bicgstabl_solver():
    rng = np.random.default_rng(0)
    n = 300
    L = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    X0 = _rand_c(rng, n, 24)
    out = ft.feast_iterative(L, None, X0, c=0.02 + 0j, r=0.02, nodes=8,
                             iters=20, tol=1e-9, solver="bicgstabl")
    lam, _, r = out.filtered()
    exact = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1))
    want = np.sort(exact[(exact > 0.0) & (exact < 0.04)])
    assert len(lam) == len(want)
    assert r.max() < 1e-9


@pytest.mark.slow
def test_feast_iterative_node_chunk_matches_full_vmap():
    # node_chunk bounds the Krylov-workspace peak (one chunk of nodes per
    # compiled call instead of the all-nodes vmap); results must agree.
    rng = np.random.default_rng(3)
    n = 300
    L = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    X0 = _rand_c(rng, n, 32)
    kw = dict(c=0.02 + 0j, r=0.02, nodes=8, iters=25, tol=1e-9)
    full = ft.feast_iterative(L, None, X0, **kw)
    chunked = ft.feast_iterative(L, None, X0, node_chunk=2, **kw)
    lf, _, rf = full.filtered()
    lc, _, rc = chunked.filtered()
    assert chunked.converged and full.converged
    assert len(lf) == len(lc)
    assert rc.max() < 1e-9
    np.testing.assert_allclose(np.sort(lc.real), np.sort(lf.real),
                               atol=1e-10)
    with pytest.raises(ValueError):
        ft.feast_iterative(L, None, X0, node_chunk=3, **kw)


def test_bicgstab_rr_matches_plain_and_true_residual():
    # residual replacement (van der Vorst/Ye): final resnorm is the TRUE
    # residual b - A x, and on a well-conditioned system it matches plain
    # bicgstab.
    rng = np.random.default_rng(7)
    n, m = 400, 5
    Ad = (np.diag(2.0 + rng.random(n))
          + np.diag(-0.5 * rng.random(n - 1), 1)
          + np.diag(-0.5 * rng.random(n - 1), -1)).astype(complex)
    Ad += 1j * 0.1 * np.diag(rng.random(n))
    A = cx.as_cx(Ad)
    B = cx.as_cx(rng.standard_normal((n, m))
                 + 1j * rng.standard_normal((n, m)))
    mv = lambda X: cx.cmatmul(A, X)
    s1 = krylov.bicgstab(mv, B, tol=1e-12, maxiter=300)
    s2 = krylov.bicgstab_rr(mv, B, tol=1e-12, maxiter=300,
                            replace_every=20)
    assert np.asarray(s1.resnorm).max() < 1e-12
    assert np.asarray(s2.resnorm).max() < 1e-12
    X2 = np.asarray(s2.x.re) + 1j * np.asarray(s2.x.im)
    Bn = np.asarray(B.re) + 1j * np.asarray(B.im)
    true_rel = (np.linalg.norm(Ad @ X2 - Bn, axis=0)
                / np.linalg.norm(Bn, axis=0))
    np.testing.assert_allclose(true_rel, np.asarray(s2.resnorm),
                               rtol=1e-6, atol=1e-14)


def test_feast_iterative_bicgstab_rr_solver():
    rng = np.random.default_rng(5)
    n = 300
    L = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    X0 = _rand_c(rng, n, 32)
    out = ft.feast_iterative(L, None, X0, c=0.02 + 0j, r=0.02, nodes=8,
                             iters=25, tol=1e-9, solver="bicgstab_rr",
                             solve_iters=200)
    lam, _, r = out.filtered()
    exact = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1))
    want = np.sort(exact[(exact > 0.0) & (exact < 0.04)])
    assert out.converged and len(lam) == len(want)
    np.testing.assert_allclose(np.sort(lam.real), want, atol=1e-10)


def test_feast_iterative_host_rr():
    # rr="host": Rayleigh-Ritz phase on host LAPACK, node solves on device
    # (the TPU fix for the emulated-f64 MXU's f32-grade long-contraction
    # accumulation, which caps on-device Ritz values near 1e-6 relative).
    rng = np.random.default_rng(5)
    n = 300
    L = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    X0 = _rand_c(rng, n, 32)
    out = ft.feast_iterative(L, None, X0, c=0.02 + 0j, r=0.02, nodes=8,
                             iters=25, tol=1e-9, rr="host",
                             node_chunk=4, solve_iters=300)
    lam, _, r = out.filtered()
    exact = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1))
    want = np.sort(exact[(exact > 0.0) & (exact < 0.04)])
    assert out.converged and len(lam) == len(want)
    assert r.max() < 1e-9
    np.testing.assert_allclose(np.sort(lam.real), want, atol=1e-10)
    with pytest.raises(ValueError):
        from feast_tpu.parallel.mesh import node_mesh
        ft.feast_iterative(L, None, X0, c=0.02 + 0j, r=0.02, nodes=8,
                           rr="host", mesh=node_mesh(1))


@pytest.mark.slow
def test_feast_iterative_keep_q_stepping():
    # keep_q=True + iters=0 gives exact single-sweep stepping: restarting
    # each sweep from the returned moment subspace Q converges like the
    # continuous loop (the crash-recovery checkpoint the 1M-dof TPU
    # benchmark needs — the remote worker dies after ~2 consecutive
    # 1M-dof sweeps).
    rng = np.random.default_rng(2)
    n = 300
    L = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    X = _rand_c(rng, n, 32)
    kw = dict(c=0.02 + 0j, r=0.02, nodes=8, tol=1e-9, node_chunk=4,
              solve_iters=300)
    conv = False
    for _ in range(12):
        out = ft.feast_iterative(L, None, X, iters=0, keep_q=True, **kw)
        if out.converged:
            conv = True
            break
        assert out.Q is not None
        X = cx.to_numpy(out.Q)
    lam, _, r = out.filtered()
    exact = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1))
    want = np.sort(exact[(exact > 0.0) & (exact < 0.04)])
    assert conv and len(lam) == len(want) and r.max() < 1e-9
    np.testing.assert_allclose(np.sort(lam.real), want, atol=1e-10)
    # default: Q not kept
    assert ft.feast_iterative(L, None, X, iters=0, **kw).Q is None


def test_feast_iterative_tol_mode_contour():
    """tol_mode="contour" flows through the iterative driver: a scaled
    slice converges where the absolute target cannot."""
    import numpy as np
    import scipy.sparse as sp

    from feast_tpu.solvers.ifeast import feast_iterative

    n, scale = 200, 1e7
    d = scale * np.arange(1.0, n + 1.0)
    A = sp.diags(d).tocsr().astype(complex)
    rng = np.random.default_rng(0)
    X0 = rng.standard_normal((n, 6)) + 1j * rng.standard_normal((n, 6))
    common = dict(c=2.5 * scale + 0j, r=2.0 * scale, nodes=8, iters=10,
                  solver="bicgstab_rr", solve_tol=1e-12, solve_iters=300,
                  precondition="jacobi")
    out_abs = feast_iterative(A, None, X0, tol=1e-10, **common)
    assert not bool(out_abs.converged)  # absolute 1e-10 at |lam|~1e7
    out = feast_iterative(A, None, X0, tol=1e-10, tol_mode="contour",
                          **common)
    assert bool(out.converged)
    got = np.sort(np.asarray(out.lam.re)[np.asarray(out.inside)])
    assert np.allclose(got, d[:4], rtol=1e-8)


def test_feast_iterative_auto_m0():
    """m0='auto' (VERDICT r4 #9): the matrix-free stochastic count sizes
    the subspace from the slice itself — no X0 — and must match or beat a
    minimally-buffered hand-tuned start on sweep count, on both standard
    and generalized pencils (the B-factor in the projector trace)."""
    import numpy as np
    import scipy.sparse as sp

    from feast_tpu import problems
    from feast_tpu.solvers.ifeast import feast_iterative

    n = 400
    A = problems.laplacian_1d(n, sparse=True)
    k = np.arange(1, n + 1)
    exact = 2 - 2 * np.cos(k * np.pi / (n + 1))
    # INTERIOR slice (eigenvalues ~#18-23: indefinite shifted operators)
    sel = exact[17:23]
    c = complex((sel[0] + sel[-1]) / 2)
    r = float((sel[-1] - sel[0]) / 2
              + 0.4 * min(sel[0] - exact[16], exact[23] - sel[-1]))
    n_in = int(np.sum(np.abs(exact - c) <= r))
    common = dict(c=c, r=r, nodes=8, iters=12, tol=1e-10,
                  precondition="amg", solver="bicgstab_rr",
                  solve_tol=1e-10, solve_iters=400)
    auto = feast_iterative(A, None, None, m0="auto", **common)
    lam, _, res = auto.filtered()
    assert auto.converged and len(lam) == n_in
    assert auto.X.shape[1] >= n_in + 4  # margin buffered the slice
    np.testing.assert_allclose(np.sort(lam.real),
                               exact[np.abs(exact - c) <= r], rtol=1e-8)
    # minimally-buffered hand start: must NOT beat auto's sweep count
    rng = np.random.default_rng(1)
    X0 = (rng.standard_normal((n, n_in + 1))
          + 1j * rng.standard_normal((n, n_in + 1)))
    hand = feast_iterative(A, None, X0, **common)
    assert auto.n_sweeps <= hand.n_sweeps

    # generalized: exact count recovered through the B-weighted trace
    B = sp.diags([np.full(n, 4 / 6), np.full(n - 1, 1 / 6),
                  np.full(n - 1, 1 / 6)], [0, 1, -1],
                 format="csr").astype(np.complex128)
    m = (2 + np.cos(k * np.pi / (n + 1))) / 3
    ge = np.sort(exact / m)
    cg = complex((ge[0] + ge[3]) / 2)
    rg = float((ge[3] - ge[0]) * 0.7)
    outg = feast_iterative(A, B, None, c=cg, r=rg, nodes=8, iters=12,
                           tol=1e-10, precondition="amg",
                           solve_tol=1e-10, solve_iters=300, m0="auto")
    lamg, _, _ = outg.filtered()
    assert outg.converged
    assert len(lamg) == int(np.sum(np.abs(ge - cg) <= rg))


def test_feast_iterative_x0_none_requires_m0():
    import pytest
    import scipy.sparse as sp
    import numpy as np

    from feast_tpu.solvers.ifeast import feast_iterative

    A = sp.eye(50, format="csr").astype(complex)
    with pytest.raises(ValueError, match="m0"):
        feast_iterative(A, None, None, c=1.0 + 0j, r=0.5)
