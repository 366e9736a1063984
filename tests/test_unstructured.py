"""Unstructured-sparsity SpMM path: BELL operator, RCM reordering, and the
end-to-end feast_iterative drive on matrices with no exploitable band
structure (the reference handles these through UMFPACK's internal
reordering + sparse LU, test/generalized_feast.jl:7-24; here they ride
reorder -> DIA/BELL + AMG-preconditioned Krylov)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from feast_tpu import cx, problems
from feast_tpu.ops import reorder as rd
from feast_tpu.ops import sparse as spmod
from feast_tpu.solvers.ifeast import feast_iterative


def _rand_sparse(n, m, density, seed):
    rng = np.random.default_rng(seed)
    A = sp.random(n, m, density=density, random_state=seed,
                  dtype=np.float64)
    A = A + 1j * sp.random(n, m, density=density, random_state=seed + 1)
    return A.tocsr()


@pytest.mark.parametrize("bs", [4, 16, 33])
def test_bell_matvec_matches_dense(bs):
    n, m = 237, 190  # non-divisible by bs: exercises both paddings
    A = _rand_sparse(n, m, 0.03, 1)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((m, 7)) + 1j * rng.standard_normal((m, 7))
    Ab = spmod.BELL.from_scipy(A, bs)
    Y = cx.to_numpy(Ab.matvec(cx.from_numpy(X)))
    np.testing.assert_allclose(Y, A @ X, atol=1e-12)
    np.testing.assert_allclose(cx.to_numpy(Ab.todense()), A.toarray(),
                               atol=0)


def test_bell_diagonal_and_pair_structure():
    n = 200
    A = _rand_sparse(n, n, 0.05, 3)
    A.setdiag(np.arange(1.0, n + 1.0))
    A = A.tocsr()
    Ab = spmod.BELL.from_scipy(A, 16)
    np.testing.assert_allclose(cx.to_numpy(Ab.diagonal()), A.diagonal())
    B = A.copy()
    B.data = np.random.default_rng(4).standard_normal(B.nnz) + 0j
    A1, B1 = spmod.BELL.pair_from_scipy(A, B, 8)
    assert A1.colb is B1.colb  # one shared structure (AMG union invariant)
    np.testing.assert_allclose(cx.to_numpy(B1.todense()), B.toarray(),
                               atol=0)


def test_as_operator_prefers_bell_for_unstructured():
    K, _, _ = problems.fem2d_unstructured(800, seed=2)
    perm = rd.rcm_permutation(K)
    Kp = K[perm][:, perm].tocsr()
    op = spmod.as_operator(Kp)
    assert isinstance(op, spmod.BELL), type(op)
    # matvec correctness through the auto-selected operator
    rng = np.random.default_rng(0)
    X = rng.standard_normal((K.shape[0], 5)) + 0j
    np.testing.assert_allclose(cx.to_numpy(op.matvec(cx.from_numpy(X))),
                               Kp @ X, atol=1e-11)


def test_bell_pick_bs_cost_model():
    # An RCM-clustered FEM pattern must pick a LARGE block size (the
    # measured hierarchy: bs=32/64 beat bs=8 end-to-end, bell_tune.json) —
    # the r3 regression was a fixed bs=16 fill cutoff dropping this very
    # matrix class to the 200x-off-roofline CSR path.
    K, _, _ = problems.fem2d_unstructured(2000, seed=7)
    perm = rd.rcm_permutation(K)
    Kp = K[perm][:, perm].tocsr()
    bs = spmod.bell_pick_bs(Kp)
    assert bs is not None and bs >= 32, bs
    # the byte cap is respected: a tiny cap forces a smaller block or CSR
    small = spmod.bell_pick_bs(Kp, max_bytes=spmod.bell_fill(Kp, 8)
                               * Kp.nnz * 16 + 1)
    assert small in (None, 8), small
    # random point sparsity (every nnz its own block): cost model must NOT
    # inflate blocks — CSR or the smallest block size only
    R = _rand_sparse(4000, 4000, 2e-4, 11)
    assert spmod.bell_pick_bs(R) in (None, 8)


def test_plan_reorder_recovers_band():
    n = 3000
    lap = problems.laplacian_1d(n, sparse=True)
    p = np.random.default_rng(5).permutation(n)
    lap_p = lap[p][:, p].tocsr()
    perm, info = rd.plan_reorder(lap_p)
    assert perm is not None
    assert info["bandwidth_after"] <= 2
    assert isinstance(spmod.as_operator(lap_p[perm][:, perm].tocsr()),
                      spmod.DIA)
    # an already-banded matrix is left alone
    perm2, _ = rd.plan_reorder(lap)
    assert perm2 is None


@pytest.mark.slow
def test_feast_iterative_reorder_permuted_laplacian():
    """The VERDICT r2 adversarial one-liner: a randomly permuted banded
    matrix must converge through reorder='auto' and return eigenvectors in
    the CALLER's ordering."""
    n = 2000
    lap = problems.laplacian_1d(n, sparse=True)
    exact = 2 - 2 * np.cos(np.arange(1, 8) * np.pi / (n + 1))
    p = np.random.default_rng(6).permutation(n)
    P = sp.identity(n, format="csr", dtype=np.complex128)[p]
    lap_p = (P @ lap @ P.T).tocsr()
    c = (exact[0] + exact[4]) / 2
    r = (exact[4] - exact[0]) * 0.75
    rng = np.random.default_rng(7)
    X0 = rng.standard_normal((n, 8)) + 1j * rng.standard_normal((n, 8))
    out = feast_iterative(lap_p, None, X0, c=complex(c), r=float(r),
                          nodes=8, iters=8, tol=1e-10, precondition="amg",
                          solve_tol=1e-9, solve_iters=80)
    assert out.converged
    lam, X, res = out.filtered()
    assert len(lam) == 5
    np.testing.assert_allclose(np.sort(lam.real), exact[:5], rtol=1e-8)
    assert res.max() < 1e-10
    # residual against the PERMUTED operator as the caller supplied it —
    # proves X came back in the input ordering
    Rv = lap_p @ X - X * lam[None, :]
    assert np.linalg.norm(Rv, axis=0).max() < 1e-9


@pytest.mark.slow
def test_feast_iterative_unstructured_fem_slice():
    """End-to-end: lowest slice of a genuinely unstructured 2-D FEM
    generalized pencil (Delaunay P1), auto reorder + AMG + BELL levels."""
    K, M, _ = problems.fem2d_unstructured(3000, seed=1)
    n = K.shape[0]
    import scipy.sparse.linalg as spl

    exact = np.sort(spl.eigsh(K.real.tocsc(), k=10, M=M.real.tocsc(),
                              sigma=0, which="LM",
                              return_eigenvectors=False))
    c = (exact[0] + exact[4]) / 2
    r = (exact[4] - exact[0]) * 0.6 + (exact[5] - exact[4]) * 0.2
    inside_exact = exact[np.abs(exact - c) <= r]  # degeneracies can pull
    # a 6th value in: assert against the true inside count, not 5
    rng = np.random.default_rng(8)
    X0 = rng.standard_normal((n, 10)) + 1j * rng.standard_normal((n, 10))
    out = feast_iterative(K, M, X0, c=complex(c), r=float(r), nodes=8,
                          iters=10, tol=1e-9, precondition="amg",
                          solve_tol=1e-9, solve_iters=150)
    assert out.converged, (out.n_iter, np.asarray(out.res))
    lam, X, res = out.filtered()
    assert len(lam) == len(inside_exact)
    np.testing.assert_allclose(np.sort(lam.real), inside_exact, rtol=1e-7)
    assert res.max() < 1e-9
    # vectors in caller ordering: generalized residual against raw K, M
    Rv = K @ X - (M @ X) * lam[None, :]
    assert np.linalg.norm(Rv, axis=0).max() < 1e-8


@pytest.mark.slow
def test_feast_iterative_interior_fem_slice():
    """Mid-spectrum (strongly indefinite A - zB) slice of the unstructured
    FEM pencil — the regime where the reference leans on UMFPACK's
    shift-agnostic sparse LU (test/gun2.jl:4-6) and standard SA-AMG is off
    its comfort zone.  Plain AMG + bicgstab_rr must still converge because
    contour nodes carry Im z != 0 (see ifeast._make_M damp notes)."""
    K, M, _ = problems.fem2d_unstructured(3000, seed=1)
    n = K.shape[0]
    import scipy.sparse.linalg as spl

    lmax = float(spl.eigsh(K.real.tocsc(), k=1, M=M.real.tocsc(),
                           which="LA", return_eigenvectors=False)[0])
    sigma = 0.45 * lmax
    near = np.sort(spl.eigsh(K.real.tocsc(), k=10, M=M.real.tocsc(),
                             sigma=sigma, which="LM",
                             return_eigenvectors=False))
    sel = near[2:7]
    c = (sel[0] + sel[-1]) / 2
    gap = min(sel[0] - near[1], near[7] - sel[-1])
    r = (sel[-1] - sel[0]) / 2 + 0.4 * gap
    inside_exact = near[np.abs(near - c) <= r]
    rng = np.random.default_rng(9)
    X0 = rng.standard_normal((n, 10)) + 1j * rng.standard_normal((n, 10))
    out = feast_iterative(K, M, X0, c=complex(c), r=float(r), nodes=8,
                          iters=12, tol=1e-9, precondition="amg",
                          solver="bicgstab_rr", solve_tol=1e-9,
                          solve_iters=300, spurious=1e-3)
    assert out.converged, (out.n_iter, np.asarray(out.res))
    lam, X, res = out.filtered()
    assert len(lam) == len(inside_exact), (np.sort(lam.real), inside_exact)
    np.testing.assert_allclose(np.sort(lam.real), inside_exact, rtol=1e-7)
    Rv = K @ X - (M @ X) * lam[None, :]
    assert np.linalg.norm(Rv, axis=0).max() < 1e-7 * np.abs(lam).max()


def test_bell_plan_matches_structure():
    """ADVICE r4: bell_plan must be derived from BELL._structure itself —
    the planned slot count (16-row nbr padding included) and spill nnz
    must match the structure the data arrays are actually built on."""
    import scipy.sparse as sp

    from feast_tpu.ops import sparse as spmod

    rng = np.random.default_rng(11)
    n, bs = 1000, 8
    A = sp.random(n, n, density=0.01, random_state=3, format="csr")
    A = (A + A.T + 10 * sp.eye(n)).tocsr()
    kcap, slots, spill_nnz, kfull = spmod.bell_plan(A, bs)
    b = spmod.BELL.from_scipy(A, bs=bs, kcap="auto")
    nbr_padded = b.colb.shape[0]
    assert nbr_padded % 16 == 0
    assert slots == nbr_padded * b.kmax
    assert kcap == b.kmax
    actual_spill = 0 if b.spill is None else b.spill.data.re.shape[0]
    assert spill_nnz == actual_spill
    # the modeled HBM bytes must cover the actual stored pair
    import jax.numpy as jnp
    modeled = spmod.bell_hbm_bytes(A, bs, jnp.float64)
    actual_pair = b.data.re.size * 2 * 8  # re+im f64, pre-tile-padding
    assert modeled >= actual_pair
    # tiny matrices (coarse AMG levels) were the ~5x underestimate case
    As = sp.csr_matrix(sp.eye(24) + sp.random(24, 24, density=0.1,
                                              random_state=1))
    _, slots_s, _, _ = spmod.bell_plan(As, 8)
    bsmall = spmod.BELL.from_scipy(As, bs=8, kcap="auto")
    assert slots_s == bsmall.colb.shape[0] * bsmall.kmax
