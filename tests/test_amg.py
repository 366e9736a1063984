"""SA-AMG preconditioner (ops/amg.py): the sparse hard-slice story.

The reference's sparse path is UMFPACK direct LU (engaged automatically for
SparseMatrixCSC, /root/reference/test/generalized_feast.jl:7-24).  The
TPU-native replacement is AMG-preconditioned batched Krylov; these tests pin
the regime where plain Jacobi preconditioning stalls (VERDICT r1 gap #1):
the LOWEST slice of a large Laplacian, kappa(A - zB) >= 1e8.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from feast_tpu import cx
from feast_tpu.ops import amg as amgmod
from feast_tpu.ops import krylov
from feast_tpu.ops import sparse as spmod
from feast_tpu.solvers.ifeast import feast_iterative


def lap1d(n):
    return sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                    [0, 1, -1], format="csr").astype(np.complex128)


def test_union_pair_alignment():
    rng = np.random.default_rng(0)
    A = sp.random(50, 50, density=0.1, random_state=1).astype(np.complex128)
    B = sp.random(50, 50, density=0.1, random_state=2).astype(np.complex128)
    Au, Bu = amgmod._union_pair(A, B)
    assert np.array_equal(Au.indices, Bu.indices)
    assert np.array_equal(Au.indptr, Bu.indptr)
    np.testing.assert_array_equal(Au.toarray(), A.toarray())
    np.testing.assert_array_equal(Bu.toarray(), B.toarray())


def test_banded_levels_use_dia():
    """A banded fine matrix must produce DIA level operators (the
    shifted-slice SpMM path — no gather temps at the 1M-dof scale), with
    matching A/B structure; P on a banded level is the gather-free
    STRETCH stride-band (structured aggregation, r5 — the 1M level-0 CSR
    P was 97% of the V-cycle wall; BELL/CSR remain the strength-
    aggregation fallbacks)."""
    n = 3000
    h = amgmod.build_amg(lap1d(n))
    assert len(h.levels) >= 1
    L0 = h.levels[0]
    assert isinstance(L0.A_op, spmod.DIA) and isinstance(L0.B_op, spmod.DIA)
    assert L0.A_op.offsets == L0.B_op.offsets
    assert isinstance(L0.P, spmod.STRETCH)
    assert isinstance(L0.R, spmod.STRETCHT)
    h_str = amgmod.build_amg(lap1d(n), aggregate="strength")
    assert isinstance(h_str.levels[0].P, (spmod.BELL, spmod.CSR))
    # the union structure must reproduce A - z B exactly
    z = cx.CX(jnp.asarray(0.3), jnp.asarray(0.1))
    S = amgmod._shifted_op(L0.A_op, L0.B_op, z)
    X = cx.from_numpy(np.random.default_rng(1).standard_normal((n, 3))
                      + 0j)
    got = cx.to_numpy(S.matvec(X))
    A = lap1d(n).toarray()
    want = (A - complex(0.3, 0.1) * np.eye(n)) @ cx.to_numpy(X)
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.slow
def test_vcycle_contracts():
    """One V-cycle must reduce the residual by a large factor on a
    moderately shifted Laplacian (smoke test of the cycle itself)."""
    n = 5000
    A = lap1d(n)
    h = amgmod.build_amg(A, max_coarse=200)
    z = cx.CX(jnp.asarray(-0.5), jnp.asarray(0.1))  # well-separated shift
    M = amgmod.shifted_preconditioner(h, z)
    rng = np.random.default_rng(3)
    b = cx.from_numpy(rng.standard_normal((n, 3)) + 0j, jnp.float64)
    x = M(b)
    mv = spmod.shifted_matvec(spmod.CSR.from_scipy(A), None, z)
    r = b - mv(x)
    ratio = float(np.max(np.asarray(cx.col_norms(r) / cx.col_norms(b))))
    assert ratio < 0.2, f"V-cycle contraction too weak: {ratio}"


def test_amg_beats_jacobi_on_hard_shift():
    """kappa ~ 1e8 shift near the low spectrum edge: AMG-preconditioned
    BiCGStab converges in a handful of iterations; Jacobi stalls."""
    n = 20_000
    A = lap1d(n)
    lam1 = 2 - 2 * np.cos(np.pi / (n + 1))
    zc = complex(3.5 * lam1 + 3.0 * lam1 * np.exp(1j * np.pi / 8))
    z = cx.CX(jnp.asarray(zc.real), jnp.asarray(zc.imag))
    Ac = spmod.CSR.from_scipy(A)
    mv = spmod.shifted_matvec(Ac, None, z)
    rng = np.random.default_rng(4)
    b = cx.from_numpy(rng.standard_normal((n, 4))
                      + 1j * rng.standard_normal((n, 4)), jnp.float64)
    h = amgmod.build_amg(A)
    sol = jax.jit(lambda hh, bb: krylov.bicgstab(
        mv, bb, tol=1e-10, maxiter=60,
        M=amgmod.shifted_preconditioner(hh, z)))(h, b)
    assert bool(np.asarray(sol.converged).all())
    assert int(sol.iters) <= 30, int(sol.iters)
    solj = jax.jit(lambda bb: krylov.bicgstab(
        mv, bb, tol=1e-10, maxiter=60,
        M=spmod.jacobi_preconditioner(Ac, None, z)))(b)
    assert not bool(np.asarray(solj.converged).all()), \
        "Jacobi unexpectedly converged — tighten the test shift"


def test_amg_f32_vcycle_converges_hard_shift_to_f64():
    """dtype=float32 V-cycle (TPU: native f32 vs emulated f64 — half the
    bandwidth in the heaviest phase) must still drive the OUTER f64
    BiCGStab to 1e-10 on the kappa~1e8 shift: preconditioner precision
    shapes the iteration count, never the final residual."""
    n = 20_000
    A = lap1d(n)
    lam1 = 2 - 2 * np.cos(np.pi / (n + 1))
    zc = complex(3.5 * lam1 + 3.0 * lam1 * np.exp(1j * np.pi / 8))
    z = cx.CX(jnp.asarray(zc.real), jnp.asarray(zc.imag))
    mv = spmod.shifted_matvec(spmod.CSR.from_scipy(A), None, z)
    rng = np.random.default_rng(5)
    b = cx.from_numpy(rng.standard_normal((n, 4))
                      + 1j * rng.standard_normal((n, 4)), jnp.float64)
    h = amgmod.build_amg(A)
    sol = jax.jit(lambda hh, bb: krylov.bicgstab(
        mv, bb, tol=1e-10, maxiter=80,
        M=amgmod.shifted_preconditioner(hh, z, dtype=jnp.float32)))(h, b)
    assert bool(np.asarray(sol.converged).all())
    # true f64 residual through the operator (not the recurrence estimate)
    x = sol.x
    r = b - mv(x)
    rel = np.asarray(cx.col_norms(r) / cx.col_norms(b)).max()
    assert rel < 1e-9, rel


@pytest.mark.slow
def test_feast_iterative_amg_lowest_slice_100k():
    """The VERDICT r1 'done' criterion: feast_iterative converges the
    LOWEST slice of a 100k-dof Laplacian (kappa(A - zB) ~ 4e9) to 1e-10
    with bounded refinement iterations."""
    n = 100_000
    A = lap1d(n)
    exact = 2 - 2 * np.cos(np.arange(1, 8) * np.pi / (n + 1))
    c = (exact[0] + exact[4]) / 2
    r = (exact[4] - exact[0]) * 0.75
    rng = np.random.default_rng(5)
    X0 = rng.standard_normal((n, 8)) + 1j * rng.standard_normal((n, 8))
    out = feast_iterative(A, None, X0, c=complex(c), r=float(r), nodes=8,
                          iters=8, tol=1e-10, precondition="amg",
                          solve_tol=1e-9, solve_iters=80)
    assert out.converged and out.n_iter <= 4, (out.n_iter, out.converged)
    lam, _, res = out.filtered()
    assert len(lam) == 5
    np.testing.assert_allclose(np.sort(lam.real), exact[:5], rtol=1e-6,
                               atol=1e-14)
    assert res.max() < 1e-10


@pytest.mark.slow
def test_feast_iterative_amg_sparse_generalized():
    """Sparse generalized pencil (sparse B != I): 1-D FEM stiffness/mass,
    lowest slice — covers the reference's sparse-B usage
    (generalized_feast.jl:7-24) in the iterative path."""
    n = 50_000
    h = 1.0 / (n + 1)
    K = sp.diags([np.full(n, 2.0 / h), np.full(n - 1, -1.0 / h),
                  np.full(n - 1, -1.0 / h)], [0, 1, -1],
                 format="csr").astype(np.complex128)
    M = sp.diags([np.full(n, 4 * h / 6), np.full(n - 1, h / 6),
                  np.full(n - 1, h / 6)], [0, 1, -1],
                 format="csr").astype(np.complex128)
    exact = (np.arange(1, 8) * np.pi) ** 2  # continuum; FEM error ~ O(h^2)
    c = (exact[0] + exact[4]) / 2
    r = (exact[4] - exact[0]) * 0.75
    rng = np.random.default_rng(6)
    X0 = rng.standard_normal((n, 8)) + 1j * rng.standard_normal((n, 8))
    out = feast_iterative(K, M, X0, c=complex(c), r=float(r), nodes=8,
                          iters=10, tol=1e-10, precondition="amg",
                          solve_tol=1e-9, solve_iters=80)
    assert out.converged, out.n_iter
    lam, _, res = out.filtered()
    assert len(lam) == 5
    np.testing.assert_allclose(np.sort(lam.real), exact[:5], rtol=1e-5)
    assert res.max() < 1e-10
