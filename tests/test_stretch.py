"""STRETCH stride-banded interpolation operator + structured AMG
aggregation (VERDICT r4 weak #3).

Measured context (real chip, benchmarks/results/vcycle_profile_1000000.json):
at 1M dof the level-0 prolongation fit NO BELL byte cap, fell to CSR, and
its gather-bound P/R round trip was 0.367 s of the 0.370 s V-cycle — 97%.
STRETCH stores P as per-offset weight vectors over the stride-banded
pattern (i, i//s + d) and applies it gather-free (shift + repeat-reshape),
with a scatter-free transpose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from feast_tpu import cx
from feast_tpu.ops import amg as amgmod
from feast_tpu.ops import krylov
from feast_tpu.ops import sparse as spmod
from feast_tpu.ops.sparse import STRETCH, STRETCHT


def _stride_band_P(n, s, rng, depth=(-1, 0, 1)):
    nc = -(-n // s)
    rows, cols, vals = [], [], []
    for i in range(n):
        for d in depth:
            j = i // s + d
            if 0 <= j < nc and rng.random() < 0.8:
                rows.append(i)
                cols.append(j)
                vals.append(rng.standard_normal()
                            + 1j * rng.standard_normal())
    return sp.coo_matrix((vals, (rows, cols)), shape=(n, nc)).tocsr()


@pytest.mark.parametrize("n,s", [(100, 3), (101, 3), (99, 3), (64, 4)])
def test_stretch_matches_scipy(n, s):
    rng = np.random.default_rng(0)
    P = _stride_band_P(n, s, rng)
    Pop = STRETCH.from_scipy(P, s)
    assert Pop is not None
    nc = P.shape[1]
    X = rng.standard_normal((nc, 5)) + 1j * rng.standard_normal((nc, 5))
    Y = rng.standard_normal((n, 5)) + 1j * rng.standard_normal((n, 5))
    np.testing.assert_allclose(cx.to_numpy(Pop.matvec(cx.from_numpy(X))),
                               P @ X, atol=1e-12)
    np.testing.assert_allclose(cx.to_numpy(Pop.rmatvec(cx.from_numpy(Y))),
                               P.conj().T @ Y, atol=1e-12)
    R = STRETCHT(Pop)
    assert R.shape == (nc, n)
    np.testing.assert_allclose(cx.to_numpy(R.matvec(cx.from_numpy(Y))),
                               P.conj().T @ Y, atol=1e-12)
    np.testing.assert_allclose(cx.to_numpy(Pop.todense()), P.toarray(),
                               atol=1e-14)
    # pytree/jit round trip: the operator is a jit ARGUMENT, not a constant
    f = jax.jit(lambda p, x: p.matvec(x))
    np.testing.assert_allclose(cx.to_numpy(f(Pop, cx.from_numpy(X))),
                               P @ X, atol=1e-12)


def test_stretch_rejects_nonconforming_pattern():
    P = sp.random(100, 34, density=0.5, random_state=1).tocsr()
    assert STRETCH.from_scipy(P, 3) is None
    # too many distinct offsets
    Pw = sp.random(100, 34, density=0.08, random_state=2).tocsr()
    assert STRETCH.from_scipy(Pw, 3, max_depth=2) is None


def test_structured_amg_picks_stretch_and_matches_strength():
    """aggregate='auto' uses contiguous aggregation + STRETCH transfers on
    banded levels; the V-cycle quality must match strength aggregation
    (same preconditioned Krylov iteration count +/- 2)."""
    n = 20_000
    A = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    lam1 = 2 - 2 * np.cos(np.pi / (n + 1))
    zc = complex(3.5 * lam1 + 3.0 * lam1 * np.exp(1j * np.pi / 8))
    z = cx.CX(jnp.asarray(zc.real), jnp.asarray(zc.imag))
    Aop = spmod.as_operator(A)
    rng = np.random.default_rng(0)
    b = cx.from_numpy(rng.standard_normal((n, 4))
                      + 1j * rng.standard_normal((n, 4)))
    iters = {}
    for agg in ("strength", "auto"):
        h = amgmod.build_amg(A, aggregate=agg)
        if agg == "auto":
            assert all(type(L.P).__name__ == "STRETCH" for L in h.levels)
            assert all(type(L.R).__name__ == "STRETCHT" for L in h.levels)
        sol = krylov.bicgstab(spmod.shifted_matvec(Aop, None, z), b,
                              tol=1e-10, maxiter=100,
                              M=amgmod.shifted_preconditioner(h, z))
        assert float(np.asarray(sol.resnorm).max()) < 1e-9
        iters[agg] = int(sol.iters)
    assert abs(iters["auto"] - iters["strength"]) <= 2, iters


def test_structured_amg_2d_pencil_converges():
    """The 2-D tensor pencil (the sparse1m problem): structured aggregation
    must keep coarse levels DIA-able and converge the generalized shifted
    solve."""
    N = 60
    T1 = sp.diags([np.full(N, 2.0), -np.ones(N - 1), -np.ones(N - 1)],
                  [0, 1, -1], format="csr")
    M1 = sp.diags([np.full(N, 4 / 6), np.full(N - 1, 1 / 6),
                   np.full(N - 1, 1 / 6)], [0, 1, -1], format="csr")
    I = sp.identity(N, format="csr")
    K = (sp.kron(T1, I) + sp.kron(I, T1)).tocsr().astype(np.complex128)
    B = sp.kron(M1, M1).tocsr().astype(np.complex128)
    k = np.arange(1, N + 1)
    t = 2 - 2 * np.cos(k * np.pi / (N + 1))
    m = (2 + np.cos(k * np.pi / (N + 1))) / 3
    lam = np.sort(((t[:, None] + t[None, :])
                   / (m[:, None] * m[None, :])).ravel())
    zc = complex((lam[0] + lam[4]) / 2, (lam[4] - lam[0]) * 0.3)
    h = amgmod.build_amg(K, B, aggregate="auto")
    assert any(type(L.P).__name__ == "STRETCH" for L in h.levels)
    z = cx.CX(jnp.asarray(zc.real), jnp.asarray(zc.imag))
    Kop, Bop = spmod.as_operator(K), spmod.as_operator(B)
    rng = np.random.default_rng(1)
    b = cx.from_numpy(rng.standard_normal((N * N, 4))
                      + 1j * rng.standard_normal((N * N, 4)))
    sol = krylov.bicgstab(spmod.shifted_matvec(Kop, Bop, z), b,
                          tol=1e-10, maxiter=200,
                          M=amgmod.shifted_preconditioner(h, z))
    assert float(np.asarray(sol.resnorm).max()) < 1e-9


def test_stretch_f32_cast():
    rng = np.random.default_rng(3)
    P = _stride_band_P(300, 3, rng)
    Pop = STRETCH.from_scipy(P, 3)
    R = STRETCHT(Pop)
    P32 = amgmod._cast_op(Pop, jnp.float32)
    R32 = amgmod._cast_op(R, jnp.float32)
    assert P32.data.re.dtype == jnp.float32
    assert R32.P.data.re.dtype == jnp.float32
    X = rng.standard_normal((P.shape[1], 3)) + 0j
    np.testing.assert_allclose(
        cx.to_numpy(P32.matvec(cx.from_numpy(X, jnp.float32))),
        P @ X, rtol=1e-5, atol=1e-5)


def test_feast_iterative_amg_end_to_end_structured():
    """The production driver over the structured-AMG path must still find
    the exact slice (the r2 100k-dof convergence scenario, shrunk)."""
    from feast_tpu.solvers.ifeast import feast_iterative

    n = 5000
    A = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    exact = 2 - 2 * np.cos(np.arange(1, 7) * np.pi / (n + 1))
    c = complex((exact[0] + exact[4]) / 2)
    r = float((exact[4] - exact[0]) * 0.75)
    rng = np.random.default_rng(0)
    X0 = rng.standard_normal((n, 8)) + 1j * rng.standard_normal((n, 8))
    out = feast_iterative(A, None, X0, c=c, r=r, nodes=8, iters=10,
                          tol=1e-10, precondition="amg",
                          solver="bicgstab_rr", solve_tol=1e-10,
                          solve_iters=300)
    lam, _, res = out.filtered()
    assert out.converged and len(lam) == 5
    np.testing.assert_allclose(np.sort(lam.real), exact[:5], rtol=1e-8)
    assert res.max() < 1e-10
