"""Row-sharded sparse FEAST (parallel/rowsharded.py): 8-device mesh
equivalence with the replicated driver, and the compiled-HLO guarantee that
the operator's nnz arrays are never all-gathered (VERDICT r1 gap #4/#8)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from feast_tpu.parallel.mesh import node_row_mesh
from feast_tpu.parallel import rowsharded as rs
from feast_tpu.solvers.ifeast import feast_iterative


def banded(n, bands=4, diag=None):
    """Banded Hermitian test matrix (nnz ~ (2*bands+1) n).  With a graded
    diagonal it is strongly diagonally dominant — eigenvalues near the diag
    entries and Jacobi-preconditioned solves converge fast."""
    diags = [np.arange(1.0, n + 1.0) if diag is None else diag]
    offs = [0]
    for k in range(1, bands + 1):
        diags += [np.full(n - k, -0.1 / k)] * 2
        offs += [k, -k]
    return sp.diags(diags, offs, format="csr").astype(np.complex128)


def _slice_around(A, lo_idx, hi_idx):
    w = np.sort(np.linalg.eigvalsh(A.toarray()).real)
    c = (w[lo_idx] + w[hi_idx]) / 2
    r = (w[hi_idx] - w[lo_idx]) * 0.7
    want = w[(np.abs(w - c) <= r)]
    return complex(c), float(r), want


def test_partition_csr_roundtrip():
    A = sp.random(37, 37, density=0.15, random_state=0).astype(np.complex128)
    Ab = rs.partition_csr(A, 4)
    # reassemble: local rows + shard offset
    import feast_tpu.cx as cx

    dense = np.zeros((Ab.n_pad, 37), dtype=np.complex128)
    data = cx.to_numpy(Ab.data)
    for s in range(4):
        for d, col, row in zip(data[s], np.asarray(Ab.cols)[s],
                               np.asarray(Ab.rows)[s]):
            dense[s * Ab.rows_loc + row, col] += d
    np.testing.assert_allclose(dense[:37], A.toarray(), atol=0)


@pytest.mark.slow
def test_rowsharded_matches_single_device():
    n, m0, bands = 300, 10, 14
    A = banded(n, bands=bands)
    c, r, want = _slice_around(A, 148, 152)
    rng = np.random.default_rng(1)
    X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))
    mesh = node_row_mesh(4, 2)
    hlo = []
    out = rs.feast_iterative_rows(A, None, X0, mesh=mesh, c=c, r=r,
                                  nodes=8, iters=15, tol=1e-10,
                                  solve_tol=1e-11, solve_iters=400,
                                  spurious=1e-5, hlo_sink=hlo)
    lam, X, res = out.filtered()
    assert out.converged
    good = res < 1e-10          # drop spurious inside-values
    lam, X = lam[good], X[:, good]
    np.testing.assert_allclose(np.sort(lam.real), want, atol=1e-8)
    ref = feast_iterative(A, None, X0, c=c, r=r, nodes=8, iters=15,
                          tol=1e-10, solve_tol=1e-11, solve_iters=400,
                          spurious=1e-5)
    lam2, _, res2 = ref.filtered()
    np.testing.assert_allclose(np.sort(lam.real),
                               np.sort(lam2[res2 < 1e-10].real), atol=1e-9)
    # eigenvector residual check through the ORIGINAL operator
    R = A @ X - X * lam[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-9

    # communication guarantee: every all-gather output is strictly smaller
    # than A's nnz arrays — the operator is never gathered (only the
    # (local_nodes, n_pad, m0) vector blocks move)
    worst = rs.largest_allgather_elems(hlo[0])
    assert worst >= n * m0, "expected at least the vector-block gathers"
    assert worst < A.nnz, (worst, A.nnz)


@pytest.mark.slow
def test_rowsharded_generalized():
    n = 200
    A = banded(n)
    # mass-like B with WEAK off-diagonal coupling: z*B off-diagonals must
    # not destroy the diagonal dominance of A - zB (Jacobi+BiCGStab is the
    # inner solver here; AMG covers the non-dominant regime)
    i = np.arange(n)
    B = sp.diags([1.0 + 0.3 * np.sin(i), np.full(n - 1, 0.01),
                  np.full(n - 1, 0.01)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    import scipy.linalg as sla

    w = np.sort(sla.eigh(A.toarray(), B.toarray(), eigvals_only=True))
    c = complex((w[90] + w[94]) / 2)
    r = float((w[94] - w[90]) * 0.7)
    want = w[(np.abs(w - c) <= r)]
    rng = np.random.default_rng(2)
    X0 = rng.standard_normal((n, 12)) + 1j * rng.standard_normal((n, 12))
    mesh = node_row_mesh(4, 2)
    out = rs.feast_iterative_rows(A, B, X0, mesh=mesh, c=c, r=r, nodes=8,
                                  iters=15, tol=1e-9, solve_tol=1e-11,
                                  solve_iters=500, spurious=1e-4)
    lam, _, res = out.filtered()
    assert out.converged
    np.testing.assert_allclose(np.sort(lam[res < 1e-9].real), want,
                               atol=1e-7)


@pytest.mark.slow
def test_rowsharded_amg_lowest_slice():
    """Row-sharded AMG V-cycle: lowest slice of a 2-D 9-point Laplacian —
    the regime where Jacobi stalls — converges with every hierarchy level's
    SpMM shard-local (largest all-gather = vector blocks, below A's nnz)."""
    g = 32
    n = g * g
    m0 = 4  # keeps 2*n*m0 (a combined re+im vector-block gather) below
    #         even a SINGLE component of A's nnz data (8836 entries)
    K = sp.diags([2.0 * np.ones(g), -np.ones(g - 1), -np.ones(g - 1)],
                 [0, 1, -1])
    I = sp.identity(g)
    # 9-point stencil (corner couplings via the tensor term): nnz ~ 9n, so
    # the n*m0 vector-block gathers stay strictly below A's nnz and the
    # HLO check below is non-vacuous
    A = (sp.kron(K, I) + sp.kron(I, K)
         + 0.25 * sp.kron(K, K)).tocsr().astype(np.complex128)
    lam1 = 2 - 2 * np.cos(np.pi / (g + 1))

    def ev(i, j):
        li = 2 - 2 * np.cos(i * np.pi / (g + 1))
        lj = 2 - 2 * np.cos(j * np.pi / (g + 1))
        return li + lj + 0.25 * li * lj

    want = np.sort([ev(1, 1), ev(1, 2), ev(2, 1)])   # lowest 3 (2 distinct)
    nxt = ev(2, 2)
    c = complex((want[0] + want[-1]) / 2)
    r = float(min((want[-1] - want[0]) * 0.75,
                  (nxt - want[-1]) * 0.8 + (want[-1] - want[0]) / 2))
    rng = np.random.default_rng(3)
    X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))
    mesh = node_row_mesh(4, 2)
    hlo = []
    out = rs.feast_iterative_rows(A, None, X0, mesh=mesh, c=c, r=r,
                                  nodes=8, iters=10, tol=1e-9,
                                  solve_tol=1e-11, solve_iters=150,
                                  precondition="amg",
                                  amg_opts={"max_coarse": 80},
                                  spurious=1e-4, hlo_sink=hlo)
    assert out.converged
    lam, X, res = out.filtered()
    good = res < 1e-9
    np.testing.assert_allclose(np.sort(lam[good].real), want, atol=1e-7)
    R = A @ X[:, good] - X[:, good] * lam[good][None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-8
    # communication guarantee: neither A nor any AMG level is gathered —
    # the largest all-gather is a (combined re+im) vector block of
    # 2*n*m0 elements, strictly below one component of A's nnz data, so
    # any operator gather would trip the bound
    worst = rs.largest_allgather_elems(hlo[0])
    assert worst <= 2 * n * m0, (worst, 2 * n * m0)
    assert 2 * n * m0 < A.nnz, (2 * n * m0, A.nnz)
    assert lam1 > 0  # sanity on the analytic spectrum used above


def test_largest_allgather_parser():
    txt = """
  %ag1 = f64[16,400,8]{2,1,0} all-gather(f64[16,100,8]{2,1,0} %x)
  %ag2 = (f32[32]{0}, f32[32]{0}) all-gather(f32[8]{0} %a, f32[8]{0} %b)
"""
    assert rs.largest_allgather_elems(txt) == 16 * 400 * 8
    with pytest.raises(AssertionError):
        rs.assert_no_large_allgather(txt, 1000)


def test_rowsharded_bicgstab_rr_solver():
    # same slice as test_rowsharded_matches_single_device, with the
    # residual-replacement inner solver (TPU emulated-f64 accuracy fix)
    n, m0 = 300, 10
    A = banded(n, bands=14)
    c, r, want = _slice_around(A, 148, 152)
    rng = np.random.default_rng(1)
    X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))
    mesh = node_row_mesh(4, 2)
    out = rs.feast_iterative_rows(A, None, X0, mesh=mesh, c=c, r=r,
                                  nodes=8, iters=15, tol=1e-10,
                                  solver="bicgstab_rr",
                                  solve_tol=1e-11, solve_iters=400,
                                  spurious=1e-5)
    lam, X, res = out.filtered()
    assert out.converged
    good = res < 1e-10
    lam, X = lam[good], X[:, good]
    np.testing.assert_allclose(np.sort(lam.real), want, atol=1e-8)
    R = A @ X - X * lam[None, :]
    assert np.linalg.norm(R, axis=0).max() < 1e-9
