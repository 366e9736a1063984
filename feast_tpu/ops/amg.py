"""Smoothed-aggregation AMG preconditioner for shifted sparse solves.

This is the framework's replacement for the reference's sparse direct path
(SuiteSparse UMFPACK, engaged automatically for SparseMatrixCSC inputs —
/root/reference/test/generalized_feast.jl:7-24, UMFPACK controls at
/root/reference/test/gun2.jl:4-6).  A sparse LU is the wrong primitive on
TPU (sequential, irregular); the TPU-native path is **preconditioned
batched Krylov** (ops/krylov.py) — and plain Jacobi preconditioning stalls
on the hard FEAST regime (slice near the spectrum edge: kappa(A - zB) can
exceed 1e8 for a 100k-dof Laplacian's lowest slice).  The fix is a real
multilevel preconditioner.

Key structural insight that makes this TPU-friendly: the AMG hierarchy is
**shift-independent**.  Galerkin-coarsen A and B separately once on host
(P^H A P, P^H B P per level); then for every quadrature node z the level
operator is S_l(z) = A_l - z B_l — an ELEMENTWISE combination on a shared
(union) sparsity pattern, done on device in O(nnz).  The per-node coarsest
matrix is dense and tiny, so its LU batches over the contour-node axis like
every other dense factorization in the framework (ops/lu.py vmap).

  * setup (host, numpy/scipy, runs once): strength graph -> greedy
    aggregation (Vanek-style) -> tentative P (piecewise constant,
    column-normalized) -> optional Jacobi smoothing P=(I-w D^-1 A)P_t ->
    Galerkin products; all levels stored on the UNION pattern of (A_l, B_l)
    so the shift never changes sparsity;
  * apply (device, jit/vmap-safe): V-cycle with damped-Jacobi smoothing,
    CSR SpMM restriction/prolongation (gather+segment_sum like
    ops/sparse.CSR.matvec), dense guarded-pivot LU on the coarsest level.

Used through `shifted_preconditioner(amg, z)` -> a callable M suitable for
the `M=` hook of every solver in ops/krylov.py, and wired into
`feast_iterative(..., precondition="amg")`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cx
from ..cx import CX


class AMGLevel(NamedTuple):
    """One hierarchy level.  All arrays are device-resident; static shapes
    carry the level sizes.

    A_op/B_op share one union sparsity STRUCTURE (identical CSR
    indices/rows, or identical DIA offsets) so S_l(z) = A_l - z B_l is an
    elementwise combination of their data.  Banded levels are stored DIA
    (shifted-slice SpMM: no (nnz, m) gathered temp, runs at streaming
    bandwidth — decisive at the 1M-dof scale where the gather temps alone
    approach the HBM size); irregular levels stay CSR."""

    A_op: object         # sparse.CSR or sparse.DIA, union pattern
    B_op: object         # same class/structure as A_op
    dA: CX               # (n,) diagonal of A_l
    dB: CX               # (n,) diagonal of B_l
    P: object            # prolongation (n, nc) operator
    R: object            # restriction  (nc, n) = P^H


class AMG(NamedTuple):
    levels: Tuple[AMGLevel, ...]
    Ac: CX  # coarsest-level dense A
    Bc: CX  # coarsest-level dense B


def _shifted_op(A_op, B_op, z: CX):
    """S = A - z*B on the shared structure: same class, combined data."""
    from .sparse import BELL, CSR, DIA

    def comb(a, b):
        return CX(a.re - (z.re * b.re - z.im * b.im),
                  a.im - (z.re * b.im + z.im * b.re))

    d = comb(A_op.data, B_op.data)
    if isinstance(A_op, DIA):
        return DIA(d, A_op.offsets, A_op.shape)
    if isinstance(A_op, BELL):
        spill = None
        if A_op.spill is not None:  # kcap overflow CSR shares one pattern
            spill = CSR(comb(A_op.spill.data, B_op.spill.data),
                        A_op.spill.indices, A_op.spill.row_ids,
                        A_op.spill.shape)
        return BELL(d, A_op.colb, A_op.shape, spill)
    return CSR(d, A_op.indices, A_op.row_ids, A_op.shape)


# ---------------------------------------------------------------------------
# host-side setup
# ---------------------------------------------------------------------------

def _aggregate(A, theta: float) -> Tuple[np.ndarray, int]:
    """Vanek-style greedy aggregation on the strength graph of A.

    strength: |a_ij| >= theta * sqrt(|a_ii| |a_jj|)  (symmetrized).
    Returns (agg_id per node, n_aggregates)."""
    import scipy.sparse as sp

    n = A.shape[0]
    Aa = sp.csr_matrix(abs(A))
    Aa = Aa.maximum(Aa.T)  # symmetrize strength
    d = np.sqrt(np.maximum(Aa.diagonal(), 1e-300))
    # strong connections: strip weak off-diagonals
    C = sp.csr_matrix(Aa, copy=True)
    C.data = (C.data >= theta * d[_csr_rows(C)] * d[C.indices]).astype(
        np.float64)
    C.setdiag(0.0)
    C.eliminate_zeros()
    C = C.tocsr()

    agg = np.full(n, -1, dtype=np.int64)
    n_agg = 0
    indptr, indices = C.indptr, C.indices
    # pass 1: seed aggregates from nodes whose strong neighborhood is free
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        if (agg[nbrs] >= 0).any():
            continue
        agg[i] = n_agg
        agg[nbrs] = n_agg
        n_agg += 1
    # pass 2: attach remaining nodes to a neighboring aggregate
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        placed = nbrs[agg[nbrs] >= 0]
        if placed.size:
            agg[i] = agg[placed[0]]
    # pass 3: leftover isolated nodes become singletons
    for i in range(n):
        if agg[i] < 0:
            agg[i] = n_agg
            n_agg += 1
    return agg, n_agg


def _csr_rows(A) -> np.ndarray:
    return np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))


def _union_pair(A, B):
    """Re-express sparse A and B on their union pattern (identical
    indices/indptr) so A - z*B is elementwise on device.

    scipy's csr addition prunes exact-zero results, so the union is built
    explicitly via sorted (row, col) keys."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A).sorted_indices()
    B = sp.csr_matrix(B).sorted_indices()
    n, m = A.shape

    def keys(M):
        return _csr_rows(M).astype(np.int64) * m + M.indices.astype(np.int64)

    ka, kb = keys(A), keys(B)
    ku = np.union1d(ka, kb)  # sorted unique keys = union pattern
    adata = np.zeros(ku.size, dtype=np.complex128)
    bdata = np.zeros(ku.size, dtype=np.complex128)
    adata[np.searchsorted(ku, ka)] = A.data
    bdata[np.searchsorted(ku, kb)] = B.data
    rows = (ku // m).astype(np.int64)
    cols = (ku % m).astype(np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)
    Au = sp.csr_matrix((adata, cols, indptr), shape=(n, m))
    Bu = sp.csr_matrix((bdata, cols, indptr), shape=(n, m))
    return Au, Bu


def _to_cx_data(data: np.ndarray, dtype) -> CX:
    data = np.asarray(data, dtype=np.complex128)
    return CX(jnp.asarray(data.real, dtype), jnp.asarray(data.imag, dtype))


def _dia_able(A, dia_fill: float = 0.45) -> bool:
    """Same bandedness test as _pair_ops: few enough distinct diagonals
    that the level operator will take the DIA fast path."""
    coo = A.tocoo()
    offs = np.unique(coo.col.astype(np.int64) - coo.row.astype(np.int64))
    return len(offs) * A.shape[0] * dia_fill <= A.nnz


def build_amg_host(A, B=None, *, theta: float = 0.08,
                   omega: float = 2.0 / 3.0, smooth: bool = True,
                   max_coarse: int = 600, max_levels: int = 20,
                   aggregate: str = "auto", agg_size: int = 3):
    """Host-side (scipy) hierarchy construction shared by the replicated
    (`build_amg`) and row-sharded (`parallel.rowsharded`) finalizers.

    aggregate: "strength" — greedy strength-of-connection aggregation
    (the classic SA choice, any pattern); "structured" — CONTIGUOUS
    fixed-size-`agg_size` aggregates, which make the prolongation a
    stride-banded STRETCH operator (gather-free device transfers, see
    ops/sparse.STRETCH); "auto" — structured on levels whose operator is
    banded enough for DIA (where contiguity in the RCM/row order is the
    strength structure anyway), strength elsewhere.

    Returns (levels, Ac, Bc, strides): levels is a list of (Au, Bu, P, R)
    scipy-CSR tuples — Au/Bu on their union pattern (identical
    indices/indptr) — Ac/Bc the coarsest-level dense pair, and strides a
    per-level list (agg_size for structured levels, None for strength)."""
    import scipy.sparse as sp

    A_l = sp.csr_matrix(A).astype(np.complex128)
    n = A_l.shape[0]
    B_l = (sp.identity(n, dtype=np.complex128, format="csr") if B is None
           else sp.csr_matrix(B).astype(np.complex128))

    levels = []
    strides = []
    for _ in range(max_levels):
        if A_l.shape[0] <= max_coarse:
            break
        n_l = A_l.shape[0]
        structured = (aggregate == "structured"
                      or (aggregate == "auto" and _dia_able(A_l)))
        if structured:
            agg = np.arange(n_l) // agg_size
            n_agg = -(-n_l // agg_size)
        else:
            agg, n_agg = _aggregate(A_l, theta)
        if n_agg >= n_l:  # aggregation stalled: stop coarsening
            break
        strides.append(agg_size if structured else None)
        # tentative prolongation: piecewise constant, unit columns
        sizes = np.bincount(agg, minlength=n_agg).astype(np.float64)
        vals = 1.0 / np.sqrt(sizes[agg])
        P = sp.csr_matrix((vals, (np.arange(A_l.shape[0]), agg)),
                          shape=(A_l.shape[0], n_agg)).astype(np.complex128)
        if smooth:
            # P = (I - w D^-1 A) P_tent — one damped-Jacobi smoothing step
            # turns piecewise constants into overlapping smooth basis
            # functions (the "SA" in SA-AMG)
            dg = A_l.diagonal()
            dg = np.where(np.abs(dg) > 0, dg, 1.0)
            Dinv = sp.diags(1.0 / dg)
            P = (P - omega * (Dinv @ (A_l @ P))).tocsr()
        R = P.conj().T.tocsr()
        Au, Bu = _union_pair(A_l, B_l)
        levels.append((Au, Bu, P, R))
        A_l = (R @ A_l @ P).tocsr()
        B_l = (R @ B_l @ P).tocsr()

    Ac = np.asarray(A_l.todense(), dtype=np.complex128)
    Bc = np.asarray(B_l.todense(), dtype=np.complex128)
    return levels, Ac, Bc, strides


def build_amg(A, B=None, *, theta: float = 0.08, omega: float = 2.0 / 3.0,
              smooth: bool = True, max_coarse: int = 600,
              max_levels: int = 20, dtype=None,
              aggregate: str = "auto", agg_size: int = 3) -> AMG:
    """Build the shift-independent hierarchy from scipy-sparse (or dense)
    A and optional B (defaults to identity).  Host-side; returns device
    arrays ready for `shifted_preconditioner`."""
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
    host_levels, Ac, Bc, strides = build_amg_host(
        A, B, theta=theta, omega=omega, smooth=smooth,
        max_coarse=max_coarse, max_levels=max_levels,
        aggregate=aggregate, agg_size=agg_size)
    levels = [_make_level(Au, Bu, P, R, dtype, stride=st)
              for (Au, Bu, P, R), st in zip(host_levels, strides)]
    return AMG(tuple(levels), cx.from_numpy(Ac, dtype),
               cx.from_numpy(Bc, dtype))


def _pair_ops(Au, Bu, dtype, dia_fill: float = 0.45):
    """Build the (A, B) union-pattern operator pair — DIA when the union
    pattern is banded densely enough, BELL for unstructured patterns (block
    size from sparse.bell_pick_bs's measured cost model), else CSR.  Both
    must share one structure so S(z) combines their data arrays
    elementwise."""
    from .sparse import BELL, CSR, DIA, bell_pick_bs

    coo = Au.tocoo()  # Au/Bu share the stored pattern (union construction)
    offs = np.unique(coo.col.astype(np.int64) - coo.row.astype(np.int64))
    if len(offs) * Au.shape[0] * dia_fill <= Au.nnz:
        A_op = DIA.from_scipy(Au, dtype)
        B_op = DIA.from_scipy(Bu, dtype)
        if A_op.offsets == B_op.offsets:
            return A_op, B_op
        # scipy pruned a diagonal from one of them: rebuild on the union
        offs = tuple(sorted(set(A_op.offsets) | set(B_op.offsets)))

        def on(off_union, op):
            n = op.data.re.shape[1]
            re = np.zeros((len(off_union), n), dtype=op.data.re.dtype)
            im = np.zeros_like(re)
            for k, off in enumerate(op.offsets):
                j = off_union.index(off)
                re[j] = np.asarray(op.data.re[k])
                im[j] = np.asarray(op.data.im[k])
            return DIA(CX(jnp.asarray(re), jnp.asarray(im)), off_union,
                       op.shape)

        return on(offs, A_op), on(offs, B_op)
    # the level stores BOTH A and B on the shared pattern, so halve the
    # stored-bytes cap the picker models for one operator (ADVICE r3)
    bs = bell_pick_bs(Au, dtype, max_bytes=0.5e9)
    if bs is not None:
        return BELL.pair_from_scipy(Au, Bu, bs, dtype)
    return CSR.from_scipy(Au, dtype), CSR.from_scipy(Bu, dtype)


def _csr_op(M, dtype):
    """Single-operator builder for P/R: BELL when the cost model prefers it
    (the aggregation map inherits A's locality after reordering), else
    CSR."""
    from .sparse import BELL, CSR, bell_pick_bs

    bs = bell_pick_bs(M, dtype)
    if bs is not None:
        return BELL.from_scipy(M, bs, dtype)
    return CSR.from_scipy(M, dtype)


def _make_level(Au, Bu, P, R, dtype, stride=None) -> AMGLevel:
    from .sparse import STRETCH, STRETCHT

    dA = np.asarray(Au.diagonal(), dtype=np.complex128)
    dB = np.asarray(Bu.diagonal(), dtype=np.complex128)
    A_op, B_op = _pair_ops(Au, Bu, dtype)
    P_op = R_op = None
    if stride is not None:
        # structured aggregation: P's columns sit at i//stride + d — the
        # stride-banded STRETCH form with gather-free transfers (measured
        # r5: the 1M level-0 P fit NO BELL byte cap and fell to CSR,
        # gather-binding the whole V-cycle — vcycle_profile_1000000.json)
        P_op = STRETCH.from_scipy(P, stride, dtype)
        if P_op is not None:
            R_op = STRETCHT(P_op)
    if P_op is None:
        # strength aggregation: column structure tracks the aggregate map
        # (not constant-offset), so BELL/CSR by the cost model
        P_op = _csr_op(P, dtype)
        R_op = _csr_op(R, dtype)
    return AMGLevel(
        A_op=A_op,
        B_op=B_op,
        dA=_to_cx_data(dA, dtype),
        dB=_to_cx_data(dB, dtype),
        P=P_op,
        R=R_op,
    )


# ---------------------------------------------------------------------------
# device-side apply
# ---------------------------------------------------------------------------

def hierarchy_nnz(amg: AMG):
    """(stored S-entries, stored P-entries) per level — work accounting for
    nnz/s metrics.  DIA levels count stored diagonal entries."""
    return ([int(L.A_op.nnz) for L in amg.levels],
            [int(L.P.nnz) for L in amg.levels])


def _cast_op(op, dtype):
    """Cast an operator's data to `dtype` (structure unchanged)."""
    from .sparse import BELL, CSR, DIA, STRETCH, STRETCHT

    if isinstance(op, STRETCHT):
        return STRETCHT(_cast_op(op.P, dtype))
    d = CX(op.data.re.astype(dtype), op.data.im.astype(dtype))
    if isinstance(op, DIA):
        return DIA(d, op.offsets, op.shape)
    if isinstance(op, BELL):
        spill = None if op.spill is None else _cast_op(op.spill, dtype)
        return BELL(d, op.colb, op.shape, spill)
    if isinstance(op, STRETCH):
        return STRETCH(d, op.offsets, op.stride, op.shape)
    return CSR(d, op.indices, op.row_ids, op.shape)


def shifted_preconditioner(amg: AMG, z: CX, *, nu: int = 2,
                           omega: float = 2.0 / 3.0, cycles: int = 1,
                           dtype=None):
    """Return M: X -> approx (A - z B)^{-1} X (`cycles` V-cycles).

    Everything here is jit- and vmap-safe: under `vmap` over the contour
    node axis the per-z shifted data and the coarse LU batch naturally.
    The shifted level operators S_l = A_l - z B_l and Jacobi diagonals are
    precomputed ONCE per z; each V-cycle application is pure SpMM + axpy.

    dtype: run the whole V-cycle in this REAL dtype (e.g. jnp.float32
    under x64).  A preconditioner's accuracy never bounds the outer
    Krylov's final residual — it only shapes the iteration count — and on
    TPU f64 is emulated (2-16x the cost of native f32), so an f32 V-cycle
    halves the bandwidth of the heaviest part of the sparse solve while
    the outer f64 recurrence still converges to 1e-10+.
    """
    from . import lu as lumod

    hier_dt = amg.Ac.re.dtype
    if dtype is not None and dtype != hier_dt:
        amg = AMG(
            tuple(AMGLevel(_cast_op(L.A_op, dtype), _cast_op(L.B_op, dtype),
                           L.dA.astype(dtype), L.dB.astype(dtype),
                           _cast_op(L.P, dtype), _cast_op(L.R, dtype))
                  for L in amg.levels),
            amg.Ac.astype(dtype), amg.Bc.astype(dtype))
        hier_dt = dtype
    # The V-cycle ALWAYS runs in the hierarchy's stored dtype: cast X at
    # the boundary, not inside (an f64 X flowing into f32 level stores
    # silently promotes every SpMM back to emulated f64 — the hierarchy is
    # now BUILT in the apply dtype, so this wrapper is the only cast site).
    z = CX(z.re.astype(hier_dt), z.im.astype(hier_dt))

    def shift_data(a: CX, b: CX) -> CX:
        return CX(a.re - (z.re * b.re - z.im * b.im),
                  a.im - (z.re * b.im + z.im * b.re))

    S = [_shifted_op(L.A_op, L.B_op, z) for L in amg.levels]
    dinv = []
    for L in amg.levels:
        d = shift_data(L.dA, L.dB)
        # guard exactly-zero diagonals (possible off the union diagonal)
        mag = cx.abs2(d)
        eps = jnp.finfo(d.re.dtype).eps
        scale = jnp.maximum(jnp.sqrt(jnp.max(mag)), 1.0)
        d = cx.where(mag > 0, d, CX(jnp.full_like(d.re, eps * scale),
                                    jnp.zeros_like(d.im)))
        dinv.append(cx.creciprocal(d))
    Sc = CX(amg.Ac.re - (z.re * amg.Bc.re - z.im * amg.Bc.im),
            amg.Ac.im - (z.re * amg.Bc.im + z.im * amg.Bc.re))
    LUc, permc = lumod.lu_factor(Sc)

    def smooth(l: int, x: CX, r: CX, steps: int) -> CX:
        for _ in range(steps):
            resid = r - S[l].matvec(x)
            corr = CX(resid.re * dinv[l].re[:, None]
                      - resid.im * dinv[l].im[:, None],
                      resid.re * dinv[l].im[:, None]
                      + resid.im * dinv[l].re[:, None])
            x = x + omega * corr
        return x

    def vcycle(l: int, r: CX) -> CX:
        if l == len(amg.levels):
            return lumod.lu_solve(LUc, permc, r)
        L = amg.levels[l]
        x = smooth(l, cx.zeros(r.shape, r.dtype), r, nu)
        rc = L.R.matvec(r - S[l].matvec(x))
        xc = vcycle(l + 1, rc)
        x = x + L.P.matvec(xc)
        return smooth(l, x, r, nu)

    def M_inner(X: CX) -> CX:
        out = vcycle(0, X)
        for _ in range(cycles - 1):
            resid = X - S[0].matvec(out)
            out = out + vcycle(0, resid)
        return out

    if not amg.levels:  # degenerate: problem already <= max_coarse
        M_inner = lambda X: lumod.lu_solve(LUc, permc, X)  # noqa: E731

    def M(X: CX) -> CX:
        if X.re.dtype == hier_dt:
            return M_inner(X)
        out = M_inner(CX(X.re.astype(hier_dt), X.im.astype(hier_dt)))
        return CX(out.re.astype(X.re.dtype), out.im.astype(X.im.dtype))

    return M
