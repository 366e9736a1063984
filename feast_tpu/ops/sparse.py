"""Sparse complex operators (CSR) for the matrix-free solve path.

TPU-native counterpart of the reference's UMFPACK sparse-LU path
(FEASTSolver.jl engages SuiteSparse automatically for SparseMatrixCSC inputs,
e.g. test/generalized_feast.jl:7-24).  A sparse direct factorization is the
wrong primitive for the TPU — the idiomatic path is **iterative shifted
solves on an SpMM kernel** (SURVEY.md N2): CSR gather + segment-sum, which
XLA lowers to efficient scatter/gather; a Pallas BSR kernel can slot in
behind the same interface.

`CSR.matvec` applies A @ X for a block X (n, m): one gather of X rows, one
complex multiply by the nnz data, one segment-sum — O(nnz * m) with
MXU-free bandwidth-bound cost, vmappable and shardable over a row-partition.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cx
from ..cx import CX

_SPMM_BACKEND = "xla"


def set_spmm_backend(name: str):
    """Select the DIA SpMM implementation: "xla" (shifted slices) or
    "pallas" (fused halo-window kernel; TPU f32 only — silently falls back
    to XLA elsewhere).  Mirrors cx.set_gemm_backend."""
    global _SPMM_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown spmm backend {name!r}")
    _SPMM_BACKEND = name


@jax.tree_util.register_pytree_node_class
class CSR:
    """Complex CSR matrix as pair data (static sparsity per jit trace).

    Registered as a pytree with `shape` as STATIC aux data, so a CSR can be
    passed as a jit/vmap ARGUMENT (donated/deduplicated buffers) instead of
    being closed over as an embedded constant — closing over a multi-MB
    operator makes XLA constant-fold whole SpMMs at compile time and bloats
    the executable."""

    def __init__(self, data: CX, indices, row_ids, shape):
        self.data = data          # (nnz,)
        self.indices = indices    # (nnz,) int32 column ids
        self.row_ids = row_ids    # (nnz,) int32 row ids (expanded indptr)
        self.shape = tuple(shape)

    def tree_flatten(self):
        return (self.data, self.indices, self.row_ids), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)

    @classmethod
    def from_scipy(cls, A, dtype=None):
        import scipy.sparse as sp

        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
        A = sp.csr_matrix(A)
        indptr = A.indptr
        row_ids = np.repeat(np.arange(A.shape[0], dtype=np.int32),
                            np.diff(indptr))
        return cls(cx.from_numpy(A.data.astype(np.complex128), dtype),
                   jnp.asarray(A.indices, jnp.int32),
                   jnp.asarray(row_ids, jnp.int32), A.shape)

    @classmethod
    def from_dense(cls, A, dtype=None):
        import scipy.sparse as sp

        return cls.from_scipy(sp.csr_matrix(np.asarray(A)), dtype)

    @property
    def nnz(self):
        return self.data.re.shape[0]

    def matvec(self, X: CX) -> CX:
        """A @ X for X (n_cols_of_A, m)."""
        Xg = CX(X.re[self.indices], X.im[self.indices])     # (nnz, m)
        prod = CX(self.data.re[:, None] * Xg.re - self.data.im[:, None] * Xg.im,
                  self.data.re[:, None] * Xg.im + self.data.im[:, None] * Xg.re)
        n = self.shape[0]
        return CX(jax.ops.segment_sum(prod.re, self.row_ids, num_segments=n),
                  jax.ops.segment_sum(prod.im, self.row_ids, num_segments=n))

    def diagonal(self) -> CX:
        """Diagonal entries (for Jacobi preconditioning); absent -> 0."""
        on_diag = self.row_ids == self.indices
        n = self.shape[0]
        return CX(
            jax.ops.segment_sum(jnp.where(on_diag, self.data.re, 0.0),
                                self.row_ids, num_segments=n),
            jax.ops.segment_sum(jnp.where(on_diag, self.data.im, 0.0),
                                self.row_ids, num_segments=n))

    def todense(self) -> CX:
        n, m = self.shape
        re = jnp.zeros((n, m)).at[self.row_ids, self.indices].add(self.data.re)
        im = jnp.zeros((n, m)).at[self.row_ids, self.indices].add(self.data.im)
        return CX(re, im)


@jax.tree_util.register_pytree_node_class
class DIA:
    """Banded complex matrix in diagonal (DIA) storage — the TPU-idiomatic
    SpMM for matrices whose nonzeros live on a few dense diagonals (1-D/2-D
    finite-difference Laplacians, tridiagonal pencils, AMG fine levels of
    such operators).

    The CSR gather + segment_sum SpMM lowers to per-row gathers and a
    scatter-add — irregular memory traffic the TPU executes far below HBM
    bandwidth.  With diagonal storage the same product is a static sum of
    SHIFTED elementwise multiplies:

        y[i] = sum_k  data[k, i] * x[i + offsets[k]]

    which XLA fuses into a handful of contiguous streaming reads of X —
    pure VPU work at memory bandwidth, no gathers, no scatters.

    Layout: `offsets` is a static tuple (part of the pytree aux data, so
    each distinct band structure is its own jit specialization), `data` is
    CX of shape (ndiag, n) with data[k, i] = A[i, i + offsets[k]] and 0
    where the index is out of range (row-indexed, unlike scipy's
    column-indexed dia_matrix)."""

    def __init__(self, data: CX, offsets, shape):
        self.data = data              # (ndiag, n)
        self.offsets = tuple(int(o) for o in offsets)
        self.shape = tuple(shape)

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @classmethod
    def from_scipy(cls, A, dtype=None):
        import scipy.sparse as sp

        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
        Ad = sp.dia_matrix(sp.csr_matrix(A))
        n, m = Ad.shape
        offs = [int(o) for o in Ad.offsets]
        data = np.zeros((len(offs), n), dtype=np.complex128)
        # scipy stores data[k, j] = A[j - off, j] (column-indexed); re-index
        # by row: ours[k, i] = A[i, i + off] = theirs[k, i + off]
        for k, off in enumerate(offs):
            lo, hi = max(0, -off), min(n, m - off)
            data[k, lo:hi] = Ad.data[k, lo + off:hi + off]
        return cls(cx.from_numpy(data, dtype), offs, Ad.shape)

    @classmethod
    def from_csr(cls, A: "CSR"):
        """Host-side conversion (pulls the CSR arrays once)."""
        import scipy.sparse as sp

        data = np.asarray(A.data.re) + 1j * np.asarray(A.data.im)
        M = sp.coo_matrix((data, (np.asarray(A.row_ids),
                                  np.asarray(A.indices))), shape=A.shape)
        return cls.from_scipy(M, dtype=A.data.re.dtype)

    @property
    def nnz(self):
        # stored entries (diagonals are dense in this format)
        return self.data.re.shape[0] * self.data.re.shape[1]

    @property
    def ndiag(self):
        return len(self.offsets)

    def matvec(self, X: CX) -> CX:
        """A @ X for X (n_cols_of_A, m) — static shifted slices, no gather.

        With `set_spmm_backend("pallas")` the fused halo-window kernel
        (ops/pallas_kernels.dia_matvec_pallas) takes over on TPU f32: one
        X window DMA per row block instead of one X pass per diagonal."""
        if _SPMM_BACKEND == "pallas":
            from . import pallas_kernels as pk

            return pk.dia_matvec_pallas(self, X)
        return self._matvec_xla(X)

    def _matvec_xla(self, X: CX) -> CX:
        n = self.shape[0]
        L = max(0, -min(self.offsets))                      # left zero-pad
        R = max(0, n + max(self.offsets) - self.shape[1])   # right zero-pad
        pad = ((L, R), (0, 0))
        Xp = CX(jnp.pad(X.re, pad), jnp.pad(X.im, pad))
        yre = jnp.zeros((n, X.re.shape[1]), X.re.dtype)
        yim = jnp.zeros_like(yre)
        for k, off in enumerate(self.offsets):
            dre = self.data.re[k][:, None]
            dim = self.data.im[k][:, None]
            xr = jax.lax.slice_in_dim(Xp.re, L + off, L + off + n, axis=0)
            xi = jax.lax.slice_in_dim(Xp.im, L + off, L + off + n, axis=0)
            yre = yre + dre * xr - dim * xi
            yim = yim + dre * xi + dim * xr
        return CX(yre, yim)

    def diagonal(self) -> CX:
        n = self.shape[0]
        if 0 in self.offsets:
            k = self.offsets.index(0)
            return CX(self.data.re[k], self.data.im[k])
        return CX(jnp.zeros(n, self.data.re.dtype),
                  jnp.zeros(n, self.data.re.dtype))

    def todense(self) -> CX:
        n, m = self.shape
        re = jnp.zeros((n, m), self.data.re.dtype)
        im = jnp.zeros((n, m), self.data.re.dtype)
        rows = jnp.arange(n)
        for k, off in enumerate(self.offsets):
            cols = rows + off
            ok = (cols >= 0) & (cols < m)
            re = re.at[rows, jnp.clip(cols, 0, m - 1)].add(
                jnp.where(ok, self.data.re[k], 0.0))
            im = im.at[rows, jnp.clip(cols, 0, m - 1)].add(
                jnp.where(ok, self.data.im[k], 0.0))
        return CX(re, im)


@jax.tree_util.register_pytree_node_class
class BELL:
    """Blocked-ELL complex matrix — the unstructured-sparsity SpMM format.

    The TPU executes the CSR gather+segment_sum SpMM ~200x off the HBM
    roofline (measured: random-pattern CSR 4.2 GB/s vs 840 GB/s stream,
    benchmarks/results/spmm_bandwidth.json) because it gathers and
    scatters m-wide single rows — tiny irregular transfers.  BELL fixes
    both pathologies at once:

      * rows are grouped into BLOCK rows of `bs`; each block row stores a
        fixed number `kmax` of dense (bs, bs) blocks (ELL-style padding
        with zero blocks pointing at block-column 0), so the only gather
        is of (bs, m) X block rows — bs*m-element contiguous chunks
        instead of m-element rows;
      * the product is one batched (nbr*kmax) complex GEMM
        y[r] = sum_k data[r, k] @ X[colb[r, k]] via einsum — the k-sum is
        a contraction, so there is NO scatter at all.

    Fill (stored/nnz) is the price: dense bs x bs blocks on a point-sparse
    pattern pad heavily, and padding grows with bs while gather efficiency
    shrinks with it — `bs` is therefore measured, not guessed (see
    benchmarks/bell_tune.py).  Best used AFTER bandwidth-reduction
    reordering (ops.reorder.rcm_permutation), which clusters nnz into few
    blocks per block row.

    This is the TPU-native answer to the reference's "UMFPACK factors any
    SparseMatrixCSC" generality (test/generalized_feast.jl:7-24): the
    iterative solvers see any sparsity pattern at usable bandwidth.

    Layout: data (nbr, bs, kmax*bs) CX with data[r, a, k*bs + b] =
    block(r, k)[a, b]; colb (nbr, kmax) int32 block-column ids; `shape` is
    the LOGICAL shape (pre-padding).  The k and b axes are MERGED into the
    minor dimension on purpose: the TPU tiles the last two dims to (8, 128),
    so the earlier (nbr, kmax, bs, bs) layout paid a 128/bs minor-dim
    padding factor in HBM — measured 4.0x at bs=32 on the 100k unstructured
    FEM pencil, which compile-OOMed the f64 (A, B) pair at 58 GB on a
    16 GB chip (r4 worker forensics).  With kmax*bs minor the padding is
    ceil(kmax*bs/128)*128 / (kmax*bs) ~ 1x, and the matvec contraction is
    one batched (nbr, bs, K) x (nbr, K, m) GEMM, K = kmax*bs."""

    def __init__(self, data: CX, colb, shape, spill: "CSR" = None):
        self.data = data
        self.colb = colb
        self.shape = tuple(shape)
        # Optional CSR holding entries of OVERFLOW blocks beyond the kcap
        # fullest block slots per block row (see from_scipy kcap=).  On
        # P1-FEM patterns the per-block-row slot count has a long tail
        # (kmax ~ 2.2x the mean); capping at ~p90 and spilling <0.5% of
        # the nnz to a tiny CSR cuts the stored fill ~1.8x (measured on
        # the 100k unstructured pencil: bs=8 fill 25.2 -> 13.7 at 0.42%
        # spill).
        self.spill = spill

    def tree_flatten(self):
        return (self.data, self.colb, self.spill), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux, children[2])

    @property
    def bs(self):
        return self.data.re.shape[1]

    @property
    def kmax(self):
        return self.data.re.shape[2] // self.data.re.shape[1]

    @property
    def nnz(self):
        # stored entries (blocks are dense in this format), like DIA.nnz
        d = self.data.re.shape
        return d[0] * d[1] * d[2] + (self.spill.nnz
                                     if self.spill is not None else 0)

    @staticmethod
    def _structure(A, bs, kcap=None):
        """Host-side block structure of a scipy CSR: returns
        (colb (nbr, kmax) int32, blk_of_nnz, r_in_blk, c_in_blk, vals,
        nbr, kmax, keep_nnz, coo) where blk/r/c map each stored nnz to
        (flat block slot, row-in-block, col-in-block) for data filling and
        keep_nnz marks the entries that land in stored blocks (the rest
        spill to CSR).

        kcap: cap the block slots per block row — keep the kcap FULLEST
        blocks of each row, spill the rest.  "auto" picks the kcap that
        minimizes the measured cost model (slot GEMM cost vs CSR spill
        cost).  None stores every block (kmax = max row count)."""
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n, m = A.shape
        coo = A.tocoo()
        nbr = -(-n // bs)
        ncb = -(-m // bs)
        brow = coo.row // bs
        bcol = coo.col // bs
        keys = brow.astype(np.int64) * ncb + bcol
        uk, inv, cnt = np.unique(keys, return_inverse=True,
                                 return_counts=True)
        ub_row = (uk // ncb).astype(np.int64)
        ub_col = (uk % ncb).astype(np.int64)
        counts = np.bincount(ub_row, minlength=nbr)
        kfull = max(int(counts.max()) if counts.size else 1, 1)
        row_start = np.zeros(nbr + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        # rank blocks within each row by descending nnz count (ties by
        # column) so a cap keeps the fullest blocks
        order = np.lexsort((ub_col, -cnt, ub_row))
        rank = np.empty(uk.size, dtype=np.int64)
        rank[order] = np.arange(uk.size) - row_start[ub_row[order]]
        if kcap == "auto":
            # nnz spilled if capped at k = suffix sum of cnt by rank
            nnz_at_rank = np.bincount(rank, weights=cnt, minlength=kfull)
            spill_at = np.concatenate(
                (np.cumsum(nnz_at_rank[::-1])[::-1], [0.0]))
            ks = np.arange(1, kfull + 1)
            cost = (nbr * ks * (_BELL_T0 + _BELL_T1 * bs)
                    + spill_at[1:] * _CSR_T_NNZ)
            kcap = int(ks[np.argmin(cost)])
        if kcap is None or kfull <= kcap:
            kmax, keep = kfull, np.ones(uk.size, dtype=bool)
        else:
            kmax, keep = int(kcap), rank < kcap
        # pad the block-row count to a multiple of 16 (zero blocks) so the
        # sequential row-chunked matvec can split nbr evenly (see matvec)
        nbr = -(-nbr // 16) * 16
        colb = np.zeros((nbr, kmax), dtype=np.int32)
        colb[ub_row[keep], rank[keep]] = ub_col[keep].astype(np.int32)
        blk_of_nnz = ub_row[inv] * kmax + np.minimum(rank[inv], kmax - 1)
        return (colb, blk_of_nnz, (coo.row % bs).astype(np.int64),
                (coo.col % bs).astype(np.int64), coo.data, nbr, kmax,
                keep[inv], coo, kfull)

    @staticmethod
    def _pack(blk, ri, ci, vals, keep, nbr, kmax, bs, dtype):
        data = np.zeros((nbr * kmax, bs, bs), dtype=np.complex128)
        data[blk[keep], ri[keep], ci[keep]] = vals[keep]
        data = (data.reshape(nbr, kmax, bs, bs).transpose(0, 2, 1, 3)
                .reshape(nbr, bs, kmax * bs))
        return cx.from_numpy(data, dtype)

    @staticmethod
    def _spill_csr(coo, vals, keep, shape, dtype):
        if keep.all():
            return None
        sp_rows = coo.row[~keep].astype(np.int32)
        sp_cols = coo.col[~keep].astype(np.int32)
        return CSR(cx.from_numpy(vals[~keep].astype(np.complex128), dtype),
                   jnp.asarray(sp_cols), jnp.asarray(sp_rows), shape)

    @classmethod
    def from_scipy(cls, A, bs: int = 16, dtype=None, kcap="auto"):
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        colb, blk, ri, ci, vals, nbr, kmax, keep, coo, _ = cls._structure(
            A, bs, kcap)
        return cls(cls._pack(blk, ri, ci, vals, keep, nbr, kmax, bs, dtype),
                   jnp.asarray(colb), A.shape,
                   cls._spill_csr(coo, vals, keep, A.shape, dtype))

    @classmethod
    def pair_from_scipy(cls, Au, Bu, bs: int = 16, dtype=None, kcap="auto"):
        """Two matrices on ONE shared structure (for AMG union pairs:
        S(z) = A - zB must combine data elementwise).  Au and Bu must have
        identical sparsity patterns (ops.amg._union_pair guarantees it);
        the block structure (and any kcap spill split) is built once from
        the union, so both spill CSRs share one pattern too."""
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
        import scipy.sparse as sp

        Au = sp.csr_matrix(Au).sorted_indices()
        Bu = sp.csr_matrix(Bu).sorted_indices()
        colb, blk, ri, ci, avals, nbr, kmax, keep, coo, _ = cls._structure(
            Au, bs, kcap)
        colb_j = jnp.asarray(colb)
        out = []
        for vals in (avals, Bu.tocoo().data):
            out.append(cls(
                cls._pack(blk, ri, ci, vals, keep, nbr, kmax, bs, dtype),
                colb_j, Au.shape,
                cls._spill_csr(coo, vals, keep, Au.shape, dtype)))
        return out[0], out[1]

    def matvec(self, X: CX) -> CX:
        """A @ X for X (n_cols_of_A, m): one block-row gather of X + one
        batched block GEMM (contraction over k and the block column — no
        scatter).

        Layout note (measured on the real chip, 2026-08-19): an ISOLATED
        gather of (bs*m)-element rows from a flattened 2-D operand runs
        5-7x faster than the same bytes as (bs, m) slices of a 3-D operand
        (bs=32,m=16: 556 vs 77 GB/s) — but END-TO-END the 3-D form wins
        (19.3 vs 45.3 ms on the 200k FEM at bs=32) because XLA fuses the
        3-D gather into the dot_general while the flatten+reshape breaks
        that fusion and materializes G to HBM.  Hence the 3-D gather here."""
        n, mcols = self.shape
        bs = self.bs
        kmax = self.kmax
        m = X.re.shape[1]
        ncb = -(-mcols // bs)
        pad = ncb * bs - mcols
        Xp = (CX(jnp.pad(X.re, ((0, pad), (0, 0))),
                 jnp.pad(X.im, ((0, pad), (0, 0)))) if pad else X)
        Xb = CX(Xp.re.reshape(ncb, bs, m), Xp.im.reshape(ncb, bs, m))
        nbr = self.colb.shape[0]
        hi = jax.lax.Precision.HIGHEST

        def rows(cb, dre, dim):
            # (nbr_c, kmax, bs, m) gather, then merge (k, b) into one
            # contraction axis K = kmax*bs (a bitcast: the merge does not
            # touch the tiled trailing dims) to match the (.., bs, K) data
            # layout; 3-real-multiply complex GEMM (cx.cmatmul's Karatsuba)
            r = cb.shape[0]
            G = CX(Xb.re[cb].reshape(r, kmax * bs, m),
                   Xb.im[cb].reshape(r, kmax * bs, m))
            p1 = jnp.einsum("rak,rkm->ram", dre, G.re, precision=hi)
            p2 = jnp.einsum("rak,rkm->ram", dim, G.im, precision=hi)
            p3 = jnp.einsum("rak,rkm->ram", dre + dim, G.re + G.im,
                            precision=hi)
            return CX((p1 - p2).reshape(r * bs, m),
                      (p3 - p1 - p2).reshape(r * bs, m))

        # The gathered G temp is padded to 128 lanes in m regardless of the
        # true m; when the while-loop/X64 context keeps XLA from fusing the
        # gather into the dot, that temp goes resident (measured r4: 1.0 GB
        # x2 at 12.8x padding inside the 100k Krylov body).  Bound it by
        # running the block rows in a SEQUENTIAL fori chunk loop (nbr is
        # padded to a multiple of 16 at construction).
        f64 = jnp.dtype(self.data.re.dtype).itemsize == 8
        mp = -(-max(m, 1) // 128) * 128
        gbytes = nbr * kmax * bs * mp * 4 * (2 if f64 else 1)
        chunks = 1
        while chunks < 16 and gbytes / chunks > _BELL_GATHER_BYTES:
            chunks *= 2
        if chunks == 1:
            Y = rows(self.colb, self.data.re, self.data.im)
        else:
            nbr_c = nbr // chunks

            def body(c, Y):
                sl = functools.partial(jax.lax.dynamic_slice_in_dim,
                                       start_index=c * nbr_c,
                                       slice_size=nbr_c, axis=0)
                yc = rows(sl(self.colb), sl(self.data.re), sl(self.data.im))
                up = functools.partial(jax.lax.dynamic_update_slice_in_dim,
                                       start_index=c * nbr_c * bs, axis=0)
                return CX(up(Y.re, update=yc.re), up(Y.im, update=yc.im))

            Y0 = cx.zeros((nbr * bs, m),
                          jnp.result_type(self.data.re.dtype, X.re.dtype))
            Y = jax.lax.fori_loop(0, chunks, body, Y0)
        Y = CX(Y.re[:n], Y.im[:n])
        if self.spill is not None:
            Y = Y + self.spill.matvec(X)
        return Y

    def _blocks4(self):
        """(nbr, kmax, bs, bs) logical-block view of the merged data."""
        bs, kmax = self.bs, self.kmax
        nbr = self.colb.shape[0]
        re = self.data.re.reshape(nbr, bs, kmax, bs).transpose(0, 2, 1, 3)
        im = self.data.im.reshape(nbr, bs, kmax, bs).transpose(0, 2, 1, 3)
        return CX(re, im)

    def diagonal(self) -> CX:
        n = self.shape[0]
        bs = self.bs
        nbr = self.colb.shape[0]
        ii = jnp.arange(bs)
        D4 = self._blocks4()
        dblk = CX(D4.re[:, :, ii, ii], D4.im[:, :, ii, ii])  # (nbr, kmax, bs)
        on_diag = (self.colb == jnp.arange(nbr)[:, None])[..., None]
        d = CX(jnp.sum(jnp.where(on_diag, dblk.re, 0.0), axis=1),
               jnp.sum(jnp.where(on_diag, dblk.im, 0.0), axis=1))
        d = CX(d.re.reshape(-1)[:n], d.im.reshape(-1)[:n])
        if self.spill is not None:
            d = d + self.spill.diagonal()
        return d

    def todense(self) -> CX:
        n, m = self.shape
        bs, nbr, kmax = self.bs, self.colb.shape[0], self.kmax
        ncb = -(-m // bs)
        re = jnp.zeros((nbr, ncb, bs, bs), self.data.re.dtype)
        im = jnp.zeros_like(re)
        r = jnp.repeat(jnp.arange(nbr), kmax)
        c = self.colb.reshape(-1)
        D4 = self._blocks4()
        re = re.at[r, c].add(D4.re.reshape(-1, bs, bs))
        im = im.at[r, c].add(D4.im.reshape(-1, bs, bs))
        re = re.transpose(0, 2, 1, 3).reshape(nbr * bs, ncb * bs)
        im = im.transpose(0, 2, 1, 3).reshape(nbr * bs, ncb * bs)
        D = CX(re[:n, :m], im[:n, :m])
        if self.spill is not None:
            D = D + self.spill.todense()
        return D


@jax.tree_util.register_pytree_node_class
class STRETCH:
    """Stride-banded interpolation operator (n x nc, nc ~ n/s).

    Pattern contract: every entry of row i sits at column i//s + d for d
    in a small static offset set — exactly the sparsity of a smoothed-
    aggregation AMG prolongation whose aggregates are CONTIGUOUS runs of
    fixed size s over a banded (DIA-able) fine operator (structured
    aggregation, ops/amg.py).  Storage is dense per-offset weight vectors
    data[k, i] = P[i, i//s + offsets[k]] — like DIA, the offsets are
    static aux data.

    The matvec is GATHER-FREE: x[i//s + d] is a zero-padded static shift
    of the coarse block followed by repeat(s) (broadcast + reshape), so
    the product is a static sum of contiguous streaming passes at DIA
    speed.  The transpose P^H (AMG restriction) is SCATTER-FREE by the
    reverse reshape-sum (`rmatvec`; `STRETCHT` wraps it as an operator).

    Why it exists (measured r5, vcycle_profile_1000000.json): at 1M dof
    the level-0 prolongation was the only operator whose tile-padded BELL
    store exceeded every byte cap, fell to CSR, and gather-bound the whole
    V-cycle (VERDICT r4 weak #3); the surviving BELL levels carried 13-38x
    slot fill.  The reference never faces this: UMFPACK's sparse LU has no
    grid-transfer operators at all (SURVEY N2).
    """

    def __init__(self, data: CX, offsets, stride, shape):
        self.data = data  # (ndepth, n)
        self.offsets = tuple(int(o) for o in offsets)
        self.stride = int(stride)
        self.shape = tuple(shape)

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.stride, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1], aux[2])

    @property
    def nnz(self):
        return self.data.re.size  # stored entries (DIA convention)

    @classmethod
    def from_scipy(cls, P, stride, dtype=None, max_depth: int = 24):
        """Convert a scipy sparse P, or return None when the pattern does
        not fit the stride-band form (then BELL/CSR apply)."""
        import scipy.sparse as sp

        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
        P = sp.csr_matrix(P)
        P.sum_duplicates()
        coo = P.tocoo()
        n, nc = P.shape
        if stride < 1 or nc != -(-n // stride):
            return None
        d = coo.col.astype(np.int64) - coo.row.astype(np.int64) // stride
        offs = np.unique(d)
        if len(offs) > max_depth:
            return None
        data = np.zeros((len(offs), n), dtype=np.complex128)
        data[np.searchsorted(offs, d), coo.row] = coo.data
        return cls(cx.from_numpy(data, dtype),
                   tuple(int(o) for o in offs), stride, (n, nc))

    @staticmethod
    def _shift(M: CX, nrows: int, d: int) -> CX:
        """out[k] = M[k + d] with zero padding (static slices only)."""
        K = abs(d)
        if d == 0 and M.re.shape[0] == nrows:
            return M
        pad = ((K, K + max(0, nrows - M.re.shape[0])), (0, 0))
        re = jnp.pad(M.re, pad)
        im = jnp.pad(M.im, pad)
        return CX(jax.lax.slice_in_dim(re, K + d, K + d + nrows, axis=0),
                  jax.lax.slice_in_dim(im, K + d, K + d + nrows, axis=0))

    # Lowering choice (ALL measured on chip, 1M x 16 f32, dispatch-
    # cancelled chains): the obvious upsample/downsample lowerings are
    # slow — jnp.repeat / broadcast-(nc,s,m)-reshape 5.0 ms (the 3-D
    # temp's (8,128) tile padding is a ~20x memory amplification at m=16,
    # the r4 BELL-gather-temp lesson), strided reads x[rho::s] and
    # lax.reduce_window/conv pooling ~50 ms (gather-grade).  What IS fast:
    # the matmul identity-stack — up = (Xc @ [I .. I]).reshape(nc*s, m)
    # (split-reshape, minor dim s*m) and down = T.reshape(nc, s*m) @
    # [I; ..; I] — both ride the MXU and a clean reshape, ~2-3 ms per
    # direction.  Shifts hoist THROUGH the stack (up(shift(x, d)) =
    # shift(up(x), s*d); down(shift(t, -s*d)) = shift(down(t), -d)), so
    # each matvec pays ONE up/down matmul plus ndepth streaming passes.

    def _eye_stack(self, m, dtype):
        return jnp.tile(jnp.eye(m, dtype=dtype), (1, self.stride))  # (m, s*m)

    def matvec(self, Xc: CX) -> CX:
        """P @ Xc: (nc, m) -> (n, m), gather-free."""
        n, nc = self.shape
        s = self.stride
        m = Xc.re.shape[1]
        G = self._eye_stack(m, Xc.re.dtype)
        Ur = jnp.dot(Xc.re, G, precision=jax.lax.Precision.HIGHEST)
        Ui = jnp.dot(Xc.im, G, precision=jax.lax.Precision.HIGHEST)
        U = CX(Ur.reshape(nc * s, m), Ui.reshape(nc * s, m))
        yre = jnp.zeros((n, m), Xc.re.dtype)
        yim = jnp.zeros_like(yre)
        for k, d in enumerate(self.offsets):
            Us = self._shift(U, n, s * d)
            wre = self.data.re[k][:, None]
            wim = self.data.im[k][:, None]
            yre = yre + wre * Us.re - wim * Us.im
            yim = yim + wre * Us.im + wim * Us.re
        return CX(yre, yim)

    def rmatvec(self, Y: CX) -> CX:
        """P^H @ Y: (n, m) -> (nc, m), scatter-free."""
        n, nc = self.shape
        s = self.stride
        m = Y.re.shape[1]
        npad = nc * s
        pad = ((0, npad - n), (0, 0))
        tre = jnp.zeros((npad, m), Y.re.dtype)
        tim = jnp.zeros_like(tre)
        for k, d in enumerate(self.offsets):
            wre = self.data.re[k][:, None]
            wim = self.data.im[k][:, None]
            # conj(w) * y, padded to the full nc*s rows, shifted by -s*d
            con = self._shift(
                CX(jnp.pad(wre * Y.re + wim * Y.im, pad),
                   jnp.pad(wre * Y.im - wim * Y.re, pad)), npad, -s * d)
            tre = tre + con.re
            tim = tim + con.im
        G = self._eye_stack(m, Y.re.dtype)  # down = merge-reshape @ G^T
        dre = jnp.dot(tre.reshape(nc, s * m), G.T,
                      precision=jax.lax.Precision.HIGHEST)
        dim = jnp.dot(tim.reshape(nc, s * m), G.T,
                      precision=jax.lax.Precision.HIGHEST)
        return CX(dre, dim)

    def todense(self) -> CX:
        n, nc = self.shape
        re = jnp.zeros((n, nc), self.data.re.dtype)
        im = jnp.zeros_like(re)
        rows = np.arange(n)
        for k, d in enumerate(self.offsets):
            cols = rows // self.stride + d
            ok = (cols >= 0) & (cols < nc)
            re = re.at[rows[ok], cols[ok]].add(self.data.re[k][ok])
            im = im.at[rows[ok], cols[ok]].add(self.data.im[k][ok])
        return CX(re, im)


@jax.tree_util.register_pytree_node_class
class STRETCHT:
    """R = P^H for a STRETCH prolongation (AMG restriction as an operator
    with the standard .matvec interface)."""

    def __init__(self, P: STRETCH):
        self.P = P

    def tree_flatten(self):
        return (self.P,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def shape(self):
        return (self.P.shape[1], self.P.shape[0])

    @property
    def nnz(self):
        return self.P.nnz

    def matvec(self, Y: CX) -> CX:
        return self.P.rmatvec(Y)


def bell_fill(A, bs: int = 16) -> float:
    """Stored-entries / nnz ratio BELL would pay for this matrix at block
    size `bs` (host-side, structure only)."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    coo = A.tocoo()
    nbr = -(-A.shape[0] // bs)
    ncb = -(-A.shape[1] // bs)
    keys = (coo.row // bs).astype(np.int64) * ncb + coo.col // bs
    uk = np.unique(keys)
    counts = np.bincount((uk // ncb).astype(np.int64), minlength=nbr)
    kmax = max(int(counts.max()) if counts.size else 1, 1)
    return nbr * kmax * bs * bs / max(A.nnz, 1)


# Measured SpMM cost model (real chip, benchmarks/results/bell_tune.json:
# 200k-dof P1 FEM after RCM, m=16 block vectors).  BELL wall per matvec fits
# nblocks * (T0 + T1*bs) across bs=8/32/64 (81/163/227 ns per block); CSR's
# gather+segment_sum runs at ~34 ns per nnz.  Larger blocks keep WINNING as
# fill grows (fewer, fatter gathers fuse into the batched GEMM) until the
# stored dense blocks bust HBM — so the block size is chosen by this model
# under a byte cap, never by a fill cutoff (a fill cutoff at bs=16 sent the
# 100k unstructured FEM pencil to the 200x-off-roofline CSR path, r3).
_BELL_T0 = 60e-9
_BELL_T1 = 2.6e-9
_CSR_T_NNZ = 34e-9
_BELL_CANDIDATE_BS = (8, 16, 32, 64)
# cap on the padded gather temp a single matvec chunk may materialize
# (see BELL.matvec's sequential chunk loop)
_BELL_GATHER_BYTES = 268e6


def bell_plan(A, bs: int):
    """Host-side plan of the auto-kcap BELL structure at block size `bs`:
    (kcap, stored_slots, spill_nnz, kfull).

    Derived from BELL._structure itself (ADVICE r4: a hand-mirrored copy
    drifted — it used the unpadded block-row count and a different kcap
    tie-break, so the byte caps underestimated the real store by up to ~5x
    on tiny coarse AMG levels).  stored_slots includes the 16-row nbr
    padding the chunked matvec requires."""
    (_colb, _blk, _ri, _ci, _vals, nbr_padded, kmax, keep, _coo,
     kfull) = BELL._structure(A, bs, kcap="auto")
    spill_nnz = float(np.count_nonzero(~keep))
    # kmax IS the selected kcap (== kfull when the cap does not bind)
    return kmax, nbr_padded * kmax, spill_nnz, kfull


def bell_hbm_bytes(A, bs: int, dtype=None) -> int:
    """Actual HBM footprint of one BELL operator at block size `bs` with
    the auto-kcap plan, including the TPU (8, 128) tile padding of the
    (nbr, bs, kcap*bs) data layout — the quantity the byte caps must model
    (r4: the unmodeled 4.0x minor-dim padding of the old (.., bs, bs)
    layout compile-OOMed the 100k unstructured run at 58 GB)."""
    f64 = (dtype is None and jax.config.jax_enable_x64) or (
        dtype is not None and jnp.dtype(dtype).itemsize == 8)
    bytes_per_entry = 16 if f64 else 8  # re+im pair (f64 = 2x f32 on TPU)
    kcap, slots, spill, _ = bell_plan(A, bs)
    K = kcap * bs
    pad = (-(-bs // 8) * 8 / bs) * (-(-K // 128) * 128 / max(K, 1))
    return int((slots * bs * bs * pad + spill) * bytes_per_entry)


def bell_pick_bs(A, dtype=None, max_bytes: float = 1.0e9):
    """Block size BELL should use for this pattern — the candidate from the
    measured cost model above (auto-kcap slot GEMM + CSR spill) whose
    stored CX pair (tile padding included, see bell_hbm_bytes) stays under
    `max_bytes` — or None when CSR's modeled wall beats every admissible
    candidate (degenerate patterns: near-dense rows, random point sparsity
    where every nnz lands in its own block)."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    nnz = max(A.nnz, 1)
    best, best_cost = None, _CSR_T_NNZ * nnz
    for bs in _BELL_CANDIDATE_BS:
        if bell_hbm_bytes(A, bs, dtype) > max_bytes:
            continue
        _, slots, spill, _ = bell_plan(A, bs)
        cost = slots * (_BELL_T0 + _BELL_T1 * bs) + spill * _CSR_T_NNZ
        if cost < best_cost:
            best, best_cost = bs, cost
    return best


def as_operator(A, dtype=None, dia_fill: float = 0.45,
                bell_bs=None, bell_max_fill: float = 32.0,
                bell_max_bytes: float = 1.0e9):
    """Coerce scipy-sparse/dense/CX/CSR/DIA/BELL to the best device operator.

    Selection (measured hierarchy, benchmarks/results/spmm_bandwidth.json +
    bell_tune.json):
      1. DIA when the matrix is banded with reasonably dense diagonals
         (stored DIA entries <= nnz / dia_fill) — shifted-slice SpMM at
         ~85% of the stream roofline;
      2. BELL (blocked-ELL) for everything else, block size from the
         measured per-block cost model (`bell_pick_bs`) under the
         `bell_max_bytes` stored-pair cap — block gathers + batched GEMM,
         the unstructured-pattern path (pair with
         ops.reorder.rcm_permutation to cluster the blocks first).  Pass
         `bell_bs` to pin the block size (then `bell_max_fill` guards it);
      3. CSR as the last resort (gather+segment_sum, ~200x off roofline —
         correctness fallback only)."""
    if A is None or isinstance(A, (CX, CSR, DIA, BELL)):
        return A
    import scipy.sparse as sp

    if not sp.issparse(A):
        return cx.from_numpy(np.asarray(A, dtype=np.complex128), dtype)
    Ac = sp.csr_matrix(A)
    offs = np.unique(Ac.tocoo().col - Ac.tocoo().row)
    if len(offs) * Ac.shape[0] * dia_fill <= Ac.nnz:
        return DIA.from_scipy(Ac, dtype)
    if bell_bs is not None:
        if bell_fill(Ac, bell_bs) <= bell_max_fill:
            return BELL.from_scipy(Ac, bell_bs, dtype)
        return CSR.from_scipy(Ac, dtype)
    bs = bell_pick_bs(Ac, dtype, bell_max_bytes)
    if bs is not None:
        return BELL.from_scipy(Ac, bs, dtype)
    return CSR.from_scipy(Ac, dtype)


def shifted_matvec(A, B, z: CX):
    """Matrix-free (A - z B) @ X with A, B sparse/dense/None(identity)."""
    def apply(M, X):
        if M is None:
            return X
        if isinstance(M, (CSR, DIA, BELL)):
            return M.matvec(X)
        return cx.cmatmul(M, X)

    def mv(X: CX) -> CX:
        AX = apply(A, X)
        BX = apply(B, X)
        zBX = CX(z.re * BX.re - z.im * BX.im, z.re * BX.im + z.im * BX.re)
        return AX - zBX

    return mv


def jacobi_preconditioner(A, B, z: CX):
    """M^{-1} = diag(A - z B)^{-1} as a callable for the Krylov solvers."""
    def diag_of(M):
        if M is None:
            return None
        if isinstance(M, (CSR, DIA, BELL)):
            return M.diagonal()
        return CX(jnp.diagonal(M.re), jnp.diagonal(M.im))

    dA = diag_of(A)
    dB = diag_of(B)
    n = A.shape[0]
    if dA is None:
        dA = CX(jnp.ones(n), jnp.zeros(n))
    if dB is None:
        dB = CX(jnp.ones(n), jnp.zeros(n))
    d = dA - CX(z.re * dB.re - z.im * dB.im, z.re * dB.im + z.im * dB.re)
    dinv = cx.creciprocal(d)

    def M(X: CX) -> CX:
        return CX(X.re * dinv.re[:, None] - X.im * dinv.im[:, None],
                  X.re * dinv.im[:, None] + X.im * dinv.re[:, None])

    return M
