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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cx
from ..cx import CX


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


def shifted_matvec(A, B, z: CX):
    """Matrix-free (A - z B) @ X with A, B sparse/dense/None(identity)."""
    def apply(M, X):
        if M is None:
            return X
        if isinstance(M, CSR):
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
        if isinstance(M, CSR):
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
