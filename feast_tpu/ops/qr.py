"""Tall-skinny complex QR / orthonormalization kernels.

TPU-native replacement for the reference's LAPACK `zgeqrf` path
(FEASTSolver.jl: `qr(Q).Q` at feast.jl:41, `qr!(X).Q` at nlfeast.jl:12-13,
QR factor cache at nlfeast_lapack.jl:18).

The workhorse is **shifted CholeskyQR2/3**: Gram matrix + Cholesky + two
refinement passes.  All heavy work is complex GEMM (Karatsuba on the MXU);
the only sequential part is the m0 x m0 Cholesky, which is negligible for
subspace widths m0 ~ 10..500.  This is the TPU-idiomatic tall-skinny QR: on a
row-sharded mesh the Gram matrix becomes a psum and nothing else changes
(see parallel/).

A masked Householder QR is provided as the rank-robust fallback (used when
the subspace is numerically rank-deficient and Cholesky would break down);
it is O(m0) sequential reflections, each a fused (n x m0) VPU/MXU update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .. import cx
from ..cx import CX


# ---------------------------------------------------------------------------
# small complex Cholesky + triangular solves (m x m, fori_loop)
# ---------------------------------------------------------------------------

def cholesky(G: CX) -> CX:
    """Lower Cholesky factor of a Hermitian positive-definite pair matrix.

    Returns L with G = L L^H.  Breakdown (non-PD pivot) is clamped to a tiny
    positive value; callers that care use `cholqr` refinement or Householder.
    """
    m = G.shape[0]
    rows = jnp.arange(m)
    eps = jnp.finfo(G.dtype).eps
    # pivot floor RELATIVE to the matrix scale, and NaN-sanitized: on the
    # TPU f64 emulation (f32 exponent range) a rank-deficient G cascades
    # 1/d amplification into overflow -> NaN within a few columns if the
    # floor is absolute
    g0 = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(G.re))), 1.0)
    floor = eps * eps * g0

    def body(k, G):
        dkk = lax.dynamic_slice(G.re, (k, k), (1, 1))[0, 0]
        deficient = ~(jnp.isfinite(dkk) & (dkk > floor))
        d = jnp.sqrt(jnp.where(deficient, floor, dkk))
        col = CX(lax.dynamic_slice(G.re, (0, k), (m, 1))[:, 0],
                 lax.dynamic_slice(G.im, (0, k), (m, 1))[:, 0])
        below = rows > k
        at_or_below = rows >= k
        # semidefinite convention: a dependent column gets diagonal
        # sqrt(floor) and ZERO below — dividing the dependent column by
        # the floored pivot would cascade 1/(eps sqrt(g0)) amplification
        # through the trailing updates into overflow (and the raw junk
        # diagonal itself can be large-negative by then)
        at_k = rows == k
        col = CX(jnp.where(below & deficient, 0.0,
                           jnp.where(at_k & deficient, d * d, col.re)),
                 jnp.where(at_or_below & deficient, 0.0, col.im))
        newcol = CX(jnp.where(at_or_below, col.re / d, col.re),
                    jnp.where(at_or_below, col.im / d, col.im))
        # any TRUE Cholesky factor satisfies |L[i,k]| <= sqrt(G[i,i]) <=
        # sqrt(g0); entries past that are junk-pivot amplification on a
        # semidefinite input — clamp (phase-preserving) so garbage cannot
        # cascade through the trailing updates into overflow
        cap = 2.0 * jnp.sqrt(g0)
        mag = jnp.sqrt(newcol.re ** 2 + newcol.im ** 2)
        scale_dn = jnp.where(mag > cap, cap / jnp.where(mag > cap, mag, 1.0),
                             1.0)
        newcol = CX(jnp.where(below, newcol.re * scale_dn, newcol.re),
                    jnp.where(below, newcol.im * scale_dn, newcol.im))
        G = CX(lax.dynamic_update_slice(G.re, newcol.re[:, None], (0, k)),
               lax.dynamic_update_slice(G.im, newcol.im[:, None], (0, k)))
        # trailing update: G[i,j] -= L[i,k] * conj(L[j,k]) for i,j > k
        lk = CX(jnp.where(below, newcol.re, 0.0), jnp.where(below, newcol.im, 0.0))
        upd = CX(lk.re[:, None] * lk.re[None, :] + lk.im[:, None] * lk.im[None, :],
                 lk.im[:, None] * lk.re[None, :] - lk.re[:, None] * lk.im[None, :])
        return G - upd

    G = lax.fori_loop(0, m, body, G)
    # zero strict upper triangle
    tril = jnp.tril(jnp.ones((m, m), dtype=bool))
    return CX(jnp.where(tril, G.re, 0.0), jnp.where(tril, G.im, 0.0))


def solve_lower(L: CX, B: CX, unit: bool = False) -> CX:
    """Solve L X = B with L (m,m) lower triangular, B (m,k)."""
    m = L.shape[0]
    cols = jnp.arange(m)
    eps = jnp.finfo(L.dtype).eps

    def body(i, B):
        mask = (cols < i).astype(L.dtype)
        rowL = CX(lax.dynamic_slice(L.re, (i, 0), (1, m))[0] * mask,
                  lax.dynamic_slice(L.im, (i, 0), (1, m))[0] * mask)
        num = CX(cx.hdot(rowL.re, B.re) - cx.hdot(rowL.im, B.im),
                 cx.hdot(rowL.re, B.im) + cx.hdot(rowL.im, B.re))
        rowB = CX(lax.dynamic_slice(B.re, (i, 0), (1, B.shape[1]))[0],
                  lax.dynamic_slice(B.im, (i, 0), (1, B.shape[1]))[0])
        rhs = rowB - num
        if unit:
            new = rhs
        else:
            d = CX(lax.dynamic_slice(L.re, (i, i), (1, 1))[0, 0],
                   lax.dynamic_slice(L.im, (i, i), (1, 1))[0, 0])
            dmag2 = cx.abs2(d)
            d = cx.where(dmag2 > 0.0, d, cx.as_cx(1.0, L.dtype) * (eps * eps))
            new = cx.cdiv(rhs, CX(jnp.broadcast_to(d.re, rhs.shape),
                                  jnp.broadcast_to(d.im, rhs.shape)))
        return CX(lax.dynamic_update_slice(B.re, new.re[None, :], (i, 0)),
                  lax.dynamic_update_slice(B.im, new.im[None, :], (i, 0)))

    return lax.fori_loop(0, m, body, B)


def solve_upper(U: CX, B: CX) -> CX:
    """Solve U X = B with U (m,m) upper triangular, B (m,k)."""
    # U X = B  <=>  (U^H)^H X = B; reuse lower solve on the conj-transpose:
    # U^H is lower; solve U^H Y = conj(B)... simpler: direct backward loop.
    m = U.shape[0]
    cols = jnp.arange(m)
    eps = jnp.finfo(U.dtype).eps

    def body(t, B):
        i = m - 1 - t
        mask = (cols > i).astype(U.dtype)
        rowU = CX(lax.dynamic_slice(U.re, (i, 0), (1, m))[0] * mask,
                  lax.dynamic_slice(U.im, (i, 0), (1, m))[0] * mask)
        num = CX(cx.hdot(rowU.re, B.re) - cx.hdot(rowU.im, B.im),
                 cx.hdot(rowU.re, B.im) + cx.hdot(rowU.im, B.re))
        rowB = CX(lax.dynamic_slice(B.re, (i, 0), (1, B.shape[1]))[0],
                  lax.dynamic_slice(B.im, (i, 0), (1, B.shape[1]))[0])
        d = CX(lax.dynamic_slice(U.re, (i, i), (1, 1))[0, 0],
               lax.dynamic_slice(U.im, (i, i), (1, 1))[0, 0])
        dmag2 = cx.abs2(d)
        d = cx.where(dmag2 > 0.0, d, cx.as_cx(1.0, U.dtype) * (eps * eps))
        rhs = rowB - num
        new = cx.cdiv(rhs, CX(jnp.broadcast_to(d.re, rhs.shape),
                              jnp.broadcast_to(d.im, rhs.shape)))
        return CX(lax.dynamic_update_slice(B.re, new.re[None, :], (i, 0)),
                  lax.dynamic_update_slice(B.im, new.im[None, :], (i, 0)))

    return lax.fori_loop(0, m, body, B)


def right_solve_upper(A: CX, R: CX) -> CX:
    """Compute A R^{-1} (A: n x m, R: m x m upper) via R^H Y = A^H."""
    Y = solve_lower(R.H, A.H)
    return Y.H


# ---------------------------------------------------------------------------
# CholeskyQR family
# ---------------------------------------------------------------------------

def _gram(A: CX, psum_axis=None) -> CX:
    # elementwise-reduction Gram (cx.cgram): the MXU's emulated-f64 long
    # contraction is only ~f32-accurate, which capped CholeskyQR2
    # orthogonality at 1.7e-5 on chip; the VPU form keeps dd accuracy
    G = cx.cgram(A)
    if psum_axis is not None:
        G = CX(lax.psum(G.re, psum_axis), lax.psum(G.im, psum_axis))
    return G


def cholqr(A: CX, shift: bool = True, psum_axis=None):
    """One shifted CholeskyQR pass: returns (Q, R) with A = Q R."""
    n, m = A.shape
    G = _gram(A, psum_axis)
    if shift:
        eps = jnp.finfo(A.dtype).eps
        # shifted CholeskyQR (Fukaya et al. 2020): guarantees chol succeeds
        # for cond(A) < ~eps^{-1}; the shift is washed out by later passes.
        s = 11.0 * (m * n + n * (n + 1)) * eps * jnp.trace(G.re) / m
        G = CX(G.re + s * jnp.eye(m, dtype=G.dtype), G.im)
    L = cholesky(G)
    R = L.H
    Q = right_solve_upper(A, R)
    return Q, R


def cholqr2(A: CX, psum_axis=None):
    """Shifted CholeskyQR2: orthogonality to ~eps for cond(A) < ~1e8."""
    Q1, R1 = cholqr(A, shift=True, psum_axis=psum_axis)
    Q2, R2 = cholqr(Q1, shift=False, psum_axis=psum_axis)
    return Q2, cx.cmatmul(R2, R1)


def cholqr3(A: CX, psum_axis=None):
    """Shifted CholeskyQR3: near-machine orthogonality up to cond ~ 1e15."""
    Q1, R1 = cholqr(A, shift=True, psum_axis=psum_axis)
    Q2, R2 = cholqr(Q1, shift=True, psum_axis=psum_axis)
    Q3, R3 = cholqr(Q2, shift=False, psum_axis=psum_axis)
    return Q3, cx.cmatmul(R3, cx.cmatmul(R2, R1))


# ---------------------------------------------------------------------------
# Householder QR (rank-robust fallback)
# ---------------------------------------------------------------------------

def householder_qr(A: CX):
    """Thin Householder QR of (n, m), n >= m: returns (Q (n,m), R (m,m)).

    Sequential over m reflections; each reflection is a fused rank-1 update
    of the trailing matrix.  Use for ill-conditioned subspaces where
    CholeskyQR cannot recover orthogonality.
    """
    n, m = A.shape
    ridx = jnp.arange(n)
    V = cx.zeros((n, m), A.dtype)  # Householder vectors
    eps = jnp.finfo(A.dtype).eps

    def body(k, state):
        A, V = state
        col = CX(lax.dynamic_slice(A.re, (0, k), (n, 1))[:, 0],
                 lax.dynamic_slice(A.im, (0, k), (n, 1))[:, 0])
        mask = ridx >= k
        xm = cx.where(mask, col, cx.zeros((n,), A.dtype))
        normx = jnp.sqrt(jnp.sum(cx.abs2(xm)))
        alpha = _dyn_scalar(xm, k)
        ph = cx.phase(alpha)
        sel = ridx == k
        add = ph * normx
        v = CX(xm.re + jnp.where(sel, add.re, 0.0),
               xm.im + jnp.where(sel, add.im, 0.0))
        vnorm2 = jnp.sum(cx.abs2(v))
        beta = jnp.where(vnorm2 > eps * eps, 2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0), 0.0)
        # A <- (I - beta v v^H) A
        w = CX(cx.hdot(v.re, A.re) + cx.hdot(v.im, A.im), cx.hdot(v.re, A.im) - cx.hdot(v.im, A.re))  # v^H A
        A = A - CX(
            (v.re[:, None] * w.re[None, :] - v.im[:, None] * w.im[None, :]) * beta,
            (v.re[:, None] * w.im[None, :] + v.im[:, None] * w.re[None, :]) * beta,
        )
        V = CX(lax.dynamic_update_slice(V.re, v.re[:, None], (0, k)),
               lax.dynamic_update_slice(V.im, v.im[:, None], (0, k)))
        return A, V

    A, V = lax.fori_loop(0, m, body, (A, V))
    triu = jnp.triu(jnp.ones((m, m), dtype=bool))
    R = CX(jnp.where(triu, A.re[:m], 0.0), jnp.where(triu, A.im[:m], 0.0))

    # form thin Q = H_0 ... H_{m-1} [e_0 .. e_{m-1}] by backward accumulation
    Q = CX(jnp.eye(n, m, dtype=A.dtype), jnp.zeros((n, m), A.dtype))

    def backward(t, Q):
        k = m - 1 - t
        v = CX(lax.dynamic_slice(V.re, (0, k), (n, 1))[:, 0],
               lax.dynamic_slice(V.im, (0, k), (n, 1))[:, 0])
        vnorm2 = jnp.sum(cx.abs2(v))
        beta = jnp.where(vnorm2 > eps * eps, 2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0), 0.0)
        w = CX(cx.hdot(v.re, Q.re) + cx.hdot(v.im, Q.im), cx.hdot(v.re, Q.im) - cx.hdot(v.im, Q.re))  # v^H Q
        return Q - CX(
            (v.re[:, None] * w.re[None, :] - v.im[:, None] * w.im[None, :]) * beta,
            (v.re[:, None] * w.im[None, :] + v.im[:, None] * w.re[None, :]) * beta,
        )

    Q = lax.fori_loop(0, m, backward, Q)
    return Q, R


def _dyn_scalar(v: CX, k) -> CX:
    return CX(lax.dynamic_slice(v.re, (k,), (1,))[0],
              lax.dynamic_slice(v.im, (k,), (1,))[0])


def colscale_unit(A: CX, psum_axis=None) -> CX:
    """Scale each column to unit 2-norm, safely across extreme dynamic
    range: a max-abs pre-scale first, so tiny columns (FEAST's filtered
    junk directions decay geometrically per iteration) never underflow the
    squared-norm reduction — on TPU's emulated f64 (f32 exponent range)
    squaring ~1e-19 entries silently returns 0 and the normalization
    destroys the column.  Span-preserving (diagonal right-scaling)."""
    tiny = jnp.finfo(A.dtype).tiny
    amax = jnp.max(jnp.maximum(jnp.abs(A.re), jnp.abs(A.im)), axis=0)
    if psum_axis is not None:
        amax = lax.pmax(amax, psum_axis)
    s1 = 1.0 / jnp.where(amax > tiny, amax, 1.0)
    As = CX(A.re * s1[None, :], A.im * s1[None, :])
    nrm2 = jnp.sum(As.re * As.re + As.im * As.im, axis=0)
    if psum_axis is not None:
        nrm2 = lax.psum(nrm2, psum_axis)
    nrm = jnp.sqrt(nrm2)
    s2 = 1.0 / jnp.where(nrm > tiny, nrm, 1.0)
    return CX(As.re * s2[None, :], As.im * s2[None, :])


def orthonormalize(A: CX, method: str = "cholqr2", psum_axis=None) -> CX:
    """Orthonormal basis of range(A) — the `qr(Q).Q` step of the reference.

    Columns are safely pre-normalized to unit norm first (colscale_unit):
    the FEAST moment sum's outside-contour columns decay geometrically per
    refinement iteration, and the resulting dynamic range breaks every
    factorization on TPU's f32-exponent-range emulated f64."""
    A = colscale_unit(A, psum_axis)
    if method == "cholqr2":
        return cholqr2(A, psum_axis)[0]
    if method == "cholqr3":
        return cholqr3(A, psum_axis)[0]
    if method == "householder":
        return householder_qr(A)[0]
    raise ValueError(f"unknown method {method}")
