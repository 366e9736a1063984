"""On-device complex QZ: generalized Schur decomposition of a pencil (A, B).

The real LAPACK-parity core behind `zggev` (reference hand-binding at
lapack.jl:32-97, used by `eigen!(Aq,Bq)` at feast.jl:122, companion.jl:15,
beyn.jl:78).  `ops.eig.gen_eig` reduces via B^{-1}A, which is fine when B is
comfortably invertible (every FEAST Rayleigh-Ritz site); THIS kernel handles
the general pencil — singular or ill-conditioned B, infinite eigenvalues —
with the textbook QZ structure, formulated on CX pairs for TPU:

  1. B = QR; A <- Q^H A (B triangular);
  2. Hessenberg-triangular reduction by interleaved left/right Givens
     rotations (row pairs zero A below the subdiagonal, column pairs restore
     B's triangularity);
  3. single-shift implicit QZ sweeps with bulge chasing, deflation on
     |H[i+1,i]| <= eps(|H[i,i]|+|H[i+1,i+1]|);
  4. eigenvalues as (alpha, beta) = (diag(S), diag(T)) pairs — beta ~ 0
     encodes infinite eigenvalues instead of overflowing;
  5. right eigenvectors by triangular-pencil back-substitution through Z.

Everything is static-shape (masked active window, fori/while loops); each
rotation touches two rows or two columns via dynamic slices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .. import cx
from ..cx import CX
from .eig import _givens


def _get_rows2(M: CX, i):
    n = M.shape[1]
    return CX(lax.dynamic_slice(M.re, (i, 0), (2, n)),
              lax.dynamic_slice(M.im, (i, 0), (2, n)))


def _set_rows2(M: CX, i, R2: CX):
    return CX(lax.dynamic_update_slice(M.re, R2.re, (i, 0)),
              lax.dynamic_update_slice(M.im, R2.im, (i, 0)))


def _get_cols2(M: CX, j):
    n = M.shape[0]
    return CX(lax.dynamic_slice(M.re, (0, j), (n, 2)),
              lax.dynamic_slice(M.im, (0, j), (n, 2)))


def _set_cols2(M: CX, j, C2: CX):
    return CX(lax.dynamic_update_slice(M.re, C2.re, (0, j)),
              lax.dynamic_update_slice(M.im, C2.im, (0, j)))


def _lrot(M: CX, i, c, s: CX) -> CX:
    """Left Givens on rows (i, i+1): [c, s; -conj(s), c]."""
    R = _get_rows2(M, i)
    top = CX(R.re[0], R.im[0])
    bot = CX(R.re[1], R.im[1])
    new_top = top * c + s * bot
    new_bot = bot * c - s.conj() * top
    return _set_rows2(M, i, CX(jnp.stack([new_top.re, new_bot.re]),
                               jnp.stack([new_top.im, new_bot.im])))


def _rrot(M: CX, j, c, s: CX) -> CX:
    """Right Givens on columns (j, j+1) by [c, s; -conj(s), c]^H."""
    Cc = _get_cols2(M, j)
    left = CX(Cc.re[:, 0], Cc.im[:, 0])
    right = CX(Cc.re[:, 1], Cc.im[:, 1])
    new_l = left * c + s.conj() * right
    new_r = right * c - s * left
    return _set_cols2(M, j, CX(jnp.stack([new_l.re, new_r.re], axis=1),
                               jnp.stack([new_l.im, new_r.im], axis=1)))


def _scal(M: CX, i, j) -> CX:
    return CX(lax.dynamic_slice(M.re, (i, j), (1, 1))[0, 0],
              lax.dynamic_slice(M.im, (i, j), (1, 1))[0, 0])


def _givens_zero_first(a: CX, b: CX):
    """(c, s) for `_rrot` such that a row pair [a, b] maps to [0, r]:
    new_a = a c + conj(s) b = 0.  Used to kill T's subdiagonal fill with a
    column rotation (b = the diagonal entry)."""
    na2 = cx.abs2(a)
    nb2 = cx.abs2(b)
    r2 = na2 + nb2
    a_zero = na2 == 0
    r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
    absb = jnp.sqrt(nb2)
    phb = cx.phase(b)  # 1 when b == 0
    c = jnp.where(a_zero, 1.0, absb / r)
    s = phb * a.conj()
    s = CX(jnp.where(a_zero, 0.0, -s.re / r), jnp.where(a_zero, 0.0, -s.im / r))
    return c, s


def hessenberg_triangular(A: CX, B: CX):
    """Reduce (A, B) to (H upper Hessenberg, T upper triangular):
    H = Q^H A Z, T = Q^H B Z.  Returns (H, T, Q, Z)."""
    from . import qr as qrmod

    n = A.shape[0]
    # B = Q0 R
    Q, R = qrmod.householder_qr(B)
    H = cx.cmatmul(Q.H, A)
    T = R
    Z = cx.eye(n, A.dtype)
    Qacc = Q  # accumulates left transforms as columns: Qacc <- Qacc * G^H

    def col_loop(j, state):
        H, T, Qacc, Z = state

        def row_loop(t, state):
            H, T, Qacc, Z = state
            i = (n - 2) - t  # i from n-2 down to j+1: rotate rows (i, i+1)
            active = i >= j + 1

            def do(state):
                H, T, Qacc, Z = state
                a = _scal(H, i, j)
                b = _scal(H, i + 1, j)
                c, s = _givens(a, b)
                H = _lrot(H, i, c, s)
                T = _lrot(T, i, c, s)
                # accumulate: Qacc <- Qacc G^H (columns i, i+1)
                Qacc = _rrot(Qacc, i, c, s)
                # T got fill at (i+1, i): column rotation (i, i+1) kills it
                ta = _scal(T, i + 1, i)
                tb = _scal(T, i + 1, i + 1)
                cr, sr = _givens_zero_first(ta, tb)
                T = _rrot(T, i, cr, sr)
                H = _rrot(H, i, cr, sr)
                Z = _rrot(Z, i, cr, sr)
                return H, T, Qacc, Z

            return lax.cond(active, do, lambda s_: s_, (H, T, Qacc, Z))

        return lax.fori_loop(0, n - 2, row_loop, (H, T, Qacc, Z))

    if n > 2:
        H, T, Qacc, Z = lax.fori_loop(0, n - 2, col_loop, (H, T, Qacc, Z))
    return H, T, Qacc, Z


# ---------------------------------------------------------------------------
# QZ iteration
# ---------------------------------------------------------------------------

def _trailing_shift(H: CX, T: CX, k, stagnation):
    """Generalized Wilkinson shift: eigenvalue of the trailing active 2x2 of
    T^{-1}H closest to its bottom-right entry; exceptional shift on
    stagnation (like ops.eig._wilkinson_shift)."""
    h11 = _scal(H, k - 1, k - 1)
    h12 = _scal(H, k - 1, k)
    h21 = _scal(H, k, k - 1)
    h22 = _scal(H, k, k)
    t11 = _scal(T, k - 1, k - 1)
    t12 = _scal(T, k - 1, k)
    t22 = _scal(T, k, k)
    eps = jnp.finfo(H.dtype).eps
    # guard tiny T diagonal (near-infinite eigenvalue): clamp magnitude
    def _guard(t):
        m2 = cx.abs2(t)
        floor = eps * eps
        return cx.where(m2 > floor, t, cx.as_cx(1.0, H.dtype) * jnp.sqrt(floor))
    t11g, t22g = _guard(t11), _guard(t22)
    # M = [h11 h12; h21 h22] @ inv([t11 t12; 0 t22])
    it11 = cx.creciprocal(t11g)
    it22 = cx.creciprocal(t22g)
    it12 = (t12 * it11 * it22)
    m11 = h11 * it11
    m12 = CX(h12.re * it22.re - h12.im * it22.im,
             h12.re * it22.im + h12.im * it22.re) - h11 * it12
    m21 = h21 * it11
    m22 = h22 * it22 - h21 * it12
    delta = (m11 - m22) * 0.5
    bg = m12 * m21
    t_ = cx.csqrt(delta * delta + bg)
    den1 = delta + t_
    den2 = delta - t_
    pick1 = cx.abs2(den1) >= cx.abs2(den2)
    den = cx.where(pick1, den1, den2)
    small = cx.abs2(den) <= 0.0
    quot = cx.cdiv(bg, cx.where(small, cx.as_cx(1.0, H.dtype), den))
    mu = m22 - cx.where(small, cx.zeros((), H.dtype), quot)
    exc = CX(m22.re + 0.75 * cx.cabs(m21), m22.im)
    use_exc = (stagnation > 0) & (stagnation % 10 == 0)
    return cx.where(use_exc, exc, mu)


def _qz_sweep(H: CX, T: CX, Q: CX, Z: CX, lo, k, sigma: CX):
    """One implicit single-shift QZ sweep on the active window rows lo..k.

    `lo` is the top of the unreduced block containing row k (the first row
    after the nearest deflated subdiagonal above k) — an implicit bulge
    cannot cross a zero subdiagonal, so the chase must start there."""
    n = H.shape[0]

    def chase(i, state):
        H, T, Q, Z = state
        active = (i >= lo) & (i < k)

        def do(state):
            H, T, Q, Z = state
            if_first = i == lo

            # left rotation rows (i, i+1)
            def first_col(_):
                # x = H[lo,lo] - sigma T[lo,lo]; y = H[lo+1,lo]
                x = _scal(H, lo, lo) - sigma * _scal(T, lo, lo)
                y = _scal(H, lo + 1, lo)
                return x, y

            def bulge_col(_):
                x = _scal(H, i, i - 1)
                y = _scal(H, i + 1, i - 1)
                return x, y

            x, y = lax.cond(if_first, first_col, bulge_col, None)
            c, s = _givens(x, y)
            H = _lrot(H, i, c, s)
            T = _lrot(T, i, c, s)
            Q = _rrot(Q, i, c, s)
            # kill T fill (i+1, i) with a column rotation
            ta = _scal(T, i + 1, i)
            tb = _scal(T, i + 1, i + 1)
            cr, sr = _givens_zero_first(ta, tb)
            T = _rrot(T, i, cr, sr)
            H = _rrot(H, i, cr, sr)
            Z = _rrot(Z, i, cr, sr)
            return H, T, Q, Z

        return lax.cond(active, do, lambda s_: s_, (H, T, Q, Z))

    return lax.fori_loop(0, n - 1, chase, (H, T, Q, Z))


def qz(A: CX, B: CX, max_sweeps_per_eig: int = 30):
    """Complex generalized Schur: A = Q S Z^H, B = Q T Z^H with S, T upper
    triangular.  Returns (S, T, Q, Z)."""
    n = A.shape[0]
    if n == 1:
        return A, B, cx.eye(1, A.dtype), cx.eye(1, A.dtype)
    H, T, Q, Z = hessenberg_triangular(A, B)
    eps = jnp.finfo(H.dtype).eps
    fnorm = cx.fro_norm(H)
    idx = jnp.arange(n - 1)
    maxit = max_sweeps_per_eig * n

    def deflate(H):
        sub = CX(jnp.diagonal(H.re, -1), jnp.diagonal(H.im, -1))
        diag_abs = cx.cabs(CX(jnp.diagonal(H.re), jnp.diagonal(H.im)))
        # LAPACK zhgeqz-style: floor the tolerance at ulp*||H|| — unlike the
        # standard-eig case, H's diagonal (the alpha values) can be much
        # smaller than ||H||, and the subdiagonal noise floor is eps*||H||;
        # a diag-only tolerance then never accepts convergence (stagnation).
        tol = eps * jnp.maximum(diag_abs[:-1] + diag_abs[1:],
                                jnp.where(fnorm > 0, fnorm, 1.0))
        conv = cx.cabs(sub) <= tol
        conv_full = jnp.zeros((n, n), dtype=bool).at[
            jnp.arange(1, n), jnp.arange(n - 1)].set(conv)
        H = CX(jnp.where(conv_full, 0.0, H.re),
               jnp.where(conv_full, 0.0, H.im))
        nz = ~conv
        k = jnp.max(jnp.where(nz, idx + 1, 0))
        return H, k

    H, k0 = deflate(H)

    def cond(state):
        H, T, Q, Z, k, it, stag = state
        return (k > 0) & (it < maxit)

    def body(state):
        H, T, Q, Z, k, it, stag = state
        # top of the unreduced block holding row k: first zero subdiagonal
        # above k (exact zeros — deflate() zeroes converged entries)
        sub0 = (jnp.diagonal(H.re, -1) == 0.0) & (jnp.diagonal(H.im, -1) == 0.0)
        lo = jnp.max(jnp.where(sub0 & (idx < k), idx + 1, 0))
        sigma = _trailing_shift(H, T, k, stag)
        H, T, Q, Z = _qz_sweep(H, T, Q, Z, lo, k, sigma)
        H, k_new = deflate(H)
        stag = jnp.where(k_new < k, 0, stag + 1)
        return H, T, Q, Z, k_new, it + 1, stag

    H, T, Q, Z, k, it, _ = lax.while_loop(
        cond, body, (H, T, Q, Z, k0, jnp.array(0, jnp.int32),
                     jnp.array(0, jnp.int32)))
    tri = jnp.triu(jnp.ones((n, n), dtype=bool))
    H = CX(jnp.where(tri, H.re, 0.0), jnp.where(tri, H.im, 0.0))
    T = CX(jnp.where(tri, T.re, 0.0), jnp.where(tri, T.im, 0.0))
    return H, T, Q, Z


def pencil_eigvecs(S: CX, T: CX) -> CX:
    """Right eigenvectors of the triangular pencil (S, T) by
    back-substitution on beta_i S - alpha_i T (no division by beta, so
    infinite eigenvalues degrade gracefully)."""
    n = S.shape[0]
    alpha = CX(jnp.diagonal(S.re), jnp.diagonal(S.im))
    beta = CX(jnp.diagonal(T.re), jnp.diagonal(T.im))
    eps = jnp.finfo(S.dtype).eps
    smln = eps * jnp.maximum(cx.fro_norm(S) + cx.fro_norm(T), 1.0)
    Y = cx.eye(n, S.dtype)
    col_idx = jnp.arange(n)

    def body(t, Y):
        j = n - 2 - t
        rowmask = (col_idx > j).astype(S.dtype)
        rowS = CX(S.re[j] * rowmask, S.im[j] * rowmask)
        rowT = CX(T.re[j] * rowmask, T.im[j] * rowmask)
        numS = CX(cx.hdot(rowS.re, Y.re) - cx.hdot(rowS.im, Y.im),
                  cx.hdot(rowS.re, Y.im) + cx.hdot(rowS.im, Y.re))
        numT = CX(cx.hdot(rowT.re, Y.re) - cx.hdot(rowT.im, Y.im),
                  cx.hdot(rowT.re, Y.im) + cx.hdot(rowT.im, Y.re))
        num = beta * numS - alpha * numT
        sjj = CX(S.re[j, j], S.im[j, j])
        tjj = CX(T.re[j, j], T.im[j, j])
        den = beta * sjj - alpha * tjj
        dmag = cx.cabs(den)
        den = cx.where(dmag < smln,
                       CX(jnp.full((n,), smln, S.dtype),
                          jnp.zeros((n,), S.dtype)),
                       den)
        val = cx.cdiv(CX(-num.re, -num.im), den)
        upd = col_idx > j
        newrow = cx.where(upd, val, CX(Y.re[j], Y.im[j]))
        return CX(Y.re.at[j].set(newrow.re), Y.im.at[j].set(newrow.im))

    if n > 1:
        Y = lax.fori_loop(0, n - 1, body, Y)
    return Y


def pencil_left_nullvecs(S: CX, T: CX) -> CX:
    """Conjugated left null vectors of the triangular pencil (S, T).

    Column i of the returned H satisfies, entrywise over rows j,
      (beta_i S[j,j] - alpha_i T[j,j]) h[j]
          = - sum_{l<j} (beta_i S[l,j] - alpha_i T[l,j]) h[l],
    with h[i] = 1 and support on rows [i, n) — the forward-substitution
    mirror of `pencil_eigvecs`.  Then u_i = Q conj(h_i) is a LEFT
    eigenvector of the original pencil: u_i^H A = lam_i u_i^H B for
    A = Q S Z^H, B = Q T Z^H (conjugating turns the adjoint lower-
    triangular null problem into this plain forward substitution)."""
    n = S.shape[0]
    alpha = CX(jnp.diagonal(S.re), jnp.diagonal(S.im))
    beta = CX(jnp.diagonal(T.re), jnp.diagonal(T.im))
    eps = jnp.finfo(S.dtype).eps
    smln = eps * jnp.maximum(cx.fro_norm(S) + cx.fro_norm(T), 1.0)
    H = cx.eye(n, S.dtype)
    row_idx = jnp.arange(n)

    def body(t, H):
        j = t + 1
        lmask = (row_idx < j).astype(S.dtype)
        colS = CX(S.re[:, j] * lmask, S.im[:, j] * lmask)
        colT = CX(T.re[:, j] * lmask, T.im[:, j] * lmask)
        numS = CX(cx.hdot(colS.re, H.re) - cx.hdot(colS.im, H.im),
                  cx.hdot(colS.re, H.im) + cx.hdot(colS.im, H.re))
        numT = CX(cx.hdot(colT.re, H.re) - cx.hdot(colT.im, H.im),
                  cx.hdot(colT.re, H.im) + cx.hdot(colT.im, H.re))
        num = beta * numS - alpha * numT
        sjj = CX(S.re[j, j], S.im[j, j])
        tjj = CX(T.re[j, j], T.im[j, j])
        den = beta * sjj - alpha * tjj
        dmag = cx.cabs(den)
        den = cx.where(dmag < smln,
                       CX(jnp.full((n,), smln, S.dtype),
                          jnp.zeros((n,), S.dtype)),
                       den)
        val = cx.cdiv(CX(-num.re, -num.im), den)
        upd = row_idx < j
        newrow = cx.where(upd, val, CX(H.re[j], H.im[j]))
        return CX(H.re.at[j].set(newrow.re), H.im.at[j].set(newrow.im))

    if n > 1:
        H = lax.fori_loop(0, n - 1, body, H)
    return H


def gen_eig_qz(A: CX, B: CX, refine_rq: bool = True,
               kappa_max: float = 1e4):
    """Generalized eigenpairs via full QZ: returns (alpha, beta, V) with
    A V diag(beta) = B V diag(alpha).  lam = alpha/beta; beta ~ 0 marks
    infinite eigenvalues (the reference's ggev alpha/beta convention,
    lapack.jl:96).

    refine_rq polishes each pair with the two-sided pencil Rayleigh
    quotient (alpha, beta) <- (u^H A v, u^H B v) — division-free, so
    infinite eigenvalues refine as gracefully as finite ones; pairs with
    eigenvalue condition number above kappa_max keep the backward-stable
    Schur diagonals (see ops.eig._rq_refine)."""
    S, T, Q, Z = qz(A, B)
    alpha = CX(jnp.diagonal(S.re), jnp.diagonal(S.im))
    beta = CX(jnp.diagonal(T.re), jnp.diagonal(T.im))
    Y = pencil_eigvecs(S, T)
    V = cx.cmatmul(Z, Y)
    if refine_rq:
        U = cx.cmatmul(Q, pencil_left_nullvecs(S, T).conj())
        num = cx.cdot_cols(U, cx.cmatmul(A, V))
        den = cx.cdot_cols(U, cx.cmatmul(B, V))
        mag = jnp.sqrt(cx.abs2(num) + cx.abs2(den))
        n = A.shape[0]
        scale = ((cx.fro_norm(A) + cx.fro_norm(B))
                 / jnp.sqrt(jnp.asarray(float(n), A.re.dtype)))
        safe = mag > 0
        kappa = (cx.col_norms(U) * cx.col_norms(V) * scale
                 / jnp.where(safe, mag, 1.0))
        use = safe & (kappa < kappa_max)
        alpha = cx.where(use, num, alpha)
        beta = cx.where(use, den, beta)
    return alpha, beta, cx.normalize_cols(V)
