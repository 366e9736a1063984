"""Batched matrix-free Krylov solvers on complex pairs.

TPU-native replacement for IterativeSolvers.jl `bicgstabl`/`gmres`
(reference: ifeast at feast_experimental.jl:28, nlfeast_it at
nlfeast.jl:106,139).  Where the reference solves column-by-column in a Julia
loop, these solvers advance ALL right-hand sides at once: each iteration is
two block matvecs (n, m) — MXU/SpMM work — plus column-wise scalar
recurrences on the VPU; converged columns freeze via masks (static shapes,
`lax.while_loop`).

The operator is a callable X -> A @ X (matrix-free), so the same code drives
dense shifted matrices, CSR SpMM operators (ops/sparse.py), and user
callables.  An optional preconditioner callable M: X -> M^{-1} X is applied
right-preconditioned.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .. import cx
from ..cx import CX


class KrylovResult(NamedTuple):
    x: CX
    resnorm: jax.Array   # (m,) final relative residual norms
    iters: jax.Array     # scalar iterations used
    converged: jax.Array  # (m,) bool


def _safe_div(a: CX, b: CX) -> CX:
    mag = cx.abs2(b)
    tiny = jnp.finfo(a.re.dtype).tiny
    safe = CX(jnp.where(mag > tiny, b.re, 1.0), jnp.where(mag > tiny, b.im, 0.0))
    out = cx.cdiv(a, safe)
    return CX(jnp.where(mag > tiny, out.re, 0.0), jnp.where(mag > tiny, out.im, 0.0))


def bicgstab(matvec: Callable[[CX], CX], B: CX, x0: Optional[CX] = None,
             tol: float = 1e-8, maxiter: int = 1000,
             M: Optional[Callable[[CX], CX]] = None) -> KrylovResult:
    """Unpreconditioned/right-preconditioned BiCGStab for a block of RHS.

    Solves A x_k = b_k for every column simultaneously; per-column scalars
    (rho, alpha, omega) ride as (m,) CX vectors.  Converged columns stop
    updating (mask), matching per-column convergence of the reference's
    column loop.
    """
    n, m = B.shape
    dt = B.dtype
    ident = (lambda v: v) if M is None else M
    x = cx.zeros((n, m), dt) if x0 is None else x0
    r = B - matvec(x)
    bnorm = jnp.maximum(cx.col_norms(B), jnp.finfo(dt).tiny)
    rhat = r
    one = CX(jnp.ones((m,), dt), jnp.zeros((m,), dt))
    zero_v = cx.zeros((n, m), dt)
    state0 = dict(x=x, r=r, p=zero_v, v=zero_v, rho=one, alpha=one, omega=one,
                  it=jnp.array(0, jnp.int32))

    def resrel(r):
        return cx.col_norms(r) / bnorm

    def cond(st):
        return (jnp.max(resrel(st["r"])) > tol) & (st["it"] < maxiter)

    def body(st):
        x, r, p, v = st["x"], st["r"], st["p"], st["v"]
        rho, alpha, omega = st["rho"], st["alpha"], st["omega"]
        active = resrel(r) > tol
        rho_new = cx.cdot_cols(rhat, r)
        beta = _safe_div(rho_new * alpha, rho * omega)
        p = r + cx.scale_cols(p - cx.scale_cols(v, omega), beta)
        ph = ident(p)
        v = matvec(ph)
        alpha = _safe_div(rho_new, cx.cdot_cols(rhat, v))
        s = r - cx.scale_cols(v, alpha)
        sh = ident(s)
        t = matvec(sh)
        omega = _safe_div(cx.cdot_cols(t, s), cx.cdot_cols(t, t))
        x_new = x + cx.scale_cols(ph, alpha) + cx.scale_cols(sh, omega)
        r_new = s - cx.scale_cols(t, omega)
        # freeze converged columns
        am = active.astype(dt)
        x = CX(x.re * (1 - am) + x_new.re * am, x.im * (1 - am) + x_new.im * am)
        r = CX(r.re * (1 - am) + r_new.re * am, r.im * (1 - am) + r_new.im * am)
        return dict(x=x, r=r, p=p, v=v, rho=rho_new, alpha=alpha, omega=omega,
                    it=st["it"] + 1)

    st = lax.while_loop(cond, body, state0)
    rel = resrel(st["r"])
    return KrylovResult(st["x"], rel, st["it"], rel <= tol)


def gmres(matvec: Callable[[CX], CX], B: CX, x0: Optional[CX] = None,
          tol: float = 1e-8, restart: int = 30, maxrestart: int = 20,
          M: Optional[Callable[[CX], CX]] = None) -> KrylovResult:
    """Restarted block-column GMRES(m): each column runs its own Arnoldi
    recurrence; the basis is batched over columns (n, m, restart).

    Memory: (restart+1) * n * m — keep `restart` modest for wide blocks.
    """
    n, m = B.shape
    dt = B.dtype
    ident = (lambda v: v) if M is None else M
    x = cx.zeros((n, m), dt) if x0 is None else x0
    bnorm = jnp.maximum(cx.col_norms(B), jnp.finfo(dt).tiny)
    k = restart

    def arnoldi_cycle(x):
        r = B - matvec(x)
        beta = cx.col_norms(r)
        # basis V: (k+1, n, m)
        V0 = CX(r.re / jnp.maximum(beta, jnp.finfo(dt).tiny),
                r.im / jnp.maximum(beta, jnp.finfo(dt).tiny))
        V = CX(jnp.zeros((k + 1, n, m), dt).at[0].set(V0.re),
               jnp.zeros((k + 1, n, m), dt).at[0].set(V0.im))
        H = cx.zeros((k + 1, k, m), dt)  # per-column Hessenberg

        def arn_step(j, VH):
            V, H = VH
            vj = CX(V.re[j], V.im[j])
            wv = matvec(ident(vj))
            # orthogonalize against all previous basis vectors (MGS)
            def mgs(i, wH):
                w, H = wH
                vi = CX(V.re[i], V.im[i])
                mask = (i <= j).astype(dt)
                h = cx.cdot_cols(vi, w)
                h = CX(h.re * mask, h.im * mask)
                w = w - cx.scale_cols(vi, h)
                H = CX(H.re.at[i, j].set(h.re), H.im.at[i, j].set(h.im))
                return w, H

            wv, H = lax.fori_loop(0, k, mgs, (wv, H))
            hnext = cx.col_norms(wv)
            H = CX(H.re.at[j + 1, j].set(hnext), H.im)
            vnext = CX(wv.re / jnp.maximum(hnext, jnp.finfo(dt).tiny),
                       wv.im / jnp.maximum(hnext, jnp.finfo(dt).tiny))
            V = CX(V.re.at[j + 1].set(vnext.re), V.im.at[j + 1].set(vnext.im))
            return V, H

        V, H = lax.fori_loop(0, k, arn_step, (V, H))
        # least squares per column: H (k+1, k) y = beta e1, via normal
        # equations on the small Hessenberg (k is modest)
        def solve_col(Hc_re, Hc_im, beta_c):
            Hc = CX(Hc_re, Hc_im)  # (k+1, k)
            g = CX(jnp.zeros((k + 1,), dt).at[0].set(beta_c),
                   jnp.zeros((k + 1,), dt))
            HtH = cx.cmatmul(Hc.H, Hc)
            Htg = CX(Hc.H.re @ g.re - Hc.H.im @ g.im,
                     Hc.H.re @ g.im + Hc.H.im @ g.re)
            # tiny regularization for rank-deficient tail
            eps = jnp.finfo(dt).eps
            tr = jnp.trace(HtH.re)
            HtH = CX(HtH.re + eps * (tr + 1.0) * jnp.eye(k, dtype=dt), HtH.im)
            from . import lu as lumod
            LU, perm = lumod.lu_factor(HtH, block=k)
            y = lumod.lu_solve(LU, perm, CX(Htg.re[:, None], Htg.im[:, None]),
                               block=k)
            return y.re[:, 0], y.im[:, 0]

        y_re, y_im = jax.vmap(solve_col, in_axes=(2, 2, 0), out_axes=(1, 1))(
            H.re, H.im, beta)
        # x += sum_j V_j y_j
        upd = CX(jnp.einsum("jnm,jm->nm", V.re[:k], y_re)
                 - jnp.einsum("jnm,jm->nm", V.im[:k], y_im),
                 jnp.einsum("jnm,jm->nm", V.re[:k], y_im)
                 + jnp.einsum("jnm,jm->nm", V.im[:k], y_re))
        return x + (ident(upd) if M is not None else upd)

    def cond(st):
        x, it = st
        rel = cx.col_norms(B - matvec(x)) / bnorm
        return (jnp.max(rel) > tol) & (it < maxrestart)

    def body(st):
        x, it = st
        return arnoldi_cycle(x), it + 1

    x, it = lax.while_loop(cond, body, (x, jnp.array(0, jnp.int32)))
    rel = cx.col_norms(B - matvec(x)) / bnorm
    return KrylovResult(x, rel, it, rel <= tol)
