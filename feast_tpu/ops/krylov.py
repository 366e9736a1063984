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
             M: Optional[Callable[[CX], CX]] = None,
             bnorm=None) -> KrylovResult:
    """Unpreconditioned/right-preconditioned BiCGStab for a block of RHS.

    Solves A x_k = b_k for every column simultaneously; per-column scalars
    (rho, alpha, omega) ride as (m,) CX vectors.  Converged columns stop
    updating (mask), matching per-column convergence of the reference's
    column loop.

    bnorm: optional (m,) override for the per-column norms the relative
    tolerance is measured against (used by `bicgstab_rr`, whose restart
    passes solve correction systems but must stop relative to the
    ORIGINAL right-hand side).

    The system is solved in COLUMN-SCALED form (each b_k normalized to
    unit norm, solution unscaled at the end).  TPU's emulated f64 is a
    double-f32 pair with f32 exponent range: once quantities fall below
    ~1e-19 the correction terms of products/sums denormalize and the
    arithmetic silently degrades to f32 grade — measured on-chip, a
    shifted AMG-preconditioned solve that reaches 9e-10 relative accuracy
    at unit RHS scale stalls at 5e-3 with a 1e-7-scaled RHS and makes NO
    progress at 1e-10 scale.  Inside FEAST the node solves take the
    (shrinking) outer residual as RHS, so without this scaling the outer
    iteration plateaus near f32 epsilon.  Scaling is exact in infinite
    precision and keeps every recurrence quantity O(1).
    """
    n, m = B.shape
    dt = B.dtype
    ident = (lambda v: v) if M is None else M
    tiny = jnp.finfo(dt).tiny
    cn = cx.col_norms(B)
    bn_true = jnp.where(cn > tiny, cn, 1.0)  # zero column -> scale 1
    ref = bn_true if bnorm is None else jnp.maximum(bnorm, tiny)
    inv = 1.0 / bn_true
    B = CX(B.re * inv[None, :], B.im * inv[None, :])
    x = (cx.zeros((n, m), dt) if x0 is None
         else CX(x0.re * inv[None, :], x0.im * inv[None, :]))
    r = B - matvec(x)
    # per-column tolerance scale: ||r||/ref in ORIGINAL units equals
    # ||r_scaled|| * bn_true/ref in scaled units
    rscale = jnp.maximum(ref * inv, tiny)
    rhat = r
    one = CX(jnp.ones((m,), dt), jnp.zeros((m,), dt))
    zero_v = cx.zeros((n, m), dt)
    state0 = dict(x=x, r=r, p=zero_v, v=zero_v, rho=one, alpha=one, omega=one,
                  it=jnp.array(0, jnp.int32))

    def resrel(r):
        return cx.col_norms(r) / rscale

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
    xout = CX(st["x"].re * bn_true[None, :], st["x"].im * bn_true[None, :])
    return KrylovResult(xout, rel, st["it"], rel <= tol)


def bicgstab_rr(matvec: Callable[[CX], CX], B: CX, x0: Optional[CX] = None,
                tol: float = 1e-8, maxiter: int = 1000,
                M: Optional[Callable[[CX], CX]] = None,
                replace_every: int = 30) -> KrylovResult:
    """BiCGStab with residual replacement (van der Vorst / Ye "reliable
    updates"): restart from a freshly computed true residual b - A x every
    `replace_every` iterations.

    Plain BiCGStab's recursively-updated residual drifts from the true one
    by ~ eps * kappa(A) * growth over a long solve, so its ATTAINABLE
    accuracy stalls at eps*kappa even when the recursion reports
    convergence.  On TPU the f64 emulation is a double-f32 pair
    (eps ~ 2^-48), so an ill-conditioned shifted contour solve
    (kappa >= 1e5 at edge-of-spectrum slices) stalls around 1e-8 — above
    FEAST's 1e-10 target.  Restarting from the true residual resets the
    drift each pass; the attainable floor drops to ~ eps*||A||*||x||
    (direct-solve quality).  Each pass is bounded to `replace_every`
    iterations so the drift within a pass stays small; with an AMG
    preconditioner a pass converges in a handful of iterations, so the
    restart costs are negligible.  Also subsumes stale warm starts: x0
    only seeds the first pass's true residual.
    """
    n, m = B.shape
    dt = B.dtype
    bnorm = jnp.maximum(cx.col_norms(B), jnp.finfo(dt).tiny)
    x = cx.zeros((n, m), dt) if x0 is None else x0
    npass = max(1, -(-maxiter // replace_every))

    # while_loop over passes: ONE bicgstab graph compiled (an unrolled
    # python loop quadrupled remote-tunnel compile time), and passes stop
    # as soon as the inner recursion reports convergence — with
    # solve_iters=1000 defaults npass is ~34, and running them all would
    # waste ~2 block matvecs per converged pass (review r2).
    def cond(carry):
        _, _, k, rel = carry
        return (k < npass) & (jnp.max(rel) > tol)

    def one_pass(carry):
        x, it_total, k, _ = carry
        r = B - matvec(x)
        sol = bicgstab(matvec, r, x0=None, tol=tol,
                       maxiter=replace_every, M=M, bnorm=bnorm)
        return (x + sol.x, it_total + sol.iters, k + 1, sol.resnorm)

    x, it_total, _, _ = lax.while_loop(
        cond, one_pass,
        (x, jnp.array(0, jnp.int32), jnp.array(0, jnp.int32),
         jnp.full((m,), jnp.inf, dt)))
    # final TRUE relative residual, with the difference scaled to O(1)
    # BEFORE the norm: squaring ~1e-19 entries underflows the emulated
    # f64's f32 exponent range and under-reports the residual
    d = B - matvec(x)
    inv = 1.0 / bnorm
    rel = cx.col_norms(CX(d.re * inv[None, :], d.im * inv[None, :]))
    return KrylovResult(x, rel, it_total, rel <= tol)


def gmres(matvec: Callable[[CX], CX], B: CX, x0: Optional[CX] = None,
          tol: float = 1e-8, restart: int = 30, maxrestart: int = 20,
          M: Optional[Callable[[CX], CX]] = None) -> KrylovResult:
    """Restarted block-column GMRES(m): each column runs its own Arnoldi
    recurrence; the basis is batched over columns (n, m, restart).

    Memory: (restart+1) * n * m — keep `restart` modest for wide blocks.

    Columns are scaled to unit norm internally (see `bicgstab`: TPU's
    emulated f64 degrades to f32 grade once quantities underflow its f32
    exponent range).
    """
    n, m = B.shape
    dt = B.dtype
    ident = (lambda v: v) if M is None else M
    tiny = jnp.finfo(dt).tiny
    cn = cx.col_norms(B)
    bn_true = jnp.where(cn > tiny, cn, 1.0)  # zero column -> scale 1
    inv = 1.0 / bn_true
    B = CX(B.re * inv[None, :], B.im * inv[None, :])
    x = (cx.zeros((n, m), dt) if x0 is None
         else CX(x0.re * inv[None, :], x0.im * inv[None, :]))
    bnorm = jnp.ones((m,), dt)
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
        # least squares per column: H (k+1, k) y = beta e1 via complex
        # GIVENS QR — the numerically robust formulation (normal equations
        # H^H H square the Hessenberg conditioning; VERDICT r1)
        def solve_col(Hc_re, Hc_im, beta_c):
            from .lu import _get_row, _upper_solve_small

            R = CX(Hc_re, Hc_im)  # (k+1, k)
            g = CX(jnp.zeros((k + 1,), dt).at[0].set(beta_c),
                   jnp.zeros((k + 1,), dt))

            def rot(j, Rg):
                R, g = Rg
                a = CX(lax.dynamic_slice(R.re, (j, j), (1, 1))[0, 0],
                       lax.dynamic_slice(R.im, (j, j), (1, 1))[0, 0])
                b = CX(lax.dynamic_slice(R.re, (j + 1, j), (1, 1))[0, 0],
                       lax.dynamic_slice(R.im, (j + 1, j), (1, 1))[0, 0])
                rr = jnp.sqrt(cx.abs2(a) + cx.abs2(b))
                safe = rr > 0
                inv = jnp.where(safe, 1.0 / jnp.where(safe, rr, 1.0), 0.0)
                one = CX(jnp.ones((), dt), jnp.zeros((), dt))
                c = cx.where(safe, a.conj() * inv, one)
                s = b.conj() * inv
                ca = cx.where(safe, a * inv, one)
                cb = b * inv
                rowj, rowj1 = _get_row(R, j), _get_row(R, j + 1)
                new_j = c * rowj + s * rowj1
                new_j1 = ca * rowj1 - cb * rowj
                R = CX(lax.dynamic_update_slice(R.re, new_j.re[None], (j, 0)),
                       lax.dynamic_update_slice(R.im, new_j.im[None], (j, 0)))
                R = CX(
                    lax.dynamic_update_slice(R.re, new_j1.re[None], (j + 1, 0)),
                    lax.dynamic_update_slice(R.im, new_j1.im[None], (j + 1, 0)))
                gj = CX(lax.dynamic_slice(g.re, (j,), (1,))[0],
                        lax.dynamic_slice(g.im, (j,), (1,))[0])
                gj1 = CX(lax.dynamic_slice(g.re, (j + 1,), (1,))[0],
                         lax.dynamic_slice(g.im, (j + 1,), (1,))[0])
                ng_j = c * gj + s * gj1
                ng_j1 = ca * gj1 - cb * gj
                g = CX(lax.dynamic_update_slice(g.re, ng_j.re[None], (j,)),
                       lax.dynamic_update_slice(g.im, ng_j.im[None], (j,)))
                g = CX(lax.dynamic_update_slice(g.re, ng_j1.re[None], (j + 1,)),
                       lax.dynamic_update_slice(g.im, ng_j1.im[None], (j + 1,)))
                return R, g

            R, g = lax.fori_loop(0, k, rot, (R, g))
            y = _upper_solve_small(CX(R.re[:k, :k], R.im[:k, :k]),
                                   CX(g.re[:k, None], g.im[:k, None]))
            return y.re[:, 0], y.im[:, 0]

        y_re, y_im = jax.vmap(solve_col, in_axes=(2, 2, 0), out_axes=(1, 1))(
            H.re, H.im, beta)
        # x += sum_j V_j y_j
        hp = jax.lax.Precision.HIGHEST
        upd = CX(jnp.einsum("jnm,jm->nm", V.re[:k], y_re, precision=hp)
                 - jnp.einsum("jnm,jm->nm", V.im[:k], y_im, precision=hp),
                 jnp.einsum("jnm,jm->nm", V.re[:k], y_im, precision=hp)
                 + jnp.einsum("jnm,jm->nm", V.im[:k], y_re, precision=hp))
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
    xout = CX(x.re * bn_true[None, :], x.im * bn_true[None, :])
    return KrylovResult(xout, rel, it, rel <= tol)


def bicgstab_l(matvec: Callable[[CX], CX], B: CX, x0: Optional[CX] = None,
               ell: int = 2, tol: float = 1e-8, maxiter: int = 500,
               M: Optional[Callable[[CX], CX]] = None) -> KrylovResult:
    """BiCGStab(l) (Sleijpen-Fokkema) for a block of RHS — the method the
    reference actually calls (`bicgstabl`, nlfeast.jl:106,139,
    feast_experimental.jl:28).  The l-degree minimal-residual polynomial
    smooths BiCGStab's erratic convergence on complex/indefinite spectra.

    All columns advance together; per-column scalars are (m,) CX vectors;
    storage is two (l+1, n, m) stacks.  Right-preconditioned via M.
    maxiter counts BiCGStab(l) cycles (2*l matvecs each).

    Columns are scaled to unit norm internally (see `bicgstab`: TPU's
    emulated f64 degrades to f32 grade once quantities underflow its f32
    exponent range).
    """
    n, m = B.shape
    dt = B.dtype
    ident = (lambda v: v) if M is None else M
    mv = (lambda v: matvec(ident(v)))
    tiny = jnp.finfo(dt).tiny
    cn = cx.col_norms(B)
    bn_true = jnp.where(cn > tiny, cn, 1.0)  # zero column -> scale 1
    inv = 1.0 / bn_true
    B = CX(B.re * inv[None, :], B.im * inv[None, :])
    if x0 is not None:
        x0 = CX(x0.re * inv[None, :], x0.im * inv[None, :])
    # x0 lives in TRUE coordinates; the iteration accumulates increments in
    # the right-preconditioned variable, mapped back at the end.
    x_init = cx.zeros((n, m), dt) if x0 is None else x0
    x = cx.zeros((n, m), dt)
    r0 = B - matvec(x_init)
    bnorm = jnp.ones((m,), dt)
    rhat = r0
    one = CX(jnp.ones((m,), dt), jnp.zeros((m,), dt))
    zero_s = cx.zeros((m,), dt)

    def stack_set(S: CX, j, V: CX) -> CX:
        return CX(lax.dynamic_update_slice(S.re, V.re[None], (j, 0, 0)),
                  lax.dynamic_update_slice(S.im, V.im[None], (j, 0, 0)))

    def stack_get(S: CX, j) -> CX:
        return CX(lax.dynamic_slice(S.re, (j, 0, 0), (1, n, m))[0],
                  lax.dynamic_slice(S.im, (j, 0, 0), (1, n, m))[0])

    state0 = dict(
        x=x,
        rs=stack_set(cx.zeros((ell + 1, n, m), dt), 0, r0),
        us=cx.zeros((ell + 1, n, m), dt),
        rho0=one, alpha=zero_s, omega=one,
        it=jnp.array(0, jnp.int32),
    )

    def resrel(rs):
        return cx.col_norms(CX(rs.re[0], rs.im[0])) / bnorm

    def cond(st):
        return (jnp.max(resrel(st["rs"])) > tol) & (st["it"] < maxiter)

    def body(st):
        x, rs, us = st["x"], st["rs"], st["us"]
        rho0, alpha, omega = st["rho0"], st["alpha"], st["omega"]
        rho0 = CX(-(omega.re * rho0.re - omega.im * rho0.im),
                  -(omega.re * rho0.im + omega.im * rho0.re))

        # ---- BiCG part ----
        def bicg_step(j, carry):
            x, rs, us, rho0, alpha = carry
            rj = stack_get(rs, j)
            rho1 = cx.cdot_cols(rhat, rj)
            beta = _safe_div(alpha * rho1, rho0)
            rho0 = rho1

            def upd_u(i, us):
                ui = stack_get(us, i)
                ri = stack_get(rs, i)
                return stack_set(us, i, ri - cx.scale_cols(ui, beta))

            us = lax.fori_loop(0, j + 1, upd_u, us)
            uj = stack_get(us, j)
            us = stack_set(us, j + 1, mv(uj))
            gamma = cx.cdot_cols(rhat, stack_get(us, j + 1))
            alpha = _safe_div(rho0, gamma)

            def upd_r(i, rs):
                ri = stack_get(rs, i)
                ui1 = stack_get(us, i + 1)
                return stack_set(rs, i, ri - cx.scale_cols(ui1, alpha))

            rs = lax.fori_loop(0, j + 1, upd_r, rs)
            rs = stack_set(rs, j + 1, mv(stack_get(rs, j)))
            x = x + cx.scale_cols(stack_get(us, 0), alpha)
            return x, rs, us, rho0, alpha

        x, rs, us, rho0, alpha = lax.fori_loop(
            0, ell, bicg_step, (x, rs, us, rho0, alpha))

        # ---- MR part: min ||r_0 - sum_{j=1..l} g_j r_j|| per column ----
        # normal equations Z g = y with Z_ij = <r_i, r_j>, y_i = <r_i, r_0>
        Zre = jnp.zeros((ell, ell, m), dt)
        Zim = jnp.zeros((ell, ell, m), dt)
        Yre = jnp.zeros((ell, m), dt)
        Yim = jnp.zeros((ell, m), dt)
        for i_ in range(1, ell + 1):
            ri = CX(rs.re[i_], rs.im[i_])
            yi = cx.cdot_cols(ri, CX(rs.re[0], rs.im[0]))
            Yre = Yre.at[i_ - 1].set(yi.re)
            Yim = Yim.at[i_ - 1].set(yi.im)
            for j_ in range(1, ell + 1):
                zij = cx.cdot_cols(ri, CX(rs.re[j_], rs.im[j_]))
                Zre = Zre.at[i_ - 1, j_ - 1].set(zij.re)
                Zim = Zim.at[i_ - 1, j_ - 1].set(zij.im)
        # solve the tiny l x l complex system per column (vmapped closed LU)
        from . import lu as lumod

        def solve_col(zr, zi, yr, yi):
            sol = lumod.solve(CX(zr, zi), CX(yr[:, None], yi[:, None]),
                              block=ell)
            return sol.re[:, 0], sol.im[:, 0]

        g_re, g_im = jax.vmap(solve_col, in_axes=(2, 2, 1, 1),
                              out_axes=(1, 1))(Zre, Zim, Yre, Yim)
        g = CX(g_re, g_im)  # (l, m)

        # updates: x += sum g_j r_{j-1};  r_0 -= sum g_j r_j;  u_0 -= sum g_j u_j
        for j_ in range(1, ell + 1):
            gj = CX(g.re[j_ - 1], g.im[j_ - 1])
            x = x + cx.scale_cols(CX(rs.re[j_ - 1], rs.im[j_ - 1]), gj)
            r0n = CX(rs.re[0], rs.im[0]) - cx.scale_cols(
                CX(rs.re[j_], rs.im[j_]), gj)
            rs = stack_set(rs, 0, r0n)
            u0n = CX(us.re[0], us.im[0]) - cx.scale_cols(
                CX(us.re[j_], us.im[j_]), gj)
            us = stack_set(us, 0, u0n)
        omega = CX(g.re[ell - 1], g.im[ell - 1])
        return dict(x=x, rs=rs, us=us, rho0=rho0, alpha=alpha, omega=omega,
                    it=st["it"] + 1)

    st = lax.while_loop(cond, body, state0)
    xfin = x_init + (ident(st["x"]) if M is not None else st["x"])
    # recompute the true residual (the recursive one can drift)
    rel = cx.col_norms(B - matvec(xfin)) / bnorm
    xout = CX(xfin.re * bn_true[None, :], xfin.im * bn_true[None, :])
    return KrylovResult(xout, rel, st["it"], rel <= tol)
