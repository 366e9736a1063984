"""Research variants of the moment NLFEAST family.

TPU-native re-designs of the reference's experimental solvers:

* `nlfeast_moments_all` (nlfeast_experimental.jl:2-145): like
  `nlfeast_moments` but the RII update refines with the FULL K*m0 Ritz set
  (resolvent over all Ritz values, moment-split accumulation
  Q_j += z^{j-1} U[:, :m0], Q_{j+K} += z^{j-1+K} U[:, :m0]).

* `nlfeast_moments_ss` (nlfeast_experimental.jl:147-250): Sakurai-Sugiura
  style LEFT-projected Hankel pencils (X^H S blocks at startup, a fresh
  random probe each refinement iteration), rank cut sigma/sigma1 > 1e-13,
  eigenvectors through the first K moment blocks.  The reference's
  `Temp`-used-before-assignment bug (nlfeast_experimental.jl:210-212) is
  fixed here: the update is applied to the solve output before accumulation.

* `nlfeast_rr` — the ggev-path NLFEAST the reference EXPORTS but never
  includes (`nlfeast_opt!` exported at FEASTSolver.jl:15, file missing from
  the include list at :22-31, so calling it throws UndefVarError).  This is
  that capability, wired correctly: X^H-projected Rayleigh-Ritz pencils
  (X^H Q1, X^H Q0) solved by the generalized eigensolver instead of the SVD
  extraction (nlfeast_lapack.jl:27-31,50-54), plus a proper residual-based
  stop the reference lacked.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import contour as ct
from .. import cx
from ..cx import CX
from .. import nep as nepmod
from ..ops import eig as eigmod
from ..ops import lu as lumod
from ..ops import svd as svdmod
from .feast import _in_mask
from .nlfeast import (NlfeastResult, _dbg, _residuals, _scaled, _stop,
                      _unscale, beyn_svd_extract)


def _setup(T, X0, nodes, c, r, contour):
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X = X0 if isinstance(X0, CX) else cx.from_numpy(np.asarray(X0), dtype)
    n, m0 = X.shape
    T = nepmod.as_nep(T, n=n, dtype=dtype)
    if isinstance(T, nepmod.CallableNEP):
        raise TypeError("moment solvers need an SPMF/polynomial NEP")
    if contour is None:
        contour = ct.circular_contour_trapezoidal(complex(c), float(r), nodes)
    z = contour.device_nodes(dtype)
    w = contour.device_weights(dtype)
    LUb, permb = jax.jit(lumod.lu_factor_batched)(T.eval_nodes(z))
    return T, X, n, m0, dtype, contour, z, w, LUb, permb


def _zpow_scale(term: CX, zi: CX, count: int, start: int = 0):
    """[term * z^(start), ..., term * z^(start+count-1)] stacked."""
    out = []
    zp = cx.cpow_scalar(CX(jnp.asarray(zi.re), jnp.asarray(zi.im)), start) \
        if start else CX(jnp.ones((), term.dtype), jnp.zeros((), term.dtype))
    m = term.shape[1]
    for _ in range(count):
        out.append(cx.scale_cols(term, CX(jnp.broadcast_to(zp.re, (m,)),
                                          jnp.broadcast_to(zp.im, (m,)))))
        zp = zp * CX(zi.re, zi.im)
    return cx.stack(out, axis=0)


# ---------------------------------------------------------------------------
# nlfeast_moments_all
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("K", "kind", "params",
                                             "first", "scale"))
def _moments_all_step(T, LUb, permb, z, zeta, w, X: CX, Y: CX, R: CX, lam: CX,
                      K: int, kind: str, params, scale, first: bool):
    n, m0 = X.shape

    def one_node(LU, perm, zi, zetai, wi):
        if first:
            Tinv = lumod.lu_solve(LU, perm, X)
            term = cx.scale_cols(Tinv, CX(jnp.broadcast_to(wi.re, (m0,)),
                                          jnp.broadcast_to(wi.im, (m0,))))
            return _zpow_scale(term, zetai, 2 * K)
        # full-width RII: solve against all K*m0 residual columns
        Tinv = lumod.lu_solve(LU, perm, R)
        resv = cx.cdiv(CX(jnp.broadcast_to(wi.re, lam.shape),
                          jnp.broadcast_to(wi.im, lam.shape)),
                       CX(zi.re - lam.re, zi.im - lam.im))
        Rtemp = cx.scale_cols(Y - Tinv, resv)
        lead = CX(Rtemp.re[:, :m0], Rtemp.im[:, :m0])
        # moment-split accumulation (nlfeast_experimental.jl:95-100),
        # centered-scaled powers (see nlfeast._scaled)
        low = _zpow_scale(lead, zetai, K)          # zeta^0 .. zeta^{K-1}
        high = _zpow_scale(lead, zetai, K, start=K)  # zeta^K .. zeta^{2K-1}
        return cx.concatenate([low, high], axis=0)

    stacks = jax.vmap(one_node)(LUb, permb, z, zeta, w)
    Qm = CX(jnp.sum(stacks.re, 0), jnp.sum(stacks.im, 0))
    from .nlfeast import _hankel
    Q0, Q1 = _hankel(Qm, K, n, m0)
    mu, Ynew = beyn_svd_extract(Q0, Q1, top_rows=n)
    lam_new = _unscale(mu, scale)
    Ynew, Rnew, res = _residuals(T, Ynew, lam_new)
    p = jnp.argsort(res)
    res = res[p]
    lam_new = CX(lam_new.re[p], lam_new.im[p])
    Ynew = cx.take_cols(Ynew, p)
    Rnew = cx.take_cols(Rnew, p)
    X_new = CX(Ynew.re[:, :m0], Ynew.im[:, :m0])
    inside = _in_mask(lam_new, kind, params)
    return X_new, Ynew, Rnew, lam_new, res, inside


def nlfeast_moments_all(T, X0, nodes: int = 16, iters: int = 10, *,
                        moments: int = 2, c: complex = 0.0 + 0.0j,
                        r: float = 1.0, contour: Optional[ct.Contour] = None,
                        tol: float = 1e-11, spurious: float = 1e-5,
                        debug: bool = False) -> NlfeastResult:
    T, X, n, m0, dtype, contour, z, w, LUb, permb = _setup(
        T, X0, nodes, c, r, contour)
    K = int(moments)
    Y = cx.zeros((n, K * m0), dtype)
    R = cx.zeros((n, K * m0), dtype)
    lam = cx.zeros((K * m0,), dtype)
    res = inside = None
    n_iter, converged = 0, False
    for nit in range(iters + 1):
        n_iter = nit
        zeta, scale = _scaled(contour, z)
        X, Y, R, lam, res, inside = _moments_all_step(
            T, LUb, permb, z, zeta, w, X, Y, R, lam, K,
            contour.kind, contour.params, scale, nit == 0)
        res_h, inside_h = np.asarray(res), np.asarray(inside)
        if debug:
            _dbg(nit, res_h, inside_h, spurious)
        if _stop(nit, res_h, inside_h, tol, spurious):
            converged = True
            break
    return NlfeastResult(lam, cx.normalize_cols(Y), res, inside, n_iter,
                         converged)


# ---------------------------------------------------------------------------
# nlfeast_moments_ss
# ---------------------------------------------------------------------------

def _ss_extract(T, Sm: CX, probe: CX, K: int, m0: int, kind, params,
                shift: int, scale=(0.0, 0.0, 1.0), rank_tol: float = 1e-13):
    """Left-projected Hankel extraction shared by both SS phases.

    Sm: (2K+1, n, m0) moment stack; probe: (n, m0) left probe block;
    shift: moment offset of the Hankel blocks (1 at startup, 0 in
    refinement — matching nlfeast_experimental.jl:175-178 vs :210-216)."""
    proj = [cx.cmatmul(probe.H, CX(Sm.re[j], Sm.im[j]))
            for j in range(2 * K + 1)]
    rows0 = [cx.concatenate([proj[i + j + shift] for j in range(K)], axis=1)
             for i in range(K)]
    rows1 = [cx.concatenate([proj[i + j + shift + 1] for j in range(K)], axis=1)
             for i in range(K)]
    Q0 = cx.concatenate(rows0, axis=0)
    Q1 = cx.concatenate(rows1, axis=0)
    U, s, Vh = svdmod.svd(Q0)
    keep = s / jnp.maximum(s[0], jnp.finfo(s.dtype).tiny) > rank_tol
    V = Vh.H
    H1 = cx.cmatmul(U.H, cx.cmatmul(Q1, V))
    H0 = cx.cmatmul(U.H, cx.cmatmul(Q0, V))
    km = H0.shape[0]
    dmask = keep.astype(s.dtype)
    omask = dmask[:, None] * dmask[None, :]
    eye = jnp.eye(km, dtype=s.dtype)
    far = 1e8
    H0 = CX(H0.re * omask + (1.0 - dmask) * eye, H0.im * omask)
    H1 = CX(H1.re * omask + (1.0 - dmask) * eye * far, H1.im * omask)
    mu, Xq = eigmod.gen_eig(H1, H0)
    lam = _unscale(mu, scale)
    Sflat = cx.concatenate([CX(Sm.re[j], Sm.im[j]) for j in range(K)], axis=1)
    Yout = cx.cmatmul(Sflat, cx.cmatmul(V, Xq))
    Yout, Rfull, res = _residuals(T, Yout, lam)
    p = jnp.argsort(res)
    return (CX(lam.re[p], lam.im[p]), cx.take_cols(Yout, p),
            cx.take_cols(Rfull, p), res[p])


@functools.partial(jax.jit, static_argnames=("K", "kind", "params",
                                             "first", "scale"))
def _ss_step(T, LUb, permb, z, zeta, w, X: CX, R: CX, lam_m0: CX, probe: CX,
             K: int, kind: str, params, scale, first: bool):
    n, m0 = X.shape

    def one_node(LU, perm, zi, zetai, wi):
        if first:
            Tinv = lumod.lu_solve(LU, perm, X)
            term = cx.scale_cols(Tinv, CX(jnp.broadcast_to(wi.re, (m0,)),
                                          jnp.broadcast_to(wi.im, (m0,))))
        else:
            Tinv = lumod.lu_solve(LU, perm, R)
            resv = cx.cdiv(CX(jnp.broadcast_to(wi.re, (m0,)),
                              jnp.broadcast_to(wi.im, (m0,))),
                           CX(zi.re - lam_m0.re, zi.im - lam_m0.im))
            term = cx.scale_cols(X - Tinv, resv)
        return _zpow_scale(term, zetai, 2 * K + 1)

    stacks = jax.vmap(one_node)(LUb, permb, z, zeta, w)
    Sm = CX(jnp.sum(stacks.re, 0), jnp.sum(stacks.im, 0))
    shift = 1 if first else 0
    lam, Y, Rf, res = _ss_extract(T, Sm, probe, K, m0, kind, params, shift,
                                  scale)
    X_new = CX(Y.re[:, :m0], Y.im[:, :m0])
    R_new = CX(Rf.re[:, :m0], Rf.im[:, :m0])
    lam_new = CX(lam.re[:m0], lam.im[:m0])
    inside = _in_mask(lam, kind, params)
    return X_new, R_new, lam_new, lam, Y, res, inside


def nlfeast_moments_ss(T, X0, nodes: int = 16, iters: int = 10, *,
                       moments: int = 2, c: complex = 0.0 + 0.0j,
                       r: float = 1.0, contour: Optional[ct.Contour] = None,
                       tol: float = 1e-11, spurious: float = 1e-5,
                       seed: int = 0, debug: bool = False) -> NlfeastResult:
    T, X, n, m0, dtype, contour, z, w, LUb, permb = _setup(
        T, X0, nodes, c, r, contour)
    K = int(moments)
    rng = np.random.default_rng(seed)
    R = cx.zeros((n, m0), dtype)
    lam_m0 = cx.zeros((m0,), dtype)
    lam_all = Y = res = inside = None
    n_iter, converged = 0, False
    for nit in range(iters + 1):
        n_iter = nit
        # startup projects on X itself; refinement draws a fresh random
        # probe each iteration (nlfeast_experimental.jl:204)
        probe = X if nit == 0 else cx.from_numpy(
            rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0)),
            dtype)
        zeta, scale = _scaled(contour, z)
        X, R, lam_m0, lam_all, Y, res, inside = _ss_step(
            T, LUb, permb, z, zeta, w, X, R, lam_m0, probe, K,
            contour.kind, contour.params, scale, nit == 0)
        res_h, inside_h = np.asarray(res)[:m0], np.asarray(inside)[:m0]
        if debug:
            _dbg(nit, res_h, inside_h, spurious)
        if _stop(nit, res_h, inside_h, tol, spurious):
            converged = True
            break
    return NlfeastResult(lam_all, cx.normalize_cols(Y), res, inside, n_iter,
                         converged)


# ---------------------------------------------------------------------------
# nlfeast_rr (the fixed nlfeast_opt!)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("kind", "params", "first",
                                             "scale"))
def _rr_step(T, LUb, permb, z, zeta, w, X: CX, R: CX, lam: CX,
             kind: str, params, scale, first: bool):
    n, m0 = X.shape

    def one_node(LU, perm, zi, zetai, wi):
        if first:
            Tinv = lumod.lu_solve(LU, perm, X)
            term = cx.scale_cols(Tinv, CX(jnp.broadcast_to(wi.re, (m0,)),
                                          jnp.broadcast_to(wi.im, (m0,))))
        else:
            Tinv = lumod.lu_solve(LU, perm, R)
            resv = cx.cdiv(CX(jnp.broadcast_to(wi.re, (m0,)),
                              jnp.broadcast_to(wi.im, (m0,))),
                           CX(zi.re - lam.re, zi.im - lam.im))
            term = cx.scale_cols(X - Tinv, resv)
        return _zpow_scale(term, zetai, 2)

    stacks = jax.vmap(one_node)(LUb, permb, z, zeta, w)
    Q0 = CX(stacks.re[:, 0].sum(0), stacks.im[:, 0].sum(0))
    Q1 = CX(stacks.re[:, 1].sum(0), stacks.im[:, 1].sum(0))
    # X^H-projected pencil + generalized eig (nlfeast_lapack.jl:27-31)
    Aq = cx.cmatmul(X.H, Q1)
    Bq = cx.cmatmul(X.H, Q0)
    mu, Vr = eigmod.gen_eig(Aq, Bq)
    lam_new = _unscale(mu, scale)
    X_new = cx.cmatmul(Q0, Vr)
    X_new, R_new, res = _residuals(T, X_new, lam_new)
    inside = _in_mask(lam_new, kind, params)
    return X_new, R_new, lam_new, res, inside


def nlfeast_rr(T, X0, nodes: int = 16, iters: int = 10, *,
               c: complex = 0.0 + 0.0j, r: float = 1.0,
               contour: Optional[ct.Contour] = None, tol: float = 1e-11,
               spurious: float = 1e-5, debug: bool = False) -> NlfeastResult:
    """NLFEAST with projected-pencil (ggev-style) extraction — the
    reference's orphaned `nlfeast_opt!`, made callable and convergent."""
    T, X, n, m0, dtype, contour, z, w, LUb, permb = _setup(
        T, X0, nodes, c, r, contour)
    R = cx.zeros((n, m0), dtype)
    lam = cx.zeros((m0,), dtype)
    res = inside = None
    n_iter, converged = 0, False
    for nit in range(iters + 1):
        n_iter = nit
        zeta, scale = _scaled(contour, z)
        X, R, lam, res, inside = _rr_step(
            T, LUb, permb, z, zeta, w, X, R, lam,
            contour.kind, contour.params, scale, nit == 0)
        res_h, inside_h = np.asarray(res), np.asarray(inside)
        if debug:
            _dbg(nit, res_h, inside_h, spurious)
        if _stop(nit, res_h, inside_h, tol, spurious):
            converged = True
            break
    return NlfeastResult(lam, cx.normalize_cols(X), res, inside, n_iter,
                         converged)
