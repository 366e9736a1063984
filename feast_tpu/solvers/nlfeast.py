"""Nonlinear FEAST: contour-moment solvers with RII refinement.

TPU-native re-design of the reference's `nlfeast!` (nlfeast.jl:2-84) and
`nlfeast_moments!` (nlfeast.jl:173-318):

  * the threaded node loop + ReentrantLock accumulation (nlfeast.jl:36-61)
    becomes a batched solve over a leading node axis followed by a sum (a
    psum over the `node` mesh axis when sharded);
  * the first iteration applies the plain moment filter T(z)^{-1} X w_i
    (nlfeast.jl:39-45), later iterations the RII form
    (X - T(z)^{-1} R) diag(w_i/(z_i - lam)) (nlfeast.jl:46-55);
  * extraction is the Beyn SVD step (utils.jl:69-77): SVD(Q0), project Q1,
    eig of the small matrix, X = U * vectors;
  * the moments variant accumulates 2K moments Q_j += Tinv z^{j-1}
    (nlfeast.jl:208-211), assembles block-Hankel pencils (nlfeast.jl:213-216)
    and keeps the residual-sorted top m0 of the K*m0 Ritz pairs for the next
    update (utils.jl:118-134, nlfeast.jl:229-230);
  * two-tier stopping (nlfeast.jl:73-79): all-inside < tol, or after iter 1
    the non-spurious subset (res < spurious) < tol;
  * unlike the reference (hardcoded trapezoid circle via theta grid,
    nlfeast.jl:8) these drivers accept any `Contour` — the weights already
    absorb dz/(2 pi i).

T is an SPMF/PolynomialNEP (fully jitted residuals) or a host callable
(reference-parity mode; residuals loop on host).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import contour as ct
from .. import cx
from ..cx import CX
from .. import nep as nepmod
from ..ops import eig as eigmod
from ..ops import lu as lumod
from ..ops import qr as qrmod
from ..ops import svd as svdmod
from .feast import _in_mask


class NlfeastResult(NamedTuple):
    lam: CX
    X: CX
    res: jax.Array
    inside: jax.Array
    n_iter: int
    converged: bool

    def filtered(self, spurious: Optional[float] = None):
        mask = np.asarray(self.inside)
        if spurious is not None:
            mask = mask & (np.asarray(self.res) < spurious)
        return (cx.to_numpy(self.lam)[mask], cx.to_numpy(self.X)[:, mask],
                np.asarray(self.res)[mask])


def beyn_svd_extract(Q0: CX, Q1: CX, top_rows: Optional[int] = None,
                     rank_tol: float = 1e-13):
    """Beyn SVD extraction (utils.jl:69-77): returns (lam, X).

    X = U @ eigvecs(U^H Q1 V diag(1/s)); if top_rows is given, only the
    first `top_rows` rows of U form X (block-Hankel case, nlfeast.jl:223).

    Unlike the reference (raw `Diagonal(1 ./ S.S)`, utils.jl:73), directions
    with s < rank_tol * s_max are DEFLATED with static shapes: their rows and
    columns of the projected matrix are zeroed and the diagonal set to a
    far-away value.  Without this, a rank-deficient Q0 (search space wider
    than the filtered spectrum — routine for block-Hankel) injects
    1/eps-scale noise directions whose norm destroys the absolute accuracy
    of the small Schur eigenproblem, wiping out the true eigenvalues.
    """
    U, s, Vh = svdmod.svd(Q0)
    eps = jnp.finfo(s.dtype).eps
    keep = s > jnp.maximum(s[0], eps) * rank_tol
    s_safe = jnp.where(keep, s, 1.0)
    M = cx.cmatmul(U.H, cx.cmatmul(Q1, Vh.H))
    M = CX(M.re / s_safe[None, :], M.im / s_safe[None, :])
    kmask = keep.astype(s.dtype)
    omask = kmask[:, None] * kmask[None, :]
    far = 1e3  # far outside any sane (scaled) contour
    eye = jnp.eye(M.shape[0], dtype=s.dtype)
    M = CX(M.re * omask + (1.0 - kmask) * eye * far, M.im * omask)
    lam, W = eigmod.eig(M)
    Utop = U if top_rows is None else CX(U.re[:top_rows], U.im[:top_rows])
    X = cx.cmatmul(Utop, W)
    return lam, X


def _residuals(T, X: CX, lam: CX):
    """Normalized columns + relative residuals res = ||T(lam)x|| / ||T(lam)||
    (utils.jl:104-109, :151-157)."""
    X = cx.normalize_cols(X)
    R = T.apply_cols(X, lam)
    res = cx.col_norms(R) / jnp.maximum(T.fro_norms(lam), jnp.finfo(R.dtype).tiny)
    return X, R, res


# ---------------------------------------------------------------------------
# moment scaling
# ---------------------------------------------------------------------------
#
# All moment solvers accumulate powers of the CENTERED-SCALED node
# zeta = (z - c)/r instead of the raw z the reference uses
# (nlfeast.jl:208-211).  Mathematically equivalent — the Hankel pencil then
# yields mu = (lam - c)/r and we map back lam = c + r mu — but numerically
# essential: for contours like loaded_string's (c=800, r=790) raw z^5 is
# ~1e16 and the block-Hankel conditioning collapses.  With zeta all moments
# are O(1) regardless of where the contour sits in the plane.

def _scaled(contour: ct.Contour, z: CX):
    c = complex(contour.center)
    r = float(contour.radius) or 1.0
    zeta = CX((z.re - c.real) / r, (z.im - c.imag) / r)
    return zeta, (c.real, c.imag, r)


def _unscale(mu: CX, scale) -> CX:
    c_re, c_im, r = scale
    return CX(c_re + r * mu.re, c_im + r * mu.im)


# ---------------------------------------------------------------------------
# nlfeast (single-moment Beyn extraction)
# ---------------------------------------------------------------------------

def _node_terms(T, LUb, permb, z, zeta, w, X, R, lam, first: bool,
                mixed: bool, refine: int = 2):
    """Partial moment sums (Q0, Q1) over a batch of nodes.

    mixed: f32 LU solve + f64 iterative refinement with the residual
    applied in SPMF form (no per-node f64 matrix kept — the memory/speed
    path for reference-scale problems, e.g. gun at N=9956 x 16 nodes)."""

    def node_solve(LU, perm, zi, Bmat):
        if not mixed:
            return lumod.lu_solve(LU, perm, Bmat)
        t = lumod.lu_solve(LU, perm, Bmat.astype(jnp.float32)).astype(
            Bmat.dtype)
        for _ in range(refine):
            resid = Bmat - T.apply_block(CX(zi.re, zi.im), t)
            t = t + lumod.lu_solve(LU, perm,
                                   resid.astype(jnp.float32)).astype(
                Bmat.dtype)
        return t

    def one_node(LU, perm, zi, zetai, wi):
        if first:
            Tinv = node_solve(LU, perm, zi, X)
            term = cx.scale_cols(Tinv, CX(jnp.broadcast_to(wi.re, (X.shape[1],)),
                                          jnp.broadcast_to(wi.im, (X.shape[1],))))
        else:
            Tinv = node_solve(LU, perm, zi, R)
            resv = cx.cdiv(CX(jnp.broadcast_to(wi.re, lam.shape),
                              jnp.broadcast_to(wi.im, lam.shape)),
                           CX(zi.re - lam.re, zi.im - lam.im))
            term = cx.scale_cols(X - Tinv, resv)
        q0 = term
        q1 = cx.scale_cols(term, CX(jnp.broadcast_to(zetai.re, (X.shape[1],)),
                                    jnp.broadcast_to(zetai.im, (X.shape[1],))))
        return q0, q1

    q0s, q1s = jax.vmap(one_node)(LUb, permb, z, zeta, w)
    Q0 = CX(jnp.sum(q0s.re, 0), jnp.sum(q0s.im, 0))
    Q1 = CX(jnp.sum(q1s.re, 0), jnp.sum(q1s.im, 0))
    return Q0, Q1


@functools.partial(jax.jit, static_argnames=("kind", "params", "first",
                                             "scale", "mixed", "refine"))
def _nlfeast_step(T, LUb, permb, z: CX, zeta: CX, w: CX, X: CX, R: CX,
                  lam: CX, kind: str, params, scale, first: bool,
                  mixed: bool = False, refine: int = 2):
    Q0, Q1 = _node_terms(T, LUb, permb, z, zeta, w, X, R, lam, first, mixed,
                         refine)
    return _extract(T, Q0, Q1, kind, params, scale)


# store=False path, TWO jit units per chunk: evaluate+factor, then
# solve+accumulate.  Peak memory is one chunk's factorization instead of
# all N nodes (reference store flag semantics, nlfeast.jl:17-28; mandatory
# at gun scale on a 16 GB chip).  Kept as SEPARATE programs on purpose: a
# single fused chunk graph gives the XLA scheduler panel-loop live ranges
# it cannot compact (observed 54 GB of HLO temps at n=9956).

@functools.partial(jax.jit, static_argnames=("mixed",))
def _chunk_eval(T, z_c: CX, mixed: bool):
    return T.eval_nodes(z_c, out_dtype=jnp.float32 if mixed else None)


@jax.jit
def _chunk_lu(Tz: CX):
    return lumod.lu_factor_batched(Tz)


def _chunk_factor(T, z_c: CX, mixed: bool):
    # two programs on purpose: evaluating next to the coefficient stack
    # and factoring next to the LU workspace in ONE program doubles the
    # peak (the 16 GB chip is the binding constraint at gun scale)
    return _chunk_lu(_chunk_eval(T, z_c, mixed))


@jax.jit
def _chunk_solve_shared(LUb, permb, Bm: CX) -> CX:
    """All chunk nodes solve against the SAME right-hand side block."""
    out = jax.vmap(lambda LU, p: lumod.lu_solve(LU, p,
                                                Bm.astype(LUb.dtype)))(
        LUb, permb)
    return out.astype(Bm.dtype)


@jax.jit
def _chunk_solve_each(LUb, permb, Bc: CX) -> CX:
    """Per-node right-hand sides (the iterative-refinement corrections)."""
    out = jax.vmap(lambda LU, p, Bm: lumod.lu_solve(LU, p,
                                                    Bm.astype(LUb.dtype)))(
        LUb, permb, Bc)
    return out.astype(Bc.dtype)


@jax.jit
def _chunk_resid(T, z_c: CX, t: CX, Bm: CX) -> CX:
    return jax.vmap(lambda zr, zi_, ti: Bm - T.apply_block(CX(zr, zi_), ti))(
        z_c.re, z_c.im, t)


@functools.partial(jax.jit, static_argnames=("first",))
def _chunk_terms_post(t: CX, z_c: CX, zeta_c: CX, w_c: CX, X: CX, lam: CX,
                      first: bool):
    def one(ti, zi, zetai, wi):
        if first:
            term = cx.scale_cols(ti, CX(jnp.broadcast_to(wi.re, (X.shape[1],)),
                                        jnp.broadcast_to(wi.im, (X.shape[1],))))
        else:
            resv = cx.cdiv(CX(jnp.broadcast_to(wi.re, lam.shape),
                              jnp.broadcast_to(wi.im, lam.shape)),
                           CX(zi.re - lam.re, zi.im - lam.im))
            term = cx.scale_cols(X - ti, resv)
        q1 = cx.scale_cols(term, CX(jnp.broadcast_to(zetai.re, (X.shape[1],)),
                                    jnp.broadcast_to(zetai.im, (X.shape[1],))))
        return term, q1

    q0s, q1s = jax.vmap(one)(t, z_c, zeta_c, w_c)
    return (CX(jnp.sum(q0s.re, 0), jnp.sum(q0s.im, 0)),
            CX(jnp.sum(q1s.re, 0), jnp.sum(q1s.im, 0)))


def _nlfeast_chunk(T, z_c: CX, zeta_c: CX, w_c: CX, X: CX, R: CX, lam: CX,
                   first: bool, mixed: bool, refine: int = 2):
    """store=False chunk pipeline, HOST-composed from small programs:
    evaluate -> factor -> solve (+ iterative refinement) -> term sums.

    Deliberately NOT one fused jit: at gun scale (n=9956 on a 15.75 GB
    v5e) any mega-graph over the chunk gives the XLA scheduler live ranges
    it cannot compact (observed 41-54 GB of HLO temps across three
    formulations); five small programs with persistent arguments peak
    under the chip's HBM, and every shape is reused across chunks and
    iterations so the per-program dispatch cost amortizes."""
    LUb, permb = _chunk_factor(T, z_c, mixed)
    Bm = X if first else R
    t = _chunk_solve_shared(LUb, permb, Bm)
    if mixed:
        for _ in range(refine):
            r = _chunk_resid(T, z_c, t, Bm)
            t = t + _chunk_solve_each(LUb, permb, r)
    return _chunk_terms_post(t, z_c, zeta_c, w_c, X, lam, first)


@functools.partial(jax.jit, static_argnames=("kind", "params", "scale"))
def _extract(T, Q0: CX, Q1: CX, kind: str, params, scale):
    mu, Xn = beyn_svd_extract(Q0, Q1)
    lam_new = _unscale(mu, scale)
    Xn, Rn, res = _residuals(T, Xn, lam_new)
    inside = _in_mask(lam_new, kind, params)
    return Xn, Rn, lam_new, res, inside


def _stop(nit, res_h, inside_h, tol, spurious):
    """Two-tier stopping decision (nlfeast.jl:73-79)."""
    if inside_h.any():
        res_in = res_h[inside_h]
        if res_in.max() < tol:
            return True
        if nit > 1:
            non_spur = res_in[res_in < spurious]
            if len(non_spur) > 0 and non_spur.max() < tol:
                return True
    return False


def nlfeast(T, X0, nodes: int = 16, iters: int = 10, *,
            c: complex = 0.0 + 0.0j, r: float = 1.0,
            contour: Optional[ct.Contour] = None, tol: float = 1e-11,
            spurious: float = 1e-5, mixed_prec: bool = False,
            store: bool = True, factor_chunk: int = 4,
            debug: bool = False) -> NlfeastResult:
    """Nonlinear FEAST (nlfeast!, nlfeast.jl:2-84).

    T: SPMF/PolynomialNEP, coefficient list, or callable z -> matrix.
    X0: (n, m0) initial subspace (in/out, warm-restartable).

    mixed_prec (SPMF T only): factor the node matrices in f32 pairs and
    recover f64 accuracy by iterative refinement with the residual applied
    in SPMF form (d GEMMs; no per-node f64 matrix is ever stored).  This
    is 16x faster LU on TPU (f64 is emulated) and halves the dominant
    memory term.  Node matrices are evaluated and factored in
    `factor_chunk`-node chunks to bound the f64 evaluation peak.

    store=False (reference store flag, nlfeast.jl:17-28): do NOT keep the
    N-node factorization — re-evaluate/factor/solve `factor_chunk` nodes
    at a time every iteration.  Peak memory drops from O(N n^2) to
    O(factor_chunk n^2): with mixed_prec this fits gun at N=9956 x 16
    nodes on a 16 GB chip (batched f32 LU is cheap on the MXU, so
    refactoring costs seconds per iteration).
    """
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X = X0 if isinstance(X0, CX) else cx.from_numpy(np.asarray(X0), dtype)
    n, m0 = X.shape
    T = nepmod.as_nep(T, n=n, dtype=dtype)
    host_mode = isinstance(T, nepmod.CallableNEP)
    if mixed_prec and host_mode:
        raise ValueError("mixed_prec needs an SPMF/polynomial T (the "
                         "refinement residual is applied in SPMF form)")
    if not store and host_mode:
        raise ValueError("store=False needs an SPMF/polynomial T")
    if contour is None:
        contour = ct.circular_contour_trapezoidal(complex(c), float(r), nodes)
    z = contour.device_nodes(dtype)
    w = contour.device_weights(dtype)
    N_nodes = len(contour)
    if not store:
        LUb = permb = None
    elif mixed_prec:
        factor = jax.jit(lumod.lu_factor_batched)
        LU_parts, perm_parts = [], []
        for i0 in range(0, N_nodes, factor_chunk):
            zi = CX(z.re[i0:i0 + factor_chunk], z.im[i0:i0 + factor_chunk])
            LUi, permi = factor(T.eval_nodes(zi, out_dtype=jnp.float32))
            LU_parts.append(LUi)
            perm_parts.append(permi)
        LUb = CX(jnp.concatenate([p.re for p in LU_parts]),
                 jnp.concatenate([p.im for p in LU_parts]))
        permb = jnp.concatenate(perm_parts)
    else:
        Tz = T.eval_nodes(z)
        LUb, permb = jax.jit(lumod.lu_factor_batched)(Tz)
    X, _ = qrmod.cholqr2(X)  # reference: X .= Matrix(qr!(X).Q), nlfeast.jl:12-13

    lam = cx.zeros((m0,), dtype)
    R = cx.zeros((n, m0), dtype)
    res = inside = None
    n_iter, converged = 0, False
    for nit in range(iters + 1):
        n_iter = nit
        if host_mode:
            X, R, lam, res, inside = _nlfeast_step_host(
                T, LUb, permb, z, w, X, R, lam, contour, nit == 0)
        else:
            zeta, scale = _scaled(contour, z)
            if store:
                X, R, lam, res, inside = _nlfeast_step(
                    T, LUb, permb, z, zeta, w, X, R, lam,
                    contour.kind, contour.params, scale, nit == 0,
                    bool(mixed_prec))
            else:
                Q0 = cx.zeros((n, m0), dtype)
                Q1 = cx.zeros((n, m0), dtype)
                for i0 in range(0, N_nodes, factor_chunk):
                    sl = slice(i0, i0 + factor_chunk)
                    q0, q1 = _nlfeast_chunk(
                        T, CX(z.re[sl], z.im[sl]),
                        CX(zeta.re[sl], zeta.im[sl]),
                        CX(w.re[sl], w.im[sl]), X, R, lam, nit == 0,
                        bool(mixed_prec))
                    Q0 = Q0 + q0
                    Q1 = Q1 + q1
                X, R, lam, res, inside = _extract(
                    T, Q0, Q1, contour.kind, contour.params, scale)
        res_h, inside_h = np.asarray(res), np.asarray(inside)
        if debug:
            _dbg(nit, res_h, inside_h, spurious)
        if _stop(nit, res_h, inside_h, tol, spurious):
            converged = True
            break
    X = cx.normalize_cols(X)
    return NlfeastResult(lam, X, res, inside, n_iter, converged)


def _nlfeast_step_host(T, LUb, permb, z, w, X, R, lam, contour, first):
    """Host-residual variant for CallableNEP (reference parity mode)."""
    def one_node(LU, perm, zi, wi):
        if first:
            Tinv = lumod.lu_solve(LU, perm, X)
            return cx.scale_cols(Tinv, CX(jnp.broadcast_to(wi.re, (X.shape[1],)),
                                          jnp.broadcast_to(wi.im, (X.shape[1],))))
        Tinv = lumod.lu_solve(LU, perm, R)
        resv = cx.cdiv(CX(jnp.broadcast_to(wi.re, lam.shape),
                          jnp.broadcast_to(wi.im, lam.shape)),
                       CX(zi.re - lam.re, zi.im - lam.im))
        return cx.scale_cols(X - Tinv, resv)

    terms = jax.vmap(one_node)(LUb, permb, z, w)
    Q0 = CX(jnp.sum(terms.re, 0), jnp.sum(terms.im, 0))
    # centered-scaled first moment (same conditioning fix as the SPMF path)
    zeta, scale = _scaled(contour, z)
    zb = CX(zeta.re[:, None, None], zeta.im[:, None, None])
    q1 = CX(terms.re * zb.re - terms.im * zb.im,
            terms.re * zb.im + terms.im * zb.re)
    Q1 = CX(jnp.sum(q1.re, 0), jnp.sum(q1.im, 0))
    mu, Xn = beyn_svd_extract(Q0, Q1)
    lam_new = _unscale(mu, scale)
    Xn = cx.normalize_cols(Xn)
    Xh, lamh = cx.to_numpy(Xn), cx.to_numpy(lam_new)
    Rh = T.host_apply_cols(Xh, lamh)
    resh = np.linalg.norm(Rh, axis=0) / np.maximum(T.host_fro_norms(lamh), 1e-300)
    Rn = cx.from_numpy(Rh, Xn.dtype)
    inside = np.asarray(ct.in_contour(lamh, contour))
    return Xn, Rn, lam_new, jnp.asarray(resh), jnp.asarray(inside)


def _dbg(nit, res, inside, spurious):
    n_in = int(inside.sum())
    if n_in:
        ri = res[inside]
        ns = ri[ri < spurious]
        extra = f" ({ns.max():.3e})" if len(ns) else ""
        print(f"{nit}: {n_in} ({len(ns)}) {ri.max():.3e}{extra}")
    else:
        print(f"{nit}: 0 inside")


# ---------------------------------------------------------------------------
# nlfeast_moments (block-Hankel, K moments)
# ---------------------------------------------------------------------------

def _hankel(Qm: CX, K: int, n: int, m0: int):
    """Assemble Q0 = [Q_{i+j-1}], Q1 = [Q_{i+j}] of shape (K n, K m0)
    from the moment stack Qm (2K, n, m0) (nlfeast.jl:213-216)."""
    rows0, rows1 = [], []
    for i in range(K):
        rows0.append(cx.concatenate([CX(Qm.re[i + j], Qm.im[i + j])
                                     for j in range(K)], axis=1))
        rows1.append(cx.concatenate([CX(Qm.re[i + j + 1], Qm.im[i + j + 1])
                                     for j in range(K)], axis=1))
    return cx.concatenate(rows0, axis=0), cx.concatenate(rows1, axis=0)


@functools.partial(jax.jit, static_argnames=("K", "kind", "params",
                                             "first", "scale"))
def _moments_step(T, LUb, permb, z: CX, zeta: CX, w: CX, X: CX, R: CX,
                  lam_m0: CX, K: int, kind: str, params, scale, first: bool):
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
        # moment stack: term * zeta^(j-1), j = 1..2K (centered-scaled)
        powers = [term]
        zp = CX(jnp.ones((), X.dtype), jnp.zeros((), X.dtype))
        for j in range(1, 2 * K):
            zp = zp * CX(zetai.re, zetai.im)
            powers.append(cx.scale_cols(term, CX(jnp.broadcast_to(zp.re, (m0,)),
                                                 jnp.broadcast_to(zp.im, (m0,)))))
        return cx.stack(powers, axis=0)  # (2K, n, m0)

    stacks = jax.vmap(one_node)(LUb, permb, z, zeta, w)  # (nodes, 2K, n, m0)
    Qm = CX(jnp.sum(stacks.re, 0), jnp.sum(stacks.im, 0))
    Q0, Q1 = _hankel(Qm, K, n, m0)
    mu, Y = beyn_svd_extract(Q0, Q1, top_rows=n)  # (K m0,), (n, K m0)
    lam = _unscale(mu, scale)
    Y, Ry, res = _residuals(T, Y, lam)
    # residual-sorted permutation (update_R_moments!, utils.jl:125-133)
    p = jnp.argsort(res)
    res = res[p]
    lam = CX(lam.re[p], lam.im[p])
    Y = cx.take_cols(Y, p)
    Ry = cx.take_cols(Ry, p)
    X_new = CX(Y.re[:, :m0], Y.im[:, :m0])
    R_new = CX(Ry.re[:, :m0], Ry.im[:, :m0])
    lam_new = CX(lam.re[:m0], lam.im[:m0])
    inside = _in_mask(lam, kind, params)
    return X_new, R_new, lam_new, Y, lam, res, inside


def nlfeast_moments(T, X0, nodes: int = 16, iters: int = 10, *,
                    moments: int = 2, c: complex = 0.0 + 0.0j, r: float = 1.0,
                    contour: Optional[ct.Contour] = None, tol: float = 1e-11,
                    spurious: float = 1e-5, debug: bool = False) -> NlfeastResult:
    """Higher-moment NLFEAST (nlfeast_moments!, nlfeast.jl:173-318).

    Search space is K*m0 (block Hankel); only the residual-best m0 columns
    are refined per node solve.  Returns the full K*m0 sorted Ritz set
    (reference returns `Λ, Y, res`, nlfeast.jl:317).

    Sizing note: like the reference, the two-tier stop accepts convergence
    of the NON-SPURIOUS subset (nlfeast.jl:77-79), so with m0 below the
    eigenvalue count the solver can return early with a partial set — keep
    m0 >= expected count (K widens the search space, not the refinement
    width).
    """
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X = X0 if isinstance(X0, CX) else cx.from_numpy(np.asarray(X0), dtype)
    n, m0 = X.shape
    K = int(moments)
    T = nepmod.as_nep(T, n=n, dtype=dtype)
    if isinstance(T, nepmod.CallableNEP):
        raise TypeError("nlfeast_moments needs an SPMF/polynomial NEP "
                        "(jitted residuals over K*m0 Ritz values)")
    if contour is None:
        contour = ct.circular_contour_trapezoidal(complex(c), float(r), nodes)
    z = contour.device_nodes(dtype)
    w = contour.device_weights(dtype)
    Tz = T.eval_nodes(z)
    LUb, permb = jax.jit(lumod.lu_factor_batched)(Tz)

    lam_m0 = cx.zeros((m0,), dtype)
    R = cx.zeros((n, m0), dtype)
    lam_all = Y = res = inside = None
    n_iter, converged = 0, False
    for nit in range(iters + 1):
        n_iter = nit
        zeta, scale = _scaled(contour, z)
        X, R, lam_m0, Y, lam_all, res, inside = _moments_step(
            T, LUb, permb, z, zeta, w, X, R, lam_m0, K,
            contour.kind, contour.params, scale, nit == 0)
        res_h = np.asarray(res)[:m0]
        inside_h = np.asarray(inside)[:m0]
        if debug:
            _dbg(nit, res_h, inside_h, spurious)
        if _stop(nit, res_h, inside_h, tol, spurious):
            converged = True
            break
    Y = cx.normalize_cols(Y)
    return NlfeastResult(lam_all, Y, res, inside, n_iter, converged)


# ---------------------------------------------------------------------------
# alternative extraction steps (utils.jl:79-101 parity)
# ---------------------------------------------------------------------------

def beyn_qr_extract(Q0: CX, Q1: CX):
    """QR-based Beyn step (beyn_qr_step!, utils.jl:79-85):
    eig of Q^H Q1 R^{-1} with Q0 = Q R."""
    Q, Rf = qrmod.cholqr2(Q0)
    M = qrmod.right_solve_upper(cx.cmatmul(Q.H, Q1), Rf)
    lam, W = eigmod.eig(M)
    return lam, cx.cmatmul(Q, W)


def beyn_rr_extract(Q0: CX, Q1: CX, X: CX):
    """Projected-pencil Beyn step (beyn_rr_step!, utils.jl:87-93):
    generalized eig of (X^H Q1, X^H Q0), vectors through Q0."""
    Aq = cx.cmatmul(X.H, Q1)
    Bq = cx.cmatmul(X.H, Q0)
    lam, W = eigmod.gen_eig(Aq, Bq)
    return lam, cx.cmatmul(Q0, W)


def beyn_rr2_extract(Q0: CX, Q1: CX):
    """Self-projected pencil (beyn_rr_step2!, utils.jl:95-101):
    generalized eig of (Q0^H Q1, Q0^H Q0)."""
    Aq = cx.cmatmul(Q0.H, Q1)
    Bq = cx.cmatmul(Q0.H, Q0)
    lam, W = eigmod.gen_eig(Aq, Bq)
    return lam, cx.cmatmul(Q0, W)


# ---------------------------------------------------------------------------
# nlfeast_it: iterative (matrix-free) node solves
# ---------------------------------------------------------------------------

def nlfeast_it(T, X0, nodes: int = 16, iters: int = 10, *,
               c: complex = 0.0 + 0.0j, r: float = 1.0,
               contour: Optional[ct.Contour] = None, tol: float = 1e-11,
               spurious: float = 1e-5, solve_tol: float = 1e-8,
               solve_iters: int = 500, debug: bool = False) -> NlfeastResult:
    """NLFEAST with BiCGStab node solves, warm-started per node across
    refinement iterations (nlfeast_it!, nlfeast.jl:87-171).  The reference
    solves column-by-column (nlfeast.jl:139); here every node keeps a
    (n, m0) warm block and all columns advance together."""
    from ..ops import krylov

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X = X0 if isinstance(X0, CX) else cx.from_numpy(np.asarray(X0), dtype)
    n, m0 = X.shape
    T = nepmod.as_nep(T, n=n, dtype=dtype)
    if isinstance(T, nepmod.CallableNEP):
        raise TypeError("nlfeast_it needs an SPMF/polynomial NEP")
    if contour is None:
        contour = ct.circular_contour_trapezoidal(complex(c), float(r), nodes)
    z = contour.device_nodes(dtype)
    w = contour.device_weights(dtype)
    N = len(contour)
    Tz = T.eval_nodes(z)  # (N, n, n) — used as matvec operands
    X, _ = qrmod.cholqr2(X)

    @functools.partial(jax.jit, static_argnames=("first",))
    def step(X, R, lam, warm, first):
        zeta, scale = _scaled(contour, z)

        def one_node(Tzi, zi, zetai, wi, x0):
            mv = lambda V: cx.cmatmul(Tzi, V)
            rhs = X if first else R
            sol = krylov.bicgstab(mv, rhs, x0=x0, tol=solve_tol,
                                  maxiter=solve_iters)
            if first:
                term = cx.scale_cols(sol.x, CX(jnp.broadcast_to(wi.re, (m0,)),
                                               jnp.broadcast_to(wi.im, (m0,))))
            else:
                resv = cx.cdiv(CX(jnp.broadcast_to(wi.re, (m0,)),
                                  jnp.broadcast_to(wi.im, (m0,))),
                               CX(zi.re - lam.re, zi.im - lam.im))
                term = cx.scale_cols(X - sol.x, resv)
            q1 = cx.scale_cols(term, CX(jnp.broadcast_to(zetai.re, (m0,)),
                                        jnp.broadcast_to(zetai.im, (m0,))))
            return term, q1, sol.x

        q0s, q1s, warm_new = jax.vmap(one_node)(Tz, z, zeta, w, warm)
        Q0 = CX(jnp.sum(q0s.re, 0), jnp.sum(q0s.im, 0))
        Q1 = CX(jnp.sum(q1s.re, 0), jnp.sum(q1s.im, 0))
        mu, Xn = beyn_svd_extract(Q0, Q1)
        lam_new = _unscale(mu, _scaled(contour, z)[1])
        Xn, Rn, res = _residuals(T, Xn, lam_new)
        inside = _in_mask(lam_new, contour.kind, contour.params)
        return Xn, Rn, lam_new, res, inside, warm_new

    warm = cx.zeros((N, n, m0), dtype)
    lam = cx.zeros((m0,), dtype)
    R = cx.zeros((n, m0), dtype)
    res = inside = None
    n_iter, converged = 0, False
    for nit in range(iters + 1):
        n_iter = nit
        X, R, lam, res, inside, warm = step(X, R, lam, warm, nit == 0)
        res_h, inside_h = np.asarray(res), np.asarray(inside)
        if debug:
            _dbg(nit, res_h, inside_h, spurious)
        if _stop(nit, res_h, inside_h, tol, spurious):
            converged = True
            break
    return NlfeastResult(lam, cx.normalize_cols(X), res, inside, n_iter,
                         converged)
