"""Single-shot contour solvers: Beyn's method and block Sakurai-Sugiura.

TPU-native re-design of the reference's `beyn` (beyn.jl:2-32) and `block_SS!`
(beyn.jl:34-94):

  * the per-node `lu!` loop becomes one batched LU over the node axis;
  * Beyn extraction reuses `beyn_svd_extract` (SVD + small Schur eig);
  * block-SS: 2K+1 moment blocks, random left-probe Hankel compression
    (beyn.jl:57-62), and the data-dependent rank cut sigma/sigma_1 > 1e-13
    (beyn.jl:72-73) is realized with STATIC shapes by deflating the
    below-cut directions to far-away eigenvalues (masked identity rows) that
    the caller filters by contour membership/residual — no dynamic shapes,
    so the whole pipeline stays jittable.
"""

from __future__ import annotations

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
from .nlfeast import beyn_svd_extract, _residuals, _scaled, _unscale


class BeynResult(NamedTuple):
    lam: CX
    X: CX
    res: jax.Array

    def sorted_numpy(self):
        lam = cx.to_numpy(self.lam)
        X = cx.to_numpy(self.X)
        res = np.asarray(self.res)
        p = np.argsort(res)
        return lam[p], X[:, p], res[p]


def beyn(T, X0, nodes: int = 16, *, c: complex = 0.0 + 0.0j, r: float = 1.0,
         contour: Optional[ct.Contour] = None,
         relative_res: bool = False) -> BeynResult:
    """Beyn's single-shot contour method (beyn.jl:2-32).

    Computes moments Q0 = sum w_i T(z_i)^{-1} X, Q1 = sum w_i z_i ...,
    then the SVD extraction.  Residuals are absolute column norms
    ||T(lam) x|| like the reference (beyn.jl:28) unless relative_res.
    """
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X = X0 if isinstance(X0, CX) else cx.from_numpy(np.asarray(X0), dtype)
    n, m0 = X.shape
    T = nepmod.as_nep(T, n=n, dtype=dtype)
    if contour is None:
        contour = ct.circular_contour_trapezoidal(complex(c), float(r), nodes)
    z = contour.device_nodes(dtype)
    w = contour.device_weights(dtype)
    Tz = T.eval_nodes(z)
    LUb, permb = jax.jit(lumod.lu_factor_batched)(Tz)

    zeta, scale = _scaled(contour, z)

    def one_node(LU, perm, zetai, wi):
        temp = lumod.lu_solve(LU, perm, X)
        q0 = cx.scale_cols(temp, CX(jnp.broadcast_to(wi.re, (m0,)),
                                    jnp.broadcast_to(wi.im, (m0,))))
        # centered-scaled first moment (see nlfeast._scaled)
        zw = CX(zetai.re * wi.re - zetai.im * wi.im,
                zetai.re * wi.im + zetai.im * wi.re)
        q1 = cx.scale_cols(temp, CX(jnp.broadcast_to(zw.re, (m0,)),
                                    jnp.broadcast_to(zw.im, (m0,))))
        return q0, q1

    q0s, q1s = jax.jit(jax.vmap(one_node))(LUb, permb, zeta, w)
    Q0 = CX(jnp.sum(q0s.re, 0), jnp.sum(q0s.im, 0))
    Q1 = CX(jnp.sum(q1s.re, 0), jnp.sum(q1s.im, 0))
    mu, X = beyn_svd_extract(Q0, Q1)
    lam = _unscale(mu, scale)
    X = cx.normalize_cols(X)
    if isinstance(T, nepmod.CallableNEP):
        lamh, Xh = cx.to_numpy(lam), cx.to_numpy(X)
        Rh = T.host_apply_cols(Xh, lamh)
        res = np.linalg.norm(Rh, axis=0)
        if relative_res:
            res = res / T.host_fro_norms(lamh)
        res = jnp.asarray(res)
    else:
        R = T.apply_cols(X, lam)
        res = cx.col_norms(R)
        if relative_res:
            res = res / jnp.maximum(T.fro_norms(lam), jnp.finfo(res.dtype).tiny)
    return BeynResult(lam, X, res)


def block_ss(T, X0, nodes: int = 16, moments: int = 2, *,
             c: complex = 0.0 + 0.0j, r: float = 1.0,
             contour: Optional[ct.Contour] = None,
             rank_tol: float = 1e-13, seed: int = 0) -> BeynResult:
    """Block Sakurai-Sugiura with higher moments (block_SS!, beyn.jl:34-94).

    Left-projected Hankel pencils from a random probe block Y; rank cut at
    sigma/sigma_1 > rank_tol (static-shape deflation); eigenvectors recovered
    through the first K moment blocks (beyn.jl:78-80).
    """
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X = X0 if isinstance(X0, CX) else cx.from_numpy(np.asarray(X0), dtype)
    n, m0 = X.shape
    K = int(moments)
    T = nepmod.as_nep(T, n=n, dtype=dtype)
    if isinstance(T, nepmod.CallableNEP):
        raise TypeError("block_ss needs an SPMF/polynomial NEP")
    if contour is None:
        contour = ct.circular_contour_trapezoidal(complex(c), float(r), nodes)
    z = contour.device_nodes(dtype)
    w = contour.device_weights(dtype)
    X, _ = qrmod.cholqr2(X)  # reference: X = Matrix(qr(X).Q), beyn.jl:38
    rng = np.random.default_rng(seed)
    Y = cx.from_numpy(rng.standard_normal((n, m0))
                      + 1j * rng.standard_normal((n, m0)), dtype)

    Tz = T.eval_nodes(z)
    LUb, permb = jax.jit(lumod.lu_factor_batched)(Tz)

    zeta, scale = _scaled(contour, z)

    def one_node(LU, perm, zetai, wi):
        temp = lumod.lu_solve(LU, perm, X)
        temp = cx.scale_cols(temp, CX(jnp.broadcast_to(wi.re, (m0,)),
                                      jnp.broadcast_to(wi.im, (m0,))))
        blocks = [temp]
        zp = CX(jnp.ones((), dtype), jnp.zeros((), dtype))
        for _ in range(2 * K):
            zp = zp * CX(zetai.re, zetai.im)
            blocks.append(cx.scale_cols(temp, CX(jnp.broadcast_to(zp.re, (m0,)),
                                                 jnp.broadcast_to(zp.im, (m0,)))))
        return cx.stack(blocks, axis=0)  # (2K+1, n, m0)

    stacks = jax.jit(jax.vmap(one_node))(LUb, permb, zeta, w)
    S = CX(jnp.sum(stacks.re, 0), jnp.sum(stacks.im, 0))  # (2K+1, n, m0)

    # Hankel pencils of Y^H-projected moments: (K m0, K m0)
    proj = [cx.cmatmul(Y.H, CX(S.re[j], S.im[j])) for j in range(2 * K + 1)]
    rows0 = [cx.concatenate([proj[i + j + 1] for j in range(K)], axis=1)
             for i in range(K)]
    rows1 = [cx.concatenate([proj[i + j + 2] for j in range(K)], axis=1)
             for i in range(K)]
    Q0 = cx.concatenate(rows0, axis=0)
    Q1 = cx.concatenate(rows1, axis=0)

    U, s, Vh = svdmod.svd(Q0)
    keep = s / jnp.maximum(s[0], jnp.finfo(s.dtype).tiny) > rank_tol
    V = Vh.H
    H1 = cx.cmatmul(U.H, cx.cmatmul(Q1, V))
    H0 = cx.cmatmul(U.H, cx.cmatmul(Q0, V))
    # static-shape deflation of below-cut directions: unit diagonal in H0,
    # far-away eigenvalue in H1 (filtered later by contour membership)
    km = H0.shape[0]
    far = 1e6  # in scaled coordinates (|mu| <= 1 inside the contour)
    dmask = keep.astype(dtype)
    omask = dmask[:, None] * dmask[None, :]
    eye = jnp.eye(km, dtype=dtype)
    H0 = CX(H0.re * omask + (1.0 - dmask) * eye, H0.im * omask)
    H1 = CX(H1.re * omask + (1.0 - dmask) * eye * far, H1.im * omask)
    mu, Xq = eigmod.gen_eig(H1, H0)
    lam = _unscale(mu, scale)
    # X = S[:, first K blocks] V Xq  (beyn.jl:80)
    Sflat = cx.concatenate([CX(S.re[j], S.im[j]) for j in range(K)], axis=1)
    Xout = cx.cmatmul(Sflat, cx.cmatmul(V, Xq))
    Xout, _, res = _residuals(T, Xout, lam)
    return BeynResult(lam, Xout, res)
