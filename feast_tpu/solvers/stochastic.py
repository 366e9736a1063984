"""Stochastic contour-based eigenvalue counting.

TPU-native re-design of `contour_estimate_eig` (stochastic.jl:2-33):
Hutchinson trace estimate of the spectral projector
    E[#eig inside] = (1/samples) sum_i w_i tr(X^H (B z_i - A)^{-1} X)
with Gaussian probes (sparse probes rejected by the reference, stochastic.jl:14).
This is the tool that sizes m0 / spectral slices before running FEAST.

The per-node factor+solve loop batches over the node axis; `mixed_prec`
runs the solves in float32 pairs (stochastic.jl:8).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import contour as ct
from .. import cx
from ..cx import CX
from ..ops import lu as lumod


def contour_estimate_eig(A, contour: ct.Contour, B=None, *,
                         samples: Optional[int] = None, seed: int = 0,
                         mixed_prec: bool = False) -> float:
    """Expected number of eigenvalues of (A, B) inside the contour."""
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    A = A if isinstance(A, CX) else cx.from_numpy(np.asarray(A), dtype)
    n = A.shape[0]
    if B is not None and not isinstance(B, CX):
        B = cx.from_numpy(np.asarray(B), dtype)
    m0 = samples if samples is not None else min(100, n)
    rng = np.random.default_rng(seed)
    X = cx.from_numpy(rng.standard_normal((n, m0)).astype(np.float64)
                      + 0j, dtype)  # real Gaussian probes (stochastic.jl:15)
    z = contour.device_nodes(dtype)
    w = contour.device_weights(dtype)
    # ZmA = B z - A  (note the sign: stochastic.jl:24)
    if B is None:
        eyer = jnp.eye(n, dtype=dtype)
        S = CX(z.re[:, None, None] * eyer[None] - A.re[None],
               z.im[:, None, None] * eyer[None] - A.im[None])
    else:
        S = CX(z.re[:, None, None] * B.re[None]
               - z.im[:, None, None] * B.im[None] - A.re[None],
               z.re[:, None, None] * B.im[None]
               + z.im[:, None, None] * B.re[None] - A.im[None])
    solve_dtype = jnp.float32 if mixed_prec else dtype
    if mixed_prec:
        S = S.astype(jnp.float32)
    Xs = X.astype(solve_dtype)

    @jax.jit
    def estimate(S, z, w):
        LUb, permb = lumod.lu_factor_batched(S)

        def one_node(LU, perm, zi, wi):
            temp = lumod.lu_solve(LU, perm, Xs)
            # tr(X^H temp) = sum conj(X) * temp
            tr_re = jnp.sum(Xs.re * temp.re + Xs.im * temp.im)
            tr_im = jnp.sum(Xs.re * temp.im - Xs.im * temp.re)
            tr = CX(tr_re.astype(dtype), tr_im.astype(dtype))
            return (tr * CX(wi.re, wi.im)).re

        vals = jax.vmap(one_node)(LUb, permb, z, w)
        return jnp.sum(vals) / m0

    return float(estimate(S, z, w))
