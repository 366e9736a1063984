"""Companion linearization for polynomial eigenproblems.

TPU-native re-design of the reference's `companion` (companion.jl:1-28):
P(lam) x = 0 with P(z) = sum_j A_j z^(j-1) becomes the NL x NL generalized
pencil  C1 y = lam C2 y  with y = [x; lam x; ...; lam^(L-1) x]; eigenvectors
read from the LAST block row (companion.jl:16), residuals relative to
||P(lam)||_F (companion.jl:19-26) computed through the SPMF Gram trick.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import cx
from ..cx import CX
from ..nep import PolynomialNEP
from ..ops import eig as eigmod


class CompanionResult(NamedTuple):
    lam: CX
    X: CX
    res: jax.Array


def companion(coeffs: Sequence, method: str = "auto") -> CompanionResult:
    """Full dense solve of the polynomial EVP via companion pencil.

    coeffs: [A_1, ..., A_{L+1}] with P(z) = sum_j A_j z^(j-1)
    (matches the reference's 1-based convention, companion.jl:19-26).
    Returns all N*L eigenpairs with relative residuals.

    method: "lu" reduces via C2^{-1} C1 (fast; needs a nonsingular leading
    coefficient A_{L+1}), "qz" runs the full QZ kernel (handles singular
    A_{L+1} — infinite eigenvalues come out as huge lam = alpha/beta, the
    ggev convention the reference gets from LAPACK, companion.jl:15);
    "auto" picks QZ when cond(A_{L+1}) indicates (near-)singularity.
    """
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mats = [np.asarray(A, dtype=np.complex128) for A in coeffs]
    N = mats[0].shape[0]
    L = len(mats) - 1
    NL = N * L
    C1 = np.zeros((NL, NL), dtype=np.complex128)
    C2 = np.zeros((NL, NL), dtype=np.complex128)
    C1[:N, :N] = mats[0]
    for i in range(N, NL):
        C1[i, i] = 1.0
        C2[i, i - N] = 1.0
    for i in range(L):
        C2[:N, N * i:N * (i + 1)] = -mats[i + 1]
    if method == "auto":
        # host-side singularity check of the leading coefficient (tiny SVD)
        s = np.linalg.svd(mats[-1], compute_uv=False)
        cond = s[0] / s[-1] if s[-1] > 0 else np.inf
        method = "qz" if cond > 1.0 / np.sqrt(np.finfo(np.float64).eps) \
            else "lu"
    if method == "qz":
        from ..ops import qz as qzmod

        alpha, beta, V = qzmod.gen_eig_qz(cx.from_numpy(C1, dtype),
                                          cx.from_numpy(C2, dtype))
        lam = cx.cdiv(alpha, beta)
    else:
        lam, V = eigmod.gen_eig(cx.from_numpy(C1, dtype),
                                cx.from_numpy(C2, dtype))
    # eigenvectors from the last block row (companion.jl:16)
    X = CX(V.re[(L - 1) * N:, :], V.im[(L - 1) * N:, :])
    X = cx.normalize_cols(X)
    nep = PolynomialNEP(mats, dtype)
    R = nep.apply_cols(X, lam)
    res = cx.col_norms(R) / jnp.maximum(nep.fro_norms(lam),
                                        jnp.finfo(R.dtype).tiny)
    return CompanionResult(lam, X, res)
