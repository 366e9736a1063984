"""Hermitian eigendecomposition on CX pairs via the real-symmetric embedding.

For Hermitian H = A + iB (A symmetric, B skew-symmetric) the real 2n x 2n
matrix

    M = [[A, -B],
         [B,  A]]

is symmetric with spectrum = spec(H) doubled, and EVERY vector (p, q) in the
eigenspace of an eigenvalue lam maps to a valid complex eigenvector
x = p + i q of H (the eigenspace is exactly {(Re(cx), Im(cx)) : c in C}).
So one native real `eigh` — which XLA implements on TPU — replaces a complex
Hermitian solver, with exact recovery.

The only subtlety is SELECTING n of the 2n eigenvectors whose complex images
are linearly independent: within one doubled eigenvalue the two real
eigenvectors can map to complex-colinear images.  We pick every other vector
in sorted order and then repair any colinear pairs in a cluster by applying
the quarter rotation (p, q) -> (-q, p) (whose image is i x — colinear) and
Gram-Schmidt within the cluster; for well-separated spectra the first pick is
already correct.

Used by the Rayleigh-Ritz fast path for Hermitian problems and as an
accurate Gram-eigh building block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import cx
from ..cx import CX


def eigh_cx(H: CX):
    """Eigenvalues (ascending) and eigenvectors of a Hermitian pair matrix.

    Returns (w (n,) real, V CX (n,n)) with H V = V diag(w), V^H V = I.
    """
    n = H.shape[0]
    M = jnp.block([[H.re, -H.im], [H.im, H.re]])
    w2, V2 = jnp.linalg.eigh(M)  # ascending, doubled eigenvalues
    # candidates: every other eigenvector (one per doubled eigenvalue)
    idx = 2 * jnp.arange(n)
    w = w2[idx]
    P = V2[:n, :]
    Q = V2[n:, :]
    Xre = P[:, idx]
    Xim = Q[:, idx]
    V = CX(Xre, Xim)
    # normalize (embedding vectors are unit in R^{2n} => unit in C^n)
    V = cx.normalize_cols(V)
    # repair complex-colinear neighbours inside degenerate clusters:
    # project out earlier columns that share the eigenvalue; if a column
    # collapses, replace it with the OTHER real eigenvector of its pair.
    alt = CX(V2[:n, :][:, idx + 1], V2[n:, :][:, idx + 1])
    alt = cx.normalize_cols(alt)

    # vectorized single-neighbour repair (handles the common 2-cluster):
    same = jnp.concatenate([jnp.array([False]),
                            jnp.abs(w[1:] - w[:-1])
                            <= 1e-12 * (1.0 + jnp.abs(w[1:]))])
    prev = CX(jnp.roll(V.re, 1, axis=1), jnp.roll(V.im, 1, axis=1))
    ip = cx.cdot_cols(prev, V)  # <prev, v>
    colinear = same & (cx.cabs(ip) > 0.99)
    V = cx.where(colinear[None, :], alt, V)
    # within exactly-degenerate clusters the selected vectors are independent
    # but not C-orthogonal; one CholeskyQR pass re-orthonormalizes (columns
    # mix only leftward, i.e. within the ascending-eigenvalue cluster, so
    # each column remains an eigenvector of its lam)
    any_cluster = jnp.any(same)
    from . import qr as qrmod

    Vq, _ = qrmod.cholqr2(V)
    V = cx.where(any_cluster, Vq, V)
    return w, V


def gram_eigh(A: CX):
    """Eigendecomposition of the Hermitian Gram matrix A^H A (for
    orthogonalization / subspace analysis)."""
    G = cx.cmatmul(A.H, A)
    # force exact Hermitian-ness against rounding
    G = CX((G.re + G.re.T) / 2, (G.im - G.im.T) / 2)
    return eigh_cx(G)
