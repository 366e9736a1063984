"""Tensor-product fast-diagonalization direct solver / preconditioner.

For SEPARABLE 2-D pencils the shifted operator S(z) = A - z B diagonalizes
in a Kronecker product of two 1-D eigenbases, so S(z)^{-1} applies as four
dense (n1, n1)-by-(n1, n2*m) GEMMs plus one elementwise complex divide —
pure MXU work at ANY shift, no Krylov iteration, no multigrid.  This is the
TPU-native analog of the reference's shift-agnostic UMFPACK sparse LU
(reference test/gun2.jl:4-6 tunes UMFPACK for interior contours) for the
structured-operator class: SA-AMG (ops/amg.py) covers general unstructured
pencils but is measured to stall on DEEP interior slices of dense-spectrum
operators (BiCGStab+AMG plateaus at resnorm ~0.2-1 for every CSL damp when
~87% of the spectrum sits below the shift and r/|c| ~ 1e-3), exactly where
a direct method is required.

Two supported separable forms (n = n1 * n2, row index i = i1*n2 + i2):

  form="fem":   A = A1 (x) M2  +  M1 (x) A2,   B = M1 (x) M2
     (the tensor-product FEM pencil).  Per-axis GENERALIZED eigenbases
     A_k W_k = M_k W_k diag(lam_k) with W_k^T M_k W_k = I give
     (W1 (x) W2)^T S(z) (W1 (x) W2) = lam1 (+) lam2 - z I.

  form="kron":  A = A1 (x) I   +  I (x) A2,    B = B1 (x) B2
     with [A_k, B_k] = 0 (commuting pairs, e.g. tridiagonal Toeplitz
     stiffness/mass sharing the sine eigenbasis).  Per-axis ORTHOGONAL
     eigenbases S_k of A_k simultaneously diagonalize B_k; the build
     verifies commutation numerically and refuses otherwise.

Both reduce to one stored structure: transform bases (applied transposed on
the way in, untransposed on the way out) and diagonal grids (dA, dB) with
S(z)-diagonal dA - z*dB.  The grids are stored and shifted in f64 (the
denominator dA - z dB cancels to ~|r| << |dA| on interior slices; an f32
subtraction would lose ~1e-3 relative there) while the GEMM transforms run
in the factor dtype (f32 by default: as a preconditioner inside the f64
Krylov refinement, per-apply accuracy ~1e-7 means ~1e-6 residual
contraction PER OUTER ITERATION, i.e. a mixed-precision direct solve with
iterative refinement — the same structure as the dense mixed_prec path).

Usage with the production sparse driver:

    fd = fastdiag.build(A1=T1, A2=T1, B1=M1, B2=M1, form="kron")
    feast_iterative(K, B, X0, ..., precondition=fastdiag.preconditioner(fd),
                    solver="bicgstab_rr")
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import cx
from ..cx import CX

_P = jax.lax.Precision.HIGHEST


class FastDiag(NamedTuple):
    """Separable diagonalization of (A, B).  A pytree of arrays — safe to
    pass as a jit argument or close over (the bases are O(n1^2), a few MB;
    nothing here constant-folds: every use feeds a matmul with a traced
    operand)."""

    S1: jax.Array   # (n1, n1) axis-0 basis; forward transform = S1^T @ .
    S2: jax.Array   # (n2, n2) axis-1 basis
    dA: jax.Array   # (n1, n2) f64 diagonal of A in the tensor basis
    dB: jax.Array   # (n1, n2) f64 diagonal of B in the tensor basis


def _eigh_host(A, M=None):
    import scipy.linalg as sla

    A = np.asarray(A.todense() if hasattr(A, "todense") else A, dtype=float)
    if M is None:
        return sla.eigh(A)
    M = np.asarray(M.todense() if hasattr(M, "todense") else M, dtype=float)
    return sla.eigh(A, M)


def build(A1, A2=None, B1=None, B2=None, *, form: str = "kron",
          dtype=jnp.float32, commute_tol: float = 1e-10) -> FastDiag:
    """Host-side build (one small dense eigh per axis; scipy LAPACK).

    A2/B2 default to A1/B1 (the symmetric-grid case).  B1/B2 = None means
    identity on that factor.  `dtype` is the TRANSFORM dtype (the diagonal
    grids always stay f64, see module docstring)."""
    if A2 is None:
        A2 = A1
    if B2 is None and B1 is not None and A2 is A1:
        B2 = B1
    axes = []
    for Ak, Mk in ((A1, B1), (A2, B2)):
        if form == "fem":
            lam, W = _eigh_host(Ak, Mk)       # W^T Mk W = I, W^T Ak W = lam
            axes.append((W, lam, np.ones_like(lam)))
        elif form == "kron":
            lam, S = _eigh_host(Ak)           # orthogonal S
            if Mk is None:
                m = np.ones_like(lam)
            else:
                Mk_d = np.asarray(Mk.todense() if hasattr(Mk, "todense")
                                  else Mk, dtype=float)
                G = S.T @ Mk_d @ S
                m = np.diag(G).copy()
                off = G - np.diag(m)
                rel = np.abs(off).max() / max(np.abs(m).max(), 1e-300)
                if rel > commute_tol:
                    raise ValueError(
                        f"form='kron' needs commuting (A_k, B_k): "
                        f"off-diagonal of S^T B S is {rel:.2e} relative "
                        f"(tol {commute_tol:g}); use form='fem' for "
                        f"A = A1(x)M2 + M1(x)A2 pencils")
            axes.append((S, lam, m))
        else:
            raise ValueError(f"unknown form {form!r} (use 'fem' or 'kron')")
    (S1, t1, m1), (S2, t2, m2) = axes
    dA = t1[:, None] + t2[None, :]
    dB = m1[:, None] * m2[None, :]
    grid_dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return FastDiag(jnp.asarray(S1, dtype), jnp.asarray(S2, dtype),
                    jnp.asarray(dA, grid_dt), jnp.asarray(dB, grid_dt))


def _mm(S, X, precision=_P):
    """Real-basis matmul on a CX block: S @ X, two real GEMMs."""
    return CX(jnp.matmul(S, X.re, precision=precision),
              jnp.matmul(S, X.im, precision=precision))


def solve(fd: FastDiag, z: CX, X: CX) -> CX:
    """(A - z B)^{-1} X through the tensor diagonalization.  Jit-traceable
    (z may be a tracer); X is (n, m) CX with n = n1*n2.

    Lowering layout (r5 STRETCH lessons, measured on the real chip): every
    GEMM keeps a >= n2-sized minor dimension — the naive per-axis einsum
    ('bc,abm->acm') carries the m-sized minor dim, which the TPU pads to
    128 lanes (16x waste at m=8).  Axis-1 transforms therefore go through
    a (n1, m, n2) transpose so the contraction sits on the n2-minor."""
    n1, n2 = fd.dA.shape
    m = X.shape[1]
    tdt = fd.S1.dtype
    xdt = X.re.dtype
    # forward: Y = (S1^T (x) S2^T) X
    X3 = X.astype(tdt).reshape(n1, n2 * m)
    Y = _mm(fd.S1.T, X3)
    Y = CX(Y.re.reshape(n1, n2, m).transpose(0, 2, 1).reshape(n1 * m, n2),
           Y.im.reshape(n1, n2, m).transpose(0, 2, 1).reshape(n1 * m, n2))
    Y = CX(jnp.matmul(Y.re, fd.S2, precision=_P),     # = (S2^T y) rows
           jnp.matmul(Y.im, fd.S2, precision=_P))
    # diagonal divide: denominator in f64 (interior shifts cancel ~1e-3 of
    # the grid magnitude; see module docstring), reciprocal cast to the
    # transform dtype for the elementwise apply.
    den = CX(fd.dA - (z.re.astype(fd.dA.dtype) * fd.dB),
             -(z.im.astype(fd.dA.dtype) * fd.dB))
    rec = cx.creciprocal(den)
    rec = CX(rec.re.astype(tdt).reshape(n1, 1, n2),
             rec.im.astype(tdt).reshape(n1, 1, n2))
    Y3 = CX(Y.re.reshape(n1, m, n2), Y.im.reshape(n1, m, n2))
    Y3 = Y3 * rec
    # backward: X = (S1 (x) S2) Y
    Yb = CX(Y3.re.reshape(n1 * m, n2), Y3.im.reshape(n1 * m, n2))
    Yb = CX(jnp.matmul(Yb.re, fd.S2.T, precision=_P),  # = S2 y
            jnp.matmul(Yb.im, fd.S2.T, precision=_P))
    Yb = CX(Yb.re.reshape(n1, m, n2).transpose(0, 2, 1).reshape(n1, n2 * m),
            Yb.im.reshape(n1, m, n2).transpose(0, 2, 1).reshape(n1, n2 * m))
    out = CX(jnp.matmul(fd.S1, Yb.re, precision=_P),
             jnp.matmul(fd.S1, Yb.im, precision=_P))
    return CX(out.re.astype(xdt).reshape(n1 * n2, m),
              out.im.astype(xdt).reshape(n1 * n2, m))


def preconditioner(fd: FastDiag):
    """`precondition=` callable for feast_iterative: z -> (X -> S(z)^{-1}X).

    The factors ride in the closure (a few MB of matmul operands — no
    constant-folding hazard, unlike AMG's scatter-built hierarchies which
    must be jit ARGUMENTS, ops/amg.py)."""
    def make(z: CX):
        def M(X: CX) -> CX:
            return solve(fd, z, X)
        return M
    return make
