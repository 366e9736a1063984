"""Nonlinear eigenproblem (NEP) representations.

The reference passes T(z) as an opaque Julia callable that materializes the
matrix (nlfeast.jl:2, beyn.jl:2) — fine for a host language, hostile to XLA.
The TPU-native design represents T in **SPMF form** (sum of products of
matrices and functions):

    T(z) = sum_j f_j(z) * A_j

with static matrices A_j and jit-safe scalar functions f_j.  This covers every
problem in the reference's test suite (polynomial: butterfly/system5/quadratic;
exponential: hadeler, dep_distributed; sqrt branch: gun) and yields:

  * node matrices T(z_i): one einsum over the coefficient stack (MXU);
  * residual columns T(lam_k) x_k for ALL Ritz values at once:
        R = sum_j scale_cols(A_j @ X, f_j(lam))      — d+1 GEMMs total,
    instead of the reference's per-Ritz-value matrix materialization
    (utils.jl:104-109);
  * Frobenius norms ||T(lam)||_F for relative residuals via the precomputed
    Gram tensor G_jk = <A_j, A_k>_F:
        ||T(lam)||^2 = sum_jk conj(f_j) f_k G_jk     — O(d^2) per lam.

A `CallableNEP` wrapper supports arbitrary host callables (residuals then run
on host per iteration — correct but slower; used for parity with gallery
problems not in SPMF form).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cx
from .cx import CX


@jax.tree_util.register_pytree_node_class
class SPMF:
    """T(z) = sum_j f_j(z) * A_j with jit-safe f_j: CX scalar/vector -> CX.

    Registered as a PYTREE: the coefficient matrices flatten as children
    (jit ARGUMENTS) while the scalar functions ride as static aux data.
    Never make an SPMF a jit static argument — that captures the whole
    O(d n^2) matrix stack as compile-time constants baked into (and
    re-uploaded with) every executable; at gun scale that is 6+ GB per
    compiled program."""

    def tree_flatten(self):
        extra = tuple(sorted((k, v) for k, v in self.__dict__.items()
                             if k not in ("mats", "_gram", "funcs")))
        return ((self.mats, self._gram), (tuple(self.funcs), extra))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.mats = list(children[0])
        obj._gram = children[1]
        obj.funcs = list(aux[0])
        for k, v in aux[1]:
            setattr(obj, k, v)
        return obj

    def __init__(self, terms: Sequence[Tuple[object, Callable]], dtype=None):
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        self.funcs: List[Callable] = [f for _, f in terms]
        mats = []
        hosts = []  # numpy view of each matrix, for the host-side Gram
        for A, _ in terms:
            if isinstance(A, CX):
                hosts.append(cx.to_numpy(A))  # one pull per CX input
                mats.append(A)
            else:
                An = np.asarray(A)
                hosts.append(An)
                mats.append(cx.from_numpy(An, dtype))
        self.mats: List[CX] = mats
        self.n = mats[0].shape[0]
        self.d = len(mats)
        # Gram tensor for Frobenius norms: G_jk = <A_j, A_k>_F.  Computed on
        # HOST from the numpy inputs: doing it from self.mats costs d^2 full
        # device->host matrix transfers (minutes over the remote-TPU tunnel
        # at gun scale, n~1e4).
        G = np.empty((self.d, self.d), dtype=np.complex128)
        for j in range(self.d):
            for k in range(j, self.d):
                G[j, k] = np.sum(np.conj(hosts[j]) * hosts[k])
                G[k, j] = np.conj(G[j, k])
        self._gram = cx.from_numpy(G, dtype)

    # -- evaluation ---------------------------------------------------------
    def coeffs(self, lam: CX) -> CX:
        """f_j(lam) for all terms: returns CX of shape (d, *lam.shape)."""
        vals = [f(lam) for f in self.funcs]
        return cx.stack([cx.as_cx(v, lam.dtype) for v in vals], axis=0)

    def eval_at(self, z: CX) -> CX:
        """Materialize T(z) for a (traced) scalar z."""
        co = self.coeffs(z)
        out = cx.zeros((self.n, self.n), self.mats[0].dtype)
        for j in range(self.d):
            cj = CX(co.re[j], co.im[j])
            out = out + CX(self.mats[j].re * cj.re - self.mats[j].im * cj.im,
                           self.mats[j].re * cj.im + self.mats[j].im * cj.re)
        return out

    def eval_nodes(self, z: CX, out_dtype=None) -> CX:
        """Batch T(z_i) over a node axis: (N, n, n).

        Term-by-term accumulation, NOT an einsum over the d axis: under
        TPU f64 emulation XLA materializes (d, N, n, n) broadcast temps
        for the einsum (~3x the output size) — at gun scale that alone
        blows a 16 GB chip.  out_dtype (e.g. float32 for a mixed-precision
        factorization) casts per term so the peak is one (N, n, n) pair.
        """
        co = self.coeffs(z)  # (d, N)
        N = z.re.shape[0]
        dt = out_dtype or self.mats[0].dtype
        out = cx.zeros((N, self.n, self.n), dt)
        for j in range(self.d):
            Ar = self.mats[j].re.astype(dt)
            Ai = self.mats[j].im.astype(dt)
            cr = co.re[j].astype(dt)[:, None, None]
            ci = co.im[j].astype(dt)[:, None, None]
            out = CX(out.re + cr * Ar[None] - ci * Ai[None],
                     out.im + cr * Ai[None] + ci * Ar[None])
            out = jax.lax.optimization_barrier(out)
        return out

    def apply_block(self, z: CX, V: CX) -> CX:
        """T(z) @ V for ONE (traced) scalar z without materializing T(z):
        d GEMMs — the building block for mixed-precision iterative
        refinement of node solves (memory: no (n, n) per-node matrix)."""
        co = self.coeffs(z)  # (d,) scalars
        out = cx.zeros(V.shape, V.dtype)
        for j in range(self.d):
            AV = cx.cmatmul(self.mats[j], V)
            cj = CX(co.re[j], co.im[j])
            out = out + CX(AV.re * cj.re - AV.im * cj.im,
                           AV.re * cj.im + AV.im * cj.re)
            # serialize the per-term GEMMs: without a barrier XLA schedules
            # all d independent products (and their f64-emulation splits)
            # concurrently — ~d x the transient memory, an OOM at gun scale
            (V, out) = jax.lax.optimization_barrier((V, out))
        return out

    def apply_cols(self, X: CX, lam: CX) -> CX:
        """Columns T(lam_k) x_k for all k at once: (n, m)."""
        co = self.coeffs(lam)  # (d, m)
        out = cx.zeros(X.shape, X.dtype)
        for j in range(self.d):
            AX = cx.cmatmul(self.mats[j], X)
            out = out + cx.scale_cols(AX, CX(co.re[j], co.im[j]))
            (X, out) = jax.lax.optimization_barrier((X, out))
        return out

    def fro_norms(self, lam: CX) -> jax.Array:
        """||T(lam_k)||_F for each k (for relative residuals, utils.jl:151)."""
        co = self.coeffs(lam)  # (d, m)
        # sum_jk conj(c_j) c_k G_jk  (real, >= 0)
        acc = jnp.zeros(lam.shape, lam.dtype)
        for j in range(self.d):
            for k in range(self.d):
                g = CX(self._gram.re[j, k], self._gram.im[j, k])
                cj = CX(co.re[j], -co.im[j])
                ck = CX(co.re[k], co.im[k])
                prod = cj * ck * g
                acc = acc + prod.re
        return jnp.sqrt(jnp.maximum(acc, 0.0))


@jax.tree_util.register_pytree_node_class
class PolynomialNEP(SPMF):
    """T(z) = A_0 + A_1 z + ... + A_d z^d (companion.jl / polynomial tests)."""

    def __init__(self, coeff_mats: Sequence, dtype=None):
        def monomial(p):
            if p == 0:
                return lambda z: cx.CX(jnp.ones_like(z.re), jnp.zeros_like(z.im))
            return lambda z: cx.cpow_scalar(z, p)

        super().__init__([(A, monomial(p)) for p, A in enumerate(coeff_mats)],
                         dtype)
        self.degree = len(self.mats) - 1


@jax.tree_util.register_pytree_node_class
class LinearPencilNEP(SPMF):
    """T(z) = A - z B — lets nlfeast solvers run linear problems."""

    def __init__(self, A, B=None, dtype=None):
        terms = [(A, lambda z: cx.CX(jnp.ones_like(z.re), jnp.zeros_like(z.im)))]
        if B is None:
            n = np.asarray(A).shape[0] if not isinstance(A, CX) else A.shape[0]
            B = np.eye(n, dtype=np.complex128)
        terms.append((B, lambda z: cx.CX(-z.re, -z.im)))
        super().__init__(terms, dtype)


class CallableNEP:
    """Arbitrary host callable z -> numpy matrix (reference parity mode).

    Node-factorizations still batch fine (contour nodes are static), but the
    per-Ritz residual T(lam) x must run on host, so drivers fall back to a
    host residual loop when given one of these.
    """

    def __init__(self, fn: Callable, n: int, dtype=None):
        self.fn = fn
        self.n = n
        self.dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                               else jnp.float32)

    def eval_nodes(self, z: CX, out_dtype=None) -> CX:
        zs = np.asarray(z.re) + 1j * np.asarray(z.im)
        mats = np.stack([np.asarray(self.fn(complex(zi)), dtype=np.complex128)
                         for zi in zs])
        return cx.from_numpy(mats, out_dtype or self.dtype)

    def host_apply_cols(self, Xn: np.ndarray, lamn: np.ndarray) -> np.ndarray:
        cols = [np.asarray(self.fn(complex(l)), dtype=np.complex128) @ Xn[:, i]
                for i, l in enumerate(lamn)]
        return np.stack(cols, axis=1)

    def host_fro_norms(self, lamn: np.ndarray) -> np.ndarray:
        return np.array([np.linalg.norm(np.asarray(self.fn(complex(l))))
                         for l in lamn])


def as_nep(T, n=None, dtype=None):
    """Coerce user input into a NEP object."""
    if isinstance(T, (SPMF, CallableNEP)):
        return T
    if callable(T):
        if n is None:
            raise ValueError("CallableNEP needs the problem size n")
        return CallableNEP(T, n, dtype)
    if isinstance(T, (list, tuple)):
        return PolynomialNEP(T, dtype)
    raise TypeError(f"cannot interpret {type(T)} as a NEP")
