"""Complex arrays as pairs of real arrays — the TPU-native complex "dtype".

TPU hardware has no complex element types (XLA:TPU rejects C64/C128 outright),
so every complex-arithmetic kernel in this framework operates on a `CX` pair of
real arrays (re, im).  Complex matmul lowers to three real matmuls (Karatsuba),
which ride the MXU directly; elementwise complex ops lower to VPU-friendly real
ops.  On CPU (tests / x64 golden runs) the same code path runs in float64,
giving bit-level parity with a complex128 formulation up to matmul-ordering
rounding.

This replaces the reference's reliance on BLAS/LAPACK complex types
(FEASTSolver.jl `src/lapack.jl`, stdlib `mul!`/`ldiv!` on ComplexF64): instead
of FFI-ing into zgemm, the complex product is expressed so XLA tiles it onto
the systolic array.

`CX` is a pytree (NamedTuple), so it passes transparently through jit / vmap /
scan / shard_map.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

Real = Union[int, float, jax.Array]


class CX(NamedTuple):
    """A complex tensor stored as separate real and imaginary parts."""

    re: jax.Array
    im: jax.Array

    # ---- metadata ----
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    @property
    def T(self) -> "CX":
        return CX(self.re.T, self.im.T)

    def mT(self) -> "CX":
        return CX(jnp.swapaxes(self.re, -1, -2), jnp.swapaxes(self.im, -1, -2))

    @property
    def H(self) -> "CX":
        """Conjugate transpose (last two axes)."""
        return CX(jnp.swapaxes(self.re, -1, -2), -jnp.swapaxes(self.im, -1, -2))

    # ---- arithmetic ----
    def __add__(self, o):
        o = as_cx(o, self.dtype)
        return CX(self.re + o.re, self.im + o.im)

    def __radd__(self, o):
        return self.__add__(o)

    def __sub__(self, o):
        o = as_cx(o, self.dtype)
        return CX(self.re - o.re, self.im - o.im)

    def __rsub__(self, o):
        o = as_cx(o, self.dtype)
        return CX(o.re - self.re, o.im - self.im)

    def __neg__(self):
        return CX(-self.re, -self.im)

    def __mul__(self, o):
        """Elementwise complex multiply."""
        if isinstance(o, (int, float)) or (
            isinstance(o, (jax.Array, np.ndarray)) and not np.iscomplexobj(o)
        ):
            return CX(self.re * o, self.im * o)
        o = as_cx(o, self.dtype)
        return CX(
            self.re * o.re - self.im * o.im,
            self.re * o.im + self.im * o.re,
        )

    def __rmul__(self, o):
        return self.__mul__(o)

    def __truediv__(self, o):
        if isinstance(o, (int, float)) or (
            isinstance(o, (jax.Array, np.ndarray)) and not np.iscomplexobj(o)
        ):
            return CX(self.re / o, self.im / o)
        o = as_cx(o, self.dtype)
        return cdiv(self, o)

    def __rtruediv__(self, o):
        o = as_cx(o, self.dtype)
        return cdiv(o, self)

    def __matmul__(self, o):
        o = as_cx(o, self.dtype)
        return cmatmul(self, o)

    # ---- indexing / shaping ----
    def __getitem__(self, idx):
        return CX(self.re[idx], self.im[idx])

    def reshape(self, *shape):
        return CX(self.re.reshape(*shape), self.im.reshape(*shape))

    def astype(self, dtype):
        return CX(self.re.astype(dtype), self.im.astype(dtype))

    def conj(self) -> "CX":
        return CX(self.re, -self.im)

    def at_set(self, idx, value: "CX") -> "CX":
        value = as_cx(value, self.dtype)
        return CX(self.re.at[idx].set(value.re), self.im.at[idx].set(value.im))

    def at_add(self, idx, value: "CX") -> "CX":
        value = as_cx(value, self.dtype)
        return CX(self.re.at[idx].add(value.re), self.im.at[idx].add(value.im))


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------

def as_cx(x, dtype=None) -> CX:
    """Coerce scalars / real or complex arrays / CX into CX."""
    if isinstance(x, CX):
        return x
    if isinstance(x, complex):
        r = jnp.asarray(x.real, dtype=dtype)
        return CX(r, jnp.asarray(x.imag, dtype=r.dtype))
    if isinstance(x, (int, float)):
        r = jnp.asarray(x, dtype=dtype)
        return CX(r, jnp.zeros_like(r))
    x = np.asarray(x) if isinstance(x, np.ndarray) else x
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        rdt = dtype or _real_dtype_of(x.dtype)
        return CX(jnp.asarray(x.real, dtype=rdt), jnp.asarray(x.imag, dtype=rdt))
    arr = jnp.asarray(x, dtype=dtype)
    if jnp.iscomplexobj(arr):  # jax complex array (CPU path)
        return CX(jnp.real(arr), jnp.imag(arr))
    return CX(arr, jnp.zeros_like(arr))


def _real_dtype_of(cdtype):
    return jnp.float32 if np.dtype(cdtype) == np.complex64 else jnp.float64


def zeros(shape, dtype=jnp.float64) -> CX:
    z = jnp.zeros(shape, dtype=dtype)
    return CX(z, jnp.zeros_like(z))


def eye(n, dtype=jnp.float64) -> CX:
    return CX(jnp.eye(n, dtype=dtype), jnp.zeros((n, n), dtype=dtype))


def full_like(x: CX, val: complex) -> CX:
    return CX(
        jnp.full_like(x.re, val.real if isinstance(val, complex) else val),
        jnp.full_like(x.im, val.imag if isinstance(val, complex) else 0.0),
    )


def from_numpy(z: np.ndarray, dtype=jnp.float64) -> CX:
    z = np.asarray(z)
    im = np.imag(z)
    if im.size and not np.any(im):
        # Real input: materialize the imaginary half as a DEVICE-side zero
        # fill instead of uploading a zero buffer.  Through the remote-TPU
        # tunnel (~25 MB/s) this matters enormously: a real 100k-dof FEM
        # pencil's AMG hierarchy is 1.81 GB of which 0.90 GB was all-zero
        # imaginary parts — every fresh worker paid ~35 s uploading zeros.
        return CX(jnp.asarray(z.real, dtype=dtype),
                  jnp.zeros(z.shape, dtype))
    return CX(jnp.asarray(z.real, dtype=dtype), jnp.asarray(im, dtype=dtype))


def to_numpy(x: CX) -> np.ndarray:
    return np.asarray(x.re) + 1j * np.asarray(x.im)


def expi(theta) -> CX:
    """e^{i theta} for real theta."""
    return CX(jnp.cos(theta), jnp.sin(theta))


# ---------------------------------------------------------------------------
# arithmetic kernels
# ---------------------------------------------------------------------------

_GEMM_BACKEND = "xla"  # "xla" | "pallas" (f32 2-D fused kernel, TPU only)


def set_gemm_backend(name: str):
    """Select the complex-GEMM backend: "xla" (default, 3-matmul Karatsuba)
    or "pallas" (ops/pallas_kernels.cmatmul_pallas — fused tiles, f32 2-D
    shapes on TPU; everything else silently falls back to XLA)."""
    global _GEMM_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown gemm backend {name!r}")
    _GEMM_BACKEND = name


def cmatmul(a: CX, b: CX, precision=jax.lax.Precision.HIGHEST) -> CX:
    """Complex matmul via 3 real matmuls (Karatsuba / Gauss trick).

    (Ar + iAi)(Br + iBi):  t1 = Ar@Br, t2 = Ai@Bi, t3 = (Ar+Ai)@(Br+Bi)
    re = t1 - t2, im = t3 - t1 - t2.
    Saves 25% of MXU work vs. the 4-matmul form; the extra additions are
    HBM-bandwidth-cheap relative to the O(n^3) products.
    """
    if (_GEMM_BACKEND == "pallas" and a.re.ndim == 2 and b.re.ndim == 2
            and a.dtype == jnp.float32):
        from .ops.pallas_kernels import cmatmul_pallas

        return cmatmul_pallas(a, b)
    return _cmatmul_xla(a, b, precision)


def _cmatmul_xla(a: CX, b: CX, precision=jax.lax.Precision.HIGHEST) -> CX:
    t1 = jnp.matmul(a.re, b.re, precision=precision)
    t2 = jnp.matmul(a.im, b.im, precision=precision)
    t3 = jnp.matmul(a.re + a.im, b.re + b.im, precision=precision)
    return CX(t1 - t2, t3 - t1 - t2)


def cdiv(a: CX, b: CX) -> CX:
    """Elementwise complex division (Smith's algorithm for robustness)."""
    # Smith: avoids overflow of c^2+d^2
    c, d = b.re, b.im
    big = jnp.abs(c) >= jnp.abs(d)
    # branch 1: r = d/c, den = c + d*r
    r1 = d / jnp.where(c == 0, 1.0, c)
    den1 = c + d * r1
    re1 = (a.re + a.im * r1) / den1
    im1 = (a.im - a.re * r1) / den1
    # branch 2: r = c/d, den = c*r + d
    r2 = c / jnp.where(d == 0, 1.0, d)
    den2 = c * r2 + d
    re2 = (a.re * r2 + a.im) / den2
    im2 = (a.im * r2 - a.re) / den2
    return CX(jnp.where(big, re1, re2), jnp.where(big, im1, im2))


def abs2(a: CX) -> jax.Array:
    return a.re * a.re + a.im * a.im


def cabs(a: CX) -> jax.Array:
    return jnp.hypot(a.re, a.im)


def creciprocal(a: CX) -> CX:
    return cdiv(as_cx(1.0, a.dtype), a)


def hdot(a, b):
    """Real matmul at Precision.HIGHEST — for the raw row/vector dots
    inside the LU/QR/QZ/Schur kernels.  jax's DEFAULT matmul precision on
    TPU lowers even x64-emulated operands to ~bf16x3 passes; every dot in
    this package must be explicit rather than depending on the host
    program's global precision config."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def cdot_cols(a: CX, b: CX) -> CX:
    """Column-wise inner products: sum_i conj(a[i,j]) * b[i,j] -> (cols,)."""
    re = jnp.sum(a.re * b.re + a.im * b.im, axis=0)
    im = jnp.sum(a.re * b.im - a.im * b.re, axis=0)
    return CX(re, im)


def cgram(a: CX, b: Optional[CX] = None) -> CX:
    """a^H @ b (or a^H @ a) via elementwise products + add-reduction.

    Numerically equivalent to `cmatmul(a.H, b)` but NOT routed through the
    MXU: on TPU the emulated-f64 matmul accumulates its long contraction
    axis at ~f32 grade even at Precision.HIGHEST (measured on-chip: a
    (40000, 8) Gram wrong at 2e-8 relative, which capped CholeskyQR2
    orthogonality at 1.7e-5 and on-device Ritz values at ~1e-6 relative).
    Elementwise multiplies and the tree add-reduction stay at full
    emulated-f64 accuracy.  Cost is O(n m_a m_b) VPU work and ~m-fold the
    matmul's bandwidth — use for the small m0-wide subspace Grams, never
    for wide GEMMs.

    HARDWARE dtypes (f32/bf16) take the MXU matmul directly: the
    accumulation weakness is specific to the emulated-f64 pair format,
    and for native f32 the elementwise form is the same accuracy at
    ~m-fold the bandwidth (the f32 coarse tier calls this every sweep).
    """
    if b is None:
        b = a
    if a.re.dtype != jnp.float64:
        return cmatmul(a.H, b)
    are, aim = a.re[:, :, None], a.im[:, :, None]
    bre, bim = b.re[:, None, :], b.im[:, None, :]
    re = jnp.sum(are * bre + aim * bim, axis=0)
    im = jnp.sum(are * bim - aim * bre, axis=0)
    return CX(re, im)


def col_norms(a: CX) -> jax.Array:
    return jnp.sqrt(jnp.sum(abs2(a), axis=0))


def fro_norm(a: CX) -> jax.Array:
    return jnp.sqrt(jnp.sum(abs2(a)))


def normalize_cols(a: CX, eps=0.0) -> CX:
    """Scale each column to unit 2-norm (reference utils.jl:144-149)."""
    nrm = col_norms(a)
    nrm = jnp.where(nrm == 0, 1.0, nrm)
    return CX(a.re / nrm, a.im / nrm)


def scale_cols(a: CX, s: CX) -> CX:
    """a @ diag(s) — columnwise complex scaling (reference rmul!(., Diagonal(s)))."""
    s = as_cx(s, a.dtype)
    return CX(a.re * s.re - a.im * s.im, a.re * s.im + a.im * s.re)


def cpow_scalar(z: CX, p: int) -> CX:
    """Integer power of a (batched) complex scalar via repeated squaring."""
    result = as_cx(1.0, z.dtype)
    result = CX(jnp.broadcast_to(result.re, z.shape), jnp.broadcast_to(result.im, z.shape))
    base = z
    while p > 0:
        if p & 1:
            result = result * base
        base = base * base
        p >>= 1
    return result


def csqrt(a: CX) -> CX:
    """Principal square root of complex numbers stored as pairs."""
    m = cabs(a)
    re = jnp.sqrt(jnp.maximum((m + a.re) / 2, 0.0))
    im_mag = jnp.sqrt(jnp.maximum((m - a.re) / 2, 0.0))
    im = jnp.where(a.im >= 0, im_mag, -im_mag)
    return CX(re, im)


def phase(a: CX, eps=0.0) -> CX:
    """a/|a| with a->1 guard at zero (used for Householder sign choice)."""
    m = cabs(a)
    safe = m > eps
    m_ = jnp.where(safe, m, 1.0)
    return CX(jnp.where(safe, a.re / m_, 1.0), jnp.where(safe, a.im / m_, 0.0))


def stack(xs, axis=0) -> CX:
    return CX(
        jnp.stack([x.re for x in xs], axis=axis),
        jnp.stack([x.im for x in xs], axis=axis),
    )


def concatenate(xs, axis=0) -> CX:
    return CX(
        jnp.concatenate([x.re for x in xs], axis=axis),
        jnp.concatenate([x.im for x in xs], axis=axis),
    )


def where(cond, a: CX, b: CX) -> CX:
    return CX(jnp.where(cond, a.re, b.re), jnp.where(cond, a.im, b.im))


def take_cols(a: CX, idx) -> CX:
    return CX(a.re[:, idx], a.im[:, idx])
