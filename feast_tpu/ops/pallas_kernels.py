"""Pallas TPU kernels for the hot complex-arithmetic paths.

`cmatmul_pallas`: fused complex matmul C = A @ B on CX pairs.  The XLA
formulation (cx.cmatmul) issues three real matmuls (Karatsuba) and writes
three n x m intermediates to HBM before combining; this kernel keeps a tile
of both real and imaginary operands in VMEM, runs the three MXU contractions
per tile, and writes only the two output tiles — 3 intermediate
materializations saved, ~1.5x less HBM traffic on large shapes.

f32 only (the TPU MXU path; f64 pairs are emulated by XLA and stay on the
XLA formulation).  Falls back to cx.cmatmul off-TPU or for small/ragged
shapes where the tiling would pad more than it saves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import cx
from ..cx import CX


_INTERPRET = False  # interpret-mode for CPU correctness tests


def _pallas_available() -> bool:
    if _INTERPRET:
        return True
    try:
        import jax.experimental.pallas  # noqa: F401
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _pad_to(x, rows, cols):
    r, c = x.shape
    if r == rows and c == cols:
        return x
    return jnp.pad(x, ((0, rows - r), (0, cols - c)))


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def _cmatmul_pallas_padded(ar, ai, br, bi, bm: int, bn: int, bk: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = ar.shape
    _, N = br.shape
    grid = (M // bm, N // bn, K // bk)

    def kernel(ar_ref, ai_ref, br_ref, bi_ref, cr_ref, ci_ref, t1_ref, t2_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            t1_ref[:] = jnp.zeros_like(t1_ref)
            t2_ref[:] = jnp.zeros_like(t2_ref)
            cr_ref[:] = jnp.zeros_like(cr_ref)
            ci_ref[:] = jnp.zeros_like(ci_ref)

        arv, aiv = ar_ref[:], ai_ref[:]
        brv, biv = br_ref[:], bi_ref[:]
        # HIGHEST: full f32 accuracy on the MXU (default would be one bf16
        # pass — 1e-2 relative error, unusable for eigensolver work)
        hp = jax.lax.Precision.HIGHEST
        t1 = jnp.dot(arv, brv, preferred_element_type=jnp.float32, precision=hp)
        t2 = jnp.dot(aiv, biv, preferred_element_type=jnp.float32, precision=hp)
        t3 = jnp.dot(arv + aiv, brv + biv, preferred_element_type=jnp.float32,
                     precision=hp)
        t1_ref[:] += t1
        t2_ref[:] += t2
        ci_ref[:] += t3

        @pl.when(k == grid[2] - 1)
        def _():
            cr_ref[:] = t1_ref[:] - t2_ref[:]
            ci_ref[:] = ci_ref[:] - t1_ref[:] - t2_ref[:]

    out_shape = (jax.ShapeDtypeStruct((M, N), jnp.float32),
                 jax.ShapeDtypeStruct((M, N), jnp.float32))
    cr, ci = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
                   pl.BlockSpec((bm, bn), lambda i, j, k: (i, j))),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(ar, ai, br, bi)
    return cr, ci


def cmatmul_pallas(a: CX, b: CX, bm: int = 256, bn: int = 256,
                   bk: int = 256) -> CX:
    """Fused complex matmul; pads to tile multiples, slices back."""
    if a.dtype != jnp.float32 or not _pallas_available():
        return cx._cmatmul_xla(a, b)
    M, K = a.shape
    K2, N = b.shape
    if M * N * K < 64 ** 3:  # too small to beat the XLA path
        return cx._cmatmul_xla(a, b)
    bm = min(bm, max(128, M))
    bn = min(bn, max(128, N))
    bk = min(bk, max(128, K))
    Mp = -(-M // bm) * bm
    Np = -(-N // bn) * bn
    Kp = -(-K // bk) * bk
    ar = _pad_to(a.re, Mp, Kp)
    ai = _pad_to(a.im, Mp, Kp)
    br = _pad_to(b.re, Kp, Np)
    bi = _pad_to(b.im, Kp, Np)
    cr, ci = _cmatmul_pallas_padded(ar, ai, br, bi, bm, bn, bk)
    return CX(cr[:M, :N], ci[:M, :N])
