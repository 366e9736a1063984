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


@functools.partial(jax.jit,
                   static_argnames=("offsets", "bn", "span"))
def _dia_matvec_pallas_padded(dre, dim, xre, xim, offsets, bn: int,
                              span: int):
    """Core kernel on pre-padded operands.

    dre/dim: (ndiag, n_pad) row-indexed diagonal data, zero-padded.
    xre/xim: (n_pad + span, m) — X pre-shifted so padded row j holds
    x_original[j + min(offsets)] (zero outside range); the union window
    for output block [i0, i0+bn) then starts exactly at padded row i0.
    Grid over row blocks; each step DMAs ONE
    (bn + span, m) window of X from HBM into VMEM scratch and accumulates
    every diagonal from in-VMEM static shifted slices — X is read once per
    block instead of once per diagonal (the XLA shifted-slice formulation's
    traffic is ndiag * n * m)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndiag, n_pad = dre.shape
    m = xre.shape[1]
    grid = (n_pad // bn,)
    min_off = min(offsets)

    def kernel(dre_ref, dim_ref, xre_hbm, xim_hbm, yre_ref, yim_ref,
               xre_w, xim_w, sem_re, sem_im):
        i = pl.program_id(0)
        start = i * bn  # x is pre-shifted: union window starts at i*bn
        cp_re = pltpu.make_async_copy(
            xre_hbm.at[pl.ds(start, bn + span)], xre_w, sem_re)
        cp_im = pltpu.make_async_copy(
            xim_hbm.at[pl.ds(start, bn + span)], xim_w, sem_im)
        cp_re.start()
        cp_im.start()
        cp_re.wait()
        cp_im.wait()
        acc_re = jnp.zeros((bn, m), jnp.float32)
        acc_im = jnp.zeros((bn, m), jnp.float32)
        for k, off in enumerate(offsets):
            s = off - min_off  # static in-window shift
            xr = xre_w[s:s + bn, :]
            xi = xim_w[s:s + bn, :]
            ar = dre_ref[k, :][:, None]
            ai = dim_ref[k, :][:, None]
            acc_re += ar * xr - ai * xi
            acc_im += ar * xi + ai * xr
        yre_ref[:] = acc_re
        yim_ref[:] = acc_im

    out_shape = (jax.ShapeDtypeStruct((n_pad, m), jnp.float32),
                 jax.ShapeDtypeStruct((n_pad, m), jnp.float32))
    yre, yim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ndiag, bn), lambda i: (0, i)),
            pl.BlockSpec((ndiag, bn), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec((bn, m), lambda i: (i, 0)),
                   pl.BlockSpec((bn, m), lambda i: (i, 0))),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bn + span, m), jnp.float32),
            pltpu.VMEM((bn + span, m), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_INTERPRET,
    )(dre, dim, xre, xim)
    return yre, yim


def dia_matvec_pallas(A, X: CX, bn: int = 1024) -> CX:
    """A @ X for a `sparse.DIA` operator via the fused halo-window kernel.

    Falls back to the XLA shifted-slice formulation off-TPU, for f64
    (emulated — no Pallas path), or when the band span is too wide for the
    window to pay off.  Returns (n, m) CX like `DIA.matvec`.

    MEASURED (v5e, 2026-08-17, benchmarks/results/spmm_bandwidth.json):
    this kernel LOSES to the XLA shifted-slice path by ~14x at n=1e6,
    ndiag=5, m=16.  XLA's fusion of the static shifted slices already runs
    at 714 GB/s effective (85% of the 840 GB/s stream roofline), while the
    manual-DMA kernel pays the 128-lane padding of the skinny X block (8x
    the useful bytes for m=16) and is single-buffered (DMA latency-bound).
    Kept as a wired, tested reference point behind
    `sparse.set_spmm_backend("pallas")` — default stays "xla"."""
    n, ncols = A.shape
    offsets = A.offsets
    span = max(offsets) - min(offsets)
    if (A.data.re.dtype != jnp.float32 or not _pallas_available()
            or span > bn // 2 or len(offsets) < 2):
        return A._matvec_xla(X)
    n_pad = -(-n // bn) * bn
    dre = jnp.pad(A.data.re, ((0, 0), (0, n_pad - n)))
    dim = jnp.pad(A.data.im, ((0, 0), (0, n_pad - n)))
    # output row i reads x[i + off] for each diagonal; pre-shift X so that
    # padded row j holds x[j + min_off]: the union window for output block
    # [i0, i0+bn) is exactly padded rows [i0, i0+bn+span).  Columns pad to
    # the 128-lane tile: the manual HBM->VMEM window DMA requires lane
    # alignment, and HBM stores the array 128-lane padded anyway (same
    # physical traffic).
    mo = min(offsets)
    span = -(-span // 8) * 8  # sublane-align the halo (f32 tile = 8 rows):
    #                           DMA windows of bn+span rows stay tile-aligned
    need = n_pad + span
    m = X.re.shape[1]
    m_pad = -(-m // 128) * 128

    def shift_pad(x):
        head = max(0, -mo)
        xs = x if mo <= 0 else x[mo:]
        tail = need - head - xs.shape[0]
        return jnp.pad(xs, ((head, max(0, tail)),
                            (0, m_pad - m)))[:need]

    yre, yim = _dia_matvec_pallas_padded(dre, dim, shift_pad(X.re),
                                         shift_pad(X.im), offsets, bn, span)
    return CX(yre[:n, :m], yim[:n, :m])


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
