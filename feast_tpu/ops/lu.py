"""Batched dense complex LU with partial pivoting + triangular solves.

TPU-native replacement for the reference's LAPACK `zgetrf`/`zgetrs` path
(FEASTSolver.jl: `factorizer=lu` default at feast.jl:5, per-node `lu!` at
beyn.jl:18, cached factorizations at feast.jl:28-38 / nlfeast.jl:17-28).

Design (TPU-first, not a LAPACK translation):
  * complex arithmetic = CX real pairs (see cx.py); the trailing-submatrix
    update is a Karatsuba complex GEMM that rides the MXU;
  * right-looking *blocked* factorization with a **static Python block loop**
    (block edges are compile-time constants, so every slice is static and XLA
    sees fixed-shape GEMMs — no masking waste on the O(n^3) work);
  * the O(n·b^2) panel factorization runs in a `lax.fori_loop` with dynamic
    row/column indexing (VPU work, negligible vs the GEMM);
  * partial pivoting by |.|^2 argmax; swaps are recorded per panel and applied
    to the off-panel columns as a single gather (LAPACK laswp equivalent);
  * everything is jit/vmap-safe: `vmap(lu_factor)` batches over contour nodes,
    which is how the per-node factorization cache of the reference becomes one
    batched tensor (nodes, n, n).

Zero pivots are guarded (replaced by eps-scaled values) so singular shifted
matrices produce large-but-finite results instead of NaN — the driver detects
these through residuals, mirroring the reference's (absent) handling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .. import cx
from ..cx import CX


# ---------------------------------------------------------------------------
# small dynamic-index helpers (traced row/col index)
# ---------------------------------------------------------------------------

def _get_col(P: CX, k) -> CX:
    m = P.shape[0]
    return CX(
        lax.dynamic_slice(P.re, (0, k), (m, 1))[:, 0],
        lax.dynamic_slice(P.im, (0, k), (m, 1))[:, 0],
    )


def _set_col(P: CX, k, col: CX) -> CX:
    return CX(
        lax.dynamic_update_slice(P.re, col.re[:, None], (0, k)),
        lax.dynamic_update_slice(P.im, col.im[:, None], (0, k)),
    )


def _get_row(P: CX, k) -> CX:
    n = P.shape[1]
    return CX(
        lax.dynamic_slice(P.re, (k, 0), (1, n))[0],
        lax.dynamic_slice(P.im, (k, 0), (1, n))[0],
    )


def _swap_rows(P: CX, i, j) -> CX:
    ri, rj = _get_row(P, i), _get_row(P, j)
    P = CX(lax.dynamic_update_slice(P.re, rj.re[None, :], (i, 0)),
           lax.dynamic_update_slice(P.im, rj.im[None, :], (i, 0)))
    P = CX(lax.dynamic_update_slice(P.re, ri.re[None, :], (j, 0)),
           lax.dynamic_update_slice(P.im, ri.im[None, :], (j, 0)))
    return P


def _scalar(P: CX, i, j) -> CX:
    return CX(lax.dynamic_slice(P.re, (i, j), (1, 1))[0, 0],
              lax.dynamic_slice(P.im, (i, j), (1, 1))[0, 0])


# ---------------------------------------------------------------------------
# panel factorization (unblocked, fori_loop)
# ---------------------------------------------------------------------------

def _panel_lu(P: CX):
    """LU with partial pivoting of an (m, b) panel, m >= b.

    Returns (P_factored, swaps) where swaps[k] is the row swapped with row k
    at step k (local panel row indices).  L has unit diagonal, stored below,
    U on/above; multipliers overwrite the eliminated entries.
    """
    m, b = P.shape
    rows = jnp.arange(m)
    eps = jnp.finfo(P.dtype).eps
    # zero-pivot substitute scaled to the panel (LAPACK safe-minimum style):
    # an absolute eps^2 either fails to bound multipliers (norm >> 1) or
    # masks genuine pivots (norm << 1)
    pscale = jnp.sqrt(jnp.max(cx.abs2(P)))
    tiny = eps * jnp.maximum(pscale, jnp.finfo(P.dtype).tiny ** 0.5)

    def body(k, state):
        P, swaps = state
        col = _get_col(P, k)
        mag = cx.abs2(col)
        mag = jnp.where(rows >= k, mag, -1.0)
        p = jnp.argmax(mag)
        swaps = swaps.at[k].set(p.astype(jnp.int32))
        P = _swap_rows(P, k, p)
        col = _get_col(P, k)
        piv = _scalar(P, k, k)
        pmag2 = cx.abs2(piv)
        # guard exact zero pivot: substitute a panel-scaled tiny value
        piv = cx.where(pmag2 > 0.0, piv,
                       CX(jnp.full((), tiny, P.dtype), jnp.zeros((), P.dtype)))
        inv = cx.creciprocal(piv)
        below = rows > k
        mult = cx.where(below, col * inv, col)
        P = _set_col(P, k, mult)
        # rank-1 trailing update restricted to panel: rows>k, cols>k
        rowk = _get_row(P, k)
        cols = jnp.arange(b)
        rmask = below.astype(P.dtype)
        cmask = (cols > k).astype(P.dtype)
        mr = CX(mult.re * rmask, mult.im * rmask)
        rk = CX(rowk.re * cmask, rowk.im * cmask)
        upd = CX(mr.re[:, None] * rk.re[None, :] - mr.im[:, None] * rk.im[None, :],
                 mr.re[:, None] * rk.im[None, :] + mr.im[:, None] * rk.re[None, :])
        return P - upd, swaps

    swaps0 = jnp.zeros((b,), jnp.int32)
    P, swaps = lax.fori_loop(0, min(b, m), body, (P, swaps0))
    return P, swaps


def _swaps_to_perm(swaps, m):
    """Compose the sequential row swaps into a single permutation of 0..m-1."""
    perm = jnp.arange(m)

    def body(k, perm):
        p = swaps[k]
        pk, pp = perm[k], perm[p]
        return perm.at[k].set(pp).at[p].set(pk)

    return lax.fori_loop(0, swaps.shape[0], body, perm)


# ---------------------------------------------------------------------------
# small triangular solves (fori_loop over rows)
# ---------------------------------------------------------------------------

def _unit_lower_solve_small(L: CX, B: CX) -> CX:
    """Solve L X = B with L (b,b) unit lower triangular, B (b, k)."""
    b = L.shape[0]
    cols = jnp.arange(b)

    def body(i, B):
        mask = (cols < i).astype(L.dtype)
        rowL = _get_row(L, i)
        rowL = CX(rowL.re * mask, rowL.im * mask)
        # num = rowL @ B
        num = CX(cx.hdot(rowL.re, B.re) - cx.hdot(rowL.im, B.im),
                 cx.hdot(rowL.re, B.im) + cx.hdot(rowL.im, B.re))
        rowB = _get_row(B, i)
        new = rowB - num
        return CX(lax.dynamic_update_slice(B.re, new.re[None, :], (i, 0)),
                  lax.dynamic_update_slice(B.im, new.im[None, :], (i, 0)))

    return lax.fori_loop(0, b, body, B)


def _upper_solve_small(U: CX, B: CX) -> CX:
    """Solve U X = B with U (b,b) upper triangular (general diagonal)."""
    b = U.shape[0]
    cols = jnp.arange(b)
    eps = jnp.finfo(U.dtype).eps
    uscale = jnp.sqrt(jnp.max(cx.abs2(U)))
    tiny = eps * jnp.maximum(uscale, jnp.finfo(U.dtype).tiny ** 0.5)

    def body(t, B):
        i = b - 1 - t
        mask = (cols > i).astype(U.dtype)
        rowU = _get_row(U, i)
        rowUm = CX(rowU.re * mask, rowU.im * mask)
        num = CX(cx.hdot(rowUm.re, B.re) - cx.hdot(rowUm.im, B.im),
                 cx.hdot(rowUm.re, B.im) + cx.hdot(rowUm.im, B.re))
        d = _scalar(U, i, i)
        dmag2 = cx.abs2(d)
        d = cx.where(dmag2 > 0.0, d,
                     CX(jnp.full((), tiny, U.dtype), jnp.zeros((), U.dtype)))
        rowB = _get_row(B, i)
        new = cx.cdiv(rowB - num, CX(jnp.broadcast_to(d.re, rowB.shape),
                                     jnp.broadcast_to(d.im, rowB.shape)))
        return CX(lax.dynamic_update_slice(B.re, new.re[None, :], (i, 0)),
                  lax.dynamic_update_slice(B.im, new.im[None, :], (i, 0)))

    return lax.fori_loop(0, b, body, B)


def lu_diag_inv(LU: CX, block: int):
    """Explicit inverses of the (block, block) diagonal blocks of L (unit
    lower) and U — the solve accelerator for latency-bound repeated solves.

    The in-place small triangular solves are b-step sequential fori_loops;
    a blocked (n, k) solve runs 2*(n/b)*b sequential steps (~8200 at
    n=4096, ~14ms each solve on a remote TPU).  Multiplying by a
    precomputed inverse turns every diagonal-block solve into one MXU GEMM.
    Inversion costs ~one extra solve (amortized over the store=True FEAST
    iteration loop); |L| <= 1 from partial pivoting keeps the inverses
    well-scaled, and the mixed-precision IR loop scrubs the extra
    rounding.  Returns (invL, invU), each (nblocks, block, block) stacked
    over PADDED blocks (identity extension, matching `_lu_solve_fori`)."""
    n = LU.shape[0]
    n_pad = -(-n // block) * block
    if n_pad != n:
        ext = n_pad - n
        LUre = jnp.pad(LU.re, ((0, ext), (0, ext)))
        LUre = LUre.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
        LU = CX(LUre, jnp.pad(LU.im, ((0, ext), (0, ext))))
    nb = n_pad // block
    starts = jnp.arange(nb) * block

    def get(j):
        return CX(lax.dynamic_slice(LU.re, (j, j), (block, block)),
                  lax.dynamic_slice(LU.im, (j, j), (block, block)))

    D = jax.vmap(get)(starts)
    rows = jnp.arange(block)
    lmask = (rows[:, None] > rows[None, :]).astype(LU.dtype)
    umask = (rows[:, None] <= rows[None, :]).astype(LU.dtype)
    eyeb = jnp.eye(block, dtype=LU.dtype)
    Ld = CX(D.re * lmask + eyeb[None], D.im * lmask)
    Ud = CX(D.re * umask, D.im * umask)
    eye_cx = CX(jnp.broadcast_to(eyeb, (nb, block, block)),
                jnp.zeros((nb, block, block), LU.dtype))
    invL = jax.vmap(_unit_lower_solve_small)(Ld, eye_cx)
    invU = jax.vmap(_upper_solve_small)(Ud, eye_cx)
    return invL, invU


# ---------------------------------------------------------------------------
# fori-loop factorization (large n): one aliased carry buffer
# ---------------------------------------------------------------------------
#
# The python-unrolled block loop below ("unrolled" path) gives XLA one full
# (n, n) rebuild per block; at n ~ 10^4 the scheduler keeps dozens of those
# 0.4-3 GB planes live simultaneously (observed 42 GB of HLO temps on a
# 16 GB chip).  The fori formulation carries ONE matrix buffer through
# `lax.fori_loop` (aliased in place by XLA), with every per-block slice a
# static-size dynamic_slice and the trailing update a masked full-width
# (n, b) x (b, n) GEMM — ~3x the minimal LU flops, but flops are cheap on
# the MXU and memory/compile-time are what bind at scale.

def _panel_lu_slab(slab: CX, j0, n_all: int, block: int):
    """LU factor the (n_all, block) column slab in place, eliminating rows
    j0..j0+block-1 (global pivot rows).  Returns (slab, swaps) with swaps
    the GLOBAL row index swapped with j0+k at step k."""
    rows = jnp.arange(n_all)
    eps = jnp.finfo(slab.dtype).eps
    pscale = jnp.sqrt(jnp.max(cx.abs2(slab)))
    tiny = eps * jnp.maximum(pscale, 1e-30)

    def body(k, state):
        slab, swaps = state
        g = j0 + k
        col = _get_col(slab, k)
        mag = jnp.where(rows >= g, cx.abs2(col), -1.0)
        p = jnp.argmax(mag)
        swaps = swaps.at[k].set(p.astype(jnp.int32))
        slab = _swap_rows(slab, g, p)
        col = _get_col(slab, k)
        piv = _scalar(slab, g, k)
        piv = cx.where(cx.abs2(piv) > 0.0, piv,
                       CX(jnp.full((), tiny, slab.dtype),
                          jnp.zeros((), slab.dtype)))
        inv = cx.creciprocal(piv)
        below = rows > g
        mult = cx.where(below, col * inv, col)
        slab = _set_col(slab, k, mult)
        rowg = _get_row(slab, g)
        cols = jnp.arange(block)
        rmask = below.astype(slab.dtype)
        cmask = (cols > k).astype(slab.dtype)
        mr = CX(mult.re * rmask, mult.im * rmask)
        rk = CX(rowg.re * cmask, rowg.im * cmask)
        upd = CX(mr.re[:, None] * rk.re[None, :] - mr.im[:, None] * rk.im[None, :],
                 mr.re[:, None] * rk.im[None, :] + mr.im[:, None] * rk.re[None, :])
        return slab - upd, swaps

    swaps0 = jnp.zeros((block,), jnp.int32)
    return lax.fori_loop(0, block, body, (slab, swaps0))


def _lu_factor_fori(A: CX, block: int):
    """Blocked LU via lax.fori_loop over block columns (see note above).

    A must be (n_pad, n_pad) with n_pad % block == 0 (caller pads)."""
    n = A.shape[0]
    nblocks = n // block
    rows = jnp.arange(n)

    def body(jb, state):
        A, perm = state
        j0 = jb * block
        slab = CX(lax.dynamic_slice(A.re, (0, j0), (n, block)),
                  lax.dynamic_slice(A.im, (0, j0), (n, block)))
        slab, swaps = _panel_lu_slab(slab, j0, n, block)
        # compose the block's swaps into a global row permutation
        def compose(k, p):
            g = j0 + k
            s = swaps[k]
            pg, ps = p[g], p[s]
            return p.at[g].set(ps).at[s].set(pg)

        p_n = lax.fori_loop(0, block, compose, jnp.arange(n))
        A = CX(A.re[p_n], A.im[p_n])
        perm = perm[p_n]
        A = CX(lax.dynamic_update_slice(A.re, slab.re, (0, j0)),
               lax.dynamic_update_slice(A.im, slab.im, (0, j0)))
        # U12: L11^{-1} applied to the pivot-row slab, only cols >= j0+block
        L11 = CX(lax.dynamic_slice(slab.re, (j0, 0), (block, block)),
                 lax.dynamic_slice(slab.im, (j0, 0), (block, block)))
        rowslab = CX(lax.dynamic_slice(A.re, (j0, 0), (block, n)),
                     lax.dynamic_slice(A.im, (j0, 0), (block, n)))
        Y = _unit_lower_solve_small(L11, rowslab)
        cols = jnp.arange(n)
        cmask = (cols >= j0 + block).astype(A.dtype)[None, :]
        newrow = CX(Y.re * cmask + rowslab.re * (1.0 - cmask),
                    Y.im * cmask + rowslab.im * (1.0 - cmask))
        A = CX(lax.dynamic_update_slice(A.re, newrow.re, (j0, 0)),
               lax.dynamic_update_slice(A.im, newrow.im, (j0, 0)))
        # trailing update with masked full-width operands:
        # rows >= j0+block of the L-panel, cols >= j0+block of U12
        rmask = (rows >= j0 + block).astype(A.dtype)[:, None]
        L21 = CX(slab.re * rmask, slab.im * rmask)
        U12 = CX(newrow.re * cmask, newrow.im * cmask)
        A = A - cx.cmatmul(L21, U12)
        return A, perm

    return lax.fori_loop(0, nblocks, body, (A, jnp.arange(n)))


def _lu_pad(A: CX, block: int):
    """Pad to a block multiple with an identity extension (its pivots are
    the 1.0 diagonals; zero coupling to the true part)."""
    n = A.shape[0]
    n_pad = -(-n // block) * block
    if n_pad == n:
        return A, n
    ext = n_pad - n
    re = jnp.pad(A.re, ((0, ext), (0, ext)))
    re = re.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
    im = jnp.pad(A.im, ((0, ext), (0, ext)))
    return CX(re, im), n


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _auto_block(n: int) -> int:
    """Panel width from the real-chip sweep (benchmarks/lu_tune.py,
    results/lu_tune.json): 64 wins to n=512, 128 wins at n>=1024 (20%
    faster factor than 256 at n=2048); larger panels only buy compile
    time, which the persistent cache already amortizes."""
    if n <= 512:
        return 64
    return 128


# Default "pallas" (r4): the whole-panel Mosaic kernel measured 2.61x
# faster than the XLA rank-1 panel loop on the bench shape (16xLU(4096)
# f32 1.131 s vs 2.953 s, benchmarks/results/lu_pallas.json) and 8%
# end-to-end on the dense headline (pallas_e2e.json).  The auto gate
# below still restricts it to f32, n >= 1024, n % 128 == 0, TPU.
_PANEL_BACKEND = "pallas"


def set_panel_backend(name: str):
    """Select the panel-factorization backend for f32 lu_factor: "xla"
    (rank-1 steps as fused XLA kernels) or "pallas" (whole-panel fusion,
    ops/pallas_lu.py — one launch per 128-column panel instead of 128;
    see benchmarks/lu_pallas.py for the measured comparison)."""
    global _PANEL_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown panel backend {name!r}")
    _PANEL_BACKEND = name


def lu_factor(A: CX, block: int = 0, loop: str = "auto"):
    """Blocked LU with partial pivoting: P A = L U.

    Returns (LU, perm) with L (unit diag) and U packed in LU, and perm the
    row permutation as an index vector (solve uses B[perm]).
    Batched use: `jax.vmap(lu_factor)` over a leading node axis.
    block=0 picks the size from n.

    loop: "unrolled" (python block loop — minimal flops, best for small n),
    "fori" (single aliased carry buffer + masked full-width trailing GEMMs
    — bounded memory and fast compiles at large n), "pallas" (whole-panel
    Pallas kernel, f32 + n % 128 == 0 only), "auto" picks by size and the
    set_panel_backend selection.
    """
    n = A.shape[0]
    assert A.shape[0] == A.shape[1], "lu_factor expects square matrices"
    if loop == "auto":
        # n <= 4096: the whole-panel kernel holds the full (n, 128) slab
        # pair + perm + body temps in VMEM — measured 19.71M > the 16M
        # scoped limit at n=8192 (block=64 does not help: the minor dim
        # pads back to the 128-lane tile).  Larger n stays on XLA.
        # Batch-tracer check: under vmap+x64 the pallas grid-batching
        # rule emits i64 index-map returns that Mosaic cannot legalize
        # (same as ops/eig._pallas_gate) — vmapped factors (the small-n
        # lu_factor_batched drivers) take the XLA path; scan-over-nodes
        # (the headline _factor_scan) keeps the Pallas kernel.
        if (_PANEL_BACKEND == "pallas" and A.re.dtype == jnp.float32
                and n % 128 == 0 and 1024 <= n <= 4096
                and "Batch" not in type(A.re).__name__
                and jax.default_backend() not in ("cpu",)):
            loop = "pallas"
        else:
            loop = "fori" if n > 4096 else "unrolled"
    if loop == "pallas":
        from . import pallas_lu

        return pallas_lu.lu_factor_pallas(A, block=block or 128)
    if loop == "fori":
        block = block or 512
        Ap, n_true = _lu_pad(A, block)
        LUp, permp = _lu_factor_fori(Ap, block)
        if Ap.shape[0] != n_true:
            LUp = CX(LUp.re[:n_true, :n_true], LUp.im[:n_true, :n_true])
            permp = permp[:n_true]
        return LUp, permp
    block = block or _auto_block(n)
    perm = jnp.arange(n)

    for j in range(0, n, block):
        b = min(block, n - j)
        # panel = A[j:, j:j+b]
        panel = CX(A.re[j:, j:j + b], A.im[j:, j:j + b])
        panel, swaps = _panel_lu(panel)
        sub_perm = _swaps_to_perm(swaps, n - j)  # permutation of rows j..n-1
        # apply row permutation to the off-panel columns and to perm
        left = CX(A.re[j:, :j][sub_perm], A.im[j:, :j][sub_perm])
        right = CX(A.re[j:, j + b:][sub_perm], A.im[j:, j + b:][sub_perm])
        perm = perm.at[j:].set(perm[j:][sub_perm])
        if right.shape[1] > 0:
            # U12 = L11^{-1} A12  (b x rest)
            L11 = CX(panel.re[:b, :b], panel.im[:b, :b])
            U12 = _unit_lower_solve_small(L11, CX(right.re[:b], right.im[:b]))
            # trailing update A22 -= L21 @ U12  (the MXU GEMM)
            L21 = CX(panel.re[b:, :b], panel.im[b:, :b])
            if L21.shape[0] > 0:
                A22 = CX(right.re[b:], right.im[b:]) - cx.cmatmul(L21, U12)
            else:
                A22 = CX(right.re[b:], right.im[b:])
            right = cx.concatenate([U12, A22], axis=0)
        # reassemble A
        bottom = cx.concatenate([left, panel, right], axis=1)
        A = CX(jnp.concatenate([A.re[:j], bottom.re], axis=0),
               jnp.concatenate([A.im[:j], bottom.im], axis=0))
    return A, perm


def _dinv_block(dinv_part: CX, jb, block: int) -> CX:
    return CX(lax.dynamic_slice(dinv_part.re, (jb, 0, 0),
                                (1, block, block))[0],
              lax.dynamic_slice(dinv_part.im, (jb, 0, 0),
                                (1, block, block))[0])


def _lu_solve_fori(LU: CX, perm, B: CX, block: int, dinv=None) -> CX:
    """lu_solve via lax.fori_loop over blocks (large n: one carry buffer,
    tiny compiled graph — the unrolled variant's ~80-block program is the
    compile-time long pole at n ~ 10^4).  Masked full-width row slabs, so
    n must be a block multiple (lu_factor's fori path pads; for a trimmed
    LU we re-pad here with identity extension rows)."""
    n = LU.shape[0]
    n_pad = -(-n // block) * block
    if n_pad != n:
        ext = n_pad - n
        LUre = jnp.pad(LU.re, ((0, ext), (0, ext)))
        LUre = LUre.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
        LU = CX(LUre, jnp.pad(LU.im, ((0, ext), (0, ext))))
        perm = jnp.concatenate([perm, jnp.arange(n, n_pad)])
        B = CX(jnp.pad(B.re, ((0, ext), (0, 0))),
               jnp.pad(B.im, ((0, ext), (0, 0))))
    np_, m = B.shape
    cols = jnp.arange(np_)
    X = CX(B.re[perm], B.im[perm])
    nblocks = np_ // block

    def fwd(jb, X):
        j = jb * block
        Lrow = CX(lax.dynamic_slice(LU.re, (j, 0), (block, np_)),
                  lax.dynamic_slice(LU.im, (j, 0), (block, np_)))
        lmask = (cols < j).astype(LU.dtype)[None, :]
        Lprev = CX(Lrow.re * lmask, Lrow.im * lmask)
        upd = cx.cmatmul(Lprev, X)
        Xd = CX(lax.dynamic_slice(X.re, (j, 0), (block, m)) - upd.re,
                lax.dynamic_slice(X.im, (j, 0), (block, m)) - upd.im)
        if dinv is not None:
            Xd = cx.cmatmul(_dinv_block(dinv[0], jb, block), Xd)
        else:
            Ld = CX(lax.dynamic_slice(LU.re, (j, j), (block, block)),
                    lax.dynamic_slice(LU.im, (j, j), (block, block)))
            Xd = _unit_lower_solve_small(Ld, Xd)
        return CX(lax.dynamic_update_slice(X.re, Xd.re, (j, 0)),
                  lax.dynamic_update_slice(X.im, Xd.im, (j, 0)))

    X = lax.fori_loop(0, nblocks, fwd, X)

    def bwd(t, X):
        jb = nblocks - 1 - t
        j = jb * block
        Urow = CX(lax.dynamic_slice(LU.re, (j, 0), (block, np_)),
                  lax.dynamic_slice(LU.im, (j, 0), (block, np_)))
        umask = (cols >= j + block).astype(LU.dtype)[None, :]
        Upost = CX(Urow.re * umask, Urow.im * umask)
        upd = cx.cmatmul(Upost, X)
        Xd = CX(lax.dynamic_slice(X.re, (j, 0), (block, m)) - upd.re,
                lax.dynamic_slice(X.im, (j, 0), (block, m)) - upd.im)
        if dinv is not None:
            Xd = cx.cmatmul(_dinv_block(dinv[1], jb, block), Xd)
        else:
            Ud = CX(lax.dynamic_slice(LU.re, (j, j), (block, block)),
                    lax.dynamic_slice(LU.im, (j, j), (block, block)))
            Xd = _upper_solve_small(Ud, Xd)
        return CX(lax.dynamic_update_slice(X.re, Xd.re, (j, 0)),
                  lax.dynamic_update_slice(X.im, Xd.im, (j, 0)))

    X = lax.fori_loop(0, nblocks, bwd, X)
    return CX(X.re[:n], X.im[:n])


def lu_solve(LU: CX, perm, B: CX, block: int = 0, loop: str = "auto",
             dinv=None) -> CX:
    """Solve A X = B given (LU, perm) from `lu_factor`.  B is (n, k).

    dinv: optional (invL, invU) from `lu_diag_inv` — replaces the
    sequential diagonal-block substitutions with MXU GEMMs (the repeated-
    solve fast path; see lu_diag_inv).  The block size is taken from dinv
    when given."""
    n = LU.shape[0]
    if dinv is not None:
        block = dinv[0].shape[-1]
    if loop == "auto":
        loop = "fori" if n > 4096 else "unrolled"
    if loop == "fori":
        return _lu_solve_fori(LU, perm, B, block or 512, dinv)
    block = block or _auto_block(n)
    X = CX(B.re[perm], B.im[perm])
    # forward: L X = B  (unit lower)
    for j in range(0, n, block):
        b = min(block, n - j)
        if j > 0:
            Lj = CX(LU.re[j:j + b, :j], LU.im[j:j + b, :j])
            upd = cx.cmatmul(Lj, CX(X.re[:j], X.im[:j]))
            X = CX(X.re.at[j:j + b].add(-upd.re), X.im.at[j:j + b].add(-upd.im))
        Xj = CX(X.re[j:j + b], X.im[j:j + b])
        if dinv is not None:
            jb = j // block
            Xd = cx.cmatmul(CX(dinv[0].re[jb][:b, :b],
                               dinv[0].im[jb][:b, :b]), Xj)
        else:
            Ld = CX(LU.re[j:j + b, j:j + b], LU.im[j:j + b, j:j + b])
            Xd = _unit_lower_solve_small(Ld, Xj)
        X = CX(X.re.at[j:j + b].set(Xd.re), X.im.at[j:j + b].set(Xd.im))
    # backward: U X = Y
    starts = list(range(0, n, block))
    for j in reversed(starts):
        b = min(block, n - j)
        if j + b < n:
            Uj = CX(LU.re[j:j + b, j + b:], LU.im[j:j + b, j + b:])
            upd = cx.cmatmul(Uj, CX(X.re[j + b:], X.im[j + b:]))
            X = CX(X.re.at[j:j + b].add(-upd.re), X.im.at[j:j + b].add(-upd.im))
        Xj = CX(X.re[j:j + b], X.im[j:j + b])
        if dinv is not None:
            jb = j // block
            Xd = cx.cmatmul(CX(dinv[1].re[jb][:b, :b],
                               dinv[1].im[jb][:b, :b]), Xj)
        else:
            Ud = CX(LU.re[j:j + b, j:j + b], LU.im[j:j + b, j:j + b])
            Xd = _upper_solve_small(Ud, Xj)
        X = CX(X.re.at[j:j + b].set(Xd.re), X.im.at[j:j + b].set(Xd.im))
    return X


def solve(A: CX, B: CX, block: int = 0) -> CX:
    """One-shot dense solve A X = B (factor + solve)."""
    LU, perm = lu_factor(A, block=block)
    return lu_solve(LU, perm, B, block=block)


# batched convenience wrappers (leading axis = contour node)
lu_factor_batched = jax.vmap(lu_factor, in_axes=(0,), out_axes=(0, 0))
lu_solve_batched = jax.vmap(lu_solve, in_axes=(0, 0, 0), out_axes=0)
solve_batched = jax.vmap(solve, in_axes=(0, 0), out_axes=0)
