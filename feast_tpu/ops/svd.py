"""On-device complex SVD (tall-skinny) via QR + parallel one-sided Jacobi.

TPU-native replacement for the reference's LAPACK `zgesdd` path
(FEASTSolver.jl: `svd!` at utils.jl:70 for the Beyn extraction, nlfeast.jl:218
for the block-Hankel compression, feast.jl:199 for bi-orthogonalization).

Algorithm:
  1. reduce (n, m) -> (m, m) by CholeskyQR2 (MXU GEMMs, see qr.py) — or
     Householder for very ill-conditioned inputs;
  2. one-sided Jacobi on the m x m factor with **round-robin parallel
     ordering**: each step rotates m/2 disjoint column pairs simultaneously
     (gather pairs -> batched 2x2 rotations on the VPU -> scatter), so a full
     sweep is m-1 vectorized steps instead of m^2/2 sequential rotations —
     this is the TPU-first formulation (XLA-friendly static shapes, no
     scalar inner loop);
  3. singular values = column norms, right vectors accumulate in V,
     U = Q_qr @ (columns / sigma), with tiny-sigma columns zeroed (they are
     below the rank cut everywhere this is used: beyn.jl:72, nlfeast.jl:218).

One-sided Jacobi delivers high *relative* accuracy of small singular values,
which the Gram/eigh shortcut cannot (sigma^2 underflows the rank-cut used by
block_SS, 1e-13 * sigma_max).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import cx
from ..cx import CX
from . import qr as qrmod


def _round_robin_pairs(m: int) -> np.ndarray:
    """Static (m-1, 2, m//2) round-robin tournament schedule for even m."""
    players = list(range(m))
    steps = []
    for _ in range(m - 1):
        p = np.array(players[: m // 2])
        q = np.array(players[m // 2:][::-1])
        steps.append(np.stack([p, q]))
        # rotate all but the first
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.stack(steps)  # (m-1, 2, m/2)


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def _jacobi_sweeps(R: CX, max_sweeps: int = 30):
    """One-sided Jacobi on an (n, m) pair matrix (m even).

    Returns (B, V) with R = B V^H, B having orthogonal columns whose norms
    are the singular values.
    """
    m = R.shape[1]
    assert m % 2 == 0, "pad to even column count before calling"
    sched = jnp.asarray(_round_robin_pairs(m))  # (m-1, 2, m/2)
    eps = jnp.finfo(R.dtype).eps
    V = cx.eye(m, R.dtype)

    def step(carry, pq):
        B, V = carry
        p, q = pq[0], pq[1]
        bp = cx.take_cols(B, p)   # (m, m/2)
        bq = cx.take_cols(B, q)
        app = jnp.sum(cx.abs2(bp), axis=0)
        aqq = jnp.sum(cx.abs2(bq), axis=0)
        apq = cx.cdot_cols(bp, bq)         # p^H q, complex (m/2,)
        # rotation angles: diagonalize [[app, apq], [conj(apq), aqq]]
        absapq = cx.cabs(apq)
        # skip pairs already orthogonal (guard division).  NOTE
        # sqrt(app)*sqrt(aqq), NOT sqrt(app*aqq): TPU emulated f64 has
        # f32 EXPONENT RANGE — app*aqq underflows for eps-scale columns.
        norm_pq = jnp.sqrt(app) * jnp.sqrt(aqq)
        active = absapq > eps * norm_pq * 0.1
        safe_abs = jnp.where(active, absapq, 1.0)
        tau = (aqq - app) / (2.0 * safe_abs)
        sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
        # tau^2 overflows (-> NaN on the TPU f64 emulation, range ~1e38)
        # for |tau| >~ 1e19; there the rotation is t ~ sgn/(2|tau|) ~ 0
        abs_tau = jnp.abs(tau)
        big = abs_tau > 1e12
        tau_c = jnp.where(big, 0.0, tau)
        t = jnp.where(big, sgn / (2.0 * jnp.maximum(abs_tau, 1.0)),
                      sgn / (jnp.abs(tau_c) + jnp.sqrt(1.0 + tau_c * tau_c)))
        t = jnp.where(active, t, 0.0)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s_mag = c * t
        # complex phase: e^{i phi} = apq/|apq|
        ph = cx.phase(apq)
        s = ph * s_mag  # complex s
        # new columns:
        #   p' = c*p + conj(s)? ... choose the one-sided update
        #   bp' = c*bp - bq*s^*,  bq' = bp*s + c*bq   (verified orthogonal)
        sconj = s.conj()
        bp_new = CX(bp.re * c - (bq.re * sconj.re - bq.im * sconj.im),
                    bp.im * c - (bq.re * sconj.im + bq.im * sconj.re))
        bq_new = CX((bp.re * s.re - bp.im * s.im) + bq.re * c,
                    (bp.re * s.im + bp.im * s.re) + bq.im * c)
        B = CX(B.re.at[:, p].set(bp_new.re).at[:, q].set(bq_new.re),
               B.im.at[:, p].set(bp_new.im).at[:, q].set(bq_new.im))
        vp = cx.take_cols(V, p)
        vq = cx.take_cols(V, q)
        vp_new = CX(vp.re * c - (vq.re * sconj.re - vq.im * sconj.im),
                    vp.im * c - (vq.re * sconj.im + vq.im * sconj.re))
        vq_new = CX((vp.re * s.re - vp.im * s.im) + vq.re * c,
                    (vp.re * s.im + vp.im * s.re) + vq.im * c)
        V = CX(V.re.at[:, p].set(vp_new.re).at[:, q].set(vq_new.re),
               V.im.at[:, p].set(vp_new.im).at[:, q].set(vq_new.im))
        # convergence metric: worst relative cosine |p^H q| / (|p||q|) —
        # relative, so tiny-sigma pairs are driven to orthogonality too
        # (this is what preserves high relative accuracy of small sigmas).
        rel = jnp.where(norm_pq > 0.0, absapq / jnp.where(norm_pq > 0,
                                                          norm_pq, 1.0), 0.0)
        return (B, V), jnp.max(rel)

    def sweep(state):
        B, V, _, it = state
        (B, V), rels = lax.scan(step, (B, V), sched)
        return B, V, jnp.max(rels), it + 1

    def cond(state):
        B, V, relmax, it = state
        return (relmax > 10.0 * eps) & (it < max_sweeps)

    # run at least one sweep; loop until off-diagonal mass is negligible
    B, V, off, it = sweep((R, V, jnp.array(jnp.inf, R.dtype), jnp.array(0, jnp.int32)))
    B, V, off, it = lax.while_loop(cond, sweep, (B, V, off, it))
    return B, V


def svd(A: CX, max_sweeps: int = 30, reduce: str = "cholqr3"):
    """Singular value decomposition of (n, m) with n >= m (thin).

    Returns (U (n,m), s (m,) descending, Vh (m,m)) like numpy's svd with
    full_matrices=False.  A = U diag(s) Vh.

    reduce:
      "cholqr3"     (default) all-GEMM QR reduction; absolute accuracy
                    ~eps*sigma_max — right for every rank-cut use;
      "householder" sequential-reflection QR reduction;
      "direct"      Jacobi on the tall matrix itself (no QR) — column-scaling
                    invariant, so small singular values keep high *relative*
                    accuracy; costlier sweeps (O(n m) per rotation step).
    """
    n, m = A.shape
    if n < m:
        raise ValueError("svd expects n >= m (tall or square input)")
    pad = m % 2  # Jacobi schedule needs even m
    if pad:
        A = CX(jnp.pad(A.re, ((0, 0), (0, 1))), jnp.pad(A.im, ((0, 0), (0, 1))))
        m = m + 1
        if n < m and reduce != "direct":  # odd square input: pad a zero row too
            A = CX(jnp.pad(A.re, ((0, m - n), (0, 0))),
                   jnp.pad(A.im, ((0, m - n), (0, 0))))
    if reduce == "direct":
        B, V = _jacobi_sweeps(A, max_sweeps=max_sweeps)
    elif reduce == "householder":
        Qq, R = qrmod.householder_qr(A)
        B, V = _jacobi_sweeps(R, max_sweeps=max_sweeps)
    else:
        Qq, R = qrmod.cholqr3(A)
        B, V = _jacobi_sweeps(R, max_sweeps=max_sweeps)
    s = cx.col_norms(B)
    # sort descending
    order = jnp.argsort(-s)
    s = s[order]
    B = cx.take_cols(B, order)
    V = cx.take_cols(V, order)
    eps = jnp.finfo(A.dtype).eps
    smax = jnp.maximum(s[0], eps)
    safe = jnp.where(s > smax * eps * 0.01, s, 1.0)
    Ur = CX(B.re / safe, B.im / safe)
    U = Ur if reduce == "direct" else cx.cmatmul(Qq, Ur)
    if pad:
        # drop the padded zero column: its sigma=0 sorts last, and its right
        # vector is e_m (so V's padded coordinate row is ~0 elsewhere).
        true_m = m - 1
        U = CX(U.re[:n, :true_m], U.im[:n, :true_m])
        s = s[:true_m]
        V = CX(V.re[:true_m, :true_m], V.im[:true_m, :true_m])
    return U, s, V.H


def svd_vals(A: CX, max_sweeps: int = 30):
    """Singular values only."""
    _, s, _ = svd(A, max_sweeps=max_sweeps)
    return s
