"""On-device complex nonsymmetric eigensolver (Schur / QR iteration).

XLA:TPU has no nonsymmetric eigendecomposition (jnp.linalg.eig is CPU-only),
yet every FEAST Rayleigh-Ritz step needs eig of a small dense complex matrix
(reference: LAPACK zgeev via `eigen!` at feast.jl:45, utils.jl:74).  This
module implements it from scratch on CX real-pair arithmetic so it compiles
for TPU:

  1. Householder reduction to upper-Hessenberg form,
  2. explicit single-shift (Wilkinson) QR iteration with deflation,
     formulated as two `lax.scan`s per sweep (row-rotations forward, column
     rotations backward) so each sweep is O(n) fused vector steps instead of
     O(n^2) scalar updates,
  3. eigenvectors of the triangular Schur factor by masked back-substitution.

Everything is static-shape and jit/vmap-safe; deflation is tracked by an
active-window bottom index `k` carried through a while_loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .. import cx
from ..cx import CX
from . import lu as lumod


def _outer(v: CX, w: CX) -> CX:
    """Complex outer product v w (no conjugation): (n,1)*(1,m)."""
    vr, vi = v.re[:, None], v.im[:, None]
    wr, wi = w.re[None, :], w.im[None, :]
    return CX(vr * wr - vi * wi, vr * wi + vi * wr)


def _getitem_scalar(a: CX, i) -> CX:
    return CX(a.re[i], a.im[i])


def hessenberg(A: CX):
    """Reduce A to upper Hessenberg H = Q^H A Q, returning (H, Q).

    Body form: all six complex matvecs of the two-sided application ride
    in TWO stacked real GEMMs per step (left: (2, n) @ (n, 2n); right:
    (4n, n) @ (n, 2)); the three rank-1 updates are broadcast FMAs.
    MEASURED (real chip, r3): this is speed-NEUTRAL vs the 12-hdot form
    (~2.8 ms/step either way at n=48) — per-step cost on this chip is set
    by the count of sequential scalar->vector dependency stages (~150 us
    each: norm, phase, beta, each GEMM), not by kernel-launch count.
    Kept for the lower op count; the cost model lives in CLAUDE.md."""
    n = A.shape[0]
    idx = jnp.arange(n)
    Q = cx.eye(n, A.dtype)
    hi = jax.lax.Precision.HIGHEST

    def body(k, AQ):
        A, Q = AQ
        m = (idx >= k + 1).astype(A.dtype)
        xr = A.re[:, k] * m
        xi = A.im[:, k] * m
        normx = jnp.sqrt(jnp.sum(xr * xr + xi * xi))
        alpha = CX(xr[k + 1], xi[k + 1])
        ph = cx.phase(alpha)
        # v = x_masked + ph*normx * e_{k+1}
        sel = (idx == k + 1).astype(A.dtype)
        v = CX(xr + sel * (ph.re * normx), xi + sel * (ph.im * normx))
        vnorm2 = jnp.sum(v.re * v.re + v.im * v.im)
        beta = jnp.where(vnorm2 > 0, 2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0),
                         0.0)
        V2 = jnp.stack([v.re, v.im])                      # (2, n)
        # ---- left apply A <- (I - beta v v^H) A ----
        AL = jnp.concatenate([A.re, A.im], axis=1)        # (n, 2n)
        W = jnp.matmul(V2, AL, precision=hi)              # (2, 2n): one GEMM
        wre = W[0, :n] + W[1, n:]
        wim = W[0, n:] - W[1, :n]
        A = CX(A.re - beta * (v.re[:, None] * wre[None, :]
                              - v.im[:, None] * wim[None, :]),
               A.im - beta * (v.re[:, None] * wim[None, :]
                              + v.im[:, None] * wre[None, :]))
        # ---- right apply A <- A (I - beta v v^H), Q <- Q (I - beta v v^H)
        M = jnp.concatenate([A.re, A.im, Q.re, Q.im], axis=0)  # (4n, n)
        U = jnp.matmul(M, V2.T, precision=hi)             # (4n, 2): one GEMM
        ure, uim = U[:n, 0] - U[n:2 * n, 1], U[:n, 1] + U[n:2 * n, 0]
        qre, qim = (U[2 * n:3 * n, 0] - U[3 * n:, 1],
                    U[2 * n:3 * n, 1] + U[3 * n:, 0])
        # outer(u, conj(v)) updates, fused broadcast FMAs
        A = CX(A.re - beta * (ure[:, None] * v.re[None, :]
                              + uim[:, None] * v.im[None, :]),
               A.im - beta * (uim[:, None] * v.re[None, :]
                              - ure[:, None] * v.im[None, :]))
        Q = CX(Q.re - beta * (qre[:, None] * v.re[None, :]
                              + qim[:, None] * v.im[None, :]),
               Q.im - beta * (qim[:, None] * v.re[None, :]
                              - qre[:, None] * v.im[None, :]))
        return A, Q

    if n > 2:
        A, Q = lax.fori_loop(0, n - 2, body, (A, Q))
    return A, Q


def _givens(a: CX, b: CX):
    """Rotation G=[[c, s],[-conj(s), c]], c real, with G @ [a; b] = [r; 0]."""
    na2 = cx.abs2(a)
    nb2 = cx.abs2(b)
    r2 = na2 + nb2
    b_zero = nb2 == 0
    r = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
    absa = jnp.sqrt(na2)
    a_zero = na2 == 0
    pha = cx.phase(a)  # 1 when a == 0
    c = jnp.where(b_zero, 1.0, absa / r)
    s = pha * b.conj()
    s = CX(jnp.where(b_zero, 0.0, s.re / r), jnp.where(b_zero, 0.0, s.im / r))
    del a_zero
    return c, s


def _qr_sweep(H: CX, Z: CX, k, sigma: CX):
    """One explicit-shift QR sweep on the leading (k+1) block of Hessenberg H.

    H' = R Q + sigma I  where  H - sigma I = Q R.  Rotations with index >= k
    are forced to identity, so deflated trailing rows/cols are untouched.
    Z accumulates the unitary similarity (Schur vectors).
    """
    n = H.shape[0]
    idx = jnp.arange(n)
    # subtract the shift on the active diagonal only
    dr = jnp.where(idx <= k, sigma.re, 0.0)
    di = jnp.where(idx <= k, sigma.im, 0.0)
    Hs = CX(H.re - jnp.diag(dr), H.im - jnp.diag(di))

    # ---- forward scan: eliminate subdiagonal with Givens row rotations ----
    def fwd(carry_row, inp):
        i, next_row = inp
        a = _getitem_scalar(carry_row, i)
        b = _getitem_scalar(next_row, i)
        c, s = _givens(a, b)
        active = i < k
        c = jnp.where(active, c, 1.0)
        s = CX(jnp.where(active, s.re, 0.0), jnp.where(active, s.im, 0.0))
        top = carry_row * c + s * next_row
        bot = next_row * c - s.conj() * carry_row
        return bot, (top, c, s)

    rows_in = (jnp.arange(n - 1), CX(Hs.re[1:], Hs.im[1:]))
    first_row = CX(Hs.re[0], Hs.im[0])
    last_row, (r_rows, cs_c, cs_s) = lax.scan(fwd, first_row, rows_in)
    R = CX(jnp.concatenate([r_rows.re, last_row.re[None, :]], axis=0),
           jnp.concatenate([r_rows.im, last_row.im[None, :]], axis=0))

    # ---- backward scan: right-multiply R (and Z) by G_0^H ... G_{n-2}^H ----
    # stack R and Z vertically: columns of both transform identically
    M = CX(jnp.concatenate([R.re, Z.re], axis=0),
           jnp.concatenate([R.im, Z.im], axis=0))

    def bwd(carry_col, inp):
        next_col, c, s = inp
        newcol = carry_col * c + s.conj() * next_col
        carry = next_col * c - s * carry_col
        return carry, newcol

    cols_in = (CX(M.re[:, 1:].T, M.im[:, 1:].T), cs_c, cs_s)
    first_col = CX(M.re[:, 0], M.im[:, 0])
    last_col, out_cols = lax.scan(bwd, first_col, cols_in)
    Mout = CX(
        jnp.concatenate([out_cols.re.T, last_col.re[:, None]], axis=1),
        jnp.concatenate([out_cols.im.T, last_col.im[:, None]], axis=1),
    )
    Hn = CX(Mout.re[:n] + jnp.diag(dr), Mout.im[:n] + jnp.diag(di))
    Zn = CX(Mout.re[n:], Mout.im[n:])
    return Hn, Zn


def _wilkinson_shift(H: CX, k, stagnation):
    """Eigenvalue of the trailing active 2x2 closest to H[k,k]; exceptional
    shift when the iteration stagnates (LAPACK-style)."""
    a = _getitem_scalar(H, (k - 1, k - 1))
    b = _getitem_scalar(H, (k - 1, k))
    g = _getitem_scalar(H, (k, k - 1))
    d = _getitem_scalar(H, (k, k))
    delta = (a - d) * 0.5
    bg = b * g
    t = cx.csqrt(delta * delta + bg)
    den1 = delta + t
    den2 = delta - t
    pick1 = cx.abs2(den1) >= cx.abs2(den2)
    den = cx.where(pick1, den1, den2)
    small = cx.abs2(den) <= 0.0
    quot = cx.cdiv(bg, cx.where(small, cx.as_cx(1.0, H.dtype), den))
    mu = d - cx.where(small, cx.zeros((), H.dtype), quot)
    # exceptional shift every 10 stagnating iterations
    exc = CX(d.re + 0.75 * cx.cabs(g), d.im)
    use_exc = (stagnation > 0) & (stagnation % 10 == 0)
    return cx.where(use_exc, exc, mu)


_SCHUR_BACKEND = "pallas"


def set_schur_backend(name: str):
    """Select the f32 Schur backend: "pallas" (whole-decomposition Mosaic
    kernel, ops/pallas_eig.py — ONE launch; measured 28.6 ms vs 97 ms for
    the XLA formulation at n=48 on the real chip) or "xla" (the scan/
    while_loop formulation below).  f64 always uses the XLA path (Mosaic
    has no emulated f64)."""
    global _SCHUR_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown schur backend {name!r}")
    _SCHUR_BACKEND = name


def schur(A: CX, max_sweeps_per_eig: int = 30):
    """Complex Schur decomposition A = Z T Z^H via Hessenberg + shifted QR.

    Returns (T upper triangular CX, Z unitary CX).
    """
    n = A.shape[0]
    if n == 1:
        return A, cx.eye(1, A.dtype)
    if _pallas_gate(A.re.dtype, n, A.re):
        from . import pallas_eig

        return pallas_eig.schur_pallas(A, max_sweeps_per_eig)
    H, Z = hessenberg(A)
    eps = jnp.finfo(H.dtype).eps
    fnorm = cx.fro_norm(H)
    idx = jnp.arange(n - 1)
    maxit = max_sweeps_per_eig * n

    def deflate(H):
        sub = CX(jnp.diagonal(H.re, -1), jnp.diagonal(H.im, -1))
        diag_abs = cx.cabs(CX(jnp.diagonal(H.re), jnp.diagonal(H.im)))
        tol = eps * (diag_abs[:-1] + diag_abs[1:])
        tol = jnp.where(tol > 0, tol, eps * jnp.where(fnorm > 0, fnorm, 1.0))
        conv = cx.cabs(sub) <= tol
        # zero converged subdiagonal entries
        sub_sel = jnp.eye(n, n, -1, dtype=bool)
        conv_full = jnp.zeros((n, n), dtype=bool).at[jnp.arange(1, n), jnp.arange(n - 1)].set(conv)
        Hre = jnp.where(conv_full, 0.0, H.re)
        Him = jnp.where(conv_full, 0.0, H.im)
        H = CX(Hre, Him)
        nz = ~conv
        k = jnp.max(jnp.where(nz, idx + 1, 0))
        return H, k

    H, k0 = deflate(H)

    def cond(state):
        H, Z, k, it, stag = state
        return (k > 0) & (it < maxit)

    def body(state):
        H, Z, k, it, stag = state
        sigma = _wilkinson_shift(H, k, stag)
        H, Z = _qr_sweep(H, Z, k, sigma)
        H, k_new = deflate(H)
        stag = jnp.where(k_new < k, 0, stag + 1)
        return H, Z, k_new, it + 1, stag

    H, Z, k, it, _ = lax.while_loop(
        cond, body, (H, Z, k0, jnp.array(0, jnp.int32), jnp.array(0, jnp.int32)))
    # force exact triangularity for downstream back-substitution
    tri = jnp.triu(jnp.ones((n, n), dtype=bool))
    H = CX(jnp.where(tri, H.re, 0.0), jnp.where(tri, H.im, 0.0))
    return H, Z


def tri_eigvecs(T: CX) -> CX:
    """Eigenvectors of an upper-triangular T by back-substitution (ZTREVC-style).

    Column i solves (T - lam_i I) y = 0 with y_i = 1, entries below i zero.
    """
    n = T.shape[0]
    lam = CX(jnp.diagonal(T.re), jnp.diagonal(T.im))
    eps = jnp.finfo(T.dtype).eps
    smln = eps * jnp.maximum(cx.fro_norm(T), 1.0)
    Y = cx.eye(n, T.dtype)
    col_idx = jnp.arange(n)

    def body(t, Y):
        j = n - 2 - t
        rowmask = (col_idx > j).astype(T.dtype)
        rowT = CX(T.re[j] * rowmask, T.im[j] * rowmask)
        # num_i = sum_l T[j,l] Y[l,i] for l > j
        num = CX(cx.hdot(rowT.re, Y.re) - cx.hdot(rowT.im, Y.im),
                 cx.hdot(rowT.re, Y.im) + cx.hdot(rowT.im, Y.re))
        tjj = CX(T.re[j, j], T.im[j, j])
        den = CX(tjj.re - lam.re, tjj.im - lam.im)
        dmag = cx.cabs(den)
        den = cx.where(dmag < smln,
                       CX(jnp.full((n,), smln, T.dtype), jnp.zeros((n,), T.dtype)),
                       den)
        val = cx.cdiv(CX(-num.re, -num.im), den)
        upd = col_idx > j
        newrow = cx.where(upd, val, CX(Y.re[j], Y.im[j]))
        return CX(Y.re.at[j].set(newrow.re), Y.im.at[j].set(newrow.im))

    if n > 1:
        Y = lax.fori_loop(0, n - 1, body, Y)
    return Y


def tri_unit_inv(Y: CX) -> CX:
    """Inverse of a unit upper-triangular matrix by back-substitution.

    `tri_eigvecs` returns unit upper-triangular Y (diagonal pinned to 1),
    so X = Y^{-1} exists and is unit upper-triangular: row j is
    e_j - Y[j, j+1:] @ X[j+1:, :].  Rows of Y^{-1} are left eigenvectors
    of the triangular Schur factor (Y^{-1} T Y = diag)."""
    n = Y.shape[0]
    col_idx = jnp.arange(n)
    X = cx.eye(n, Y.dtype)

    def body(t, X):
        j = n - 2 - t
        rowmask = (col_idx > j).astype(Y.dtype)
        rowY = CX(Y.re[j] * rowmask, Y.im[j] * rowmask)
        num = CX(cx.hdot(rowY.re, X.re) - cx.hdot(rowY.im, X.im),
                 cx.hdot(rowY.re, X.im) + cx.hdot(rowY.im, X.re))
        newrow = CX(jnp.where(col_idx == j, 1.0, -num.re),
                    jnp.where(col_idx == j, 0.0, -num.im))
        return CX(X.re.at[j].set(newrow.re), X.im.at[j].set(newrow.im))

    if n > 1:
        X = lax.fori_loop(0, n - 1, body, X)
    return X


def _rq_refine(A: CX, w: CX, V: CX, U: CX, kappa_max: float = 1e4):
    """Two-sided Rayleigh-quotient refinement of Ritz values.

    lam_j = (u_j^H A v_j) / (u_j^H v_j) is second-order accurate in the
    eigenvector errors, so it scrubs the first-order eigenvalue drift the
    shifted-QR sweeps accumulate on TPU's emulated f64 (the dots here are
    SHORT contractions — dd-accurate on chip, unlike the long sweep
    chains; see CLAUDE.md precision model).  Pairs whose eigenvalue
    condition number kappa_j = ||u_j|| ||v_j|| / |u_j^H v_j| exceeds
    kappa_max keep the Schur diagonal: for (near-)defective eigenvalues
    the RQ's kappa^3-amplified second-order term can exceed the
    backward-stable first-order one."""
    AV = cx.cmatmul(A, V)
    num = cx.cdot_cols(U, AV)
    den = cx.cdot_cols(U, V)
    dmag = cx.cabs(den)
    safe = dmag > 0
    kappa = cx.col_norms(U) * cx.col_norms(V) / jnp.where(safe, dmag, 1.0)
    den_s = cx.where(safe, den, cx.as_cx(1.0, A.dtype))
    w_rq = cx.cdiv(num, den_s)
    use = safe & (kappa < kappa_max)
    return cx.where(use, w_rq, w)


def _ii_polish(A: CX, lam: CX, V: CX, steps: int = 2):
    """Batched inverse-iteration polish of approximate eigenpairs.

    Each step: Rayleigh-quotient shifts lam_j = v_j^H A v_j (short dots —
    dd-accurate on chip), then one batched solve (A - lam_j I) y_j = v_j
    (m small LUs, vmapped — rank-1 panel steps cost the same wall for the
    whole batch as for one matrix on TPU).  Exact-shift near-singularity
    is the classic II behavior: partial pivoting + the eps-scaled
    zero-pivot guard in lu._panel_lu make the solve return a vector
    dominated by the eigendirection."""
    n = A.shape[0]
    eyer = jnp.eye(n, dtype=A.re.dtype)

    def rq(V):
        AV = cx.cmatmul(A, V)
        return cx.cdot_cols(V, AV)

    for _ in range(steps):
        lam = rq(V)
        Sb = CX(A.re[None] - lam.re[:, None, None] * eyer[None],
                A.im[None] - lam.im[:, None, None] * eyer[None])
        rhs = CX(V.re.T[:, :, None], V.im.T[:, :, None])
        Y = lumod.solve_batched(Sb, rhs)
        V = cx.normalize_cols(CX(Y.re[:, :, 0].T, Y.im[:, :, 0].T))
    return rq(V), V


def _pallas_gate(dtype, n: int, operand=None) -> bool:
    if operand is not None:
        # vmapped pallas_call trips a Mosaic func.return legalization
        # error (i64 carries reappear under the grid-batching rule,
        # measured r4) — the sliced/vmapped drivers take the XLA path.
        # BatchTracer moved under jax._src in recent jax; match by name
        # so this survives relocations.
        if "Batch" in type(operand).__name__:
            return False
    return (_SCHUR_BACKEND == "pallas" and dtype == jnp.float32
            and 2 <= n <= 128 and jax.default_backend() not in ("cpu",))


def _schur_vecs32(A: CX, want_inv: bool = True):
    """(T, Z, Y, X=Y^-1) — one Pallas launch for f32 on TPU (the kernel
    back-substitutes Y and X in-kernel), the XLA pieces elsewhere (any
    dtype).  want_inv=False skips the XLA tri_unit_inv (the Pallas
    launch computes both regardless — it is in-VMEM-cheap)."""
    if _pallas_gate(A.re.dtype, A.shape[0], A.re):
        from . import pallas_eig

        return pallas_eig.schur_pallas(A, want_y=True)
    T, Z = schur(A)
    Y = tri_eigvecs(T)
    return T, Z, Y, (tri_unit_inv(Y) if want_inv else None)


def eig_mixed(A: CX, ii_steps: int = 2):
    """Mixed-precision eig: f32 Schur + batched f64 inverse-iteration
    polish — the eigensolver analog of the f32-LU + f64-IR dense path.

    On TPU the f32 Schur is the single-launch Pallas kernel
    (ops/pallas_eig.py, ~29 ms at n=48) and the f64 work is GEMMs plus
    `ii_steps` batched (m, n, n) small LUs — no sequential QR sweeps in
    emulated f64 (the all-f64 Schur costs ~0.55 s at m0=48; see the
    CLAUDE.md chip cost model).  Accuracy: II with per-pair RQ shifts
    recovers f64-grade residuals when the f32 Schur resolves the pair
    (gap >> eps32*||A||); for tighter clusters the polish matches the
    ~1e-9 drift the all-f64 device path already shows on late clustered
    reduced pencils (r3 note b)."""
    if A.re.dtype == jnp.float32:
        return eig(A)
    A32 = A.astype(jnp.float32)
    T32, Z32, Y32, _ = _schur_vecs32(A32)
    V = cx.normalize_cols(Z32 @ Y32).astype(A.re.dtype)
    lam0 = CX(jnp.diagonal(T32.re).astype(A.re.dtype),
              jnp.diagonal(T32.im).astype(A.re.dtype))
    lam, V = _ii_polish(A, lam0, V, ii_steps)
    return lam, V


def _indep_ok(V: CX, floor: float = 1e-4):
    """Column-independence term for the mixed-eig acceptance guards.

    ADVICE r4: the per-column residual guard alone cannot see the collapse
    mode — on an exactly (or sub-f32) degenerate cluster the batched
    inverse-iteration polish can park two columns on the SAME eigenvector,
    every column is still a true eigenpair, and a silently rank-deficient
    basis would reach the FEAST RR step.  Cheap check: V has unit columns,
    so diag(chol(V^H V)) are the pivots of a unit-diagonal Gram; a
    dependent column drives its pivot to ~eps (qr.cholesky clamps
    breakdown pivots to eps*sqrt(g0), far below `floor`).  min pivot
    upper-bounds sigma_min(V), so pivot <= floor is a sure rejection."""
    from . import qr as qrmod

    G = cx.cgram(V)
    L = qrmod.cholesky(G)
    d = jnp.diagonal(L.re)
    return jnp.all(jnp.isfinite(d)) & (jnp.min(d) > floor)


_EIG_MODE = "mixed"


def set_eig_mode(name: str):
    """f64 eig strategy on TPU: "mixed" (default — f32 Pallas Schur +
    batched f64 inverse-iteration polish, with a residual-guarded
    lax.cond fallback to the full f64 path when a cluster defeats the
    polish) or "full" (always the f64 Schur iteration).  CPU always uses
    "full" (the mixed path's win is chip dispatch latency)."""
    global _EIG_MODE
    if name not in ("full", "mixed"):
        raise ValueError(f"unknown eig mode {name!r}")
    _EIG_MODE = name


def _eig_full(A: CX, refine_rq: bool = True):
    T, Z, Y, Yinv = _schur_vecs32(A, want_inv=refine_rq)
    w = CX(jnp.diagonal(T.re), jnp.diagonal(T.im))
    V = Z @ Y
    if refine_rq:
        w = _rq_refine(A, w, V, Z @ Yinv.H)
    return w, cx.normalize_cols(V)


def eig(A: CX, refine_rq: bool = True):
    """Eigenvalues and right eigenvectors of a dense complex matrix.

    Returns (w: CX (n,), V: CX (n,n)) with unit-norm columns.
    TPU-native replacement for LAPACK zgeev (`eigen!`, feast.jl:45).
    refine_rq polishes each Ritz value with a guarded two-sided Rayleigh
    quotient (left vectors from the unit-triangular Y inverse — one extra
    back-substitution).

    f64 on TPU defaults to the guarded mixed path (set_eig_mode): f32
    single-launch Pallas Schur + 3 steps of batched f64 RQI polish
    (~0.1 s vs ~0.55 s all-f64 at m0=48); a reduced-space residual check
    falls back to the full f64 Schur via lax.cond when the f32 stage
    cannot resolve a cluster (gap < eps32*||A||) — measured: RQI stalls
    at ~cluster-width residuals there, while every resolvable spectrum
    reaches <=1e-12 relative in 3 steps."""
    n = A.shape[0]
    if (_EIG_MODE == "mixed" and A.re.dtype != jnp.float32 and 2 <= n <= 128
            and jax.default_backend() not in ("cpu",)):
        lam_m, V_m = eig_mixed(A, ii_steps=3)
        AV = cx.cmatmul(A, V_m)
        R = AV - cx.scale_cols(V_m, lam_m)
        scale = jnp.maximum(cx.fro_norm(A), 1.0)
        ok = (jnp.max(cx.col_norms(R)) <= 1e-12 * scale * float(n) ** 0.5)
        ok = ok & _indep_ok(V_m)  # degenerate-cluster collapse guard

        return lax.cond(ok, lambda _: (lam_m, V_m),
                        lambda _: _eig_full(A, refine_rq), operand=None)
    # f32 on TPU: the whole decomposition (T, Z, Y, Y^-1) is ONE Pallas
    # launch; only the GEMMs + RQ refine stay in XLA.  Elsewhere the
    # same flow uses the XLA pieces (U = Z Y^-H are exact left
    # eigenvectors, U^H V = I)
    return _eig_full(A, refine_rq)


def _rq_refine_pencil(A: CX, B: CX, w: CX, V: CX, U: CX,
                      kappa_max: float = 1e4):
    """Two-sided Rayleigh-quotient refinement on the PENCIL (A, B):
    lam_j = (u_j^H A v_j) / (u_j^H B v_j) with u_j a LEFT pencil
    eigenvector (u^H A = lam u^H B).  Second-order accurate in both
    eigenvector errors AND independent of the B^{-1}A reduction error that
    `gen_eig` introduces through its LU solve — this is what scrubs the
    ~5e-9 lambda drift on late clustered reduced pencils (the on-chip
    rr_bisect3 eig_err plateau; the standard-eig analog is `_rq_refine`).
    The dots are short contractions — dd-accurate on TPU emulated f64."""
    AV = cx.cmatmul(A, V)
    BV = cx.cmatmul(B, V)
    num = cx.cdot_cols(U, AV)
    den = cx.cdot_cols(U, BV)
    dmag = cx.cabs(den)
    safe = dmag > 0
    # scale-invariant guard: with B = I this reduces exactly to
    # _rq_refine's kappa = ||u|| ||v|| / |u^H v|
    n = A.shape[0]
    bscale = cx.fro_norm(B) / jnp.sqrt(jnp.asarray(float(n), B.re.dtype))
    kappa = (cx.col_norms(U) * cx.col_norms(V) * bscale
             / jnp.where(safe, dmag, 1.0))
    den_s = cx.where(safe, den, cx.as_cx(1.0, A.dtype))
    w_rq = cx.cdiv(num, den_s)
    use = safe & (kappa < kappa_max)
    return cx.where(use, w_rq, w)


def gen_eig(A: CX, B: CX, refine_rq: bool = True):
    """Generalized eigenproblem A x = lambda B x for small dense pairs.

    TPU-native replacement for LAPACK zggev (`eigen!(Aq, Bq)` at feast.jl:122,
    companion.jl:15, beyn.jl:78; hand-bound at lapack.jl:32-97).

    Reduction B^{-1} A -> standard Schur eig.  Valid when B is invertible —
    which holds at every call site in the FEAST family: the Rayleigh-Ritz
    B_q = Q^H B Q with orthonormal Q, and rank-truncated Hankel pencils.
    (`ops.qz.gen_eig_qz` handles singular-B pencils.)

    refine_rq polishes each Ritz value with a guarded two-sided PENCIL
    Rayleigh quotient: left pencil eigenvectors are recovered as
    U = B^{-H} W_C where W_C are the left eigenvectors of C = B^{-1}A
    (w^H C = lam w^H  =>  (B^{-H}w)^H A = lam (B^{-H}w)^H B), costing one
    extra small LU of B^H.  Returns (w, V) with A V ~= B V diag(w).
    """
    n = A.shape[0]
    if (_EIG_MODE == "mixed" and A.re.dtype != jnp.float32 and 2 <= n <= 128
            and jax.default_backend() not in ("cpu",)):
        lam_m, V_m = _gen_eig_mixed(A, B)
        R = cx.cmatmul(A, V_m) - cx.scale_cols(cx.cmatmul(B, V_m), lam_m)
        scale = jnp.maximum(cx.fro_norm(A)
                            + jnp.max(cx.cabs(lam_m)) * cx.fro_norm(B), 1.0)
        ok = (jnp.max(cx.col_norms(R)) <= 1e-12 * scale * float(n) ** 0.5)
        ok = ok & _indep_ok(V_m)  # degenerate-cluster collapse guard
        return lax.cond(ok, lambda _: (lam_m, V_m),
                        lambda _: _gen_eig_full(A, B, refine_rq),
                        operand=None)
    return _gen_eig_full(A, B, refine_rq)


def _gen_eig_mixed(A: CX, B: CX, ii_steps: int = 3):
    """f32 Schur seed + batched f64 PENCIL inverse iteration: each step
    solves (A - lam_j B) y_j = B v_j with pencil Rayleigh-quotient
    shifts lam_j = (v^H A v)/(v^H B v).  The generalized analog of
    eig_mixed — no f64 sequential QR sweeps.  Guarded by the caller."""
    from . import lu as lumod

    n = A.shape[0]
    LU, perm = lumod.lu_factor(B)
    C = lumod.lu_solve(LU, perm, A)
    T32, Z32, Y32, _ = _schur_vecs32(C.astype(jnp.float32))
    V = cx.normalize_cols(Z32 @ Y32).astype(A.re.dtype)

    def rq(V):
        num = cx.cdot_cols(V, cx.cmatmul(A, V))
        den = cx.cdot_cols(V, cx.cmatmul(B, V))
        dmag = cx.cabs(den)
        safe = dmag > 0
        return cx.cdiv(num, cx.where(safe, den, cx.as_cx(1.0, A.dtype)))

    lam = rq(V)
    for _ in range(ii_steps):
        Sb = CX(
            A.re[None] - (lam.re[:, None, None] * B.re
                          - lam.im[:, None, None] * B.im)[..., :, :],
            A.im[None] - (lam.re[:, None, None] * B.im
                          + lam.im[:, None, None] * B.re)[..., :, :])
        BV = cx.cmatmul(B, V)
        rhs = CX(BV.re.T[:, :, None], BV.im.T[:, :, None])
        Y = lumod.solve_batched(Sb, rhs)
        V = cx.normalize_cols(CX(Y.re[:, :, 0].T, Y.im[:, :, 0].T))
        lam = rq(V)
    return lam, V


def _gen_eig_full(A: CX, B: CX, refine_rq: bool = True):
    from . import lu as lumod

    LU, perm = lumod.lu_factor(B)
    C = lumod.lu_solve(LU, perm, A)
    if not refine_rq:
        return eig(C, refine_rq=False)
    T, Z = schur(C)
    w = CX(jnp.diagonal(T.re), jnp.diagonal(T.im))
    Y = tri_eigvecs(T)
    V = Z @ Y
    Wc = Z @ tri_unit_inv(Y).H          # left eigenvectors of C
    LUh, permh = lumod.lu_factor(B.H)
    U = lumod.lu_solve(LUh, permh, Wc)  # left eigenvectors of the pencil
    w = _rq_refine_pencil(A, B, w, V, U)
    return w, cx.normalize_cols(V)


def eig_left(A: CX):
    """Left eigenvectors: y^H A = lambda y^H.  Returns (w, Y).

    Computed as the right eigenvectors of A^H (with conjugated eigenvalues),
    used by the two-sided `dual_gen_feast` driver (feast.jl:206-212).
    """
    wbar, Y = eig(A.H)
    return wbar.conj(), Y


def gen_eig_two_sided(A: CX, B: CX):
    """Right and left eigenvectors of the pencil (A, B).

    Returns (w, V, W): A V = B V diag(w), W^H A = diag(w) W^H B.
    Left vectors solve the adjoint pencil (A^H, B^H) like the reference's
    dual_gen_feast (feast.jl:206-212).
    """
    from . import lu as lumod

    LU, perm = lumod.lu_factor(B)
    C = lumod.lu_solve(LU, perm, A)          # B^{-1} A
    w, V = eig(C)
    LUh, permh = lumod.lu_factor(B.H)
    Ch = lumod.lu_solve(LUh, permh, A.H)      # B^{-H} A^H
    wl, W = eig(Ch)
    return w, V, (wl, W)
