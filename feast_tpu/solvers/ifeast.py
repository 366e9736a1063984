"""Inexact FEAST: iterative (matrix-free) shifted solves.

Two drivers:

* `ifeast` — parity with the reference's experimental `ifeast!`
  (feast_experimental.jl:2-60): plain spectral-projector filter
  Q = sum_i w_i (z_i I - A)^{-1} X via per-node BiCGStab, NO
  orthonormalization (the Rayleigh-Ritz keeps Bq = Q^H Q), absolute
  residuals.

* `feast_iterative` — the production sparse path this framework adds
  (SURVEY.md N2/N8): the full RII FEAST update (same convergence as
  `feast`/`gen_feast`) with the direct LU replaced by batched matrix-free
  BiCGStab/GMRES on (A - z_i B), Jacobi-preconditioned, warm-started from
  the previous refinement iteration (like nlfeast_it!'s recycled Tinv,
  nlfeast.jl:139).  Works with dense pairs or CSR operators — the
  reference's `factorizer`/`left_divider` injection point (feast.jl:5)
  became this solver strategy.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import contour as ct
from .. import cx
from ..cx import CX
from ..ops import eig as eigmod
from ..ops import krylov
from ..ops import sparse as spmod
from ..ops import qr as qrmod
from .feast import FeastResult, _in_mask, _debug_print


def _to_op(A, dtype):
    """Dense arrays -> CX; scipy sparse -> DIA (banded) or CSR;
    CSR/DIA/CX pass through (sparse.as_operator)."""
    return spmod.as_operator(A, dtype)


def _apply(M, X: CX) -> CX:
    if M is None:
        return X
    if isinstance(M, (spmod.CSR, spmod.DIA, spmod.BELL)):
        return M.matvec(X)
    return cx.cmatmul(M, X)


def _raw_matrix(A):
    """Recover a scipy/numpy matrix for host-side AMG setup from whatever
    the caller passed (scipy sparse, dense, CX, or a CSR/DIA operator)."""
    if isinstance(A, spmod.DIA):
        import scipy.sparse as sp

        D = cx.to_numpy(A.data)  # row-indexed (ndiag, n)
        n, m = A.shape
        rows, cols, vals = [], [], []
        for k, off in enumerate(A.offsets):
            i = np.arange(max(0, -off), min(n, m - off))
            rows.append(i)
            cols.append(i + off)
            vals.append(D[k, i])
        return sp.coo_matrix(
            (np.concatenate(vals), (np.concatenate(rows),
                                    np.concatenate(cols))),
            shape=A.shape).tocsr()
    if isinstance(A, spmod.CSR):
        import scipy.sparse as sp

        data = np.asarray(A.data.re) + 1j * np.asarray(A.data.im)
        return sp.coo_matrix(
            (data, (np.asarray(A.row_ids), np.asarray(A.indices))),
            shape=A.shape).tocsr()
    if isinstance(A, spmod.BELL):
        import scipy.sparse as sp

        bs, kmax = A.bs, A.kmax
        nbr = A.colb.shape[0]
        # merged (nbr, bs, kmax*bs) layout -> logical (nbr, kmax, bs, bs)
        D = (np.asarray(A.data.re) + 1j * np.asarray(A.data.im)).reshape(
            nbr, bs, kmax, bs).transpose(0, 2, 1, 3)
        colb = np.asarray(A.colb)
        ri, ci = np.meshgrid(np.arange(bs), np.arange(bs), indexing="ij")
        rows = (np.arange(nbr)[:, None, None, None] * bs + ri)
        cols = (colb[:, :, None, None] * bs + ci)
        rows = np.broadcast_to(rows, D.shape).ravel()
        M = sp.coo_matrix((D.ravel(), (rows, cols.ravel())),
                          shape=(nbr * bs, -(-A.shape[1] // bs) * bs)).tocsr()
        M = sp.csr_matrix(M[:A.shape[0], :A.shape[1]])
        if A.spill is not None:  # kcap overflow entries (sparse.BELL)
            data = (np.asarray(A.spill.data.re)
                    + 1j * np.asarray(A.spill.data.im))
            M = M + sp.coo_matrix(
                (data, (np.asarray(A.spill.row_ids),
                        np.asarray(A.spill.indices))), shape=A.shape).tocsr()
        M.eliminate_zeros()
        return M.tocsr()
    if isinstance(A, CX):
        return cx.to_numpy(A)
    return A


def ifeast(A, X0, nodes: int = 8, iters: int = 10, *,
           c: complex = 0.0 + 0.0j, r: float = 1.0, tol: float = 1e-10,
           solve_tol: float = 1e-8, solve_iters: int = 500,
           debug: bool = False) -> FeastResult:
    """Reference-parity inexact FEAST (ifeast!, feast_experimental.jl:2-60)."""
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    A = _to_op(A, dtype)
    X = X0 if isinstance(X0, CX) else cx.from_numpy(np.asarray(X0), dtype)
    n, m0 = X.shape
    k = ct.circular_contour_trapezoidal(complex(c), float(r), nodes)
    z = k.device_nodes(dtype)
    # plain-filter weights e^{i theta}/N (feast_experimental.jl:30); the
    # missing r only rescales Q, which the Bq=Q^H Q Rayleigh-Ritz absorbs.
    w = CX(z.re - complex(c).real, z.im - complex(c).imag) / (float(r) * nodes)

    @jax.jit
    def step(X):
        def one_node(zi, wi):
            # solve (z I - A) X — note ifeast!'s sign convention
            def zi_minus_A(V):
                AV = _apply(A, V)
                return CX(zi.re * V.re - zi.im * V.im - AV.re,
                          zi.re * V.im + zi.im * V.re - AV.im)
            sol = krylov.bicgstab(zi_minus_A, X, tol=solve_tol,
                                  maxiter=solve_iters)
            return cx.scale_cols(sol.x, CX(jnp.broadcast_to(wi.re, (m0,)),
                                           jnp.broadcast_to(wi.im, (m0,))))

        terms = jax.vmap(one_node)(z, w)
        Q = CX(jnp.sum(terms.re, 0), jnp.sum(terms.im, 0))
        AQ = _apply(A, Q)
        Aq = cx.cgram(Q, AQ)   # dd-accurate Gram (see cx.cgram)
        Bq = cx.cgram(Q)
        lam, Xq = eigmod.gen_eig(Aq, Bq)
        Xn = cx.normalize_cols(cx.cmatmul(Q, Xq))
        R = _apply(A, Xn) - cx.scale_cols(Xn, lam)
        res = cx.col_norms(R)
        inside = _in_mask(lam, k.kind, k.params)
        return Xn, lam, res, inside

    lam = res = inside = None
    n_iter, converged = 0, False
    for nit in range(1, iters + 1):
        n_iter = nit
        X, lam, res, inside = step(X)
        res_h, inside_h = np.asarray(res), np.asarray(inside)
        if debug:
            _debug_print(nit, lam, res_h, inside_h)
        if inside_h.any() and res_h[inside_h].max() < tol:
            converged = True
            break
    return FeastResult(lam, X, res, inside, n_iter, converged)


def feast_iterative(A, B, X0, contour: Optional[ct.Contour] = None, *,
                    c: complex = 0.0 + 0.0j, r: float = 1.0, nodes: int = 8,
                    iters: int = 20, tol: float = 1e-10,
                    solver: str = "bicgstab", solve_tol: float = 1e-10,
                    # solver: "bicgstab" | "bicgstab_rr" (residual
                    # replacement; use on TPU for deep tolerances — the
                    # emulated-f64 recursive residual drifts) | "bicgstabl"
                    # (l=2) | "gmres"
                    solve_iters: int = 1000, precondition="jacobi",
                    gmres_restart: Optional[int] = None,
                    rhs_chunk: Optional[int] = None,
                    amg_opts: Optional[dict] = None,
                    spurious: Optional[float] = None,
                    ortho: str = "cholqr2", mesh=None,
                    node_chunk: Optional[int] = None,
                    rr: str = "device",
                    keep_q: bool = False,
                    warm0=None, keep_warm: bool = False,
                    chunk_ckpt=None, resume_chunk=None,
                    reorder="auto",
                    nit0: int = 0, tol_mode: str = "abs",
                    m0=None, samples: int = 8, seed: int = 0,
                    auto_m0_margin: float = 2.5,
                    debug: bool = False) -> FeastResult:
    """RII FEAST with matrix-free iterative node solves (sparse-ready).

    rr: "device" (default) keeps the whole refinement step on device;
    "host" computes the Rayleigh-Ritz phase (orthonormalize, Grams, m0 x m0
    eig, residual) in numpy/LAPACK complex128 and keeps ONLY the node
    solves (the hot phase) on device.  On TPU the emulated-f64 MXU matmul
    accumulates its long contraction axis at ~f32 precision (measured:
    a (40000,8) Gram is wrong at 2e-8 relative, CholeskyQR2
    orthogonality caps at 1.7e-5), which caps the on-device Ritz values
    near 1e-6 relative and the FEAST residual near 1e-8 absolute; host RR
    restores the 1e-10..1e-14 floors.  Costs one n x m0 pull and two
    pushes per refinement iteration.  Single-device only.

    precondition: "jacobi" (diagonal of A - zB; cheap, adequate for
    diagonally-dominant/interior slices), "amg" (smoothed-aggregation
    multigrid V-cycle, ops/amg.py — required for edge-of-spectrum slices
    where kappa(A - zB) >= 1e8; the TPU replacement for the reference's
    UMFPACK sparse-LU path), False/None (unpreconditioned), or a callable
    z -> (X -> M^{-1}X).  True is accepted as an alias for "jacobi".

    mesh: shards the node axis (z, w, per-node Krylov warm starts) across
    devices; the matrix-free operators replicate (CSR data is tiny next to
    the Krylov work).

    keep_q: return the final (post-sweep) moment subspace in
    `FeastResult.Q` — restarting a later call from it (X0=Q, any iters)
    continues the refinement EXACTLY, which enables single-sweep stepping
    (`iters=0, keep_q=True`) with host checkpoints between processes
    (how benchmarks/sparse1m.py survives remote-worker crashes at 1M dof).

    warm0 / keep_warm: per-node Krylov warm-start solutions, shape
    (nodes, n, m0) complex (CX or numpy).  keep_warm=True returns the
    final solutions in `FeastResult.warm`; feeding them back as `warm0`
    on a restarted call reseeds every node solve from the previous
    sweep's solution — without this, each fresh process pays full-depth
    Krylov (measured r4: a cold sweep was 1489 s vs 173 s warm at 100k
    dof).  Row order follows the ORIGINAL (caller) numbering: `reorder`
    permutations are applied on entry and undone on exit, like X.

    chunk_ckpt / resume_chunk (chunked path only): sub-sweep fault
    tolerance for remote workers whose lifetime can be shorter than one
    sweep.  `chunk_ckpt(info)` fires once per sweep with the RR prelude
    ({ci: -1, rr: (Xn, lam, R, res, inside)}) and then after every node
    chunk with {nit, ci, nchunks, Qn (partial moment accumulator),
    warm_chunk}, all in the driver's INTERNAL (reordered) row numbering
    — persist them as opaque blobs.  `resume_chunk={"ci0": int, "Qn":
    ..., "warm_new": [...], "rr": (...) or None}` restarts the first
    sweep of the call at chunk ci0 with those same blobs, skipping the
    RR phase entirely when `rr` is present (the RR is deterministic in
    Q, so the skip is exact).

    m0: subspace sizing when X0=None.  An int draws a random (n, m0)
    start block; "auto" sizes it from a matrix-free stochastic count of
    the slice (Hutchinson trace of the spectral projector through the
    SAME iterative node solves + preconditioner this driver uses — the
    sparse analog of solvers.stochastic.contour_estimate_eig,
    reference stochastic.jl:2-33, with the B factor the projector needs
    for generalized pencils): m0 = max(ceil(margin*est), ceil(est)+4, 4).
    The margin default 2.5 encodes the measured r4 interior lever: with 6
    eigenvalues inside, m0=16 contracted ~20x/sweep where m0=10 managed
    ~2.2x at only 1.3x per-sweep cost — buffer columns are cheap, sweeps
    are not.  `samples` probes cost about one node sweep at width
    `samples`.

    node_chunk: process contour nodes in chunks of this size (host loop,
    one compiled program reused across chunks) instead of vmapping the
    Krylov solve over all `nodes` at once.  Block BiCGStab holds ~7 CX
    workspace blocks of (n, m0) per node, so the all-nodes vmap needs
    O(nodes * 7 * 2 * n * m0) HBM — at 1M dof f64 that exceeds a 16GB
    chip; node_chunk=1-2 bounds the peak (the nlfeast `factor_chunk`
    pattern).  Single-device only (ignored under `mesh`, which already
    splits nodes across devices)."""
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if warm0 is not None and not isinstance(warm0, CX):
        warm0 = cx.from_numpy(np.asarray(warm0), dtype)
    # Bandwidth-reduction reordering (ops/reorder.py): eigenproblems are
    # permutation-invariant, so an unstructured (or adversarially permuted)
    # sparse pencil is RCM-permuted onto the structured fast SpMM paths
    # (DIA/BELL) and the eigenvectors permuted back on exit.  "auto" applies
    # it only when RCM actually shrinks the pattern bandwidth; "rcm" forces
    # it; None/False disables.  The UMFPACK analog: SuiteSparse reorders
    # internally (reference test/generalized_feast.jl:7-24).
    perm = None
    if reorder:
        import scipy.sparse as sp

        if sp.issparse(A):
            from ..ops import reorder as rdmod

            B_pat = B if (B is not None and sp.issparse(B)) else None
            if reorder == "rcm":
                perm = rdmod.rcm_permutation(A, B_pat)
            else:
                perm, _ = rdmod.plan_reorder(A, B_pat)
            if perm is not None:
                A = sp.csr_matrix(A)[perm][:, perm].tocsr()
                if B is not None:
                    B = (sp.csr_matrix(B)[perm][:, perm].tocsr()
                         if sp.issparse(B)
                         else np.asarray(B)[perm][:, perm])
                if isinstance(X0, CX):
                    X0 = CX(X0.re[jnp.asarray(perm)],
                            X0.im[jnp.asarray(perm)])
                elif X0 is not None:  # X0=None: m0-sized random start is
                    X0 = np.asarray(X0)[perm]  # drawn in permuted space
                if warm0 is not None:
                    pj = jnp.asarray(perm)
                    warm0 = CX(warm0.re[:, pj], warm0.im[:, pj])
    A_raw, B_raw = A, B  # keep (permuted) originals for host-side AMG setup
    A = _to_op(A, dtype)
    B = _to_op(B, dtype)
    if precondition is True:
        precondition = "jacobi"
    _amg_apply_only = ("nu", "cycles", "damp")  # "omega" feeds build+apply
    amg_hier = None
    if precondition == "amg":
        from ..ops import amg as amgmod

        build_opts = {k: v for k, v in (amg_opts or {}).items()
                      if k not in _amg_apply_only}
        # The V-cycle dtype (f32 on TPU) is also the STORAGE dtype: building
        # the hierarchy in f64 and casting per-application kept a second
        # full-precision copy of every level resident and ran X64-split
        # casts inside the hot jit (measured r4: ~2-3 GB of the 100k
        # chunk_solve OOM was f64 P/R stores + their f32 cast temps).
        build_opts.setdefault("dtype", dtype)
        amg_hier = amgmod.build_amg(
            _raw_matrix(A_raw), None if B is None else _raw_matrix(B_raw),
            **build_opts)
    if X0 is None:
        if m0 is None:
            raise ValueError("pass X0 or m0= (int or 'auto')")
        if mesh is not None:
            raise ValueError("X0=None sizing does not compose with mesh")
        X = None
        n = A.shape[0]
    else:
        X = X0 if isinstance(X0, CX) else cx.from_numpy(np.asarray(X0),
                                                        dtype)
        n, m0 = X.shape
    if contour is None:
        contour = ct.circular_contour_trapezoidal(complex(c), float(r), nodes)
    from .feast import _resolve_tol
    tol = _resolve_tol(tol, tol_mode, contour)
    z = contour.device_nodes(dtype)
    w = contour.device_weights(dtype)
    N = len(contour)
    if mesh is not None:
        from ..parallel import mesh as pmesh
        z = pmesh.shard_nodes(z, mesh)
        w = pmesh.shard_nodes(w, mesh)
        X = pmesh.replicate(X, mesh)
        A = pmesh.replicate(A, mesh) if A is not None else None
        B = pmesh.replicate(B, mesh) if B is not None else None

    _gmres_restart_eff = None
    if solver == "bicgstab":
        solve_fn = krylov.bicgstab
    elif solver == "bicgstab_rr":
        solve_fn = krylov.bicgstab_rr
    elif solver == "bicgstabl":
        solve_fn = functools.partial(krylov.bicgstab_l, ell=2)
    else:
        # GMRES: the solver for strongly INDEFINITE interior shifts.
        # Measured (deep tensor-pencil slice at 95% of lam_max, ~99% of
        # the spectrum below the shift): AMG-preconditioned GMRES(50)
        # converges in ~20 iterations where BiCGStab's short recurrence
        # stalls at 1e-1..1e-2 even after 3000 iterations and every CSL
        # damp level.  The long recurrence costs basis memory
        # (restart+1)*n*m pairs — `rhs_chunk` bounds it (auto below).
        restart = gmres_restart or min(40, max(10, n // 8))
        solve_fn = functools.partial(
            krylov.gmres, restart=restart,
            maxrestart=max(1, -(-int(solve_iters) // restart)))
        _gmres_restart_eff = restart

    # AMG apply knobs ride in amg_opts next to the build knobs
    _amg_apply_keys = ("nu", "omega", "cycles", "dtype", "damp")
    amg_apply = {k: v for k, v in (amg_opts or {}).items()
                 if k in _amg_apply_keys}

    # A node-vmapped AMG V-cycle materializes PER-NODE shifted copies of
    # every level's stored data (S_l = A_l - z_i B_l) inside one jit, plus
    # einsum temporaries of comparable footprint — 8 nodes x a ~1GB BELL
    # level store OOMs a 16GB chip AT COMPILE (measured r3: 100k
    # unstructured FEM pencil, f32[8,8,3125,19,32,32] broadcast = 62GB).
    # Auto-chunk the node sweep when the estimated vmapped store exceeds
    # the runtime headroom — the node_chunk analog of dense feast's
    # node_loop degrade.
    on_cpu = jax.devices()[0].platform == "cpu"
    if precondition == "amg" and node_chunk is None and mesh is None \
            and not on_cpu:
        apply_dt = amg_apply.get("dtype", dtype)
        s_entries, _ = amgmod.hierarchy_nnz(amg_hier)
        # Calibrated to the MEASURED r3 failure, not the raw store: the
        # f32[8,8,3125,19,32,32] broadcast XLA staged for the 8-node vmap
        # was ~16x the naive 2*sum(entries)*itemsize store (extra leading
        # axis + scheduler temps), i.e. ~7.8 GB per node on the 100k
        # unstructured FEM.  The old 2.5x fudge picked node_chunk=4 there
        # and would still have compile-OOMed (ADVICE r3).
        per_node = 2 * sum(s_entries) * jnp.dtype(apply_dt).itemsize * 16.0
        budget = 8e9
        if N * per_node > budget:
            fit = [k for k in range(1, N + 1)
                   if N % k == 0 and k * per_node <= budget]
            node_chunk = max(fit) if fit else 1
            if debug:
                print(f"feast_iterative: node-vmapped AMG store ~"
                      f"{N * per_node / 1e9:.1f} GB exceeds HBM headroom; "
                      f"auto node_chunk={node_chunk}")

    def _rr_body(Q, A, B):
        Qo = qrmod.orthonormalize(Q, method=ortho)
        AQ = _apply(A, Qo)
        Aq = cx.cgram(Qo, AQ)  # dd-accurate Gram (see cx.cgram)
        if B is None:
            lam, Xq = eigmod.eig(Aq)
        else:
            BQ = _apply(B, Qo)
            Bq = cx.cgram(Qo, BQ)
            lam, Xq = eigmod.gen_eig(Aq, Bq)
        Xn = cx.normalize_cols(cx.cmatmul(Qo, Xq))
        BX = Xn if B is None else _apply(B, Xn)
        R = _apply(A, Xn) - cx.scale_cols(BX, lam)
        res = cx.col_norms(R)
        inside = _in_mask(lam, contour.kind, contour.params)
        return Xn, lam, R, res, inside

    def _make_M(zi: CX, A, B, amg):
        if precondition == "amg":
            from ..ops import amg as amgmod

            opts = dict(amg_apply)
            # Complex-shifted-Laplacian style damping for strongly interior
            # slices: precondition at z + i*sign(Im z)*damp*|z| — the extra
            # imaginary shift keeps the V-cycle contraction stable when
            # A - zB is indefinite mid-spectrum, at the price of a few
            # extra outer Krylov iterations (measured: damp 0.02-0.1
            # neutral-to-helpful, 0.3 costs ~40% more iterations on a
            # mid-spectrum FEM slice; plain AMG already converges there
            # because contour nodes carry Im z != 0).
            damp = float(opts.pop("damp", 0.0))
            if damp:
                s = jnp.where(zi.im >= 0, 1.0, -1.0)
                mag = jnp.sqrt(zi.re ** 2 + zi.im ** 2)
                zi = CX(zi.re, zi.im + s * damp * mag)
            return amgmod.shifted_preconditioner(amg, zi, **opts)
        if precondition == "jacobi":
            return spmod.jacobi_preconditioner(A, B, zi)
        if callable(precondition):
            return precondition(zi)
        return None

    def _solve_node(mv, M, Bm, x0):
        if solver in ("bicgstab", "bicgstab_rr", "bicgstabl"):
            return solve_fn(mv, Bm, x0=x0, tol=solve_tol,
                            maxiter=solve_iters, M=M).x
        mw = Bm.shape[1]
        ck = rhs_chunk
        if ck is None or ck >= mw:
            return solve_fn(mv, Bm, x0=x0, tol=solve_tol, M=M).x
        # GMRES RHS chunking: the (restart+1, n, chunk) Arnoldi basis is
        # the memory peak; solve the block in static column chunks
        parts = []
        for j0 in range(0, mw, ck):
            sl = slice(j0, j0 + ck)
            parts.append(solve_fn(
                mv, CX(Bm.re[:, sl], Bm.im[:, sl]),
                x0=CX(x0.re[:, sl], x0.im[:, sl]),
                tol=solve_tol, M=M).x)
        return cx.concatenate(parts, axis=1)

    def _one_node(zi, wi, x0, R, Xn, lam, A, B, amg):
        mv = spmod.shifted_matvec(A, B, CX(zi.re, zi.im))
        M = _make_M(CX(zi.re, zi.im), A, B, amg)
        x = _solve_node(mv, M, R, x0)
        from .feast import _resolvent
        return cx.scale_cols(Xn - x, _resolvent(wi, zi, lam)), x

    def _hutchinson_count():
        """E[#eig inside] = -(1/s) sum_i Re[w_i tr(X^H (A - z_i B)^{-1}
        B X)] with real Gaussian probes (stochastic.jl:2-33; the sign flip
        is ours — the node solves target (A - zB), the projector is in
        (zB - A); the B factor makes the trace the generalized projector's,
        which the reference omits).  One jitted program reused across
        nodes; amg rides as a jit ARGUMENT (closure constants would
        constant-fold the hierarchy, see ops/amg.py)."""
        s = int(samples)
        rngp = np.random.default_rng(seed)
        Xp = cx.from_numpy(rngp.standard_normal((n, s)) + 0j, dtype)

        @jax.jit
        def probe(zi, Xp, A, B, amg):
            BX = Xp if B is None else _apply(B, Xp)
            mv = spmod.shifted_matvec(A, B, zi)
            M = _make_M(zi, A, B, amg)
            Y = _solve_node(mv, M, BX, cx.zeros(BX.shape, BX.re.dtype))
            tr_re = jnp.sum(Xp.re * Y.re + Xp.im * Y.im)
            tr_im = jnp.sum(Xp.re * Y.im - Xp.im * Y.re)
            return tr_re, tr_im

        acc = 0.0
        for i in range(N):
            tr_re, tr_im = probe(CX(z.re[i], z.im[i]), Xp, A, B, amg_hier)
            tr = complex(float(np.asarray(tr_re)), float(np.asarray(tr_im)))
            wi = complex(float(np.asarray(w.re[i])),
                         float(np.asarray(w.im[i])))
            acc += (wi * (-tr)).real
        return acc / s

    if X is None:
        if m0 == "auto":
            est = _hutchinson_count()
            m0 = max(int(np.ceil(auto_m0_margin * max(est, 0.0))),
                     int(np.ceil(max(est, 0.0))) + 4, 4)
            m0 = min(m0, n)
            if debug:
                print(f"feast_iterative: stochastic count {est:.2f} inside "
                      f"-> m0={m0}")
        else:
            m0 = int(m0)
        rngx = np.random.default_rng(seed)
        X = cx.from_numpy(rngx.standard_normal((n, m0))
                          + 1j * rngx.standard_normal((n, m0)), dtype)

    if _gmres_restart_eff is not None and rhs_chunk is None:
        # auto RHS chunk: keep the (restart+1, n, chunk) pair basis
        # under ~3 GB (the 16 GB chip also holds the hierarchy, warm
        # blocks and the moment accumulators)
        bytes_per = 2 * jnp.dtype(dtype).itemsize
        ck = max(int(3e9 / ((_gmres_restart_eff + 1) * n * bytes_per)), 1)
        if ck < X.shape[1]:
            rhs_chunk = ck
            if debug:
                print(f"feast_iterative: gmres basis capped -> "
                      f"rhs_chunk={ck}")

    @jax.jit
    def step(Q, warm, A, B, amg):
        Xn, lam, R, res, inside = _rr_body(Q, A, B)

        def one_node(zi, wi, x0):
            return _one_node(zi, wi, x0, R, Xn, lam, A, B, amg)

        terms, warm_new = jax.vmap(one_node)(z, w, warm)
        Qn = CX(jnp.sum(terms.re, 0), jnp.sum(terms.im, 0))
        return Qn, Xn, lam, res, inside, warm_new

    rr_step = jax.jit(_rr_body)

    @jax.jit
    def chunk_solve(zc, wc, warmc, R, Xn, lam, A, B, amg):
        def one_node(zi, wi, x0):
            return _one_node(zi, wi, x0, R, Xn, lam, A, B, amg)

        terms, warm_new = jax.vmap(one_node)(zc, wc, warmc)
        return CX(jnp.sum(terms.re, 0), jnp.sum(terms.im, 0)), warm_new

    use_host_rr = rr == "host"
    if use_host_rr and mesh is not None:
        raise ValueError("rr='host' does not compose with mesh")
    use_chunks = use_host_rr or (node_chunk is not None and mesh is None
                                 and int(node_chunk) < N)
    if use_host_rr:
        import scipy.linalg as _sla

        A_h = _raw_matrix(A_raw)
        B_h = None if B is None else _raw_matrix(B_raw)
        if node_chunk is None:
            node_chunk = N

        def host_rr(Q):
            Qh = cx.to_numpy(Q)
            Qo, _ = np.linalg.qr(Qh)
            AQ = A_h @ Qo
            Aq = Qo.conj().T @ AQ
            if B_h is None:
                lam_h, Xq = _sla.eig(Aq)
            else:
                Bq = Qo.conj().T @ (B_h @ Qo)
                lam_h, Xq = _sla.eig(Aq, Bq)
            Xh = Qo @ Xq
            Xh = Xh / np.maximum(np.linalg.norm(Xh, axis=0),
                                 np.finfo(np.float64).tiny)
            BX = Xh if B_h is None else B_h @ Xh
            Rh = A_h @ Xh - BX * lam_h[None, :]
            res_h = np.linalg.norm(Rh, axis=0)
            inside_h = np.asarray(ct.in_contour(lam_h, contour), dtype=bool)
            return (cx.from_numpy(Xh, dtype), cx.from_numpy(lam_h, dtype),
                    cx.from_numpy(Rh, dtype), res_h, inside_h)

    if warm0 is not None and warm0.shape != (N, n, m0):
        raise ValueError(
            f"warm0 shape {warm0.shape} != (nodes, n, m0) = {(N, n, m0)}")
    if use_chunks:
        node_chunk = int(node_chunk)
        if node_chunk < 1 or N % node_chunk:
            raise ValueError(
                f"node_chunk={node_chunk} must be a positive divisor of "
                f"nodes={N}")
        nchunks = N // node_chunk
        if warm0 is not None:
            warm_list = [CX(warm0.re[k:k + node_chunk],
                            warm0.im[k:k + node_chunk])
                         for k in range(0, N, node_chunk)]
        else:
            warm_list = [cx.zeros((node_chunk, n, m0), dtype)
                         for _ in range(nchunks)]
        warm = None
    else:
        warm = warm0 if warm0 is not None else cx.zeros((N, n, m0), dtype)
        if mesh is not None:
            from ..parallel import mesh as pmesh
            warm = pmesh.shard_nodes(warm, mesh)
    lam = res = inside = None
    Xout = X
    n_iter, converged = 0, False
    n_sweeps = 0  # node-solve sweeps actually executed (ADVICE r4)
    Q = X

    # nit0: refinement-sweep offset for checkpointed single-sweep stepping
    # (orchestrate.feast_iterative_checkpointed runs iters=0 per process;
    # the offset keeps the spurious two-tier stop's nit >= 2 gate and the
    # debug iteration numbers continuous across processes).
    def _stops(nit, res_h, inside_h):
        nit = nit + nit0
        if inside_h.any() and res_h[inside_h].max() < tol:
            return True
        # two-tier stop (reference nlfeast.jl:73-79 semantics): once the
        # filter has acted (nit >= 2), values inside the contour whose
        # residual exceeds `spurious` are treated as spurious and ignored
        # for convergence — with iterative solves an over-sized subspace
        # can park a spurious Ritz value inside indefinitely.
        if spurious is not None and nit >= 2:
            ok = inside_h & (res_h < spurious)
            if ok.any() and res_h[ok].max() < tol:
                return True
        return False

    for nit in range(iters + 1):
        n_iter = nit
        if use_chunks:
            # convergence is decided by the RR step alone, so the chunked
            # path checks BEFORE the node-solve sweep — the final sweep
            # (whose Qn would be discarded) is never run.
            rr_state = (resume_chunk or {}).get("rr") \
                if (resume_chunk is not None and nit == 0) else None
            if rr_state is not None:
                # resume mid-sweep: the previous worker checkpointed this
                # sweep's RR products — skip recomputing them (the RR
                # phase plus the device init it forces is most of a
                # restarted worker's time-to-first-progress)
                Xh, lamh, Rh, resh, insh = rr_state
                Xout = cx.from_numpy(np.asarray(Xh), dtype)
                lam = cx.from_numpy(np.asarray(lamh), dtype)
                R = cx.from_numpy(np.asarray(Rh), dtype)
                res, inside = np.asarray(resh), np.asarray(insh)
            elif use_host_rr:
                Xout, lam, R, res, inside = host_rr(Q)
            else:
                Xout, lam, R, res, inside = rr_step(Q, A, B)
            res_h = np.asarray(res)
            inside_h = np.asarray(inside).astype(bool)
            if debug:
                _debug_print(nit + nit0, lam, res_h, inside_h)
            if _stops(nit, res_h, inside_h):
                converged = True
                break
            if chunk_ckpt is not None and rr_state is None:
                # RR prelude checkpoint: lets a successor worker re-enter
                # this sweep's chunk loop without redoing the RR phase
                chunk_ckpt({"nit": nit + nit0, "ci": -1,
                            "rr": (Xout, lam, R, res_h, inside_h)})
            # Sub-sweep fault tolerance (chunked path only): `chunk_ckpt`
            # is called after every node chunk with the partial moment
            # accumulator and that chunk's fresh warm block, and
            # `resume_chunk=(ci0, Qn_partial, warm_new)` restarts the
            # FIRST sweep of this call at chunk ci0 with those values —
            # the RR phase is deterministic in Q, so a resumed worker
            # recomputes it bit-identically and skips the completed
            # chunks.  This exists because a remote TPU worker's lifetime
            # can be SHORTER than one full sweep (measured r5: the axon
            # backend killed processes every 3-6 min while a 100k sweep
            # plus startup needed ~4); per-chunk checkpoints turn any
            # lifetime into forward progress.
            Qn = None
            ci0 = 0
            if resume_chunk is not None and nit == 0:
                ci0 = int(resume_chunk.get("ci0", 0))
                if ci0 > 0:
                    Qn_part = resume_chunk["Qn"]
                    warm_new = resume_chunk["warm_new"]
                    Qn = Qn_part if isinstance(Qn_part, CX) else \
                        cx.from_numpy(np.asarray(Qn_part), dtype)
                    for cj in range(ci0):
                        wj = warm_new[cj]
                        warm_list[cj] = wj if isinstance(wj, CX) else \
                            cx.from_numpy(np.asarray(wj), dtype)
            for ci in range(ci0, nchunks):
                k = ci * node_chunk
                t_ck = time.perf_counter() if debug else 0.0
                t, warm_list[ci] = chunk_solve(
                    z[k:k + node_chunk], w[k:k + node_chunk],
                    warm_list[ci], R, Xout, lam, A, B, amg_hier)
                Qn = t if Qn is None else Qn + t
                if chunk_ckpt is not None:
                    chunk_ckpt({"nit": nit + nit0, "ci": ci,
                                "nchunks": nchunks, "Qn": Qn,
                                "warm_chunk": warm_list[ci]})
                if debug:
                    print(f"  chunk {ci + 1}/{nchunks} "
                          f"{time.perf_counter() - t_ck:.1f}s", flush=True)
            n_sweeps += 1
        else:
            Qn, Xout, lam, res, inside, warm = step(Q, warm, A, B, amg_hier)
            n_sweeps += 1
            res_h, inside_h = np.asarray(res), np.asarray(inside)
            if debug:
                _debug_print(nit + nit0, lam, res_h, inside_h)
            if _stops(nit, res_h, inside_h):
                converged = True
                break
        Q = Qn
    if not np.asarray(inside).any():
        print("no eigenvalues found in contour!")
    warm_out = None
    if keep_warm:
        if use_chunks:
            warm_out = CX(jnp.concatenate([wc.re for wc in warm_list]),
                          jnp.concatenate([wc.im for wc in warm_list]))
        else:
            warm_out = warm
    if perm is not None:  # undo the RCM row permutation on the vectors
        iperm = jnp.asarray(np.argsort(perm))
        Xout = CX(Xout.re[iperm], Xout.im[iperm])
        if keep_q:
            Q = CX(Q.re[iperm], Q.im[iperm])
        if warm_out is not None:
            warm_out = CX(warm_out.re[:, iperm], warm_out.im[:, iperm])
    return FeastResult(lam, Xout, res, inside, n_iter, converged,
                       Q if keep_q else None, n_sweeps, warm_out)
