"""BASELINE north-star: 1M-dof sparse GENERALIZED FEAST slice to 1e-10.

Problem: 2-D tensor pencil (K, B) on an N x N grid (n = N^2 dofs),
K = T (+) T (5-point stiffness), B = M (x) M (9-point bilinear FEM mass,
M = tridiag(1,4,1)/6).  Both matrices are sparse, B != I — the reference's
sparse-generalized regime (/root/reference/test/generalized_feast.jl:7-24),
which it handles with UMFPACK sparse LU.  The TPU-native path is
DIA shifted-slice SpMM + SA-AMG-preconditioned block BiCGStab inside
`feast_iterative` (ops/amg.py, ops/sparse.py).

The pencil is separable, so the exact generalized eigenvalues are
(t_i + t_j) / (m_i m_j) with t_k = 2-2cos(k pi/(N+1)),
m_k = (2+cos(k pi/(N+1)))/3 — the run validates against them.

Slice: the LOWEST cluster (5 smallest, includes a degenerate pair that
pulls in a 6th) — the hard edge-of-spectrum regime where
kappa(K - zB) ~ lam_max/gap >= 1e9 at N=1000.

Writes benchmarks/results/sparse1m.json and prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp


def pick_slice(lam, interior=None, k_in=6):
    """Contour placement.  interior=None: the lowest cluster (the original
    north-star config).  interior=frac: a MID-SPECTRUM slice at
    sigma = frac * lam_max (VERDICT r4 missing #2 — the last demonstrated
    capability gap vs UMFPACK's shift-agnostic sparse LU,
    /root/reference/test/gun2.jl:4-6).

    The separable spectrum is exactly degenerate ((i,j)/(j,i) pairs), so
    the window is chosen CLUSTER-aware: group eigenvalues into distinct
    values, then among windows of consecutive clusters totalling ~k_in
    near sigma pick the one maximizing the smaller flanking gap — a window
    boundary through a degenerate pair would make the slice ill-posed."""
    if interior is None:
        c = (lam[0] + lam[4]) / 2
        r = (lam[4] - lam[0]) * 0.75
        return complex(c), float(r)
    sigma = float(interior) * lam[-1]
    i0 = int(np.argmin(np.abs(lam - sigma)))
    w = lam[max(i0 - 80, 0):i0 + 80]
    tolc = 1e-9 * sigma
    vals, mult = [], []
    start = 0
    for i in range(1, len(w)):
        if w[i] - w[i - 1] > tolc:
            vals.append(w[start])
            mult.append(i - start)
            start = i
    vals.append(w[start])
    mult.append(len(w) - start)
    vals, mult = np.asarray(vals), np.asarray(mult)
    best = None
    for lo in range(1, len(vals) - 2):
        tot, hi = mult[lo], lo
        while hi + 1 < len(vals) - 1 and tot < k_in:
            hi += 1
            tot += mult[hi]
        if tot < k_in or tot > k_in + 2:
            continue
        gapL = vals[lo] - vals[lo - 1]
        gapR = vals[hi + 1] - vals[hi]
        span = vals[hi] - vals[lo]
        c = (vals[lo] + vals[hi]) / 2
        r = span / 2 + 0.4 * min(gapL, gapR)
        score = min(gapL, gapR) / max(r, 1e-300)
        if best is None or score > best[0]:
            best = (score, c, r)
    _, c, r = best
    return complex(c), float(r)


def build_pencil(N: int):
    T1 = sp.diags([np.full(N, 2.0), -np.ones(N - 1), -np.ones(N - 1)],
                  [0, 1, -1], format="csr")
    M1 = sp.diags([np.full(N, 4 / 6), np.full(N - 1, 1 / 6),
                   np.full(N - 1, 1 / 6)], [0, 1, -1], format="csr")
    I = sp.identity(N, format="csr")
    K = (sp.kron(T1, I) + sp.kron(I, T1)).tocsr().astype(np.complex128)
    B = sp.kron(M1, M1).tocsr().astype(np.complex128)
    k = np.arange(1, N + 1)
    t = 2 - 2 * np.cos(k * np.pi / (N + 1))
    m = (2 + np.cos(k * np.pi / (N + 1))) / 3
    lam = np.sort(((t[:, None] + t[None, :])
                   / (m[:, None] * m[None, :])).ravel())
    return K, B, lam


def run(N: int = 1000, m0: int = 8, nodes: int = 8, tol: float = 1e-10,
        solve_tol: float = 1e-9, solve_iters: int = 120,
        solver: str = "bicgstab_rr", node_chunk=None, rr: str = "device",
        amg_f32: bool = False, verbose: bool = True):
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    from feast_tpu.solvers.ifeast import feast_iterative

    t0 = time.perf_counter()
    K, B, lam = build_pencil(N)
    build_s = time.perf_counter() - t0
    n = N * N
    c = (lam[0] + lam[4]) / 2
    r = (lam[4] - lam[0]) * 0.75
    n_inside = int(np.sum(np.abs(lam - c) <= r))
    if verbose:
        print(f"n={n} nnz(K)={K.nnz} nnz(B)={B.nnz} "
              f"slice c={c:.3e} r={r:.3e} ({n_inside} exact inside), "
              f"build {build_s:.1f}s", flush=True)
    rng = np.random.default_rng(0)
    X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))

    t0 = time.perf_counter()
    amg_opts = None
    if amg_f32:
        import jax.numpy as jnp
        amg_opts = {"dtype": jnp.float32}  # f32 V-cycle under the f64 Krylov
    out = feast_iterative(K, B, X0, c=complex(c), r=float(r), nodes=nodes,
                          iters=8, tol=tol, precondition="amg",
                          amg_opts=amg_opts,
                          solver=solver, solve_tol=solve_tol,
                          solve_iters=solve_iters, rr=rr,
                          node_chunk=node_chunk, debug=verbose)
    wall = time.perf_counter() - t0
    lamf, _, res = out.filtered()
    got = np.sort(lamf.real)
    exact = lam[np.abs(lam - c) <= r]
    ok = (out.converged and len(got) == n_inside
          and np.allclose(got, exact, rtol=1e-5)
          and res.size and float(res.max()) < tol)
    rec = {
        "n": n, "nnz_K": int(K.nnz), "nnz_B": int(B.nnz), "m0": m0,
        "nodes": nodes, "tol": tol, "solver": solver, "rr": rr,
        "amg_f32": amg_f32,
        "solve_tol": solve_tol,
        "solve_iters": solve_iters, "node_chunk": node_chunk,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0].device_kind),
        "solve_wall_s": round(wall, 2),
        "host_build_s": round(build_s, 2),
        "n_refinement_iters": int(out.n_iter),
        "found": len(got), "exact_inside": n_inside,
        "max_res": float(res.max()) if res.size else None,
        "max_eig_relerr": (float(np.max(np.abs(got - exact) / exact))
                           if len(got) == len(exact) and len(exact)
                           else None),
        "ok": bool(ok),
    }
    return rec


def make_fd_precond(N):
    """Fast-diagonalization direct preconditioner (ops/fastdiag.py) for the
    separable tensor pencil: T1 and M1 are commuting tridiagonal Toeplitz,
    so (K - zB)^{-1} is four dense (N,N) GEMMs + an elementwise divide at
    ANY shift — the structured-operator analog of UMFPACK's shift-agnostic
    sparse LU, and the only path that reaches DEEP interior slices (AMG
    stalls once most of the spectrum sits below the shift; r5 depth
    sweep)."""
    import jax.numpy as jnp

    from feast_tpu.ops import fastdiag

    T1 = sp.diags([np.full(N, 2.0), -np.ones(N - 1), -np.ones(N - 1)],
                  [0, 1, -1], format="csr")
    M1 = sp.diags([np.full(N, 4 / 6), np.full(N - 1, 1 / 6),
                   np.full(N - 1, 1 / 6)], [0, 1, -1], format="csr")
    fd = fastdiag.build(A1=T1, B1=M1, form="kron", dtype=jnp.float32)
    return fastdiag.preconditioner(fd)


def step(N, m0, nodes, tol, solve_tol, solve_iters, solver, node_chunk,
         amg_f32, x_in, state_out, cpu=False, interior=None, damp=0.0,
         fd=False):
    """One refinement sweep in THIS process: RR(X) -> convergence check ->
    (if not converged) one node-solve sweep; checkpoint the updated moment
    subspace Q.  The axon TPU worker reliably dies after ~2 consecutive
    1M-dof sweeps ("TPU worker process crashed"), so the orchestrator runs
    one sweep per process and restarts crashed steps from the checkpoint."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    from feast_tpu.solvers.ifeast import feast_iterative

    K, B, lam = build_pencil(N)
    n = N * N
    c, r = pick_slice(lam, interior)
    warm0 = None
    if x_in and os.path.exists(x_in):
        st_in = np.load(x_in)
        X0 = st_in["Q"]
        if "warm" in st_in.files:  # cross-process Krylov warm starts
            warm0 = st_in["warm"]
    else:
        rng = np.random.default_rng(0)
        X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))
    amg_opts = {}
    if amg_f32:
        amg_opts["dtype"] = jnp.float32
    if damp:
        amg_opts["damp"] = float(damp)
    precond = make_fd_precond(N) if fd else "amg"
    t0 = time.perf_counter()
    out = feast_iterative(K, B, X0, c=c, r=r, nodes=nodes,
                          iters=0, tol=tol, precondition=precond,
                          tol_mode="contour" if interior else "abs",
                          amg_opts=amg_opts or None, solver=solver,
                          solve_tol=solve_tol, solve_iters=solve_iters,
                          node_chunk=node_chunk, keep_q=True,
                          keep_warm=True, debug=True)
    sweep_s = time.perf_counter() - t0
    from feast_tpu import cx as cxmod
    Qh = cxmod.to_numpy(out.Q) if out.Q is not None else None
    lamh = cxmod.to_numpy(out.lam)
    res = np.asarray(out.res)
    inside = np.asarray(out.inside)
    extra = {}
    if out.warm is not None and int(out.n_sweeps) > 0:
        # per-node complex64 pulls: one monolithic f64 pull of the warm
        # stack is ~1 GB at 1M dof and a measured axon crash trigger
        from feast_tpu.orchestrate import _pull_warm_f32
        extra["warm"] = _pull_warm_f32(out.warm)
    elif warm0 is not None:
        extra["warm"] = np.asarray(warm0, dtype=np.complex64)
    np.savez(state_out, Q=(X0 if out.converged else Qh), lam=lamh,
             res=res, inside=inside, converged=out.converged,
             sweep_s=sweep_s, **extra)
    print(json.dumps({"converged": bool(out.converged),
                      "max_res_inside": (float(res[inside].max())
                                         if inside.any() else None),
                      "n_inside": int(inside.sum()),
                      "sweep_s": round(sweep_s, 2)}), flush=True)
    return 0


def orchestrate(args):
    """Subprocess-per-sweep driver with crash retry (see `step`)."""
    import subprocess

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "results")
    os.makedirs(outdir, exist_ok=True)
    suffix = "_interior" if args.interior is not None else ""
    state = os.path.join(outdir, f"sparse1m{suffix}_state_N{args.N}.npz")
    if os.path.exists(state) and not args.resume:
        os.remove(state)
    K, B, lam = build_pencil(args.N)  # for final validation
    n = args.N * args.N
    c, r = pick_slice(lam, args.interior)
    exact = lam[np.abs(lam - c) <= r]
    t_all = time.perf_counter()
    solve_s, crashes, sweeps = 0.0, 0, 0
    converged = False
    while sweeps < args.max_sweeps and not converged:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--one-step", "--state-out", state,
               "--N", str(args.N), "--m0", str(args.m0),
               "--nodes", str(args.nodes), "--tol", str(args.tol),
               "--solve-tol", str(args.solve_tol),
               "--solve-iters", str(args.solve_iters),
               "--solver", args.solver]
        if os.path.exists(state):
            cmd += ["--x-in", state]
        if args.node_chunk:
            cmd += ["--node-chunk", str(args.node_chunk)]
        if args.amg_f32:
            cmd += ["--amg-f32"]
        if args.interior is not None:
            cmd += ["--interior", str(args.interior)]
        if args.damp:
            cmd += ["--damp", str(args.damp)]
        if args.fd:
            cmd += ["--fd"]
        if args.cpu:
            cmd += ["--cpu"]
        try:
            rc = subprocess.call(cmd, timeout=3600)
        except subprocess.TimeoutExpired:
            rc = -1
        if rc != 0:
            crashes += 1
            print(f"[orchestrator] step crashed (rc={rc}), retry "
                  f"{crashes}", flush=True)
            if crashes > args.max_crashes:
                break
            continue
        st = np.load(state)
        solve_s += float(st["sweep_s"])
        converged = bool(st["converged"])
        sweeps += 1
        print(f"[orchestrator] sweep {sweeps} done, converged={converged}",
              flush=True)
    wall = time.perf_counter() - t_all
    try:
        st = np.load(state)
    except Exception as e:  # all steps crashed before any checkpoint
        rec = {"n": n, "mode": "orchestrated", "ok": False,
               "error": f"no usable checkpoint: {e!r}",
               "worker_crashes_retried": crashes,
               "n_refinement_iters": sweeps,
               "orchestrator_wall_s": round(wall, 2)}
        with open(os.path.join(outdir, "sparse1m.json"), "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps(rec))
        return 1
    lamh, res, inside = st["lam"], st["res"], st["inside"].astype(bool)
    got = np.sort(lamh[inside].real)
    # interior clusters are separated by ~1e-5 relative: matching must be
    # much tighter than the cluster spacing (measured eig err <= 1e-11)
    match_rtol = 1e-8 if args.interior is not None else 1e-5
    tol_abs = (args.tol * (abs(c) + r) if args.interior is not None
               else args.tol)
    ok = (converged and len(got) == len(exact)
          and np.allclose(got, exact, rtol=match_rtol)
          and float(res[inside].max()) < tol_abs)
    rec = {
        "n": n, "nnz_K": int(K.nnz), "nnz_B": int(B.nnz), "m0": args.m0,
        "nodes": args.nodes, "tol": args.tol, "solver": args.solver,
        "preconditioner": "fastdiag" if args.fd else "amg",
        "amg_f32": args.amg_f32, "solve_tol": args.solve_tol,
        "solve_iters": args.solve_iters, "node_chunk": args.node_chunk,
        "mode": "orchestrated (1 sweep/process, crash-retry)",
        "solve_wall_s": round(solve_s, 2),
        "orchestrator_wall_s": round(wall, 2),
        "n_refinement_iters": sweeps, "worker_crashes_retried": crashes,
        "found": len(got), "exact_inside": len(exact),
        "max_res": float(res[inside].max()) if inside.any() else None,
        "max_eig_relerr": (float(np.max(np.abs(got - exact) / exact))
                           if len(got) == len(exact) else None),
        "ok": bool(ok),
    }
    if args.interior is not None:
        rec["interior_frac"] = args.interior
        rec["c"], rec["r"] = float(c.real), float(r)
        rec["lam_max"] = float(lam[-1])
        rec["tol_abs_contour_scaled"] = tol_abs
        rec["amg_damp"] = args.damp
        rec["max_res_relative"] = (rec["max_res"] / (abs(c) + r)
                                   if rec["max_res"] is not None else None)
    # The headline filename is reserved for the real thing: N=1000 on a TPU
    # backend.  Smoke runs (reduced N, --cpu) are keyed by scale so they
    # cannot masquerade as the flagship (the r3 lesson).  The fastdiag
    # LOWEST-slice run gets its own name: sparse1m.json stays the
    # general-machinery (AMG) artifact.
    if args.fd and args.interior is None:
        suffix = f"{suffix}_fd"
    if args.N < 900 or args.cpu:
        suffix = f"{suffix}_N{args.N}_smoke"
        rec["smoke"] = True
    with open(os.path.join(outdir, f"sparse1m{suffix}.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=1000)
    ap.add_argument("--m0", type=int, default=8)
    ap.add_argument("--nodes", type=int, default=8)
    ap.add_argument("--tol", type=float, default=1e-10)
    ap.add_argument("--solve-tol", type=float, default=1e-9)
    ap.add_argument("--solve-iters", type=int, default=120)
    ap.add_argument("--node-chunk", type=int, default=None)
    ap.add_argument("--solver", type=str, default="bicgstab_rr")
    ap.add_argument("--rr", type=str, default="device")
    ap.add_argument("--amg-f32", action="store_true")
    ap.add_argument("--interior", type=float, default=None, nargs="?",
                    const=0.45, metavar="FRAC",
                    help="mid-spectrum slice at FRAC*lam_max (default 0.45 "
                         "when given bare) instead of the lowest cluster; "
                         "tol becomes contour-scaled (relative)")
    ap.add_argument("--damp", type=float, default=0.0,
                    help="CSL-style AMG preconditioner damping (relative "
                         "to |z|; only for hard interior slices)")
    ap.add_argument("--fd", action="store_true",
                    help="fast-diagonalization direct preconditioner "
                         "(ops/fastdiag.py) instead of AMG — exact "
                         "tensor-structure inverse, reaches ANY interior "
                         "depth; the AMG path stays the general-machinery "
                         "benchmark")
    ap.add_argument("--one-step", action="store_true")
    ap.add_argument("--orchestrate", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-sweeps", type=int, default=10)
    ap.add_argument("--max-crashes", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--x-in", type=str, default=None)
    ap.add_argument("--state-out", type=str, default=None)
    args = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if args.one_step:
        return step(args.N, args.m0, args.nodes, args.tol, args.solve_tol,
                    args.solve_iters, args.solver, args.node_chunk,
                    args.amg_f32, args.x_in, args.state_out, cpu=args.cpu,
                    interior=args.interior, damp=args.damp, fd=args.fd)
    if args.orchestrate:
        return orchestrate(args)
    rec = run(N=args.N, m0=args.m0, nodes=args.nodes, tol=args.tol,
              solve_tol=args.solve_tol, solve_iters=args.solve_iters,
              solver=args.solver, node_chunk=args.node_chunk, rr=args.rr,
              amg_f32=args.amg_f32)
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "results")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "sparse1m.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
