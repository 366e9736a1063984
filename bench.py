"""Benchmark: dense FEAST slice wall-time vs the LAPACK-CPU reference path,
plus the BASELINE north-star metrics (sparse shifted-solve nnz/s per chip,
gun-structure NLEP wall time).

Primary metric: wall-time to 1e-10 residual on a dense non-Hermitian
4096x4096 slice, 16 trapezoid nodes, m0=48.  The baseline is the SAME
algorithm executed by LAPACK/BLAS through numpy complex128 on host CPU —
i.e. what the Julia reference does (its compute is 100% LAPACK FFI:
SURVEY.md section 2.2), so `vs_baseline` measures TPU-native vs
reference-equivalent on this machine.

TPU path (scan-over-nodes, see feast.node_scan): per-node f32 pair LU on
the MXU + diagonal-block-inverse GEMM solves (lu.lu_diag_inv) + batched
wide-GEMM f64 iterative refinement (full accuracy; f64 LU is 16x-slower
emulation on TPU) + host LAPACK for the m0 x m0 reduced eig (remote-
dispatch latency).  Measured r2 on the real chip: 9.3s vs 66.7s LAPACK
(7.2x) at identical 7.3e-12 residuals.  A persistent XLA compilation
cache (.jax_cache/) makes repeat runs compile-free through the remote
tunnel.

Prints ONE JSON line:
  {"metric": ..., "value": wall_s, "unit": "s", "vs_baseline": base_s/wall_s,
   "detail": {..., "sparse_solve_nnz_per_s": ..., "gun_like_4096": ...}}
"""

import json
import os
import sys
import time

import numpy as np


def _setup_jax():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return jax


def _problem(n=4096, m0=48, seed=0):
    rng = np.random.default_rng(seed)
    A = np.diag(np.arange(1.0, n + 1.0)).astype(np.complex128)
    A += 0.05 * (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))
    c, r = 20.0 + 0.0j, 22.0  # ~40 eigenvalues inside
    return A, X0, c, r


def numpy_feast(A, X0, c, r, nodes=16, tol=1e-10, iters=20):
    """Reference-equivalent FEAST loop on LAPACK complex128 (feast.jl:10-80)."""
    n, m0 = X0.shape
    theta = np.pi / nodes + 2 * np.pi * np.arange(nodes) / nodes
    z = r * np.exp(1j * theta) + c
    w = r * np.exp(1j * theta) / nodes
    import scipy.linalg as sla
    t0 = time.perf_counter()
    facts = [sla.lu_factor(A - zi * np.eye(n)) for zi in z]
    Q = X0.copy()
    for nit in range(iters + 1):
        Q, _ = np.linalg.qr(Q)
        Aq = Q.conj().T @ (A @ Q)
        lam, Xq = np.linalg.eig(Aq)
        X = Q @ Xq
        X /= np.linalg.norm(X, axis=0)
        R = A @ X - X * lam[None, :]
        res = np.linalg.norm(R, axis=0)
        inside = np.abs(lam - c) <= r
        if inside.any() and res[inside].max() < tol:
            break
        Qn = np.zeros_like(Q)
        for i in range(nodes):
            temp = sla.lu_solve(facts[i], R)
            Qn += (X - temp) * (w[i] / (z[i] - lam))[None, :]
        Q = Qn
    return time.perf_counter() - t0, float(res[inside].max()), nit


def tpu_feast(A, X0, c, r, nodes=16, tol=1e-10, iters=20):
    import jax

    import feast_tpu as ft

    def run():
        t0 = time.perf_counter()
        out = ft.feast(A, X0, c=c, r=r, nodes=nodes, iters=iters, tol=tol,
                       mixed_prec=True, rr="host")
        # force a host transfer (block_until_ready is unreliable over the
        # remote tunnel)
        _ = np.asarray(out.res)
        return time.perf_counter() - t0, out

    run()  # warmup: compile everything (persistent-cached for next runs)
    wall, out = run()
    res = np.asarray(out.res)
    inside = np.asarray(out.inside)
    return wall, float(res[inside].max()), out.n_iter


def sparse_nnz_per_s(n=1_000_000, m0=16, reps=3):
    """North-star: sustained nnz/s per chip in the shifted-solve phase.

    Measures the SpMM-dominated inner loop the sparse path actually runs:
    AMG-preconditioned BiCGStab on (A - zI) for a 1M-dof Laplacian, m0
    RHS.  nnz processed = nnz * m0 * (2 matvecs + V-cycle SpMM work) per
    iteration."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from feast_tpu import cx
    from feast_tpu.ops import amg as amgmod
    from feast_tpu.ops import krylov
    from feast_tpu.ops import sparse as spmod

    A = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    nnz = A.nnz
    lam1 = 2 - 2 * np.cos(np.pi / (n + 1))
    zc = complex(3.5 * lam1 + 3.0 * lam1 * np.exp(1j * np.pi / 8))
    z = cx.CX(jnp.asarray(zc.real), jnp.asarray(zc.imag))
    h = amgmod.build_amg(A)
    # hierarchy SpMM work per V-cycle application (nu=2 pre + post + 2
    # residuals + P + R per level), counted in nonzeros touched
    lvl_nnz, p_nnz = amgmod.hierarchy_nnz(h)
    vcycle_nnz = sum(6 * a + 2 * p for a, p in zip(lvl_nnz, p_nnz))
    Ac = spmod.as_operator(A)  # tridiagonal -> DIA (shifted-slice SpMM)
    rng = np.random.default_rng(0)
    b = cx.from_numpy(rng.standard_normal((n, m0))
                      + 1j * rng.standard_normal((n, m0)), jnp.float64)

    out = {"n": n, "nnz": nnz, "m0": m0}
    best_rate = 0.0
    for tag, mdt in (("vcycle_f64", None), ("vcycle_f32", jnp.float32)):
        # f32 V-cycle: native f32 vs emulated f64 on TPU — half the
        # bandwidth in the dominant phase; outer f64 Krylov still reaches
        # 1e-10 (preconditioner precision only shapes iteration count)
        @jax.jit
        def solve(hh, bb):
            mv = spmod.shifted_matvec(Ac, None, z)
            return krylov.bicgstab(
                mv, bb, tol=1e-10, maxiter=40,
                M=amgmod.shifted_preconditioner(hh, z, dtype=mdt))

        sol = solve(h, b)           # warmup/compile
        iters = int(sol.iters)
        t_best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            sol = solve(h, b)
            _ = np.asarray(sol.resnorm)
            t_best = min(t_best, time.perf_counter() - t0)
        # per bicgstab iteration: 2 fine matvecs + 2 preconditioner V-cycles
        nnz_processed = iters * m0 * (2 * nnz + 2 * vcycle_nnz)
        rate = float(nnz_processed / t_best)
        out[tag] = {"solve_s": round(t_best, 3), "krylov_iters": iters,
                    "resnorm": float(np.asarray(sol.resnorm).max()),
                    "nnz_per_s": rate}
        best_rate = max(best_rate, rate)
    out["nnz_per_s"] = best_rate
    return out


def gun_small(n=4096):
    """gun-structure NLEP wall time (full N=9956 run: benchmarks/gun.py)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "benchmarks"))
    import importlib

    gun = importlib.import_module("gun")
    r = gun.run(n=n, m0=84, nodes=16, verbose=False)
    return r


def _aux_metric(fn_name, timeout_s=2400, attempts=3):
    """Run an aux metric in a SUBPROCESS: a remote-TPU worker crash inside
    one metric must not poison the backend for the rest of the bench (a
    dead axon backend fails every subsequent dispatch in-process).  The
    axon worker is flaky under sustained 1M-dof dispatch ("TPU worker
    process crashed", see CLAUDE.md) — retry a couple of times; a fresh
    process with the primed compile cache restarts cheaply."""
    import subprocess

    code = ("import bench, json; bench._setup_jax(); "
            f"print('\\nAUXJSON ' + json.dumps(bench.{fn_name}()))")
    last = {"error": "not run"}
    for k in range(attempts):
        if k:
            time.sleep(60)  # axon worker cool-down between retries
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s,
                               cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in p.stdout.splitlines():
                if line.startswith("AUXJSON "):
                    return json.loads(line[len("AUXJSON "):])
            last = {"error": "no output", "rc": p.returncode,
                    "stderr": p.stderr[-500:]}
        except Exception as e:
            last = {"error": repr(e)}
    return last


def main():
    _setup_jax()
    A, X0, c, r = _problem()
    wall_s, res, it = tpu_feast(A, X0, c, r)
    base_s, base_res, base_it = numpy_feast(A, X0, c, r)
    detail = {
        "tpu": {"wall_s": round(wall_s, 4), "max_res_inside": res,
                "iters": it},
        "lapack_cpu": {"wall_s": round(base_s, 4),
                       "max_res_inside": base_res, "iters": base_it},
    }
    detail["sparse_solve_nnz_per_s"] = _aux_metric("sparse_nnz_per_s")
    if "error" in detail["sparse_solve_nnz_per_s"]:
        # flaky axon worker under 1M-dof load — fall back to the recorded
        # real-chip measurement (clearly marked) rather than dropping the
        # north-star metric
        recp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "results",
                            "sparse_nnz_recorded.json")
        if os.path.exists(recp):
            with open(recp) as f:
                rec = json.load(f)
            rec["live_error"] = detail["sparse_solve_nnz_per_s"]["error"]
            detail["sparse_solve_nnz_per_s"] = rec
    detail["gun_like_4096"] = _aux_metric("gun_small")
    # BASELINE north-star: 1M-dof sparse GENERALIZED slice to 1e-10,
    # recorded by `python benchmarks/sparse1m.py --orchestrate` (a ~40 min
    # real-chip run — too long to recompute per bench invocation; the
    # JSON carries its own config + residuals for verification)
    sp1m = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "results", "sparse1m.json")
    if os.path.exists(sp1m):
        with open(sp1m) as f:
            detail["sparse1m_feast_recorded"] = json.load(f)
    print(json.dumps({
        "metric": "dense_feast_4096_wall_to_1e-10",
        "value": round(wall_s, 4),
        "unit": "s",
        "vs_baseline": round(base_s / wall_s, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    sys.exit(main())
