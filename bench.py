"""Benchmark: dense FEAST slice wall-time vs the LAPACK-CPU reference path,
plus the BASELINE north-star metrics (sparse shifted-solve nnz/s per chip,
gun-structure NLEP wall time) and per-phase FLOP/MFU accounting.

Primary metric: wall-time to 1e-10 residual on a dense non-Hermitian
4096x4096 slice, 16 trapezoid nodes, m0=48.  The baseline is the SAME
algorithm executed by LAPACK/BLAS through numpy complex128 on host CPU —
i.e. what the Julia reference does (its compute is 100% LAPACK FFI:
SURVEY.md section 2.2), so `vs_baseline` measures TPU-native vs
reference-equivalent on this machine.

TPU path (r3): `feast_compiled` — the ENTIRE refinement loop in one jit
(zero host round-trips; the r2 python-loop driver paid ~latency x
dispatches over the remote tunnel and its headline halved between runs),
scan-over-nodes at this size (feast._node_scan_auto), f32 pair LU on the
MXU + lu_diag_inv GEMM solves + batched wide-GEMM f64 iterative
refinement.  Timing: one warmup call (compile; persistent-cached), then
BEST OF 3 timed runs, all three walls recorded, cache hit/miss logged
(VERDICT r2 prescription #2).

Prints the metric JSON line TWICE (same schema both times — take the LAST
parseable line): once the moment the primary TPU-vs-LAPACK numbers exist
(flushed; detail.partial=true), and once after the aux metrics finish
under a hard wall-clock budget (FEAST_BENCH_BUDGET_S, default 1500 s).
Both printed lines are COMPACT (< 1500 chars, asserted) so they survive a
tail-limited driver capture (the r4 failure mode); the full detail tree —
aux metrics, recorded artifacts — is written to
benchmarks/results/bench_last.json and the printed line carries a
detail_file pointer.
  {"metric": ..., "value": wall_s, "unit": "s", "vs_baseline": base/wall,
   "detail": {<headline summary>, "detail_file": ...}}
"""

import glob
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def _setup_jax():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache_dir = os.path.join(_HERE, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    # The remote backend's plugin registration FLAPS (r5: outage windows
    # of minutes where every process gets "Unable to initialize backend");
    # a bench run that starts inside one must wait it out, not die with
    # nothing captured.  Each failed attempt leaves the backend list
    # poisoned in-process, so retries happen in a SUBPROCESS probe and
    # the parent only proceeds once one succeeds.
    import subprocess
    import sys as _sys
    for attempt in range(20):
        r = subprocess.run([_sys.executable, "-c",
                            "import jax; jax.devices()"],
                           capture_output=True, timeout=120)
        if r.returncode == 0:
            break
        print(f"bench: backend registration failed (attempt {attempt + 1}"
              f"/20), waiting 30 s", flush=True)
        time.sleep(30)
    return jax


def _cache_entries():
    return len(glob.glob(os.path.join(_HERE, ".jax_cache", "*")))


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
    t_factor = time.perf_counter() - t0
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
    return (time.perf_counter() - t0, float(res[inside].max()), nit,
            t_factor)


def tpu_feast_compiled(A, X0, c, r, nodes=16, tol=1e-10, iters=20, reps=3,
                       driver="compiled"):
    """Primary timed path: warmup + best-of-N.

    driver: "compiled" = feast_compiled single-jit loop (zero host
    round-trips); "host_rr" = python-loop feast(rr="host") — the LU store
    is a jit ARGUMENT there, which XLA aliases, so it avoids the single-
    jit while-loop's staging copy of the whole factor batch (measured:
    that copy is a (nodes, n, n) f32 HLO temp that OOMs n=8192 even at 8
    nodes; the pyloop fits and was the fastest n=4096 driver anyway);
    "auto" = try compiled, fall back to host_rr on failure.

    A/X0 are pushed to the device ONCE, outside the timed region (the
    LAPACK baseline also starts with A resident in RAM; re-uploading
    268MB per rep over the remote tunnel only re-measures tunnel jitter —
    the r2 headline-halving culprit).  The one-time push is reported as
    upload_s."""
    import jax.numpy as jnp

    import feast_tpu as ft
    from feast_tpu import cx

    t0 = time.perf_counter()
    Ax = cx.from_numpy(A, jnp.float64)
    Xx = cx.from_numpy(X0, jnp.float64)
    _ = np.asarray(jnp.sum(Ax.re))  # force the transfer (remote-TPU
    # block_until_ready caveat: only a host read reliably blocks)
    upload_s = time.perf_counter() - t0

    def run_compiled():
        t0 = time.perf_counter()
        out = ft.feast_compiled(Ax, Xx, c=c, r=r, nodes=nodes, iters=iters,
                                tol=tol, mixed_prec=True)
        _ = np.asarray(out.res)  # host transfer: the only reliable barrier
        return time.perf_counter() - t0, out

    def run_host_rr():
        t0 = time.perf_counter()
        o = ft.feast(Ax, Xx, c=c, r=r, nodes=nodes, iters=iters, tol=tol,
                     mixed_prec=True, rr="host")
        _ = np.asarray(o.res)
        return time.perf_counter() - t0, o

    fallback_err = None
    run = run_compiled
    if driver == "host_rr":
        run = run_host_rr
    entries0 = _cache_entries()
    try:
        warm_wall, out = run()  # compile (persistent-cached across runs)
    except Exception as e:
        if driver != "auto":
            raise
        fallback_err = f"{type(e).__name__}: {str(e)[:300]}"
        run = run_host_rr
        warm_wall, out = run()
    compiled_fresh = _cache_entries() > entries0
    walls = []
    for _ in range(reps):
        wall, out = run()
        walls.append(round(wall, 4))
    result = {
        "driver": "host_rr" if run is run_host_rr else "compiled",
        "walls_s": walls, "best_s": min(walls),
        "upload_s": round(upload_s, 2),
        "spread_pct": round(100 * (max(walls) - min(walls)) / min(walls), 1),
        "warmup_s": round(warm_wall, 2),
        "compile_cache": "miss (new entries written)" if compiled_fresh
                         else "hit (no new cache entries)",
        "max_res_inside": float(np.asarray(out.res)[
            np.asarray(out.inside)].max()),
        "iters": int(out.n_iter),
    }
    if fallback_err:
        result["compiled_driver_error"] = fallback_err
    if run is run_compiled:
        # secondary driver for the detail: python-loop feast with host-
        # LAPACK RR (the 48x48 reduced eig on host costs ~1ms vs ~0.5s for
        # the on-device Schur; the loop pays per-sweep dispatch latency)
        run_host_rr()
        result["pyloop_host_rr_s"] = round(
            min(run_host_rr()[0] for _ in range(2)), 4)
    return result


def phase_profile(A, X0, c, r, nodes=16):
    """Per-phase walls + achieved FLOP/s for the headline config.

    FLOP model (3-real-multiply complex arithmetic = 16/3 n^3 per complex
    LU, 16 n^2 m0 per triangular solve pass over m0 RHS, 16 n^2 k m0 per
    wide refinement GEMM; f64 emulated ops counted once — the hardware
    cost multiplier is reported separately, not folded in)."""
    import jax
    import jax.numpy as jnp

    import importlib

    # feast_tpu.solvers.__init__ rebinds the name `feast` to the driver
    # function, so the module must come from importlib
    fmod = importlib.import_module("feast_tpu.solvers.feast")
    from feast_tpu import contour as ct
    from feast_tpu import cx

    n, m0 = X0.shape
    dtype = jnp.float64
    Ax = cx.from_numpy(A, dtype)
    Qx = cx.from_numpy(X0, dtype)
    k = ct.circular_contour_trapezoidal(complex(c), float(r), nodes)
    z = k.device_nodes(dtype)
    w = k.device_weights(dtype)

    def timed(fn, *args, static=()):
        """Time fn JITTED (eager per-op dispatch over the remote tunnel is
        ~25ms/op and would measure the tunnel, not the chip)."""
        jfn = jax.jit(fn, static_argnames=static)
        out = jfn(*args)  # warmup/compile
        for leaf in jax.tree_util.tree_leaves(out):
            _ = np.asarray(leaf.ravel()[:1])  # force every output buffer
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            out = jfn(*args)
            for leaf in jax.tree_util.tree_leaves(out):
                _ = np.asarray(leaf.ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        return best, out

    prof = {}
    # factor phase: nodes x f32 LU + diagonal-block inverses
    t_f, (LUb, permb, dinvb) = timed(
        lambda a, zz: fmod._factor_scan(a, None, zz, solve_f32=True), Ax, z)
    flops_factor = nodes * (16 / 3) * n ** 3
    prof["factor"] = {"wall_s": round(t_f, 3),
                      "model_f32_gflop": round(flops_factor / 1e9, 1),
                      "achieved_tflops": round(flops_factor / t_f / 1e12, 2)}
    # one refinement step (RR + node update with 2 IR sweeps)
    Sb_empty = cx.CX(jnp.zeros((0,)), jnp.zeros((0,)))
    t_s, _ = timed(
        lambda q, a, lub, pb, db, zz, ww: fmod._feast_step(
            q, a, None, lub, pb, db, Sb_empty, zz, ww, k.kind, k.params,
            "cholqr2", True, True, "lu", True),
        Qx, Ax, LUb, permb, dinvb, z, w)
    refine = 2
    solves = (1 + refine) * 2 * 16 * n * n * m0 * nodes   # f32 tri solves
    ir_gemms = refine * 2 * 16 * n * n * nodes * m0       # f64 wide GEMMs
    rr_gemms = 3 * 16 * n * n * m0                        # f64 A@Q etc
    prof["step"] = {
        "wall_s": round(t_s, 3),
        "model_gflop_f32_solves": round(solves / 1e9, 1),
        "model_gflop_f64_gemms": round((ir_gemms + rr_gemms) / 1e9, 1),
        "achieved_tflops_mixed": round(
            (solves + ir_gemms + rr_gemms) / t_s / 1e12, 2),
    }
    # step sub-phases (ortho / RR incl. 48x48 device Schur / node update)
    from feast_tpu.ops import qr as qrmod

    # every big array must be a jit ARGUMENT — a closed-over matrix
    # becomes an HLO constant and blows the remote-compile tunnel's
    # request-size limit (HTTP 413 at 268MB; see CLAUDE.md)
    t_o, Qo = timed(
        lambda q: qrmod.orthonormalize(q, method="cholqr2"), Qx)
    t_rr, (lam, Xr, R, _res) = timed(
        lambda q, a: fmod._rayleigh_ritz(q, a, None, "lu"), Qo, Ax)
    t_u, _ = timed(
        lambda lub, pb, db, zz, ww, xx, rr_, ll, a: fmod._node_update_scan(
            lub, pb, zz, ww, xx, rr_, ll, jnp.float32, a, None,
            store=True, dinvb=db),
        LUb, permb, dinvb, z, w, Xr, R, lam, Ax)
    prof["step_parts"] = {
        "ortho_s": round(t_o, 3),
        "rr_s": round(t_rr, 3),
        "node_update_s": round(t_u, 3),
        "note": "rr includes the m0 x m0 on-device Schur eigensolve; "
                "node_update = 16 scanned f32 LU solves + 2 batched "
                "emulated-f64 IR sweeps",
    }
    return prof


def sparse_nnz_per_s(n=1_000_000, m0=16, reps=3, tags=None):
    """North-star: sustained nnz/s per chip in the shifted-solve phase.

    Measures the SpMM-dominated inner loop the sparse path actually runs:
    AMG-preconditioned BiCGStab on (A - zI) for an n-dof Laplacian, m0
    RHS.  `tags` restricts the dtype variants (the 1M-dof run crashes the
    axon worker under sustained dispatch — the isolated wrappers below run
    ONE variant per subprocess, the orchestrate.py lesson applied to the
    bench)."""
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
    lvl_nnz, p_nnz = amgmod.hierarchy_nnz(h)
    vcycle_nnz = sum(6 * a + 2 * p for a, p in zip(lvl_nnz, p_nnz))
    Ac = spmod.as_operator(A)  # tridiagonal -> DIA (shifted-slice SpMM)
    rng = np.random.default_rng(0)
    b = cx.from_numpy(rng.standard_normal((n, m0))
                      + 1j * rng.standard_normal((n, m0)), jnp.float64)

    out = {"n": n, "nnz": nnz, "m0": m0, "live": True}
    best_rate = 0.0
    variants = (("vcycle_f64", None), ("vcycle_f32", jnp.float32))
    if tags is not None:
        variants = tuple(v for v in variants if v[0] in tags)
    for tag, mdt in variants:
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
        nnz_processed = iters * m0 * (2 * nnz + 2 * vcycle_nnz)
        rate = float(nnz_processed / t_best)
        out[tag] = {"solve_s": round(t_best, 3), "krylov_iters": iters,
                    "resnorm": float(np.asarray(sol.resnorm).max()),
                    "nnz_per_s": rate}
        best_rate = max(best_rate, rate)
    out["nnz_per_s"] = best_rate
    return out


def sparse_nnz_per_s_100k():
    """Smaller LIVE probe of the same metric (the 1M-dof run is what
    crashes the axon worker; this one is driver-robust — VERDICT r2 #4)."""
    return sparse_nnz_per_s(n=100_000, m0=16, reps=3)


def sparse_nnz_1m_f32():
    """1M-dof probe, f32 V-cycle ONLY, 2 reps: small enough dispatch volume
    for one axon worker lifetime (the full two-variant x3-rep probe is what
    reproducibly kills it — VERDICT r3 weak #5)."""
    return sparse_nnz_per_s(n=1_000_000, m0=16, reps=2,
                            tags=("vcycle_f32",))


def sparse_nnz_1m_f64():
    return sparse_nnz_per_s(n=1_000_000, m0=16, reps=2,
                            tags=("vcycle_f64",))


def gun_small(n=4096):
    """gun-structure NLEP wall time (full N=9956 run: benchmarks/gun.py)."""
    sys.path.insert(0, os.path.join(_HERE, "benchmarks"))
    import importlib

    gun = importlib.import_module("gun")
    r = gun.run(n=n, m0=84, nodes=16, verbose=False)
    return r


_CHILDREN = set()  # live aux subprocesses (killed as process GROUPS at exit)


def _kill_children():
    """Kill every live aux subprocess's whole process group — a stray
    benchmark child outliving the bench contends for the single chip and
    can poison the NEXT capture (the r3 rc=124 root cause)."""
    import signal as sg

    for p in list(_CHILDREN):
        try:
            os.killpg(p.pid, sg.SIGKILL)
        except (ProcessLookupError, PermissionError, OSError):
            pass
        _CHILDREN.discard(p)


def _aux_metric(fn_name, timeout_s=900, attempts=1):
    """Run an aux metric in a SUBPROCESS: a remote-TPU worker crash inside
    one metric must not poison the backend for the rest of the bench (a
    dead axon backend fails every subsequent dispatch in-process).  The
    child is its own process GROUP, killed wholesale on timeout or parent
    exit so nothing outlives the bench."""
    import subprocess

    code = ("import bench, json; bench._setup_jax(); "
            f"print('\\nAUXJSON ' + json.dumps(bench.{fn_name}()))")
    last = {"error": "not run"}
    for k in range(attempts):
        if k:
            time.sleep(60)  # axon worker cool-down between retries
        p = None
        try:
            p = subprocess.Popen([sys.executable, "-c", code],
                                 stdout=subprocess.PIPE,
                                 stderr=subprocess.PIPE, text=True,
                                 cwd=_HERE, start_new_session=True)
            _CHILDREN.add(p)
            stdout, stderr = p.communicate(timeout=timeout_s)
            for line in stdout.splitlines():
                if line.startswith("AUXJSON "):
                    return json.loads(line[len("AUXJSON "):])
            last = {"error": "no output", "rc": p.returncode,
                    "stderr": stderr[-500:]}
        except subprocess.TimeoutExpired:
            last = {"error": f"timeout after {timeout_s}s"}
        except Exception as e:
            last = {"error": repr(e)}
        finally:
            if p is not None:
                _CHILDREN.discard(p)
                try:
                    os.killpg(p.pid, 9)
                except (ProcessLookupError, PermissionError, OSError):
                    pass
    return last


def _recorded(name):
    p = os.path.join(_HERE, "benchmarks", "results", name)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


_DETAIL_FILE = os.path.join("benchmarks", "results", "bench_last.json")


def _emit(wall_s, base_s, detail):
    """Print the metric line COMPACT (hard cap 1500 chars) and dump the full
    detail tree to benchmarks/results/bench_last.json.

    VERDICT r4 weak #1: the driver capture keeps only a ~2000-char tail of
    stdout, and r4's final enriched line was >10 KB — the tail held the
    middle of the giant line and `parsed` came back null for the second
    round running.  The printed line now carries only the headline numbers
    plus a `detail_file` pointer; it is asserted < 1500 chars so it always
    survives a tail-limited capture, and it is printed LAST."""
    record = {
        "metric": "dense_feast_4096_wall_to_1e-10",
        "value": round(wall_s, 4),
        "unit": "s",
        "vs_baseline": round(base_s / wall_s, 4),
        "detail": detail,
    }
    with open(os.path.join(_HERE, _DETAIL_FILE), "w") as f:
        json.dump(record, f, indent=1)
    tpu = detail.get("tpu_compiled", {})
    lap = detail.get("lapack_cpu", {})
    compact = dict(record)
    compact["detail"] = {
        "driver": tpu.get("driver"),
        "tpu_walls_s": tpu.get("walls_s"),
        "spread_pct": tpu.get("spread_pct"),
        "iters": tpu.get("iters"),
        "max_res_inside": tpu.get("max_res_inside"),
        "compile_cache": tpu.get("compile_cache"),
        "lapack_wall_s": lap.get("wall_s"),
        "baseline_source": lap.get("baseline_source"),
        "loadavg_at_start": lap.get("loadavg_at_start"),
        "partial": detail.get("partial", False),
        "detail_file": _DETAIL_FILE,
    }
    line = json.dumps(compact)
    assert len(line) < 1500, f"bench line too long ({len(line)} chars)"
    print(line, flush=True)


def _lapack_baseline(A, X0, c, r):
    """Time the LAPACK-CPU baseline with a load-integrity guard.

    VERDICT r4 weak #5: the baseline wall moves ~2x with background host
    load, and a contaminated baseline INFLATES vs_baseline (r4 artifacts
    disagreed 27x vs 47x for the same TPU wall).  Guard: if 1-min loadavg
    > 0.15 at start, wait once and re-check; if still loaded, mark the run
    contaminated and substitute the last CLEAN recorded baseline
    (benchmarks/results/lapack_baseline.json) for the ratio.  A clean run
    refreshes that file."""
    try:
        load = os.getloadavg()[0]
    except OSError:
        load = None
    if load is not None and load > 0.15:
        time.sleep(45)
        load = os.getloadavg()[0]
    contaminated = load is not None and load > 0.15
    base_runs = [numpy_feast(A, X0, c, r) for _ in range(2)]
    base_s, base_res, base_it, base_factor_s = min(base_runs)
    info = {"wall_s": round(base_s, 4),
            "walls_s": [round(b[0], 2) for b in base_runs],
            "factor_s": round(base_factor_s, 2),
            "max_res_inside": base_res, "iters": base_it,
            "loadavg_at_start": load}
    path = os.path.join(_HERE, "benchmarks", "results",
                        "lapack_baseline.json")
    prev = _recorded("lapack_baseline.json")
    if not contaminated:
        info["baseline_source"] = "live (clean host)"
        with open(path, "w") as f:
            json.dump({"wall_s": info["wall_s"], "walls_s": info["walls_s"],
                       "loadavg_at_start": load,
                       "max_res_inside": base_res, "iters": base_it},
                      f, indent=1)
    elif prev is not None:
        info["baseline_source"] = (
            f"recorded clean baseline (live run contaminated: loadavg "
            f"{load:.2f} > 0.15; live wall {base_s:.1f}s excluded)")
        info["contaminated_live_wall_s"] = info["wall_s"]
        base_s = prev["wall_s"]
        info["wall_s"] = base_s
    else:
        info["baseline_source"] = ("live (CONTAMINATED: loadavg "
                                   f"{load:.2f}, no recorded clean "
                                   "baseline to substitute)")
    return base_s, info


def main():
    """Timeout-proof capture protocol (VERDICT r3 #1):
    1. primary metric (TPU best-of-3 vs LAPACK best-of-2) is printed and
       FLUSHED the moment both sides are timed — a later aux hang can no
       longer erase the headline (r3's BENCH capture died at rc=124 with
       NOTHING parsed);
    2. aux metrics then run under a hard wall-clock alarm; whatever is
       complete when the alarm fires is dumped in a second, enriched line
       (a JSON-lines consumer should take the LAST parseable line);
    3. every aux child is a process group killed on parent exit."""
    import atexit
    import signal as sg

    _setup_jax()
    atexit.register(_kill_children)
    budget_s = int(os.environ.get("FEAST_BENCH_BUDGET_S", "1500"))
    sg.signal(sg.SIGALRM, lambda *_: (_ for _ in ()).throw(
        TimeoutError("bench wall budget exceeded")))
    sg.alarm(budget_s)
    A, X0, c, r = _problem()
    tpu = tpu_feast_compiled(A, X0, c, r)
    # baseline best-of-2 behind the load-integrity guard (_lapack_baseline)
    base_s, base_info = _lapack_baseline(A, X0, c, r)
    wall_s = tpu["best_s"]
    detail = {
        "tpu_compiled": tpu,
        "lapack_cpu": base_info,
        "partial": True,
    }
    _emit(wall_s, base_s, detail)  # the headline survives any aux failure
    del detail["partial"]

    def aux_step(key, fn):
        try:
            detail[key] = fn()
        except TimeoutError:
            detail[key] = {"error": "bench wall budget exceeded"}
            raise
        except Exception as e:  # a broken aux must not kill the capture
            detail[key] = {"error": repr(e)}

    try:
        aux_step("phases", lambda: _aux_metric("_phase_aux", timeout_s=600))
        aux_step("sparse_solve_nnz_per_s_100k_live",
                 lambda: _aux_metric("sparse_nnz_per_s_100k", timeout_s=600))

        def live_1m():
            # one isolated attempt per dtype variant (sustained two-variant
            # dispatch is the measured axon-killer); recorded fallback kept
            f32 = _aux_metric("sparse_nnz_1m_f32", timeout_s=900)
            f64 = _aux_metric("sparse_nnz_1m_f64", timeout_s=900)
            ok32, ok64 = "error" not in f32, "error" not in f64
            if not (ok32 or ok64):
                return {"live": False, "live_error": f32.get("error"),
                        "recorded": _recorded("sparse_nnz_recorded.json")
                        or {}}
            out = f32 if ok32 else f64
            if ok32 and ok64:
                out["vcycle_f64"] = f64["vcycle_f64"]
                out["nnz_per_s"] = max(out["nnz_per_s"], f64["nnz_per_s"])
            elif not ok64:
                out["vcycle_f64_error"] = f64.get("error")
            return out

        aux_step("sparse_solve_nnz_per_s_1m", live_1m)
        aux_step("gun_like_4096",
                 lambda: _aux_metric("gun_small", timeout_s=900))
    except TimeoutError:
        detail["aborted"] = f"wall budget {budget_s}s exceeded"
    finally:
        sg.alarm(0)
    for key, name in (("sparse1m_feast_recorded", "sparse1m.json"),
                      ("sparse1m_interior_recorded", "sparse1m_interior.json"),
                      ("dense8192_recorded", "dense8192.json"),
                      ("gun9956_recorded", "gun9956.json"),
                      ("spmm_unstructured_recorded", "bell_tune.json"),
                      ("unstructured100k_feast_recorded",
                       "unstructured100k.json"),
                      ("interior_slice_recorded",
                       "unstructured100k_interior.json"),
                      ("scaling_recorded", "scaling.json")):
        rec = _recorded(name)
        if rec is not None:
            detail[key] = rec
    _emit(wall_s, base_s, detail)
    _kill_children()


def _phase_aux():
    A, X0, c, r = _problem()
    return phase_profile(A, X0, c, r)


if __name__ == "__main__":
    sys.exit(main())
