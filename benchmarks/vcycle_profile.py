"""Phase-by-phase decomposition of the large-dof AMG V-cycle solve.

VERDICT r4 weak #3: the 1M-dof f32 V-cycle probe runs at 3.9e9 nnz/s —
17x below the 100k probe and ~0.5% of the 840 GB/s stream roofline — and
nothing measured where the time goes.  This profiler answers it with
dispatch-cancelled fori-chain timings (the spmm_bandwidth.py protocol:
per_op = (t[hi] - t[lo]) / (hi - lo) cancels the ~25 ms tunnel dispatch):

  * hierarchy census: per level n / operator format / stored nnz for S
    and P (is a level off the DIA fast path?);
  * per-level S (shifted) SpMM cost and per-level R∘P transfer cost;
  * sub-hierarchy V-cycle cost M_l (hierarchy truncated to levels l..L):
    first differences give the per-level TOTAL (smooth + transfer +
    recursion overhead), which the op timings above then explain;
  * the full preconditioned BiCGStab solve (the bench probe's metric).

Results stream into benchmarks/results/vcycle_profile_<n><dt>.json after
every measurement (the axon worker can die under sustained 1M-dof
dispatch; partial artifacts survive).

Usage: python benchmarks/vcycle_profile.py [--n 1000000] [--x64]
       [--m 16] [--levels 6]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def _sync(x):
    import jax.numpy as jnp

    if hasattr(x, "re"):
        return float(np.asarray(jnp.sum(x.re)))
    return float(np.asarray(jnp.sum(x)))


def _time_chain(step, x0, lo, hi, reps=2, args=()):
    """step(x, *args) -> x, dispatch-cancelled.  Operators/hierarchies MUST
    ride in `args` (jit arguments): a closure-captured CSR/BELL operator
    becomes an HLO constant and blows the remote-compile tunnel's request
    size limit (HTTP 413 — measured at the 1M level-0 CSR P)."""
    import jax
    from jax import lax

    def runner(inner):
        @jax.jit
        def run(x, *a):
            return lax.fori_loop(0, inner, lambda i, x: step(x, *a), x)

        _sync(run(x0, *args))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(run(x0, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = runner(lo)
    t_hi = runner(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--x64", action="store_true",
                    help="profile the f64 (TPU-emulated) V-cycle")
    ap.add_argument("--levels", type=int, default=6,
                    help="profile this many fine levels individually; the "
                         "rest are lumped into the deepest sub-hierarchy")
    ap.add_argument("--solve", action="store_true",
                    help="also time the full BiCGStab solve (the probe)")
    ap.add_argument("--theta", type=float, default=0.08)
    ap.add_argument("--max-coarse", type=int, default=600)
    ap.add_argument("--agg-size", type=int, default=3,
                    help="structured aggregation stride (build_amg)")
    ap.add_argument("--tag", type=str, default="",
                    help="suffix for the results filename")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)  # problem build is f64
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import scipy.sparse as sp

    from feast_tpu import cx
    from feast_tpu.ops import amg as amgmod
    from feast_tpu.ops import krylov
    from feast_tpu.ops import sparse as spmod

    n, m = args.n, args.m
    mdt = jnp.float64 if args.x64 else jnp.float32
    w = 8 if args.x64 else 4
    out = {"device": str(jax.devices()[0]), "n": n, "m": m,
           "vcycle_dtype": "f64(emulated)" if args.x64 else "f32",
           "theta": args.theta, "max_coarse": args.max_coarse,
           "agg_size": args.agg_size}
    res_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results")
    tag = (f"vcycle_profile_{n}{'_x64' if args.x64 else ''}"
           f"{args.tag}.json")

    def save():
        os.makedirs(res_dir, exist_ok=True)
        with open(os.path.join(res_dir, tag), "w") as f:
            json.dump(out, f, indent=1)

    # same problem as bench.sparse_nnz_per_s
    A = sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr").astype(np.complex128)
    lam1 = 2 - 2 * np.cos(np.pi / (n + 1))
    zc = complex(3.5 * lam1 + 3.0 * lam1 * np.exp(1j * np.pi / 8))
    z = cx.CX(jnp.asarray(zc.real), jnp.asarray(zc.imag))
    t0 = time.perf_counter()
    h = amgmod.build_amg(A, theta=args.theta, max_coarse=args.max_coarse,
                         dtype=mdt, agg_size=args.agg_size)
    out["build_s"] = round(time.perf_counter() - t0, 1)

    # ---- hierarchy census -------------------------------------------------
    census = []
    for L in h.levels:
        info = {"n": int(L.A_op.shape[0]),
                "S_format": type(L.A_op).__name__,
                "S_nnz": int(L.A_op.nnz),
                "P_format": type(L.P).__name__, "P_nnz": int(L.P.nnz)}
        if isinstance(L.A_op, spmod.BELL):
            info["S_bs"], info["S_kmax"] = int(L.A_op.bs), int(L.A_op.kmax)
        if isinstance(L.P, spmod.BELL):
            info["P_bs"], info["P_kmax"] = int(L.P.bs), int(L.P.kmax)
        census.append(info)
    out["levels"] = census
    out["coarse_n"] = int(h.Ac.shape[0])
    print(json.dumps({"levels": census, "coarse_n": out["coarse_n"]},
                     indent=1), flush=True)
    save()

    rng = np.random.default_rng(0)

    def rand_block(nl):
        return cx.from_numpy(rng.standard_normal((nl, m))
                             + 1j * rng.standard_normal((nl, m)), mdt)

    def safe(tagname, fn):
        try:
            return fn()
        except Exception as e:
            out[tagname + "_error"] = repr(e)[:300]
            save()
            print(tagname, "ERROR:", repr(e)[:200], flush=True)
            return None

    nlev = len(h.levels)
    kprof = min(args.levels, nlev)

    # ---- per-level op costs ----------------------------------------------
    zc_dt = cx.CX(z.re.astype(mdt), z.im.astype(mdt))
    per_level = []
    for l in range(kprof):
        L = h.levels[l]
        nl = int(L.A_op.shape[0])
        nc = int(L.P.shape[1])
        lo, hi = (2, 8) if nl > 400_000 else (5, 25)
        Xl = rand_block(nl)
        Xc = rand_block(nc)
        Sop = amgmod._shifted_op(L.A_op, L.B_op, zc_dt)
        # chain-safety by constant damping (norm(S) <~ |2-z| + 2 < 8 for
        # every Galerkin level of this pencil): an elementwise scale, not a
        # normalization reduction — at the small levels a column-norm
        # reduction would cost more than the SpMM being measured

        def s_step(V, Lv, Bv):
            Y = amgmod._shifted_op(Lv, Bv, zc_dt).matvec(V)
            return cx.CX(Y.re * 0.125, Y.im * 0.125)

        def rp_step(V, Pv, Rv):
            Y = Rv.matvec(Pv.matvec(V))
            return cx.CX(Y.re * 0.5, Y.im * 0.5)

        t_S = safe(f"S{l}", lambda: _time_chain(
            s_step, Xl, lo, hi, args=(L.A_op, L.B_op)))
        t_RP = safe(f"RP{l}", lambda: _time_chain(
            rp_step, Xc, lo, hi, args=(L.P, L.R)))
        row = {"level": l, "n": nl,
               "S_matvec_s": None if t_S is None else round(t_S, 5),
               "RP_matvec_s": None if t_RP is None else round(t_RP, 5)}
        if t_S:
            s_bytes = (L.A_op.nnz * 2 * w * 2 + nl * m * 2 * w * 2)
            row["S_eff_GBps"] = round(s_bytes / t_S / 1e9, 1)
            row["S_nnz_per_s"] = round(L.A_op.nnz * m / t_S, 0)
        if t_RP:
            row["PR_nnz_per_s"] = round(2 * L.P.nnz * m / t_RP, 0)
        per_level.append(row)
        out["per_level_ops"] = per_level
        print(json.dumps(row), flush=True)
        save()

    # ---- sub-hierarchy V-cycles ------------------------------------------
    from jax import lax

    def time_vcycle(sub, Xl, lo, hi, reps=2):
        """Hierarchy rides as a jit ARGUMENT; the per-z shift + coarse LU
        setup is traced once OUTSIDE the fori loop, so the difference
        quotient cancels it along with dispatch."""
        def runner(inner):
            @jax.jit
            def run(x, hh):
                M = amgmod.shifted_preconditioner(hh, z, dtype=mdt)
                return lax.fori_loop(
                    0, inner, lambda i, v: cx.normalize_cols(M(v)), x)

            _sync(run(Xl, sub))
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                _sync(run(Xl, sub))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo = runner(lo)
        t_hi = runner(hi)
        return max((t_hi - t_lo) / (hi - lo), 1e-9)

    subs = []
    for l in list(range(kprof)) + [nlev]:
        nl = int(h.levels[l].A_op.shape[0]) if l < nlev else int(
            h.Ac.shape[0])
        sub = amgmod.AMG(h.levels[l:], h.Ac, h.Bc)
        Xl = rand_block(nl)
        lo, hi = (2, 6) if nl > 400_000 else (3, 13)
        t_M = safe(f"M{l}", lambda: time_vcycle(sub, Xl, lo, hi))
        row = {"from_level": l, "n": nl,
               "vcycle_s": None if t_M is None else round(t_M, 5)}
        subs.append(row)
        out["sub_vcycles"] = subs
        print(json.dumps(row), flush=True)
        save()
    # first differences = per-level totals
    diffs = []
    for a, b in zip(subs, subs[1:]):
        if a["vcycle_s"] is not None and b["vcycle_s"] is not None:
            diffs.append({"level": a["from_level"],
                          "level_total_s": round(
                              a["vcycle_s"] - b["vcycle_s"], 5)})
    out["per_level_totals"] = diffs
    save()

    # ---- the probe itself -------------------------------------------------
    if args.solve:
        Ac_op = spmod.as_operator(A)
        b = rand_block(n).astype(jnp.float64)
        zf = cx.CX(jnp.asarray(zc.real), jnp.asarray(zc.imag))

        @jax.jit
        def solve(hh, bb):
            mv = spmod.shifted_matvec(Ac_op, None, zf)
            return krylov.bicgstab(mv, bb, tol=1e-10, maxiter=40,
                                   M=amgmod.shifted_preconditioner(
                                       hh, zf, dtype=mdt))

        sol = solve(h, b)
        iters = int(sol.iters)
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            sol = solve(h, b)
            _ = np.asarray(sol.resnorm)
            best = min(best, time.perf_counter() - t0)
        lvl_nnz, p_nnz = amgmod.hierarchy_nnz(h)
        vnnz = sum(6 * a + 2 * p for a, p in zip(lvl_nnz, p_nnz))
        out["solve"] = {"solve_s": round(best, 3), "iters": iters,
                        "resnorm": float(np.asarray(sol.resnorm).max()),
                        "nnz_per_s": round(
                            iters * m * (2 * A.nnz + 2 * vnnz) / best, 0)}
        print(json.dumps(out["solve"]), flush=True)
        save()

    print(json.dumps(out))
    save()


if __name__ == "__main__":
    main()
