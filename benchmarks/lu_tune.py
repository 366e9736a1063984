"""Real-chip LU panel-width tuning (CLAUDE.md gap: block size untuned).

Times vmap-batched `ops.lu.lu_factor` + `lu_solve` across panel widths at
the shapes the FEAST drivers actually hit (batch = contour nodes), f32 and
f64-emulated, and prints the best width per shape.  The outcome feeds
`ops/lu._auto_block`.

Usage:  python benchmarks/lu_tune.py [--n 1024 2048] [--batch 8]
Writes benchmarks/results/lu_tune.json.
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

    return float(np.asarray(jnp.sum(x)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[512, 1024, 2048])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--m0", type=int, default=48)
    ap.add_argument("--blocks", type=int, nargs="+",
                    default=[64, 128, 256, 512])
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.x64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from feast_tpu import cx
    from feast_tpu.ops import lu as lumod

    dtype = jnp.float64 if args.x64 else jnp.float32
    out = {"device": str(jax.devices()[0]),
           "dtype": "f64(emulated)" if args.x64 else "f32",
           "batch": args.batch, "m0": args.m0, "cases": []}
    rng = np.random.default_rng(0)
    for n in args.n:
        Ah = (rng.standard_normal((args.batch, n, n))
              + 1j * rng.standard_normal((args.batch, n, n))
              + n * np.eye(n))
        Bh = (rng.standard_normal((args.batch, n, args.m0))
              + 1j * rng.standard_normal((args.batch, n, args.m0)))
        A = cx.from_numpy(Ah, dtype)
        B = cx.from_numpy(Bh, dtype)
        case = {"n": n, "timings": {}}
        for blk in args.blocks:
            if blk >= n:
                continue

            @jax.jit
            def fact(A):
                return jax.vmap(lambda a: lumod.lu_factor(a, block=blk))(A)

            # solve is ms-scale vs the ~25 ms tunnel dispatch: time it as a
            # chained fori_loop at two lengths, difference cancels dispatch
            def solve_chain(inner):
                from jax import lax

                @jax.jit
                def run(LU, perm, B):
                    body = jax.vmap(
                        lambda l, p, b: lumod.lu_solve(l, p, b, block=blk))
                    return lax.fori_loop(
                        0, inner, lambda i, x: body(LU, perm, x), B)

                return run

            t0 = time.perf_counter()
            LU, perm = fact(A)
            _sync(LU.re)
            compile_s = time.perf_counter() - t0
            tf = np.inf
            for _ in range(args.reps):
                t0 = time.perf_counter()
                LU, perm = fact(A)
                _sync(LU.re)
                tf = min(tf, time.perf_counter() - t0)
            times = {}
            for inner in (2, 12):
                run = solve_chain(inner)
                _sync(run(LU, perm, B).re)
                best = np.inf
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    _sync(run(LU, perm, B).re)
                    best = min(best, time.perf_counter() - t0)
                times[inner] = best
            ts = max((times[12] - times[2]) / 10, 1e-9)
            case["timings"][str(blk)] = {
                "factor_s": round(tf, 4), "solve_s": round(ts, 4),
                "compile_s": round(compile_s, 1)}
            print(f"n={n} block={blk}: factor {tf:.4f}s solve {ts:.4f}s "
                  f"(compile {compile_s:.1f}s)", flush=True)
        best = min(case["timings"], key=lambda k:
                   case["timings"][k]["factor_s"]
                   + case["timings"][k]["solve_s"])
        case["best_block"] = int(best)
        out["cases"].append(case)

    res_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results")
    os.makedirs(res_dir, exist_ok=True)
    suffix = "_x64" if args.x64 else ""
    with open(os.path.join(res_dir, f"lu_tune{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
