"""Reference-scale gun NLEP benchmark: N=9956, m0=84, 16 nodes.

BASELINE row (reference test/paper_exact.jl:102-104): nlfeast! on the RF-gun
cavity NLEP with N=9956, m0=84, 16 trapezoid nodes, converged set selected
at residual <= 1e-10.  The real NLEVP data is offline-unavailable, so this
runs `problems.gun_like(9956)` — same sqrt-branch SPMF structure and size
(K - z M + i sqrt(z - s1^2) W1 + i sqrt(z - s2^2) W2).

Path exercised: mixed-precision nlfeast — f32 batched node LU (the TPU MXU
path; f64 LU is 16x slower emulation) + SPMF-form f64 iterative refinement,
node matrices evaluated/factored in chunks so the f64 peak stays bounded.

Run:  python benchmarks/gun.py            (real chip; ~minutes)
      RUN_GUN_FULL=1 pytest tests/test_problems.py -k gun_full
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


_FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "fixtures")


def run(n=9956, m0=84, nodes=16, tol=1e-10, iters=10, seed=0,
        verbose=True, cache=True, reps=1):
    """reps > 1 times the solve reps+1 times and reports the WARM best:
    the first call pays every jit compile through the remote tunnel, whose
    latency is wildly jittery (10-280 s/program — the r4 reruns walls
    455/782 s vs the 93 s record were pure compile lottery, correctness
    identical).  The warm calls hit the in-process jit cache, so they time
    the chip, not the tunnel; the cold wall is reported separately as
    cold_s.  X0 is re-randomized per rep (same seed stream) so every rep
    does the full refinement work."""
    import jax

    jax.config.update("jax_enable_x64", True)
    try:  # persistent compile cache (shared with bench.py)
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import feast_tpu as ft
    from feast_tpu import problems

    t0 = time.perf_counter()
    # planted mode = the real gun's phenomenology: ~25 isolated resonances
    # in the contour, everything else far away, sqrt cuts BELOW the slice.
    # The coefficient build is fixture-cached (r2 verdict #7: the ~35-min
    # one-shot host build made this benchmark effectively unrepeatable).
    T = problems.gun_like(n, seed=seed, planted=25,
                          cache_dir=_FIXTURES if cache else None)
    t_build = time.perf_counter() - t0

    c, r = 105.0 + 0.0j, 8.0
    rng = np.random.default_rng(seed)

    def one_solve():
        X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))
        t0 = time.perf_counter()
        out = ft.nlfeast(T, X0, nodes=nodes, iters=iters, c=c, r=r, tol=tol,
                         spurious=1e-5, mixed_prec=True, store=False,
                         factor_chunk=1, debug=verbose)
        # force full materialization (remote-TPU block_until_ready caveat)
        _ = np.asarray(out.res)
        return time.perf_counter() - t0, out

    cold_s, out = one_solve()  # pays all jit compiles (persistent-cached)
    warm_walls = []
    for _ in range(max(reps - 1, 0)):
        w, out = one_solve()
        warm_walls.append(round(w, 2))
    t_solve = min(warm_walls) if warm_walls else cold_s

    lam, X, res = out.filtered(spurious=1e-5)
    result = {
        "n": n, "m0": m0, "nodes": nodes,
        "build_s": round(t_build, 2),
        "solve_s": round(t_solve, 2),
        "cold_s": round(cold_s, 2),
        "warm_walls_s": warm_walls,
        "found": int(len(lam)),
        "iters": int(out.n_iter),
        "converged": bool(out.converged),
        "max_res_nonspurious": float(res.max()) if len(res) else None,
    }
    if verbose:
        print(json.dumps({"metric": "gun9956_wall_to_1e-10",
                          "value": result["solve_s"], "unit": "s",
                          "detail": result}))
    return result


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=9956)
    ap.add_argument("--m0", type=int, default=84)
    ap.add_argument("--nodes", type=int, default=16)
    ap.add_argument("--no-cache", action="store_true",
                    help="rebuild the coefficient arrays from scratch")
    ap.add_argument("--reps", type=int, default=3,
                    help="solve timings: 1 cold (compile) + reps-1 warm; "
                         "solve_s reports the warm best")
    a = ap.parse_args()
    run(n=a.n, m0=a.m0, nodes=a.nodes, cache=not a.no_cache, reps=a.reps)
