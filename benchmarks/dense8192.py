"""n=8192 dense FEAST headline (r2 verdict #3): the larger size amortizes
the remote-dispatch long pole and exercises the scan-over-nodes HBM-bounded
mode at a scale where the vmapped node batch cannot fit.

Same algorithm/config family as bench.py's primary metric (16 trapezoid
nodes, m0=48, mixed f32-LU + f64-IR, feast_compiled single-jit driver) at
n=8192.  The LAPACK-CPU baseline is the identical numpy/scipy loop raced in
bench.py (reference-equivalent: the Julia reference's dense path is 100%
LAPACK FFI).

    python benchmarks/dense8192.py [--skip-baseline] [--reps 3]

Writes benchmarks/results/dense8192.json (embedded into bench.py detail).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--m0", type=int, default=48)
    ap.add_argument("--nodes", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--driver", default="auto",
                    choices=["auto", "compiled", "host_rr"])
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    import bench

    bench._setup_jax()
    try:
        load0 = os.getloadavg()[0]
    except OSError:
        load0 = None
    A, X0, c, r = bench._problem(n=args.n, m0=args.m0)
    # driver="auto": the single-jit loop OOMs at n=8192 (XLA's TPU while
    # lowering stages a (nodes, n, n) f32 copy of the carried LU store —
    # 2G even at 8 nodes, on top of the 4.3-8.6G store itself); the
    # python-loop feast(rr="host") passes the store as an aliasable jit
    # argument and fits.  auto records which driver actually ran.
    tpu = bench.tpu_feast_compiled(A, X0, c, r, nodes=args.nodes,
                                   reps=args.reps, driver=args.driver)
    out = {"n": args.n, "m0": args.m0, "nodes": args.nodes,
           "tpu_compiled": tpu, "loadavg_at_start": load0}
    if not args.skip_baseline:
        t0 = time.perf_counter()
        base_s, base_res, base_it, base_factor_s = bench.numpy_feast(
            A, X0, c, r, nodes=args.nodes)
        out["lapack_cpu"] = {"wall_s": round(base_s, 2),
                             "factor_s": round(base_factor_s, 2),
                             "max_res_inside": base_res, "iters": base_it}
        out["vs_baseline"] = round(base_s / tpu["best_s"], 2)
    txt = json.dumps(out, indent=1)
    print(txt)
    with open(os.path.join(_HERE, "results", "dense8192.json"), "w") as f:
        f.write(txt)


if __name__ == "__main__":
    main()
