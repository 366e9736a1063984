"""End-to-end A/B of the Pallas panel-LU backend inside the dense headline
config (n=4096, m0=48, 16 nodes, feast_compiled two-tier mixed precision):
does the 2.61x standalone factor win (lu_pallas.json) survive the full
driver?

    python benchmarks/pallas_e2e.py [--driver compiled|host_rr] [--reps 2]
    python benchmarks/pallas_e2e.py --backend xla   # control arm

Writes/merges benchmarks/results/pallas_e2e.json.
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
    ap.add_argument("--driver", default="compiled",
                    choices=["compiled", "host_rr"])
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import bench

    bench._setup_jax()
    from feast_tpu.ops import lu

    lu.set_panel_backend(args.backend)
    A, X0, c, r = bench._problem()
    t0 = time.perf_counter()
    res = bench.tpu_feast_compiled(A, X0, c, r, reps=args.reps,
                                   driver=args.driver)
    res["total_s"] = round(time.perf_counter() - t0, 1)
    key = f"{args.driver}_{args.backend}"
    path = os.path.join(_HERE, "results", "pallas_e2e.json")
    out = {}
    if os.path.exists(path):
        try:
            out = json.load(open(path))
        except Exception:
            pass
    out[key] = res
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({key: res}, indent=1))


if __name__ == "__main__":
    main()
