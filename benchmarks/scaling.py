"""Contour-node parallel scaling: sharded-mesh efficiency report.

Measures wall time of the FEAST solve phase with the node axis sharded over
1, 2, 4, 8 devices (virtual CPU mesh or real chips) and reports parallel
efficiency — the BASELINE north-star metric the reference cannot produce
(its only parallelism is shared-memory threads).

    python benchmarks/scaling.py [--n 800] [--m0 24] [--nodes 8]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=800)
    ap.add_argument("--m0", type=int, default=24)
    ap.add_argument("--nodes", type=int, default=8)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    want = max(args.devices)
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={want}")

    import jax

    # calling jax.devices() would lock in the single-chip axon backend; this
    # benchmark is about the node-axis sharding machinery, so force the
    # multi-device CPU mesh up front (real pods: run under JAX_PLATFORMS=tpu)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    import feast_tpu as ft
    from feast_tpu.parallel import node_mesh

    rng = np.random.default_rng(0)
    n, m0 = args.n, args.m0
    A = np.diag(np.arange(1.0, n + 1.0)).astype(np.complex128)
    A += 0.05 * (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))
    c, r = 10.0 + 0.0j, 12.0

    results = []
    base = None
    for nd in args.devices:
        if args.nodes % nd != 0 or nd > len(jax.devices()):
            continue
        mesh = node_mesh(nd)

        def run():
            t0 = time.perf_counter()
            out = ft.feast(A, X0, c=c, r=r, nodes=args.nodes, iters=8,
                           tol=1e-30, mesh=mesh)  # fixed 8 iterations
            np.asarray(out.res)
            return time.perf_counter() - t0

        run()  # compile
        wall = min(run() for _ in range(2))
        if base is None:
            base = wall
        eff = base / (wall * nd)
        results.append({"devices": nd, "wall_s": round(wall, 3),
                        "speedup": round(base / wall, 2),
                        "efficiency": round(eff, 3)})
    print(json.dumps({
        "n": n, "m0": m0, "nodes": args.nodes, "scaling": results,
        "note": ("virtual CPU devices share physical cores, so efficiency "
                 "here only validates the sharding machinery; real "
                 "node-parallel efficiency needs >=2 chips"),
    }, indent=2))


if __name__ == "__main__":
    main()
