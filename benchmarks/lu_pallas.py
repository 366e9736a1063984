"""A/B the Pallas panel-LU kernel against the XLA blocked LU on the bench
shape (n=4096, 16 contour nodes, f32 — the mixed-precision dense path's
factor stage).

The r3 cost model says the XLA factor is step-count bound: 4096 rank-1
panel steps x ~22 us launch latency ~ 90 ms per node, 1.6 s for the
16-node batch.  ops/pallas_lu.py runs each 128-column panel's full
sequential elimination inside ONE kernel (VERDICT r3 #7: "one honest push
at the dense-factor stage-count bound — record the result either way").

    python benchmarks/lu_pallas.py [--n 4096] [--nodes 16] [--reps 3]

Writes benchmarks/results/lu_pallas.json.
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
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--nodes", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variant", choices=["xla", "pallas", "both"],
                    default="both",
                    help="run one variant per invocation to bound the "
                         "remote-compile wall; results merge into the "
                         "same json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_HERE, "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import jax.numpy as jnp

    from feast_tpu import cx
    from feast_tpu.ops import lu as lumod
    from feast_tpu.ops import pallas_lu

    n, nodes = args.n, args.nodes
    # device-side operands: a (nodes, n, n) host build + upload costs
    # ~4.3 GB and ~3 min through the 25 MB/s tunnel
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    eye = jnp.eye(n, dtype=jnp.float32) * 4.0
    A = cx.CX(jax.random.normal(k1, (nodes, n, n), jnp.float32) + eye[None],
              jax.random.normal(k2, (nodes, n, n), jnp.float32))
    Ah = None  # node-0 host copy pulled lazily for the recon check

    interp = jax.devices()[0].platform == "cpu"
    xla_fac = jax.jit(jax.vmap(lambda M: lumod.lu_factor(M)))
    pal_fac = jax.jit(jax.vmap(
        lambda M: pallas_lu.lu_factor_pallas(M, block=args.block,
                                             interpret=interp)))

    def sync(t):
        return float(np.asarray(jnp.sum(t[0].re)))

    res_path = os.path.join(_HERE, "results", "lu_pallas.json")
    out = {"n": n, "nodes": nodes, "block": args.block,
           "device": str(jax.devices()[0])}
    if os.path.exists(res_path):  # merge per-variant invocations
        try:
            prev = json.load(open(res_path))
            if prev.get("n") == n and prev.get("nodes") == nodes:
                out.update(prev)
        except Exception:
            pass
    variants = [("xla_unrolled", xla_fac), ("pallas_panel", pal_fac)]
    if args.variant == "xla":
        variants = variants[:1]
    elif args.variant == "pallas":
        variants = variants[1:]
    for tag, fn in variants:
        t0 = time.perf_counter()
        r = fn(A)
        sync(r)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = fn(A)
            sync(r)
            walls.append(time.perf_counter() - t0)
        # correctness: reconstruction of node 0
        if Ah is None:
            Ah = np.asarray(A.re[0]) + 1j * np.asarray(A.im[0])
        LU, perm = r
        LUh = np.asarray(LU.re[0]) + 1j * np.asarray(LU.im[0])
        L = np.tril(LUh, -1) + np.eye(n)
        U = np.triu(LUh)
        err = float(np.abs(L @ U - Ah[np.asarray(perm[0])]).max()
                    / np.abs(Ah).max())
        out[tag] = {"best_s": round(min(walls), 4),
                    "walls": [round(w, 4) for w in walls],
                    "compile_s": round(compile_s, 1),
                    "recon_rel_err": err}
        print(tag, out[tag], flush=True)
    if "pallas_panel" in out and "xla_unrolled" in out:
        out["speedup"] = round(out["xla_unrolled"]["best_s"]
                               / out["pallas_panel"]["best_s"], 3)
    with open(res_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
