"""Real-chip BELL SpMM measurement: block-size sweep on a genuinely
unstructured matrix (2-D Delaunay P1 FEM), RCM-reordered and raw, vs the
CSR gather path and the spmm_bandwidth.py traffic model.

The VERDICT r2 'done' bar: a genuinely unstructured matrix reaches
>= 100 GB/s EFFECTIVE SpMM (same traffic model as
benchmarks/results/spmm_bandwidth.json: useful bytes =
nnz*2w + nnz*8 + nnz*m*2w + n*m*2w over wall time) on the real chip.

Also sweeps the adversarial permuted-Laplacian case, where RCM recovers
the exact band and the DIA path applies.

Usage: python benchmarks/bell_tune.py [--n 200000] [--m 16]
Saves benchmarks/results/bell_tune.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

INNER_LO, INNER_HI = 5, 35


def _sync(x):
    import jax.numpy as jnp

    if hasattr(x, "re"):
        return float(np.asarray(jnp.sum(x.re)))
    return float(np.asarray(jnp.sum(x)))


def _time_chain(step, op, x0, reps=3):
    """Per-op seconds of x -> step(op, x), dispatch-cancelled.  The
    operator is a jit ARGUMENT (pytree), never a closure constant — an
    embedded multi-hundred-MB constant blows the remote-compile tunnel's
    request size limit (HTTP 413) and would be constant-folded anyway."""
    import jax
    from jax import lax

    def runner(inner):
        @jax.jit
        def run(op, x):
            return lax.fori_loop(0, inner, lambda i, x: step(op, x), x)

        _sync(run(op, x0))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(run(op, x0))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = runner(INNER_LO)
    t_hi = runner(INNER_HI)
    return max((t_hi - t_lo) / (INNER_HI - INNER_LO), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--bs", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--skip-csr", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import scipy.sparse as sp

    from feast_tpu import cx, problems
    from feast_tpu.ops import reorder as rd
    from feast_tpu.ops import sparse as spmod

    m, w, dtype = args.m, 4, jnp.float32
    out = {"device": str(jax.devices()[0]), "m": m, "dtype": "f32",
           "timing": f"fori-chain diff {INNER_LO}/{INNER_HI}"}

    def save():
        res_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results")
        os.makedirs(res_dir, exist_ok=True)
        with open(os.path.join(res_dir, "bell_tune.json"), "w") as f:
            json.dump(out, f, indent=1)

    # ---- unstructured 2-D FEM ---------------------------------------------
    t0 = time.perf_counter()
    K, M, _ = problems.fem2d_unstructured(args.n, seed=1)
    n = K.shape[0]
    # chain-safe scaling (spectral radius <~ 1 for 100+ chained matvecs)
    A = (K / np.abs(K).sum(axis=1).max()).tocsr()
    nnz = A.nnz
    out["fem"] = {"n": n, "nnz": int(nnz), "build_s": round(
        time.perf_counter() - t0, 1), "bandwidth_raw": rd.bandwidth(A)}
    perm = rd.rcm_permutation(A)
    Ap = A[perm][:, perm].tocsr()
    out["fem"]["bandwidth_rcm"] = rd.bandwidth(Ap)
    rng = np.random.default_rng(0)
    X = cx.from_numpy(rng.standard_normal((n, m))
                      + 1j * rng.standard_normal((n, m)), dtype)
    useful = nnz * 2 * w + nnz * 8 + nnz * m * 2 * w + n * m * 2 * w

    if not args.skip_csr:
        Acsr = spmod.CSR.from_scipy(A, dtype)
        t = _time_chain(lambda op, V: op.matvec(V), Acsr, X)
        out["fem"]["csr"] = {"s": round(t, 5),
                             "eff_GBps": round(useful / t / 1e9, 1)}
        print("fem csr:", out["fem"]["csr"], flush=True)
        save()

    # raw (unreordered) BELL only at the smallest bs, as the contrast
    # number — its fill is pathological by construction (that is the point
    # of the RCM pass)
    for tag, Mx, bss in (("raw", A, args.bs[:1]), ("rcm", Ap, args.bs)):
        for bs in bss:
            fill_uncapped = spmod.bell_fill(Mx, bs)
            kcap, slots, spill, kfull = spmod.bell_plan(Mx, bs)
            Ab = spmod.BELL.from_scipy(Mx, bs, dtype)  # kcap="auto"
            t = _time_chain(lambda op, V: op.matvec(V), Ab, X)
            # actual traffic BELL moves (stored data + gathered X + Y)
            stored = Ab.nnz
            actual = (stored * 2 * w + stored // Ab.bs * m * 2 * w
                      + n * m * 2 * w)
            key = f"bell_{tag}_bs{bs}"
            out["fem"][key] = {
                "fill": round(stored / nnz, 1),
                "fill_uncapped": round(fill_uncapped, 1),
                "kcap": int(kcap), "kfull": int(kfull),
                "spill_nnz": int(spill), "s": round(t, 6),
                "eff_GBps": round(useful / t / 1e9, 1),
                "raw_GBps": round(actual / t / 1e9, 1)}
            print(key, out["fem"][key], flush=True)
            save()

    # ---- adversarial permuted Laplacian -> RCM -> DIA ----------------------
    n2 = 1_000_000
    lap = sp.diags([np.full(n2, 0.4), np.full(n2 - 1, -0.19),
                    np.full(n2 - 1, -0.19)], [0, 1, -1]).tocsr()
    p = np.random.default_rng(1).permutation(n2)
    lap_p = lap[p][:, p].tocsr().astype(np.complex128)
    perm2, info = rd.plan_reorder(lap_p)
    out["permuted_laplacian"] = dict(info)
    assert perm2 is not None
    lap_r = lap_p[perm2][:, perm2].tocsr()
    op = spmod.as_operator(lap_r, dtype)
    assert isinstance(op, spmod.DIA), type(op)
    X2 = cx.from_numpy(rng.standard_normal((n2, m))
                       + 1j * rng.standard_normal((n2, m)), dtype)
    t = _time_chain(lambda o, V: o.matvec(V), op, X2)
    useful2 = (lap_r.nnz * 2 * w + lap_r.nnz * 8 + lap_r.nnz * m * 2 * w
               + n2 * m * 2 * w)
    out["permuted_laplacian"].update({
        "n": n2, "nnz": int(lap_r.nnz), "op": "DIA", "s": round(t, 6),
        "eff_GBps": round(useful2 / t / 1e9, 1)})
    print("permuted_laplacian:", out["permuted_laplacian"], flush=True)

    print(json.dumps(out))
    save()


if __name__ == "__main__":
    main()
