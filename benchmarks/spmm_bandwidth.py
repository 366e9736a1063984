"""Real-chip SpMM bandwidth measurement (SURVEY N2 / VERDICT round-1 #6).

Answers the question "is the XLA gather+segment_sum CSR SpMM at HBM
bandwidth, or does a custom (Pallas / structured-format) kernel pay off?"
with measured numbers on the attached TPU:

  * stream roofline: y = a*x + y — the speed-of-light for any
    bandwidth-bound kernel on this chip;
  * CSR.matvec (gather + segment_sum) on a banded matrix and on a
    random-pattern matrix at nnz ~ 2e6-5e6;
  * DIA.matvec (static shifted slices) on the banded matrix;
  * the fused halo-window Pallas DIA kernel (one X pass per row block).

TIMING: the remote-TPU tunnel has ~25 ms dispatch latency — longer than
most of these kernels — so every op is timed as a CHAINED `lax.fori_loop`
(x -> op(x), same shape) at two different iteration counts; the difference
quotient cancels dispatch, transfer, and warmup constants:

    per_op = (t[inner_hi] - t[inner_lo]) / (inner_hi - inner_lo)

Operators are scaled to spectral radius <~ 1 so 100+ chained applications
stay in f32 range.

Traffic model per SpMM (the bytes a perfect kernel must move):
  CSR: data nnz*2w + indices nnz*8 + X-gather nnz*m*2w + Y write n*m*2w
  DIA: data ndiag*n*2w + X read ndiag*n*m*2w (one pass per diagonal; the
       fused kernel's ideal is ONE X pass: n*m*2w) + Y write n*m*2w
(w = bytes per real scalar; complex pairs are two real arrays.)

Usage:  python benchmarks/spmm_bandwidth.py [--x64] [--m 16]
Prints one JSON object; saved to benchmarks/results/spmm_bandwidth.json.
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
    return float(np.asarray(jnp.sum(x)))  # host transfer: reliable barrier


def _time_chain(step, x0, reps=3):
    """Per-op seconds of x -> step(x), dispatch-cancelled (see module doc)."""
    import jax
    from jax import lax

    def runner(inner):
        @jax.jit
        def run(x):
            return lax.fori_loop(0, inner, lambda i, x: step(x), x)

        _sync(run(x0))  # compile + warmup
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = runner(INNER_LO)
    t_hi = runner(INNER_HI)
    return max((t_hi - t_lo) / (INNER_HI - INNER_LO), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--x64", action="store_true",
                    help="f64 (TPU-emulated) instead of f32")
    ap.add_argument("--m", type=int, default=16, help="block width m0")
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()

    import jax

    if args.x64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import scipy.sparse as sp

    from feast_tpu import cx
    from feast_tpu.ops import sparse as spmod

    n, m = args.n, args.m
    w = 8 if args.x64 else 4
    dtype = jnp.float64 if args.x64 else jnp.float32
    dev = jax.devices()[0]
    out = {"device": str(dev), "n": n, "m": m,
           "dtype": "f64(emulated)" if args.x64 else "f32",
           "timing": f"fori-chain diff {INNER_LO}/{INNER_HI}"}

    def save():
        res_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results")
        os.makedirs(res_dir, exist_ok=True)
        suffix = "_x64" if args.x64 else ""
        with open(os.path.join(res_dir, f"spmm_bandwidth{suffix}.json"),
                  "w") as f:
            json.dump(out, f, indent=1)

    # ---- stream roofline --------------------------------------------------
    size = 256 * 1024 * 1024 // w  # 256 MB per array
    xs = jnp.full((size,), 1e-6, dtype)
    t = _time_chain(lambda y: 0.999 * y + xs, jnp.zeros((size,), dtype))
    out["stream_axpy_GBps"] = round(3 * size * w / t / 1e9, 1)  # 2 rd + 1 wr
    print("stream:", out["stream_axpy_GBps"], "GB/s", flush=True)
    save()

    # ---- banded matrix: pentadiagonal (2-D Laplacian-like band count) -----
    offs = [-2, -1, 0, 1, 2]
    diags = [np.full(n - abs(o), 0.19) for o in offs]  # row sum < 1: chain-safe
    Ab = sp.diags(diags, offs, format="csr").astype(np.complex128)
    nnz = Ab.nnz
    rng = np.random.default_rng(0)
    X = cx.from_numpy(rng.standard_normal((n, m))
                      + 1j * rng.standard_normal((n, m)), dtype)

    Acsr = spmod.CSR.from_scipy(Ab, dtype)
    t_csr = _time_chain(lambda V: Acsr.matvec(V), X)
    csr_bytes = nnz * 2 * w + nnz * 8 + nnz * m * 2 * w + n * m * 2 * w
    out["banded_csr"] = {
        "nnz": nnz, "s": round(t_csr, 5),
        "nnz_per_s": round(nnz * m / t_csr, 0),
        "eff_GBps": round(csr_bytes / t_csr / 1e9, 1)}
    print("banded_csr:", out["banded_csr"], flush=True)
    save()

    Adia = spmod.DIA.from_scipy(Ab, dtype)
    t_dia = _time_chain(lambda V: Adia._matvec_xla(V), X)
    ndiag = Adia.ndiag
    dia_bytes = ndiag * n * 2 * w + ndiag * n * m * 2 * w + n * m * 2 * w
    out["banded_dia"] = {
        "ndiag": ndiag, "s": round(t_dia, 5),
        "nnz_per_s": round(nnz * m / t_dia, 0),
        "eff_GBps": round(dia_bytes / t_dia / 1e9, 1),
        "speedup_vs_csr": round(t_csr / t_dia, 2)}
    print("banded_dia:", out["banded_dia"], flush=True)
    save()

    # fused halo-window Pallas kernel (f32 only): one X pass per row block
    if not args.x64:
        from feast_tpu.ops import pallas_kernels as pk

        for bn in (512, 1024, 2048):
            try:
                t_pl = _time_chain(
                    lambda V, bn=bn: pk.dia_matvec_pallas(Adia, V, bn=bn), X)
            except Exception as e:  # VMEM limit etc: record, keep going
                out[f"banded_dia_pallas_bn{bn}"] = {"error": repr(e)[:300]}
                print(f"pallas bn={bn}: ERROR", repr(e)[:200], flush=True)
                save()
                continue
            # ideal traffic: X once + diagonals + Y write
            pl_bytes = n * m * 2 * w + ndiag * n * 2 * w + n * m * 2 * w
            out[f"banded_dia_pallas_bn{bn}"] = {
                "s": round(t_pl, 5),
                "nnz_per_s": round(nnz * m / t_pl, 0),
                "eff_GBps_ideal": round(pl_bytes / t_pl / 1e9, 1),
                "speedup_vs_dia_xla": round(t_dia / t_pl, 2)}
            print(f"pallas bn={bn}:", out[f"banded_dia_pallas_bn{bn}"],
                  flush=True)
            save()

    # ---- random-pattern matrix (no band structure: CSR's home turf) -------
    nr = min(n, 200_000)
    # build random COO directly (sp.random's permutation path allocates
    # O(nr^2) at this scale); duplicate (row, col) pairs just sum
    nnz_r = 2_000_000
    rr = np.random.default_rng(1)
    Arand = sp.coo_matrix(
        (rr.standard_normal(nnz_r),
         (rr.integers(0, nr, nnz_r), rr.integers(0, nr, nnz_r))),
        shape=(nr, nr)).tocsr().astype(np.complex128)
    Arand.setdiag(1.0)
    Arand = Arand.tocsr()
    # chain-safe scaling: bound the max row 1-norm to ~1
    rowsum = np.abs(Arand).sum(axis=1).max()
    Arand = Arand * (1.0 / rowsum)
    Xr = cx.from_numpy(rng.standard_normal((nr, m))
                       + 1j * rng.standard_normal((nr, m)), dtype)
    Ac2 = spmod.CSR.from_scipy(Arand, dtype)
    t_r = _time_chain(lambda V: Ac2.matvec(V), Xr)
    rb = Arand.nnz * 2 * w + Arand.nnz * 8 + Arand.nnz * m * 2 * w \
        + nr * m * 2 * w
    out["random_csr"] = {
        "n": nr, "nnz": int(Arand.nnz), "s": round(t_r, 5),
        "nnz_per_s": round(Arand.nnz * m / t_r, 0),
        "eff_GBps": round(rb / t_r / 1e9, 1)}
    print("random_csr:", out["random_csr"], flush=True)

    print(json.dumps(out))
    save()


if __name__ == "__main__":
    main()
