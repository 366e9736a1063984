"""Real-chip SpMM bandwidth measurement (SURVEY N2 / VERDICT round-1 #6).

Answers the question "is the XLA gather+segment_sum CSR SpMM at HBM
bandwidth, or does a custom (Pallas / structured-format) kernel pay off?"
with measured numbers on the attached TPU:

  * stream roofline: y = a*x + y on arrays sized like the SpMM traffic —
    the speed-of-light for any bandwidth-bound kernel on this chip;
  * CSR.matvec (gather + segment_sum) on a banded matrix and on a
    random-pattern matrix at nnz ~ 1e6-1e7;
  * DIA.matvec (static shifted slices) on the banded matrix.

Traffic model per SpMM (the bytes a perfect kernel must move):
  CSR: data nnz*2w + indices nnz*8 + X-gather nnz*m*2w + Y write n*m*2w
  DIA: data ndiag*n*2w + X read ndiag*n*m*2w (worst case; best case m*n*2w
       if all diagonals fuse into one X pass) + Y write n*m*2w
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


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x)))  # host transfer: reliable barrier


def _time_op(f, *args, reps=5):
    import numpy as np

    out = f(*args)
    _sync(out.re if hasattr(out, "re") else out)   # compile + warmup
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        _sync(out.re if hasattr(out, "re") else out)
        best = min(best, time.perf_counter() - t0)
    return best


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
           "dtype": "f64(emulated)" if args.x64 else "f32"}

    # ---- stream roofline --------------------------------------------------
    size = 64 * 1024 * 1024 // w  # 64 MB per array
    xs = jnp.ones((size,), dtype)
    ys = jnp.full((size,), 2.0, dtype)
    axpy = jax.jit(lambda x, y: 2.0 * x + y)
    t = _time_op(axpy, xs, ys)
    out["stream_axpy_GBps"] = round(3 * size * w / t / 1e9, 1)  # 2 rd + 1 wr

    # ---- banded matrix: pentadiagonal (2-D Laplacian-like band count) -----
    offs = [-2, -1, 0, 1, 2]
    diags = [np.full(n - abs(o), 1.0) for o in offs]
    Ab = sp.diags(diags, offs, format="csr").astype(np.complex128)
    nnz = Ab.nnz
    rng = np.random.default_rng(0)
    X = cx.from_numpy(rng.standard_normal((n, m))
                      + 1j * rng.standard_normal((n, m)), dtype)

    Acsr = spmod.CSR.from_scipy(Ab, dtype)
    mv_csr = jax.jit(lambda A, X: A.matvec(X))
    t_csr = _time_op(mv_csr, Acsr, X)
    csr_bytes = nnz * 2 * w + nnz * 8 + nnz * m * 2 * w + n * m * 2 * w
    out["banded_csr"] = {
        "nnz": nnz, "s": round(t_csr, 5),
        "nnz_per_s": round(nnz * m / t_csr, 0),
        "eff_GBps": round(csr_bytes / t_csr / 1e9, 1)}

    Adia = spmod.DIA.from_scipy(Ab, dtype)
    t_dia = _time_op(mv_csr, Adia, X)
    ndiag = Adia.ndiag
    dia_bytes = ndiag * n * 2 * w + ndiag * n * m * 2 * w + n * m * 2 * w
    out["banded_dia"] = {
        "ndiag": ndiag, "s": round(t_dia, 5),
        "nnz_per_s": round(nnz * m / t_dia, 0),
        "eff_GBps": round(dia_bytes / t_dia / 1e9, 1),
        "speedup_vs_csr": round(t_csr / t_dia, 2)}

    # ---- random-pattern matrix (no band structure: CSR's home turf) -------
    nr = min(n, 200_000)
    Arand = sp.random(nr, nr, density=max(1e-5, 2e6 / (nr * nr)),
                      random_state=1, format="csr",
                      dtype=np.float64).astype(np.complex128)
    Arand.setdiag(1.0)
    Arand = Arand.tocsr()
    Xr = cx.from_numpy(rng.standard_normal((nr, m))
                       + 1j * rng.standard_normal((nr, m)), dtype)
    Ac2 = spmod.CSR.from_scipy(Arand, dtype)
    t_r = _time_op(mv_csr, Ac2, Xr)
    rb = Arand.nnz * 2 * w + Arand.nnz * 8 + Arand.nnz * m * 2 * w \
        + nr * m * 2 * w
    out["random_csr"] = {
        "n": nr, "nnz": int(Arand.nnz), "s": round(t_r, 5),
        "nnz_per_s": round(Arand.nnz * m / t_r, 0),
        "eff_GBps": round(rb / t_r / 1e9, 1)}

    print(json.dumps(out))
    res_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results")
    os.makedirs(res_dir, exist_ok=True)
    suffix = "_x64" if args.x64 else ""
    with open(os.path.join(res_dir, f"spmm_bandwidth{suffix}.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
