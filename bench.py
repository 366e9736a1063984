"""Benchmark: wall-time to 1e-10 residual for a dense FEAST slice.

Config (BASELINE.md config 1 scaled up): dense non-Hermitian 1024x1024,
circular contour around the low spectrum, 16 trapezoid nodes, m0=32
(16 nodes = the reference's nlfeast default; the sharper filter converges
in ~5 refinement iterations).
The baseline is the SAME algorithm executed by LAPACK/BLAS through numpy
complex128 on host CPU — i.e. what the Julia reference does (its compute
is 100% LAPACK FFI: SURVEY.md section 2.2), so `vs_baseline` measures
TPU-native vs reference-equivalent on this machine.

Prints ONE JSON line:
  {"metric": ..., "value": wall_s, "unit": "s", "vs_baseline": base_s/wall_s}
"""

import json
import sys
import time

import numpy as np


def _problem(n=1024, m0=32, seed=0):
    rng = np.random.default_rng(seed)
    A = np.diag(np.arange(1.0, n + 1.0)).astype(np.complex128)
    A += 0.05 * (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))
    c, r = 12.0 + 0.0j, 14.0  # ~25 eigenvalues inside
    return A, X0, c, r


def numpy_feast(A, X0, c, r, nodes=16, tol=1e-10, iters=20):
    """Reference-equivalent FEAST loop on LAPACK complex128 (feast.jl:10-80)."""
    n, m0 = X0.shape
    theta = np.pi / nodes + 2 * np.pi * np.arange(nodes) / nodes
    z = r * np.exp(1j * theta) + c
    w = r * np.exp(1j * theta) / nodes
    import scipy.linalg as sla
    t0 = time.perf_counter()
    facts = [sla.lu_factor(A - zi * np.eye(n)) for zi in z]
    Q = X0.copy()
    for nit in range(iters + 1):
        Q, _ = np.linalg.qr(Q)
        Aq = Q.conj().T @ (A @ Q)
        lam, Xq = np.linalg.eig(Aq)
        X = Q @ Xq
        X /= np.linalg.norm(X, axis=0)
        R = A @ X - X * lam[None, :]
        res = np.linalg.norm(R, axis=0)
        inside = np.abs(lam - c) <= r
        if inside.any() and res[inside].max() < tol:
            break
        Qn = np.zeros_like(Q)
        for i in range(nodes):
            temp = sla.lu_solve(facts[i], R)
            Qn += (X - temp) * (w[i] / (z[i] - lam))[None, :]
        Q = Qn
    return time.perf_counter() - t0, float(res[inside].max()), nit


def tpu_feast(A, X0, c, r, nodes=16, tol=1e-10, iters=20):
    import jax

    jax.config.update("jax_enable_x64", True)  # f64 pair driver math

    import feast_tpu as ft

    def run():
        t0 = time.perf_counter()
        # production path: f32 LU + f64 iterative refinement (full accuracy
        # at 4x the f64-emulation matmul throughput); host LAPACK for the
        # tiny m0 x m0 reduced eig (cuts remote-dispatch latency)
        out = ft.feast(A, X0, c=c, r=r, nodes=nodes, iters=iters, tol=tol,
                       mixed_prec=True, rr="host")
        jax.block_until_ready((out.lam.re, out.res))
        return time.perf_counter() - t0, out

    run()  # warmup: compile everything (cached for subsequent runs)
    wall, out = run()
    res = np.asarray(out.res)
    inside = np.asarray(out.inside)
    return wall, float(res[inside].max()), out.n_iter


def main():
    A, X0, c, r = _problem()
    base_s, base_res, base_it = numpy_feast(A, X0, c, r)
    wall_s, res, it = tpu_feast(A, X0, c, r)
    print(json.dumps({
        "metric": "dense_feast_1024_wall_to_1e-10",
        "value": round(wall_s, 4),
        "unit": "s",
        "vs_baseline": round(base_s / wall_s, 4),
        "detail": {
            "tpu": {"wall_s": round(wall_s, 4), "max_res_inside": res,
                    "iters": it},
            "lapack_cpu": {"wall_s": round(base_s, 4),
                           "max_res_inside": base_res, "iters": base_it},
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
