"""Single-node inner-solve probe for the 100k INTERIOR slice: which
preconditioner configuration actually contracts (A - zB)x = r at the
hardest contour node (smallest |Im z|)?

The r4 interior driver run decayed only ~2.2x per sweep (12 sweeps,
unconverged — `_ckpt_unstructured100k_interior/worker.log`): iFEAST's
outer rate is capped by the inner relative residual, so ~0.45 inner
residual means the node solves are barely converging.  This probe
isolates one node solve and sweeps damp / iters / solver so the full
26-min driver rerun is launched with measured settings.

    python benchmarks/interior_probe.py [--n 100000] [--iters 200 ...]
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_HERE, "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from feast_tpu import contour as ct
    from feast_tpu import cx, problems
    from feast_tpu.ops import amg as amgmod
    from feast_tpu.ops import krylov
    from feast_tpu.ops import reorder as rdmod
    from feast_tpu.ops import sparse as spmod

    K, M, _ = problems.fem2d_unstructured(args.n, seed=1)
    n = K.shape[0]
    lmax = float(spl.eigsh(K.real.tocsc(), k=1, M=M.real.tocsc(),
                           which="LA", return_eigenvectors=False)[0])
    sigma = 0.45 * lmax
    near = np.sort(spl.eigsh(K.real.tocsc(), k=12, M=M.real.tocsc(),
                             sigma=sigma, which="LM",
                             return_eigenvectors=False))
    i0 = int(np.argmin(np.abs(near - sigma)))
    lo = min(max(i0 - 3, 1), len(near) - 7)
    sel = near[lo:lo + 6]
    c = (sel[0] + sel[-1]) / 2
    gap = min(sel[0] - near[lo - 1], near[lo + 6] - sel[-1])
    r = (sel[-1] - sel[0]) / 2 + 0.4 * gap

    perm, _ = rdmod.plan_reorder(K, M)
    if perm is not None:
        K = sp.csr_matrix(K)[perm][:, perm].tocsr()
        M = sp.csr_matrix(M)[perm][:, perm].tocsr()

    cont = ct.circular_contour_trapezoidal(complex(c), float(r), 8)
    zs = np.asarray(cont.nodes)
    hard = int(np.argmin(np.abs(zs.imag)))
    z = zs[hard]
    print(f"n={n} c={c:.4e} r={r:.4e} hardest node z={z:.4e} "
          f"(|Im|/|z| = {abs(z.imag)/abs(z):.3f})", flush=True)

    dtype = jnp.float64
    Aop = spmod.as_operator(K, dtype)
    Bop = spmod.as_operator(M, dtype)
    rng = np.random.default_rng(0)
    R = cx.from_numpy(rng.standard_normal((n, args.m))
                      + 1j * rng.standard_normal((n, args.m)), dtype)

    results = {}
    hier = amgmod.build_amg(K, M, dtype=jnp.float32)  # shift-independent
    for damp in (0.0, 0.1, 0.3, 0.6):
        zi = complex(z.real, z.imag + np.sign(z.imag if z.imag else 1.0)
                     * damp * abs(z))
        zi_cx = cx.CX(jnp.asarray(zi.real, dtype),
                      jnp.asarray(zi.imag, dtype))
        Mpre = amgmod.shifted_preconditioner(hier, zi_cx)
        mv = spmod.shifted_matvec(Aop, Bop, cx.CX(
            jnp.asarray(z.real, dtype), jnp.asarray(z.imag, dtype)))
        for iters in (200, 400):
            t0 = time.perf_counter()
            sol = krylov.bicgstab_rr(mv, R, tol=1e-9, maxiter=iters,
                                     M=Mpre)
            rels = np.asarray(sol.resnorm)
            wall = time.perf_counter() - t0
            key = f"damp{damp}_it{iters}"
            results[key] = {"max_rel_res": float(rels.max()),
                            "iters": int(np.asarray(sol.iters)),
                            "wall_s": round(wall, 1)}
            print(key, results[key], flush=True)

    with open(os.path.join(_HERE, "results", "interior_probe.json"),
              "w") as f:
        json.dump({"n": n, "z": [z.real, z.imag], "c": c, "r": r,
                   "configs": results}, f, indent=1)


if __name__ == "__main__":
    main()
