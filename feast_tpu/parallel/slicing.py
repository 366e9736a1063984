"""Multi-slice spectral slicing: the capability the reference names as its
purpose ("where spectral slicing is needed", README.md:11-12) but never
implements as a subsystem.

`spectral_slices` partitions a real spectral interval into contours sized by
the stochastic eigenvalue counter (`contour_estimate_eig`, stochastic.jl:2-33
— the reference's tool for exactly this, used manually).  `feast_sliced`
solves every slice (each slice's node solves can shard over a `node` mesh
axis) and merges the eigenpairs, deduplicating near-boundary duplicates by
residual.  On a multi-host mesh the `slice` axis is embarrassingly parallel:
only the final eigenpair gather crosses slice groups (SURVEY.md section 2.3).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from .. import contour as ct
from .. import cx


class SliceResult(NamedTuple):
    lam: np.ndarray
    X: np.ndarray
    res: np.ndarray
    slices: List[ct.Contour]
    counts: List[int]
    per_slice: list


def spectral_slices(A, interval: Tuple[float, float], n_slices: int,
                    B=None, *, samples: int = 40, nodes: int = 8,
                    half_height: Optional[float] = None,
                    seed: int = 0) -> Tuple[List[ct.Contour], List[float]]:
    """Partition [a, b] into n_slices circular contours with estimated
    eigenvalue counts (for choosing each slice's m0)."""
    from ..solvers.stochastic import contour_estimate_eig

    a, b = interval
    edges = np.linspace(a, b, n_slices + 1)
    contours, counts = [], []
    for lo, hi in zip(edges[:-1], edges[1:]):
        c = complex((lo + hi) / 2.0, 0.0)
        r = (hi - lo) / 2.0
        k = ct.circular_contour_trapezoidal(c, r, nodes)
        est = contour_estimate_eig(A, k, B, samples=samples, seed=seed)
        contours.append(k)
        counts.append(max(est, 0.0))
    return contours, counts


def feast_sliced(A, interval: Tuple[float, float], n_slices: int, B=None, *,
                 nodes: int = 8, iters: int = 20, tol: float = 1e-12,
                 samples: int = 40, margin: float = 1.5, min_m0: int = 4,
                 mesh=None, seed: int = 0, dedup_tol: float = 1e-8,
                 verbose: bool = False) -> SliceResult:
    """Solve A x = lam (B) x over [a, b] via independent contour slices.

    Each slice's subspace width m0 = margin * estimated count (stochastic
    sizing); converged eigenpairs are merged with near-duplicate removal
    (slices share closed boundaries, so an eigenvalue exactly on an edge can
    surface twice — the lower-residual copy wins).
    """
    from ..solvers.feast import feast, gen_feast

    contours, counts = spectral_slices(A, interval, n_slices, B,
                                       samples=samples, nodes=nodes,
                                       seed=seed)
    n = np.asarray(A).shape[0] if not hasattr(A, "shape") else A.shape[0]
    rng = np.random.default_rng(seed)
    all_lam, all_X, all_res = [], [], []
    per_slice = []
    for k, est in zip(contours, counts):
        m0 = max(min_m0, int(np.ceil(margin * est)) + 2)
        m0 = min(m0, n)
        X0 = rng.standard_normal((n, m0)) + 1j * rng.standard_normal((n, m0))
        if B is None:
            out = feast(A, X0, contour=k, iters=iters, tol=tol, mesh=mesh)
        else:
            out = gen_feast(A, B, X0, contour=k, iters=iters, tol=tol,
                            mesh=mesh)
        lam, X, res = out.filtered()
        per_slice.append(out)
        if verbose:
            print(f"slice c={k.center:.4g} r={k.radius:.4g}: est {est:.1f} "
                  f"m0={m0} found {len(lam)} (iters {out.n_iter})")
        all_lam.append(lam)
        all_X.append(X)
        all_res.append(res)
    lam = np.concatenate(all_lam) if all_lam else np.empty(0, np.complex128)
    X = np.concatenate(all_X, axis=1) if all_X else np.empty((n, 0))
    res = np.concatenate(all_res) if all_res else np.empty(0)
    # dedup near-identical eigenvalues across slice boundaries
    order = np.argsort(res)
    keep = []
    kept_lam: List[complex] = []
    scale = max(abs(interval[0]), abs(interval[1]), 1.0)
    for i in order:
        if all(abs(lam[i] - l0) > dedup_tol * scale for l0 in kept_lam):
            keep.append(i)
            kept_lam.append(lam[i])
    keep = np.array(sorted(keep), dtype=int)
    return SliceResult(lam[keep], X[:, keep], res[keep], contours, counts,
                       per_slice)
