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

import functools
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


# ---------------------------------------------------------------------------
# slice-axis PARALLEL execution (the `slice` mesh axis, SURVEY.md sec 2.3)
# ---------------------------------------------------------------------------

def _sliced_compiled_factory():
    """Slice-batched fully-compiled FEAST: all slices advance in ONE jitted
    computation, vmapped over a leading slice axis that shards across the
    `slice` mesh axis (embarrassingly parallel — zero collectives; XLA runs
    every slice group concurrently).  Contour geometry (c, r) rides as
    TRACED per-slice data, unlike the static-metadata single-slice path."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..cx import CX
    from ..ops import lu as lumod
    from ..ops import qr as qrmod
    from ..solvers.feast import _node_update, _rayleigh_ritz

    @functools.partial(jax.jit, static_argnames=("ortho", "iters", "tol"))
    def run(Q, A, B, LUb, permb, z, w, geom, ortho: str, iters: int,
            tol: float):
        # Q (S, n, m0); LUb/permb (S, N, ...); z/w (S, N); geom (S, 3)

        def one_slice(Q, LUb, permb, z, w, cp):
            c_re, c_im, rad = cp[0], cp[1], cp[2]

            def in_mask(lam):
                return ((lam.re - c_re) ** 2 + (lam.im - c_im) ** 2
                        <= rad * rad)

            def body(state):
                Q, lam, X, res, inside, it, done = state
                Qo = qrmod.orthonormalize(Q, method=ortho)
                lam, X, R, res = _rayleigh_ritz(Qo, A, B)
                inside = in_mask(lam)
                Qn = _node_update(LUb, permb, z, w, X, R, lam)
                worst = jnp.max(jnp.where(inside, res, 0.0))
                done = inside.any() & (worst < tol)
                return Qn, lam, X, res, inside, it + 1, done

            def cond(state):
                return (~state[-1]) & (state[-2] <= iters)

            n, m0 = Q.shape
            state0 = (Q, cx.zeros((m0,), Q.dtype), cx.zeros((n, m0), Q.dtype),
                      jnp.zeros((m0,), Q.dtype), jnp.zeros((m0,), bool),
                      jnp.array(0, jnp.int32), jnp.array(False))
            Q, lam, X, res, inside, it, done = lax.while_loop(cond, body,
                                                              state0)
            return lam, X, res, inside, it, done

        return jax.vmap(one_slice, in_axes=(0, 0, 0, 0, 0, 0))(
            Q, LUb, permb, z, w, geom)

    return run


def feast_sliced_parallel(A, interval: Tuple[float, float], n_slices: int,
                          B=None, *, nodes: int = 8, iters: int = 20,
                          tol: float = 1e-12, samples: int = 40,
                          margin: float = 1.5, min_m0: int = 4, mesh=None,
                          m0: Optional[int] = None, seed: int = 0,
                          dedup_tol: float = 1e-8, verbose: bool = False,
                          hlo_sink: Optional[list] = None) -> SliceResult:
    """Solve every slice of [a, b] CONCURRENTLY: slices are stacked on a
    leading axis and sharded over the mesh's `slice` axis; each device
    group runs its slices' full refinement loop with no host round-trips
    and no cross-slice communication (wall time ~ max over slices, not the
    sum — the sequential `feast_sliced` host loop's fix, VERDICT r1 #5).

    A uniform subspace width (max over the stochastic estimates, or an
    explicit `m0`) keeps the batch rectangular — the static-shape TPU
    trade: a little extra work on thin slices buys one compiled program.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..cx import CX
    from ..ops import lu as lumod
    from ..solvers.feast import _shifted_batch, _as_cx_matrix, FeastResult

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    contours, counts = spectral_slices(A, interval, n_slices, B,
                                      samples=samples, nodes=nodes,
                                      seed=seed)
    n = A.shape[0]
    if m0 is None:
        m0 = max(min_m0, int(np.ceil(margin * max(counts))) + 2)
        m0 = min(m0, n)
    rng = np.random.default_rng(seed)

    Ac = _as_cx_matrix(np.asarray(A, dtype=np.complex128)
                       if not hasattr(A, "todense") else
                       np.asarray(A.todense(), dtype=np.complex128), dtype)
    Bc = None if B is None else _as_cx_matrix(
        np.asarray(B, dtype=np.complex128) if not hasattr(B, "todense")
        else np.asarray(B.todense(), dtype=np.complex128), dtype)

    z_all = np.stack([np.asarray(k.nodes) for k in contours])      # (S, N)
    w_all = np.stack([np.asarray(k.weights) for k in contours])
    geom = np.stack([[k.params[0], k.params[1], k.params[2]]
                     for k in contours]).astype(np.float64)        # (S, 3)
    X0 = (rng.standard_normal((n_slices, n, m0))
          + 1j * rng.standard_normal((n_slices, n, m0)))

    z = cx.from_numpy(z_all, dtype)
    w = cx.from_numpy(w_all, dtype)
    Q = cx.from_numpy(X0, dtype)
    geom_j = jnp.asarray(geom, dtype)

    # per-slice shifted factorizations: (S, N, n, n)
    Sb = jax.vmap(lambda zz: _shifted_batch(Ac, Bc, zz))(z)
    if mesh is not None:
        shard = NamedSharding(mesh, P("slice"))

        def place(x):
            spec = P(*(("slice",) + (None,) * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        Sb = jax.tree_util.tree_map(place, Sb)
        z = jax.tree_util.tree_map(place, z)
        w = jax.tree_util.tree_map(place, w)
        Q = jax.tree_util.tree_map(place, Q)
        geom_j = place(geom_j)
        Ac = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), Ac)
        if Bc is not None:
            Bc = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), Bc)
    LUb, permb = jax.jit(jax.vmap(lumod.lu_factor_batched))(Sb)

    run = _sliced_compiled_factory()
    if hlo_sink is not None:
        # expose the compiled module: tests assert the slice batch is
        # partitioned (per-device leading dim = S / slice_axis_size) with
        # ZERO cross-slice collectives — wall time == max over groups by
        # construction
        hlo_sink.append(run.lower(Q, Ac, Bc, LUb, permb, z, w, geom_j,
                                  "cholqr2", int(iters),
                                  float(tol)).compile().as_text())
    lam_b, X_b, res_b, inside_b, it_b, done_b = run(
        Q, Ac, Bc, LUb, permb, z, w, geom_j, "cholqr2", int(iters),
        float(tol))

    # host-side merge + near-boundary dedup (same policy as feast_sliced)
    all_lam, all_X, all_res, per_slice = [], [], [], []
    for s, k in enumerate(contours):
        result = FeastResult(
            CX(lam_b.re[s], lam_b.im[s]), CX(X_b.re[s], X_b.im[s]),
            res_b[s], inside_b[s], int(it_b[s]), bool(done_b[s]))
        lam, X, res = result.filtered()
        per_slice.append(result)
        if verbose:
            print(f"slice c={k.center:.4g} r={k.radius:.4g}: found "
                  f"{len(lam)} (iters {int(it_b[s])})")
        all_lam.append(lam)
        all_X.append(X)
        all_res.append(res)
    lam = np.concatenate(all_lam) if all_lam else np.empty(0, np.complex128)
    X = np.concatenate(all_X, axis=1) if all_X else np.empty((n, 0))
    res = np.concatenate(all_res) if all_res else np.empty(0)
    order = np.argsort(res)
    keep, kept_lam = [], []
    scale = max(abs(interval[0]), abs(interval[1]), 1.0)
    for i in order:
        if all(abs(lam[i] - l0) > dedup_tol * scale for l0 in kept_lam):
            keep.append(i)
            kept_lam.append(lam[i])
    keep = np.array(sorted(keep), dtype=int)
    return SliceResult(lam[keep], X[:, keep], res[keep], contours, counts,
                       per_slice)
