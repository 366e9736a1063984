"""Problem gallery: the NEP families the reference exercises.

Re-implementations from the published NLEVP problem definitions (the
reference pulls them from NonlinearEigenproblems.jl's gallery at
test/string.jl:26, test/hadeler.jl:28, or generates them:
test/gen_butterfly.jl), plus loaders for the bundled MatrixMarket fixtures.

All generators return SPMF/PolynomialNEP objects ready for the solvers, and
the raw coefficient matrices for cross-validation against `companion`.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from . import cx
from .nep import PolynomialNEP, SPMF


def butterfly(m: int = 8) -> Tuple[PolynomialNEP, list]:
    """The NLEVP 'butterfly' quartic PEP on an m x m grid (N = m^2).

    Quartic T(z) = M0 + z M1 + z^2 M2 + z^3 M3 + z^4 M4 built from Kronecker
    products of shift/tridiagonal blocks with the standard coefficient table
    (its spectrum traces a butterfly curve in the complex plane).
    """
    Nshift = np.diag(np.ones(m - 1), -1)
    I_m = np.eye(m)
    Mh0 = (4 * I_m + Nshift + Nshift.T) / 6.0
    Mh1 = Nshift - Nshift.T
    Mh2 = -(2 * I_m - Nshift - Nshift.T)
    Mh3 = Mh1
    Mh4 = -Mh2
    c = np.array([[0.6, 1.3], [1.3, 0.1], [0.1, 1.2], [1.0, 1.0], [1.2, 1.0]])
    blocks = [Mh0, Mh1, Mh2, Mh3, Mh4]
    coeffs = [
        (c[k, 0] * np.kron(I_m, blocks[k]) + c[k, 1] * np.kron(blocks[k], I_m)
         ).astype(np.complex128)
        for k in range(5)
    ]
    return PolynomialNEP(coeffs), coeffs


def loaded_string(n: int = 100, kappa: float = 1.0,
                  mass: float = 1.0) -> SPMF:
    """NLEVP 'loaded_string': vibrating string with elastically attached
    mass; T(lam) = A - lam B + kappa * lam/(lam - sigma) * e_n e_n^T with
    sigma = kappa/mass (rational NEP; reference runs it with K=3 moments at
    c=800 r=790, test/string.jl:26-35)."""
    import jax.numpy as jnp

    A = n * (np.diag(np.full(n, 2.0)) - np.diag(np.ones(n - 1), 1)
             - np.diag(np.ones(n - 1), -1))
    A[-1, -1] = n * 1.0
    B = (np.diag(np.full(n, 4.0)) + np.diag(np.ones(n - 1), 1)
         + np.diag(np.ones(n - 1), -1)) / (6.0 * n)
    B[-1, -1] = 2.0 / (6.0 * n)
    C = np.zeros((n, n))
    C[-1, -1] = 1.0
    sigma = kappa / mass

    one = lambda z: cx.CX(jnp.ones_like(z.re), jnp.zeros_like(z.im))
    neg_z = lambda z: cx.CX(-z.re, -z.im)

    def rational(z):
        # kappa * z / (z - sigma)
        num = cx.CX(kappa * z.re, kappa * z.im)
        den = cx.CX(z.re - sigma, z.im)
        return cx.cdiv(num, den)

    return SPMF([(A.astype(np.complex128), one),
                 (B.astype(np.complex128), neg_z),
                 (C.astype(np.complex128), rational)])


def hadeler(n: int = 200, b0: float = 100.0) -> SPMF:
    """NLEVP 'hadeler': T(z) = (e^z - 1) B1 + z^2 B2 - b0 I
    (reference test/hadeler.jl:27-51, run at c=-30 r=10)."""
    import jax.numpy as jnp

    i = np.arange(1, n + 1)
    B1 = (n + 1 - np.maximum.outer(i, i)) * np.outer(i, i)
    B2 = n * np.eye(n) + 1.0 / np.add.outer(i, i)
    B0 = b0 * np.eye(n)

    def expm1_f(z):
        # e^z - 1 on CX pairs
        ez = jnp.exp(z.re)
        return cx.CX(ez * jnp.cos(z.im) - 1.0, ez * jnp.sin(z.im))

    z2 = lambda z: z * z
    neg_one = lambda z: cx.CX(-jnp.ones_like(z.re), jnp.zeros_like(z.im))

    return SPMF([(B1.astype(np.complex128), expm1_f),
                 (B2.astype(np.complex128), z2),
                 (B0.astype(np.complex128), neg_one)])


def delay_nep(A0: np.ndarray, A1: np.ndarray, tau: float = 1.0) -> SPMF:
    """Delay eigenvalue problem T(z) = -z I + A0 + A1 e^{-tau z}
    (dep_distributed family, reference test/nep.jl)."""
    import jax.numpy as jnp

    n = A0.shape[0]
    one = lambda z: cx.CX(jnp.ones_like(z.re), jnp.zeros_like(z.im))
    neg_z = lambda z: cx.CX(-z.re, -z.im)

    def exp_f(z):
        e = jnp.exp(-tau * z.re)
        return cx.CX(e * jnp.cos(tau * z.im), -e * jnp.sin(tau * z.im))

    return SPMF([(np.eye(n, dtype=np.complex128), neg_z),
                 (np.asarray(A0, dtype=np.complex128), one),
                 (np.asarray(A1, dtype=np.complex128), exp_f)])


def laplacian_1d(n: int, sparse: bool = False):
    """1-D Laplacian (the reference's contour test matrix,
    test/runtests.jl:33, test/contour_test.jl:7)."""
    if sparse:
        import scipy.sparse as sp

        return sp.diags([np.full(n, 2.0), -np.ones(n - 1), -np.ones(n - 1)],
                        [0, 1, -1], format="csr").astype(np.complex128)
    return (np.diag(np.full(n, 2.0)) - np.diag(np.ones(n - 1), 1)
            - np.diag(np.ones(n - 1), -1)).astype(np.complex128)


# ---------------------------------------------------------------------------
# bundled fixture loaders (reference checkout)
# ---------------------------------------------------------------------------

def _data_dir(data_dir: Optional[str]) -> str:
    d = data_dir or os.environ.get("FEAST_REF_DATA", "/root/reference/data")
    if not os.path.isdir(d):
        raise FileNotFoundError(f"fixture dir {d} not found")
    return d


def load_system5(data_dir: Optional[str] = None) -> Tuple[PolynomialNEP, list]:
    """1000x1000 real quadratic (test/polynomial.jl:5-20; slice c=-1.55
    r=0.05, m0=80, K=2)."""
    from .io import read_matrix_market

    d = _data_dir(data_dir)
    coeffs = [read_matrix_market(os.path.join(d, f"system5A{k}.mtx"),
                                 out="dense") for k in range(3)]
    return PolynomialNEP(coeffs), coeffs


def load_quadratic(data_dir: Optional[str] = None) -> Tuple[PolynomialNEP, list]:
    """15x15 rank-deficient quadratic (z+0.2)(z-0.1) A1 + A0
    (test/deficient.jl:201-219)."""
    from .io import read_matrix_market

    d = _data_dir(data_dir)
    A0 = read_matrix_market(os.path.join(d, "quadraticM0.mtx"), out="dense")
    A1 = read_matrix_market(os.path.join(d, "quadraticM1.mtx"), out="dense")
    coeffs = [A0 - 0.02 * A1, 0.1 * A1, A1]
    return PolynomialNEP(coeffs), coeffs


def load_butterfly(data_dir: Optional[str] = None) -> Tuple[PolynomialNEP, list]:
    """64x64 quartic from the bundled fixtures (falls back to butterfly())."""
    try:
        from .io import read_matrix_market

        d = _data_dir(data_dir)
        coeffs = [read_matrix_market(os.path.join(d, f"butterflyM{k}.mtx"),
                                     out="dense") for k in range(5)]
        return PolynomialNEP(coeffs), coeffs
    except FileNotFoundError:
        return butterfly()


def gun_like(n: int = 256, seed: int = 0,
             planted: Optional[int] = None,
             cluster: Tuple[float, float] = (100.0, 110.0),
             cache_dir: Optional[str] = None) -> SPMF:
    """A gun-NLEP-shaped problem: T(z) = K - z M + i sqrt(z - s1^2) W1
    + i sqrt(z - s2^2) W2 (the RF-gun cavity NLEP's structure,
    reference test/gun.jl — its 9956x9956 data lives in the NLEVP gallery
    and is not redistributable, so this generator reproduces the sqrt-branch
    STRUCTURE at configurable size for capability tests).

    planted=None (default): GOE-bulk pencil — dense uniform spectrum, good
    for interior-slice cross-method tests.  planted=m: plant m pencil
    eigenvalues in `cluster` = (lo, hi) with everything else far above —
    the real gun's phenomenology (a handful of isolated cavity resonances
    inside a huge contour, far-away bands elsewhere; the reference's
    contour holds ~20 eigenvalues against m0=84, test/paper_exact.jl:102).

    cache_dir: if given, the expensive host-built coefficient arrays are
    loaded from (or built once and saved to) an npz fixture there — the
    n=9956 host build costs ~minutes-to-tens-of-minutes (two (n, n//64)
    x (n//64, n) GEMMs + spectral normalizations), which made the
    reference-scale NLEP benchmark effectively one-shot (r2 verdict #7).
    """
    parts = None
    path = None
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        tag = "none" if planted is None else str(planted)
        path = os.path.join(
            cache_dir, f"gun_like_n{n}_seed{seed}_p{tag}"
                       f"_c{cluster[0]:g}-{cluster[1]:g}.npz")
        if os.path.exists(path):
            with np.load(path) as z:
                parts = {k: z[k] for k in z.files}
    if parts is None:
        parts = _gun_like_parts(n, seed, planted, cluster)
        if path is not None:
            tmp = path + ".tmp.npz"
            np.savez(tmp, **parts)
            os.replace(tmp, path)
    return _gun_like_assemble(parts)


def _gun_like_parts(n, seed, planted, cluster) -> dict:
    """Host build of the gun_like coefficient arrays (all real float64)."""
    rng = np.random.default_rng(seed)
    if planted is None:
        # SPD-ish stiffness / mass, low-rank boundary coupling
        Kd = rng.standard_normal((n, n))
        K = (Kd + Kd.T) / 2 + n * np.eye(n)
        Md = rng.standard_normal((n, n))
        M = ((Md + Md.T) / 2 + n * np.eye(n)) / n
        wscale = 1.0 / n
    else:
        lo, hi = cluster
        d = np.concatenate([
            rng.uniform(lo, hi, planted),
            rng.uniform(4.0 * hi, 40.0 * hi, n - planted)])
        # K = Q D Q^T with Q a product of 4 Householder reflectors —
        # spectrum exact, O(n^2) build (a dense random-orthogonal QR +
        # two GEMMs takes minutes at n=9956 on this host's BLAS)
        K = np.diag(d)
        for _ in range(4):
            v = rng.standard_normal((n, 1))
            v /= np.linalg.norm(v)
            w = K @ v
            K = K - 2.0 * (v @ w.T) - 2.0 * (w @ v.T) \
                + 4.0 * float((v * w).sum()) * (v @ v.T)
        M = np.eye(n)
        # nonlinear terms sized to shift cluster eigenvalues visibly
        # (O(spacing)) without dissolving the cluster: ||f(z) W|| ~ 1
        wscale = 0.6 / np.sqrt(lo)
    # boundary-coupling rank grows with n in the real gun (surface dofs)
    rk = 4 if planted is None else max(4, n // 64)

    def _lowrank(scale2=None):
        U = rng.standard_normal((n, rk))
        V = rng.standard_normal((rk, n))
        if scale2 is not None:
            # ||UV||_2 from the rk x rk product: nonzero eigs of
            # (UV)^T UV = V^T(U^T U)V equal eigs of (U^T U)(V V^T) —
            # a dense-2-norm SVD here is O(n^3) (~17 min at n=9956)
            s2max = np.linalg.eigvals((U.T @ U) @ (V @ V.T)).real.max()
            U = U * (scale2 / np.sqrt(s2max))
        return U @ V

    if planted is None:
        W1 = _lowrank() / n
        W2 = _lowrank() / n
        s1, s2 = 0.0, 108.8774  # gun's branch points (0 and 108.8774^2)
    else:
        W1 = _lowrank(scale2=wscale)
        W2 = _lowrank(scale2=wscale)
        # both branch points BELOW the cluster, like the real gun whose
        # contour (c=140000 > s2^2=11854.5) sits above both cuts — a
        # contour crossing a sqrt cut is non-analytic and the moment
        # quadrature would plateau at ~1e-6
        s1, s2 = 0.0, np.sqrt(0.8 * cluster[0])

    parts = {"K": K, "W1": W1, "W2": W2,
             "s1": np.float64(s1), "s2": np.float64(s2),
             "m_identity": np.bool_(planted is not None)}
    if planted is None:
        parts["M"] = M
    return parts


def _gun_like_assemble(parts: dict) -> SPMF:
    import jax.numpy as jnp

    K, W1, W2 = parts["K"], parts["W1"], parts["W2"]
    s1, s2 = float(parts["s1"]), float(parts["s2"])
    M = (np.eye(K.shape[0]) if bool(parts["m_identity"])
         else parts["M"])

    one = lambda z: cx.CX(jnp.ones_like(z.re), jnp.zeros_like(z.im))
    neg_z = lambda z: cx.CX(-z.re, -z.im)

    def isqrt_shift(s):
        def f(z):
            w = cx.csqrt(cx.CX(z.re - s * s, z.im))
            return cx.CX(-w.im, w.re)  # i * sqrt(z - s^2)
        return f

    return SPMF([(K.astype(np.complex128), one),
                 (M.astype(np.complex128), neg_z),
                 (W1.astype(np.complex128), isqrt_shift(s1)),
                 (W2.astype(np.complex128), isqrt_shift(s2))])


def fiber_like(n: int = 2400, seed: int = 0) -> SPMF:
    """A fiber-NLEP-shaped problem (NLEVP 'fiber' structure: the reference
    runs the real 2400x2400 problem with K=10 moments, test/fiber.jl:26-36;
    its data needs the NLEVP gallery + Bessel evaluations, unavailable
    offline).  Structure reproduced: T(z) = A - z I + s(z) e_n e_n^T with a
    tridiagonal refraction-profile A and a branch-singular rank-1 boundary
    term s(z) = sqrt(z - b) * z / (1 + sqrt(z - b)) — one sqrt branch point
    below the spectrum slice, exactly the regime the K=10 block-Hankel
    moment machinery exists for."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    # graded tridiagonal "refraction profile": eigenvalues cluster low
    prof = 1.0 + 0.5 * np.exp(-np.linspace(0, 4, n))
    A = (np.diag(2.0 * prof) - np.diag(np.ones(n - 1), 1)
         - np.diag(np.ones(n - 1), -1)).astype(np.complex128)
    C = np.zeros((n, n))
    C[-1, -1] = 1.0
    b = -0.5  # branch point safely left of the spectrum

    one = lambda z: cx.CX(jnp.ones_like(z.re), jnp.zeros_like(z.im))
    neg_z = lambda z: cx.CX(-z.re, -z.im)

    def s_f(z):
        w = cx.csqrt(cx.CX(z.re - b, z.im))
        num = w * z
        den = cx.CX(1.0 + w.re, w.im)
        return cx.cdiv(num, den)

    return SPMF([(A, one),
                 (np.eye(n, dtype=np.complex128), neg_z),
                 (C.astype(np.complex128), s_f)])


def fem2d_unstructured(n_points: int = 4000, seed: int = 0,
                       dirichlet: bool = True):
    """Genuinely UNSTRUCTURED sparse generalized pencil: P1 finite-element
    stiffness K and mass M on a Delaunay triangulation of random points in
    the unit square (the matrix class the reference feeds to UMFPACK —
    arbitrary SparseMatrixCSC, test/generalized_feast.jl:7-24 — and the
    adversarial case for structured TPU SpMM formats: no bands, no
    constant offsets, random vertex ordering).

    Returns (K, M, points) with K, M scipy CSR (complex128).  With
    dirichlet=True the convex-hull boundary nodes are eliminated, so K is
    SPD and the pencil (K, M) has the usual Laplace-Dirichlet spectrum
    ~ lam_k = O(k) * pi^2-ish on the unit square."""
    import scipy.sparse as sp
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    pts = rng.random((n_points, 2))
    tri = Delaunay(pts)
    t = tri.simplices  # (nt, 3)
    p0, p1, p2 = pts[t[:, 0]], pts[t[:, 1]], pts[t[:, 2]]
    # edge vectors and (signed, then abs) areas
    d1 = p1 - p0
    d2 = p2 - p0
    det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    area = 0.5 * np.abs(det)
    ok = area > 1e-14  # drop degenerate slivers
    t, d1, d2, det, area = t[ok], d1[ok], d2[ok], det[ok], area[ok]
    # gradients of the three barycentric basis functions (nt, 3, 2)
    g1 = np.stack([d2[:, 1], -d2[:, 0]], axis=1) / det[:, None]
    g2 = np.stack([-d1[:, 1], d1[:, 0]], axis=1) / det[:, None]
    g0 = -(g1 + g2)
    G = np.stack([g0, g1, g2], axis=1)
    # local stiffness K_ij = area * g_i . g_j ; local mass area/12*(1+d_ij)
    KL = area[:, None, None] * np.einsum("tid,tjd->tij", G, G)
    ML = (area / 12.0)[:, None, None] * (np.ones((3, 3)) + np.eye(3))
    rows = np.repeat(t, 3, axis=1).ravel()
    cols = np.tile(t, (1, 3)).ravel()
    nv = n_points
    K = sp.coo_matrix((KL.ravel(), (rows, cols)), shape=(nv, nv)).tocsr()
    M = sp.coo_matrix((ML.ravel(), (rows, cols)), shape=(nv, nv)).tocsr()
    if dirichlet:
        bnd = np.unique(tri.convex_hull)
        keep = np.setdiff1d(np.arange(nv), bnd)
        K = K[keep][:, keep].tocsr()
        M = M[keep][:, keep].tocsr()
        pts = pts[keep]
    return (K.astype(np.complex128), M.astype(np.complex128), pts)
