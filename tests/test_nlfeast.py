"""Nonlinear solver family: nlfeast, nlfeast_moments, beyn, block_ss,
companion, stochastic count.

Validation strategy (mirrors the reference's, SURVEY.md section 4):
  * converged residuals below the reference thresholds;
  * cross-validation of contour eigenvalues between INDEPENDENT methods
    (nlfeast vs companion exact dense solve vs beyn);
  * the reference's bundled quadratic fixture (data/quadraticM0/M1.mtx,
    test/deficient.jl:201-219) when the reference checkout is present.
"""

import os

import numpy as np
import pytest

import feast_tpu as ft
from feast_tpu import cx

REF_DATA = "/root/reference/data"


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


# ---------------------------------------------------------------------------
# linear pencil through the nonlinear machinery
# ---------------------------------------------------------------------------

def test_nlfeast_linear_pencil():
    rng = np.random.default_rng(0)
    A = np.diag(np.arange(1.0, 26.0)).astype(np.complex128)
    T = ft.LinearPencilNEP(A)
    X0 = _rand_c(rng, 25, 6)
    res = ft.nlfeast(T, X0, nodes=8, iters=20, c=1.5 + 0j, r=2.0, tol=1e-11)
    lam, X, r = res.filtered(spurious=1e-5)
    np.testing.assert_allclose(np.sort(lam.real), [1, 2, 3], atol=1e-9)
    assert r.max() < 1e-11


# ---------------------------------------------------------------------------
# quadratic polynomial NEP: nlfeast vs companion (exact dense)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def quadratic_fixture():
    """The reference's 15x15 rank-deficient quadratic
    T(z) = (z+0.2)(z-0.1) A1 + A0 (test/deficient.jl:201-219), loaded from
    the reference checkout; falls back to a synthetic quadratic."""
    if os.path.isdir(REF_DATA):
        from scipy.io import mmread

        def _load(name):
            m = mmread(os.path.join(REF_DATA, name))
            return np.asarray(m.todense() if hasattr(m, "todense") else m,
                              dtype=np.complex128)

        A0 = _load("quadraticM0.mtx")
        A1 = _load("quadraticM1.mtx")
    else:
        rng = np.random.default_rng(1234)
        A0 = _rand_c(rng, 15, 15)
        A1 = _rand_c(rng, 15, 15)
        A0[:, 0] = 0.0
    # expand (z+0.2)(z-0.1) A1 + A0 = A0 - 0.02 A1 + 0.1 z A1 + z^2 A1
    coeffs = [A0 - 0.02 * A1, 0.1 * A1, A1]
    return coeffs


@pytest.fixture(scope="module")
def generic_quadratic():
    """A well-posed (non-deficient) random quadratic for the K=1 methods
    (the bundled fixture is rank-deficient: lam=-0.2 and 0.1 share an
    eigenvector, which single-moment Beyn extraction provably cannot
    separate — the reference, too, only runs moment/SS methods on it)."""
    rng = np.random.default_rng(42)
    n = 20
    return [_rand_c(rng, n, n), _rand_c(rng, n, n), _rand_c(rng, n, n)]


def _exact_inside(coeffs, c, r):
    exact = ft.companion(coeffs)
    lam_e = cx.to_numpy(exact.lam)
    res_e = np.asarray(exact.res)
    return np.sort_complex(lam_e[(np.abs(lam_e - c) <= r) & (res_e < 1e-10)])


@pytest.mark.slow
def test_quadratic_nlfeast_vs_companion(generic_quadratic):
    coeffs = generic_quadratic
    c, r = 0.0 + 0.0j, 0.6
    want = _exact_inside(coeffs, c, r)
    assert len(want) > 0
    T = ft.PolynomialNEP(coeffs)
    rng = np.random.default_rng(5)
    X0 = _rand_c(rng, coeffs[0].shape[0], len(want) + 5)
    out = ft.nlfeast(T, X0, nodes=32, iters=30, c=c, r=r,
                     tol=1e-11, spurious=1e-3)
    lam, X, rres = out.filtered(spurious=1e-3)
    got = np.sort_complex(lam)
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=1e-7)
    assert rres.max() < 1e-11


@pytest.mark.slow
def test_quadratic_moments(quadratic_fixture):
    coeffs = quadratic_fixture
    exact = ft.companion(coeffs)
    lam_e = cx.to_numpy(exact.lam)
    res_e = np.asarray(exact.res)
    c, r = 0.0 + 0.0j, 0.25
    want = np.sort_complex(lam_e[(np.abs(lam_e - c) <= r) & (res_e < 1e-10)])
    T = ft.PolynomialNEP(coeffs)
    rng = np.random.default_rng(7)
    X0 = _rand_c(rng, coeffs[0].shape[0], 4)
    out = ft.nlfeast_moments(T, X0, nodes=16, iters=10, moments=2,
                             c=c, r=r, tol=1e-13, spurious=1e-3)
    lam, Y, rres = out.filtered(spurious=1e-3)
    got = np.sort_complex(lam)
    assert len(got) >= len(want)
    # every exact eigenvalue in the contour is found
    for w in want:
        assert np.min(np.abs(got - w)) < 1e-7


def test_quadratic_beyn(generic_quadratic):
    coeffs = generic_quadratic
    c, r = 0.0 + 0.0j, 0.6
    want = _exact_inside(coeffs, c, r)
    T = ft.PolynomialNEP(coeffs)
    rng = np.random.default_rng(9)
    X0 = _rand_c(rng, coeffs[0].shape[0], len(want) + 4)
    lam, X, rres = ft.beyn(T, X0, nodes=64, c=c, r=r).sorted_numpy()
    inside = np.abs(lam - c) <= r
    # single-shot Beyn is quadrature-limited (no refinement) — like the
    # reference's `beyn`; expect eigenvalue accuracy ~filter decay, not eps
    good = inside & (rres < 1e-2)
    got = np.sort_complex(lam[good])
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.slow
def test_quadratic_block_ss(quadratic_fixture):
    coeffs = quadratic_fixture
    exact = ft.companion(coeffs)
    lam_e = cx.to_numpy(exact.lam)
    res_e = np.asarray(exact.res)
    c, r = 0.0 + 0.0j, 0.25
    want = np.sort_complex(lam_e[(np.abs(lam_e - c) <= r) & (res_e < 1e-10)])
    T = ft.PolynomialNEP(coeffs)
    rng = np.random.default_rng(11)
    X0 = _rand_c(rng, coeffs[0].shape[0], 6)
    out = ft.block_ss(T, X0, nodes=32, moments=2, c=c, r=r)
    lam = cx.to_numpy(out.lam)
    rres = np.asarray(out.res)
    good = (np.abs(lam - c) <= r) & (rres < 1e-8)
    got = np.sort_complex(lam[good])
    for w in want:
        assert np.min(np.abs(got - w)) < 1e-7


# ---------------------------------------------------------------------------
# delay/exponential NEP (SPMF with non-polynomial f): two methods agree
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_exponential_dep_cross_method():
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    n = 30
    A0 = _rand_c(rng, n, n) / 4
    A1 = _rand_c(rng, n, n) / 4
    # T(z) = -z I + A0 + A1 exp(-z)   (dep_distributed-style, test/nep.jl)
    T = ft.SPMF([
        (np.eye(n, dtype=np.complex128), lambda z: cx.CX(-z.re, -z.im)),
        (A0, lambda z: cx.CX(jnp.ones_like(z.re), jnp.zeros_like(z.im))),
        (A1, lambda z: cx.CX(jnp.exp(-z.re) * jnp.cos(z.im),
                             -jnp.exp(-z.re) * jnp.sin(z.im))),
    ])
    c, r = 0.0 + 0.0j, 0.8
    X0 = _rand_c(rng, n, 12)
    out = ft.nlfeast(T, X0, nodes=32, iters=25, c=c, r=r, tol=1e-10,
                     spurious=1e-4)
    lam1, _, r1 = out.filtered(spurious=1e-4)
    assert len(lam1) > 0 and r1.max() < 1e-10
    lam2, _, r2 = ft.beyn(T, _rand_c(rng, n, 16), nodes=64, c=c, r=r,
                          relative_res=True).sorted_numpy()
    good2 = (np.abs(lam2 - c) <= r) & (r2 < 1e-8)
    got2 = np.sort_complex(lam2[good2])
    got1 = np.sort_complex(lam1)
    assert len(got1) == len(got2)
    np.testing.assert_allclose(got1, got2, atol=1e-7)


# ---------------------------------------------------------------------------
# callable NEP (host parity mode)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_callable_nep_host_mode():
    A = np.diag(np.arange(1.0, 26.0)).astype(np.complex128)

    def T(z):
        return A - z * np.eye(25)

    rng = np.random.default_rng(0)
    X0 = _rand_c(rng, 25, 6)
    out = ft.nlfeast(T, X0, nodes=8, iters=20, c=1.5 + 0j, r=2.0, tol=1e-11)
    lam, _, r = out.filtered(spurious=1e-5)
    np.testing.assert_allclose(np.sort(lam.real), [1, 2, 3], atol=1e-9)


# ---------------------------------------------------------------------------
# stochastic eigenvalue count
# ---------------------------------------------------------------------------

def test_contour_estimate_eig():
    n = 100
    L = (np.diag(np.full(n, 2.0)) - np.diag(np.ones(n - 1), 1)
         - np.diag(np.ones(n - 1), -1)).astype(np.complex128)
    k = ft.circular_contour_trapezoidal(0.05 + 0j, 0.05, 8)
    est = ft.contour_estimate_eig(L, k, samples=100, seed=1)
    assert 7 <= est <= 13  # true count is 10

def test_contour_estimate_eig_generalized_and_mixed():
    n = 50
    rng = np.random.default_rng(2)
    A = np.diag(np.arange(1.0, n + 1.0)).astype(np.complex128)
    B = np.eye(n, dtype=np.complex128)
    k = ft.circular_contour_trapezoidal(3.0 + 0j, 2.2, 8)  # eigs 1..5 inside
    est = ft.contour_estimate_eig(A, k, B, samples=50, seed=3)
    assert 3.5 <= est <= 6.5
    est32 = ft.contour_estimate_eig(A, k, B, samples=50, seed=3,
                                    mixed_prec=True)
    assert abs(est32 - est) < 0.5


@pytest.mark.slow
def test_nlfeast_it_butterfly():
    from feast_tpu import problems

    T, _ = problems.butterfly()
    rng = np.random.default_rng(0)
    X0 = _rand_c(rng, 64, 18)
    out = ft.nlfeast_it(T, X0, nodes=16, iters=15, c=1.0 + 1.0j, r=0.5,
                        tol=1e-10, spurious=5e-3, solve_tol=1e-10)
    lam, _, res = out.filtered(spurious=5e-3)
    assert len(lam) == 13
    assert res.max() < 1e-10


@pytest.mark.slow
def test_beyn_extraction_variants():
    # qr / rr / rr2 extraction agree with the svd step on a clean problem
    import jax.numpy as jnp
    from feast_tpu.solvers.nlfeast import (beyn_qr_extract, beyn_rr_extract,
                                           beyn_rr2_extract)
    from feast_tpu.ops import lu as lumod
    from feast_tpu import contour as ct

    A = np.diag(np.arange(1.0, 26.0)).astype(np.complex128)
    rng = np.random.default_rng(0)
    X = cx.from_numpy(_rand_c(rng, 25, 5))
    k = ct.circular_contour_trapezoidal(1.5 + 0j, 2.0, 16)
    z = k.device_nodes(jnp.float64)
    w = k.device_weights(jnp.float64)
    eye = np.eye(25)
    Sb = cx.from_numpy(np.stack([A - zi * eye for zi in np.asarray(k.nodes)]))
    LUb, permb = lumod.lu_factor_batched(Sb)
    import jax
    terms = jax.vmap(lambda LU, p, wi: cx.scale_cols(
        lumod.lu_solve(LU, p, X),
        cx.CX(jnp.broadcast_to(wi.re, (5,)), jnp.broadcast_to(wi.im, (5,)))))(
            LUb, permb, w)
    Q0 = cx.CX(terms.re.sum(0), terms.im.sum(0))
    q1 = jax.vmap(lambda t_re, t_im, zi: cx.scale_cols(
        cx.CX(t_re, t_im), cx.CX(jnp.broadcast_to(zi.re, (5,)),
                                 jnp.broadcast_to(zi.im, (5,)))))(
            terms.re, terms.im, z)
    Q1 = cx.CX(q1.re.sum(0), q1.im.sum(0))
    for extract in (beyn_qr_extract, beyn_rr2_extract,
                    lambda a, b: beyn_rr_extract(a, b, X)):
        lam, _ = extract(Q0, Q1)
        lam_n = cx.to_numpy(lam)
        inside = np.abs(lam_n - 1.5) <= 2.0
        # single filter application, 16 trapezoid nodes: ~1e-5 accuracy
        np.testing.assert_allclose(np.sort(lam_n[inside].real), [1, 2, 3],
                                   atol=1e-4)


@pytest.mark.slow
def test_callable_nep_off_origin_contour():
    # host mode at c=101.5 (would collapse with raw z moments)
    A = np.diag(np.arange(100.0, 125.0)).astype(np.complex128)

    def T(zv):
        return A - zv * np.eye(25)

    rng = np.random.default_rng(0)
    X0 = _rand_c(rng, 25, 6)
    out = ft.nlfeast(T, X0, nodes=8, iters=20, c=101.5 + 0j, r=2.0, tol=1e-11)
    lam, _, r = out.filtered(spurious=1e-5)
    np.testing.assert_allclose(np.sort(lam.real), [100, 101, 102, 103],
                               atol=1e-8)
    assert r.max() < 1e-11


@pytest.mark.slow
def test_nlfeast_rectangular_contour(generic_quadratic):
    """nlfeast accepts arbitrary Contour objects — the reference hardcodes
    the trapezoid circle (nlfeast.jl:8); SURVEY.md flags unification."""
    from feast_tpu import contour as ct

    coeffs = generic_quadratic
    T = ft.PolynomialNEP(coeffs)
    rng = np.random.default_rng(1)
    X0 = _rand_c(rng, coeffs[0].shape[0], 14)
    k = ct.rectangular_contour_gauss(-0.6 - 0.6j, 0.6 + 0.6j, 32)
    out = ft.nlfeast(T, X0, iters=30, contour=k, tol=1e-11, spurious=1e-3)
    lam, _, r = out.filtered(spurious=1e-3)
    exact = ft.companion(coeffs)
    le = cx.to_numpy(exact.lam)
    re_ = np.asarray(exact.res)
    want = np.sort_complex(le[(np.abs(le.real) < 0.6) & (np.abs(le.imag) < 0.6)
                              & (re_ < 1e-10)])
    assert len(lam) == len(want)
    np.testing.assert_allclose(np.sort_complex(lam), want, atol=1e-7)
    assert r.max() < 1e-11


def test_companion_singular_leading_coefficient():
    """Singular leading coefficient A_{L+1}: the LU reduction C2^{-1} C1 is
    invalid (C2 singular); companion(method="auto") must switch to QZ and
    return the correct FINITE eigenvalues (infinite ones come out huge, the
    ggev alpha/beta convention).  Validated against scipy.linalg.eig on the
    same companion pencil (ADVICE r1)."""
    import scipy.linalg as sla

    rng = np.random.default_rng(17)
    n = 8
    A0 = rng.standard_normal((n, n)).astype(np.complex128)
    A1 = rng.standard_normal((n, n)).astype(np.complex128)
    A2 = rng.standard_normal((n, n)).astype(np.complex128)
    A2[:, -2:] = 0.0  # rank n-2 leading coefficient -> 2 infinite eigenvalues
    out = ft.companion([A0, A1, A2])
    lam = np.asarray(out.lam.re) + 1j * np.asarray(out.lam.im)

    # scipy ground truth on the same linearization
    NL = 2 * n
    C1 = np.zeros((NL, NL), dtype=np.complex128)
    C2 = np.zeros((NL, NL), dtype=np.complex128)
    C1[:n, :n] = A0
    for i in range(n, NL):
        C1[i, i] = 1.0
        C2[i, i - n] = 1.0
    C2[:n, :n] = -A1
    C2[:n, n:] = -A2
    ref = sla.eigvals(C1, C2)
    ref_fin = ref[np.isfinite(ref) & (np.abs(ref) < 1e6)]
    finite_mask = np.isfinite(lam) & (np.abs(lam) < 1e6)
    got_fin = lam[finite_mask]
    assert len(got_fin) == len(ref_fin)
    # set comparison (conjugate pairs order differently under sort_complex)
    dist = np.abs(got_fin[:, None] - ref_fin[None, :])
    assert dist.min(axis=1).max() < 1e-7
    assert dist.min(axis=0).max() < 1e-7
    # finite eigenpairs have small residuals
    res = np.asarray(out.res)
    assert res[finite_mask].max() < 1e-7


@pytest.mark.slow
def test_nlfeast_store_false_matches_store_true():
    """store=False (reference nlfeast.jl:17-28 semantics): chunked
    re-factorization every iteration must reproduce the stored path —
    the O(chunk n^2)-memory mode that fits gun-scale on a 16 GB chip."""
    from feast_tpu import problems

    n = 128
    T = problems.gun_like(n, planted=12, cluster=(50.0, 56.0))
    rng = np.random.default_rng(3)
    X0 = rng.standard_normal((n, 30)) + 1j * rng.standard_normal((n, 30))
    kw = dict(nodes=16, iters=10, c=53.0 + 0.0j, r=5.0, tol=1e-10,
              spurious=1e-5)
    a = ft.nlfeast(T, X0, store=False, factor_chunk=3, mixed_prec=True, **kw)
    b = ft.nlfeast(T, X0, **kw)
    la, _, ra = a.filtered(spurious=1e-5)
    lb, _, rb = b.filtered(spurious=1e-5)
    assert a.converged and b.converged
    assert len(la) == len(lb) == 12
    np.testing.assert_allclose(np.sort_complex(la), np.sort_complex(lb),
                               atol=1e-9)
    assert max(ra.max(), rb.max()) < 1e-10
