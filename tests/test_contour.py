"""Contour quadrature goldens.

Golden values follow the reference formulas (contour.jl) evaluated
analytically; plus filter-quality invariants: the rational filter of any valid
contour must be ~1 inside and ~0 far outside.
"""

import numpy as np
import pytest

from feast_tpu import contour as ct
from feast_tpu import cx


def test_circular_trapezoid_nodes_weights():
    c, r, n = 1.5 + 0.5j, 2.0, 8
    k = ct.circular_contour_trapezoidal(c, r, n)
    theta = np.pi / n + 2 * np.pi * np.arange(n) / n
    np.testing.assert_allclose(k.nodes, r * np.exp(1j * theta) + c, rtol=1e-15)
    np.testing.assert_allclose(k.weights, r * np.exp(1j * theta) / n, rtol=1e-15)
    # weights sum to 0 (closed contour, no pole at infinity)
    assert abs(np.sum(k.weights)) < 1e-14


def test_circular_gauss_weights_sum():
    k = ct.circular_contour_gauss(0.0, 1.0, 16)
    assert len(k.nodes) == 16
    # sum of |weights| approximates r (total parametrization mass / 2pi * 2pi r ... )
    # closed-contour exactness: rho(z)=1 at center
    rho = ct.rational_func(np.array([0.0 + 0j]), k)
    np.testing.assert_allclose(rho, 1.0, atol=1e-10)


@pytest.mark.parametrize("maker,args", [
    (ct.circular_contour_trapezoidal, (0.3 + 0.1j, 1.2, 16)),
    (ct.circular_contour_gauss, (0.3 + 0.1j, 1.2, 16)),
    (ct.rectangular_contour_trapezoidal, (-1.0 - 1.0j, 1.5 + 1.0j, 32)),
    (ct.rectangular_contour_gauss, (-1.0 - 1.0j, 1.5 + 1.0j, 16)),
])
def test_rational_filter_inside_outside(maker, args):
    k = maker(*args)
    c = k.center
    inside = np.array([c, c + 0.1, c - 0.05j])
    far = np.array([c + 40.0, c - 33.0j])
    rho_in = ct.rational_func(inside, k)
    rho_out = ct.rational_func(far, k)
    # Cauchy: rho ~ 1 well inside, ~0 well outside
    np.testing.assert_allclose(rho_in, 1.0, atol=5e-3)
    np.testing.assert_allclose(rho_out, 0.0, atol=5e-2)


def test_rect_trapezoid_corner_weights():
    # corner weights are the half-sum of adjacent edge steps (contour.jl:77-84)
    bl, tr, n = -1.0 - 1.0j, 1.0 + 1.0j, 16
    k = ct.rectangular_contour_trapezoidal(bl, tr, n)
    q = n // 4
    top_len = tr.real - bl.real
    side_len = tr.imag - bl.imag
    w0 = (1j * side_len / (2 * q) + top_len / (2 * q)) / (-2j * np.pi)
    np.testing.assert_allclose(k.weights[0], w0, rtol=1e-14)


def test_real_corners_accepted():
    # the reference errors on real corners (contour.jl:50); we accept them
    k = ct.rectangular_contour_trapezoidal(complex(0.0, -0.05), complex(0.1, 0.05), 8)
    assert k.nodes.dtype == np.complex128


def test_in_contour_circle_and_rect():
    k = ct.circular_contour_trapezoidal(1.0, 0.5, 8)
    lam = np.array([1.2, 2.0, 1.0 + 0.49j])
    np.testing.assert_array_equal(np.asarray(ct.in_contour(lam, k)),
                                  [True, False, True])
    kr = ct.rectangular_contour_trapezoidal(-1 - 1j, 1 + 1j, 8)
    lam = np.array([0.0, 1.5, 0.9 + 0.9j])
    np.testing.assert_array_equal(np.asarray(ct.in_contour(lam, kr)),
                                  [True, False, True])


def test_in_contour_custom_winding():
    base = ct.circular_contour_trapezoidal(0.0, 1.0, 32)
    k = ct.custom_contour(base.nodes, base.weights)
    lam = np.array([0.1 + 0.1j, 3.0 + 0j])
    got = np.asarray(ct.in_contour(lam, k))
    np.testing.assert_array_equal(got, [True, False])


def test_gauss_filter_much_sharper_than_trapezoid_on_real_axis():
    # sanity: 16-node GL circle filter decays fast off-contour
    k = ct.circular_contour_gauss(0.0, 1.0, 16)
    rho = ct.rational_func(np.array([2.0 + 0j]), k)
    assert abs(rho) < 0.2


def test_cx_roundtrip_and_matmul():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((7, 5)) + 1j * rng.standard_normal((7, 5))
    b = rng.standard_normal((5, 3)) + 1j * rng.standard_normal((5, 3))
    A, B = cx.from_numpy(a), cx.from_numpy(b)
    np.testing.assert_allclose(cx.to_numpy(A @ B), a @ b, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(cx.to_numpy(A.H), a.conj().T, rtol=1e-15)
    np.testing.assert_allclose(cx.to_numpy(A * A), a * a, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(cx.to_numpy(A / A), np.ones_like(a), rtol=1e-13)


def test_cx_div_robust():
    a = cx.from_numpy(np.array([1e300 + 1e300j]))
    out = cx.to_numpy(a / a)
    np.testing.assert_allclose(out, 1.0, rtol=1e-12)


def test_elliptical_contour():
    k = ct.elliptical_contour_trapezoidal(1.0 + 0.5j, 2.0, 0.5, 32)
    # closed contour: rho ~ 1 at center, ~0 far outside
    # trapezoid on a 4:1 ellipse converges slower than on a circle
    rho_in = ct.rational_func(np.array([1.0 + 0.5j]), k)
    np.testing.assert_allclose(rho_in, 1.0, atol=1e-2)
    rho_out = ct.rational_func(np.array([30.0 + 0j]), k)
    assert abs(rho_out[0]) < 1e-2
    # membership
    lam = np.array([1.0 + 0.5j, 2.9 + 0.5j, 1.0 + 1.1j])
    np.testing.assert_array_equal(np.asarray(ct.in_contour(lam, k)),
                                  [True, True, False])


def test_zolotarev_contour_filter_and_feast():
    import jax
    import feast_tpu as ft
    from feast_tpu import problems

    k = ct.zolotarev_contour(0.0, 0.1, n=6, gap=0.002, spectrum_bound=4.0)
    xs = np.linspace(-0.5, 0.6, 45)
    rho = ct.rational_func(xs, k).real
    inside = (xs > 0.005) & (xs < 0.095)
    outside = (xs < -0.01) | (xs > 0.11)
    assert np.abs(rho[inside] - 1).max() < 0.02
    assert np.abs(rho[outside]).max() < 0.02
    # drives FEAST to convergence on the Laplacian slice
    L = problems.laplacian_1d(100)
    rng = np.random.default_rng(1)
    X0 = rng.standard_normal((100, 15)) + 1j * rng.standard_normal((100, 15))
    from feast_tpu.solvers import feast
    out = feast(L, X0, contour=k, iters=30, tol=1e-13)
    lam, _, r = out.filtered()
    assert len(lam) == 10 and r.max() < 1e-13


def test_cgram_matches_cmatmul():
    # cx.cgram (elementwise-reduction Gram — the TPU-accurate form) must
    # equal cmatmul(a.H, b) in exact arithmetic; on CPU both are f64.
    rng = np.random.default_rng(9)
    a = rng.standard_normal((500, 6)) + 1j * rng.standard_normal((500, 6))
    b = rng.standard_normal((500, 4)) + 1j * rng.standard_normal((500, 4))
    ac, bc = cx.as_cx(a), cx.as_cx(b)
    G1 = cx.to_numpy(cx.cgram(ac, bc))
    np.testing.assert_allclose(G1, a.conj().T @ b, rtol=1e-13)
    G2 = cx.to_numpy(cx.cgram(ac))
    np.testing.assert_allclose(G2, a.conj().T @ a, rtol=1e-13)
    np.testing.assert_allclose(G2, cx.to_numpy(cx.cmatmul(ac.H, ac)),
                               rtol=1e-13)
