"""Experimental moment variants + the fixed nlfeast_opt (ggev) path."""

import os

import numpy as np
import pytest

import feast_tpu as ft
from feast_tpu import cx

REF_DATA = "/root/reference/data"


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


@pytest.fixture(scope="module")
def quad():
    rng = np.random.default_rng(42)
    n = 20
    coeffs = [_rand_c(rng, n, n), _rand_c(rng, n, n), _rand_c(rng, n, n)]
    exact = ft.companion(coeffs)
    lam_e = cx.to_numpy(exact.lam)
    res_e = np.asarray(exact.res)
    c, r = 0.0 + 0.0j, 0.6
    want = np.sort_complex(lam_e[(np.abs(lam_e - c) <= r) & (res_e < 1e-10)])
    X0 = _rand_c(np.random.default_rng(1), n, len(want) + 3)
    return ft.PolynomialNEP(coeffs), X0, want, c, r


@pytest.mark.parametrize("solver", [ft.nlfeast_moments_all,
                                    ft.nlfeast_moments_ss, ft.nlfeast_rr])
def test_variant_finds_contour_spectrum(quad, solver):
    T, X0, want, c, r = quad
    out = solver(T, X0, nodes=32, iters=20, c=c, r=r, tol=1e-10,
                 spurious=1e-3)
    lam, Y, res = out.filtered(spurious=1e-3)
    got = np.sort_complex(lam)
    assert len(got) >= len(want)
    for w in want:
        assert np.min(np.abs(got - w)) < 1e-6


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference data not mounted")
def test_deficient_quadratic_ss():
    """The rank-deficient bundled quadratic: lam=-0.2 and 0.1 share an
    eigenvector; the SS left-projection separates them (deficient.jl)."""
    from scipy.io import mmread

    def _load(p):
        m = mmread(os.path.join(REF_DATA, p))
        return np.asarray(m.toarray() if hasattr(m, "toarray") else m,
                          dtype=np.complex128)

    A0, A1 = _load("quadraticM0.mtx"), _load("quadraticM1.mtx")
    T = ft.PolynomialNEP([A0 - 0.02 * A1, 0.1 * A1, A1])
    X0 = _rand_c(np.random.default_rng(2), 15, 6)
    out = ft.nlfeast_moments_ss(T, X0, nodes=16, iters=3, moments=2,
                                c=0.0 + 0.0j, r=0.25, tol=1e-13,
                                spurious=1e-3)
    lam, _, _ = out.filtered(spurious=1e-3)
    got = np.sort_complex(lam)
    for w in [-0.2, 0.1, 0.18860258 + 0.12196412j, 0.18860258 - 0.12196412j]:
        assert np.min(np.abs(got - w)) < 1e-6
