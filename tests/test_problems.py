"""Gallery problems at the reference's BASELINE configs: butterfly quartic,
loaded_string (K=3 moments), hadeler exponential NEP, plus the io layer."""

import os

import numpy as np
import pytest

import feast_tpu as ft
from feast_tpu import cx, problems

REF_DATA = "/root/reference/data"


def _x0(rng, n, m):
    return rng.standard_normal((n, m)) + 1j * rng.standard_normal((n, m))


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference data not mounted")
def test_butterfly_generator_matches_bundled_fixture():
    _, coeffs = problems.butterfly()
    _, coeffs_f = problems.load_butterfly()
    for a, b in zip(coeffs, coeffs_f):
        np.testing.assert_allclose(a, b, atol=1e-13)


@pytest.mark.slow
def test_butterfly_nlfeast_vs_companion():
    # BASELINE row: butterfly quartic, c=1+1i r=0.5, spurious 5e-3
    T, coeffs = problems.butterfly()
    exact = ft.companion(coeffs)
    lam_e = cx.to_numpy(exact.lam)
    res_e = np.asarray(exact.res)
    c, r = 1.0 + 1.0j, 0.5
    want = np.sort_complex(lam_e[(np.abs(lam_e - c) <= r) & (res_e < 1e-8)])
    X0 = _x0(np.random.default_rng(0), 64, len(want) + 6)
    out = ft.nlfeast(T, X0, nodes=32, iters=30, c=c, r=r, tol=1e-12,
                     spurious=5e-3)
    lam, _, res = out.filtered(spurious=5e-3)
    got = np.sort_complex(lam)
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=1e-8)
    assert res.max() < 1e-12


def test_loaded_string_moments_k3():
    # BASELINE row: loaded_string, m0=14, 16 nodes, K=3, c=800 r=790.
    # Exact values from the rational NEP's quadratic linearization.
    import scipy.linalg as sla

    n, kappa, mass = 100, 1.0, 1.0
    sigma = kappa / mass
    T = problems.loaded_string(n, kappa, mass)
    # SPMF terms: (A, 1), (B, -z), (C, kappa z/(z-sigma)) — the minus lives
    # in the function, so mats[1] is +B
    A = cx.to_numpy(T.mats[0])
    B = cx.to_numpy(T.mats[1])
    C = cx.to_numpy(T.mats[2])
    lin = sla.eigvals(
        np.block([[np.zeros((n, n)), np.eye(n)],
                  [sla.solve(B, -sigma * A),
                   sla.solve(B, A + sigma * B + kappa * C)]]))
    realw = np.sort(lin[np.abs(lin.imag) < 1e-6].real)
    want = realw[(realw > 10.0) & (realw < 1590.0)]

    X0 = _x0(np.random.default_rng(0), n, 14)
    out = ft.nlfeast_moments(T, X0, nodes=16, iters=10, moments=3,
                             c=800.0 + 0j, r=790.0, tol=1e-14, spurious=1e-5)
    lam, _, res = out.filtered(spurious=1e-5)
    assert len(lam) == len(want)
    np.testing.assert_allclose(np.sort(lam.real), want, rtol=1e-10)
    assert res.max() < 1e-13


@pytest.mark.slow
def test_hadeler_nlfeast():
    # BASELINE row: hadeler, c=-30 r=10 (test/hadeler.jl:55-60)
    T = problems.hadeler(200, 100.0)
    X0 = _x0(np.random.default_rng(0), 200, 15)
    out = ft.nlfeast(T, X0, nodes=8, iters=30, c=-30.0 + 0j, r=10.0,
                     tol=1e-14, spurious=1e-2)
    lam, X, res = out.filtered(spurious=1e-2)
    assert len(lam) == 12
    assert res.max() < 1e-14
    assert (lam.real > -40).all() and (lam.real < -20).all()
    # hadeler eigenvalues in this window are real
    assert np.abs(lam.imag).max() < 1e-8


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference data not mounted")
def test_native_mmio_matches_scipy():
    from scipy.io import mmread
    import scipy.sparse as sp

    from feast_tpu import io as fio

    for name in ["quadraticM0.mtx", "system5A0.mtx", "butterflyM2.mtx"]:
        p = os.path.join(REF_DATA, name)
        a = fio.read_matrix_market(p, out="dense")
        m = mmread(p)
        b = np.asarray(m.toarray() if sp.issparse(m) else m,
                       dtype=np.complex128)
        assert np.array_equal(a, b)


def test_slice_checkpoint_roundtrip(tmp_path):
    from feast_tpu import io as fio

    rng = np.random.default_rng(0)
    A = np.diag(np.arange(1.0, 26.0)).astype(np.complex128)
    X0 = _x0(rng, 25, 5)
    out = ft.feast(A, X0, c=1.5 + 0j, r=2.0, nodes=8)
    p = str(tmp_path / "slice.npz")
    fio.save_slice(p, out, meta={"c": 1.5 + 0j, "r": 2.0})
    d = fio.load_slice(p)
    np.testing.assert_allclose(d["lam"], cx.to_numpy(out.lam))
    # warm restart from the checkpoint converges immediately
    out2 = ft.feast(A, d["X"], c=1.5 + 0j, r=2.0, nodes=8)
    assert out2.converged and out2.n_iter <= 1


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference data not mounted")
@pytest.mark.slow
def test_system5_moments_k2():
    # BASELINE row: system5 quadratic N=1000, m0=80, 32 nodes, K=2,
    # c=-1.55 r=0.05 (test/polynomial.jl:20) — 50 eigenvalues inside.
    T, _ = problems.load_system5()
    X0 = _x0(np.random.default_rng(0), 1000, 80)
    out = ft.nlfeast_moments(T, X0, nodes=32, iters=10, moments=2,
                             c=-1.55 + 0j, r=0.05, tol=1e-14, spurious=1e-6)
    lam, _, res = out.filtered(spurious=1e-6)
    assert len(lam) == 50
    assert res.max() < 1e-14
    assert out.n_iter <= 2


@pytest.mark.slow
def test_gun_like_sqrt_branch_cross_method():
    """sqrt-branch NEP (the gun problem's structure): nlfeast and
    nlfeast_moments agree to 1e-7 on the contour spectrum."""
    import scipy.linalg as sla

    T = problems.gun_like(128)
    K = cx.to_numpy(T.mats[0])
    M = cx.to_numpy(T.mats[1])
    w = np.sort(sla.eigvals(K, M).real)
    mid = len(w) // 2
    c = complex((w[mid] + w[mid + 3]) / 2, 0)
    r = (w[mid + 3] - w[mid]) / 2 + 0.3 * (w[mid + 4] - w[mid + 3])
    rng = np.random.default_rng(1)
    out = ft.nlfeast(T, _x0(rng, 128, 12), nodes=64, iters=30, c=c, r=r,
                     tol=1e-11, spurious=1e-4)
    lam1, _, r1 = out.filtered(spurious=1e-4)
    out2 = ft.nlfeast_moments(T, _x0(rng, 128, 8), nodes=64, iters=15,
                              moments=2, c=c, r=r, tol=1e-12, spurious=1e-4)
    lam2, _, r2 = out2.filtered(spurious=1e-4)
    assert len(lam1) > 0
    assert r1.max() < 1e-11 and r2.max() < 1e-12
    np.testing.assert_allclose(np.sort_complex(lam1), np.sort_complex(lam2),
                               atol=1e-7)


def test_gen_feast_qz_pencil_option():
    # full-QZ Rayleigh-Ritz path matches the LU-reduction path
    rng = np.random.default_rng(0)
    A = np.diag(np.arange(1.0, 26.0)).astype(np.complex128)
    B = np.eye(25, dtype=np.complex128)
    X0 = _x0(rng, 25, 5)
    from feast_tpu.solvers.feast import _rayleigh_ritz
    from feast_tpu.ops import qr as qrmod

    Q, _ = qrmod.cholqr2(cx.from_numpy(X0))
    Ac, Bc = cx.from_numpy(A), cx.from_numpy(B)
    lam_lu, _, _, _ = _rayleigh_ritz(Q, Ac, Bc, pencil="lu")
    lam_qz, _, _, _ = _rayleigh_ritz(Q, Ac, Bc, pencil="qz")
    np.testing.assert_allclose(np.sort(cx.to_numpy(lam_lu).real),
                               np.sort(cx.to_numpy(lam_qz).real), atol=1e-10)


@pytest.mark.slow
def test_fiber_like_moments_k10():
    """The fiber problem's K=10 stress test of the block-Hankel machinery
    (reference runs NLEVP fiber with moments=10, test/fiber.jl:26-36; the
    structure-preserving generator stands in for the offline-unavailable
    data).  Cross-validated against single-shot Beyn on a fine contour."""
    n = 256
    T = problems.fiber_like(n)
    rng = np.random.default_rng(0)
    A = cx.to_numpy(T.mats[0])
    w = np.sort(np.linalg.eigvalsh(A).real)
    c = complex((w[0] + w[5]) / 2, 0)
    r = (w[5] - w[0]) * 0.75
    out = ft.nlfeast_moments(T, _x0(rng, n, 14), nodes=32, iters=20,
                             moments=10, c=c, r=r, tol=1e-11, spurious=1e-4)
    lam, _, res = out.filtered(spurious=1e-4)
    assert out.converged
    assert len(lam) == 7
    assert res.max() < 1e-11
    ref = ft.beyn(T, _x0(rng, n, 24), nodes=256, c=c, r=r)
    lam_b = cx.to_numpy(ref.lam)
    res_b = np.asarray(ref.res)
    good = (np.abs(lam_b - c) <= r) & (res_b < 1e-8)
    np.testing.assert_allclose(np.sort_complex(lam),
                               np.sort_complex(lam_b[good]), atol=1e-8)


@pytest.mark.slow
def test_nlfeast_mixed_precision_matches_full():
    """nlfeast(mixed_prec=True): f32 node LU + SPMF-form iterative
    refinement must reproduce the f64 path to residual floor (the
    memory/speed path for gun-scale problems)."""
    import scipy.linalg as sla

    T = problems.gun_like(128)
    K = cx.to_numpy(T.mats[0])
    M = cx.to_numpy(T.mats[1])
    w = np.sort(sla.eigvals(K, M).real)
    mid = len(w) // 2
    c = complex((w[mid] + w[mid + 3]) / 2, 0)
    r = (w[mid + 3] - w[mid]) / 2 + 0.3 * (w[mid + 4] - w[mid + 3])
    X0 = _x0(np.random.default_rng(1), 128, 12)
    out = ft.nlfeast(T, X0, nodes=64, iters=30, c=c, r=r, tol=1e-11,
                     spurious=1e-4, mixed_prec=True)
    lam1, _, r1 = out.filtered(spurious=1e-4)
    out2 = ft.nlfeast(T, X0, nodes=64, iters=30, c=c, r=r, tol=1e-11,
                      spurious=1e-4)
    lam2, _, r2 = out2.filtered(spurious=1e-4)
    assert r1.max() < 1e-11 and r2.max() < 1e-11
    np.testing.assert_allclose(np.sort_complex(lam1), np.sort_complex(lam2),
                               atol=1e-9)


@pytest.mark.skipif(os.environ.get("RUN_GUN_FULL") != "1",
                    reason="reference-scale gun run (N=9956, m0=84): set "
                           "RUN_GUN_FULL=1; sized for TPU, hours on CPU")
def test_gun_full_scale():
    """BASELINE row: gun NLEP at reference scale — N=9956, m0=84, 16
    nodes (test/paper_exact.jl:102-104) — converged set at res <= 1e-10.
    Run via benchmarks/gun.py on the real chip; this gate reuses it."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gun_bench", os.path.join(os.path.dirname(__file__), "..",
                                  "benchmarks", "gun.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    result = mod.run(n=9956, m0=84, nodes=16)
    assert result["converged"]
    assert result["max_res_nonspurious"] <= 1e-10
    assert result["found"] > 0
