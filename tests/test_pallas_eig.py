"""Whole-Schur Pallas kernel (ops/pallas_eig.py) — interpret-mode
correctness against numpy (the kernel is an f32 TPU launch-fusion
optimization of ops/eig.schur; semantics must match).  Real-chip
validation lives in the r4 notes: 28.6 ms vs 97 ms XLA at n=48."""

import jax.numpy as jnp
import numpy as np
import pytest

from feast_tpu import cx
from feast_tpu.ops import pallas_eig


def _check(Ah, T, Z, tol):
    n = Ah.shape[0]
    Th = np.asarray(T.re) + 1j * np.asarray(T.im)
    Zh = np.asarray(Z.re) + 1j * np.asarray(Z.im)
    scale = max(np.abs(Ah).max(), 1.0)
    assert np.abs(Zh.conj().T @ Zh - np.eye(n)).max() < tol
    assert np.abs(Zh @ Th @ Zh.conj().T - Ah).max() / scale < tol
    assert np.abs(np.tril(Th, -1)).max() == 0.0  # exact triangularity
    ev = np.sort_complex(np.diag(Th))
    evr = np.sort_complex(np.linalg.eigvals(Ah.astype(np.complex128)))
    assert np.abs(ev - evr).max() / np.abs(evr).max() < tol


@pytest.mark.parametrize("n,seed", [(2, 0), (8, 1), (33, 2), (48, 3)])
def test_schur_pallas_random(n, seed):
    rng = np.random.default_rng(seed)
    Ah = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = cx.from_numpy(Ah, jnp.float32)
    T, Z = pallas_eig.schur_pallas(A, interpret=True)
    _check(Ah, T, Z, 2e-5)


def test_schur_pallas_defective_and_real():
    # repeated eigenvalues (Jordan-ish) + a purely real matrix
    n = 12
    rng = np.random.default_rng(5)
    J = np.diag(np.full(n, 2.0)) + np.diag(np.ones(n - 1), 1)
    S = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Ah = S @ J @ np.linalg.inv(S)
    A = cx.from_numpy(Ah, jnp.float32)
    T, Z = pallas_eig.schur_pallas(A, interpret=True)
    Th = np.asarray(T.re) + 1j * np.asarray(T.im)
    Zh = np.asarray(Z.re) + 1j * np.asarray(Z.im)
    assert np.abs(Zh.conj().T @ Zh - np.eye(n)).max() < 2e-5
    # defective clusters: eigenvalues accurate only to sqrt-ish of eps;
    # check the mean (trace is exact) and the reconstruction
    scale = np.abs(Ah).max()
    assert np.abs(Zh @ Th @ Zh.conj().T - Ah).max() / scale < 2e-5
    assert abs(np.diag(Th).mean() - 2.0) < 1e-3

    R = rng.standard_normal((8, 8))  # real spectrum pairs stay real-ish
    A = cx.from_numpy(R + 0j, jnp.float32)
    T, Z = pallas_eig.schur_pallas(A, interpret=True)
    _check(R + 0j, T, Z, 5e-5)


def test_schur_backend_gate_cpu_falls_back():
    # on the forced-CPU test backend the gate must route to the XLA path
    from feast_tpu.ops import eig as eigmod

    n = 6
    rng = np.random.default_rng(7)
    Ah = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = cx.from_numpy(Ah, jnp.float32)
    assert eigmod._SCHUR_BACKEND == "pallas"  # default
    T, Z = eigmod.schur(A)  # CPU backend -> XLA formulation, no pallas
    Th = np.asarray(T.re) + 1j * np.asarray(T.im)
    ev = np.sort_complex(np.diag(Th))
    evr = np.sort_complex(np.linalg.eigvals(Ah))
    assert np.abs(ev - evr).max() / np.abs(evr).max() < 1e-4


def test_eig_mixed_accuracy():
    """f32 Schur + f64 RQI polish reaches f64-grade residuals whenever the
    f32 stage resolves the spectrum (the TPU fine-tier RR path)."""
    from feast_tpu.ops import eig as eigmod

    rng = np.random.default_rng(11)
    n = 32
    for Ah in (
        rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)),
        # moderately clustered (resolvable at f32)
        None,
    ):
        if Ah is None:
            S = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
            lam = 1.0 + 1e-3 * (rng.standard_normal(n)
                                + 1j * rng.standard_normal(n))
            Ah = S @ np.diag(lam) @ np.linalg.inv(S)
        A = cx.from_numpy(Ah, jnp.float64)
        w, V = eigmod.eig_mixed(A, ii_steps=3)
        wh = np.asarray(w.re) + 1j * np.asarray(w.im)
        Vh = np.asarray(V.re) + 1j * np.asarray(V.im)
        res = np.linalg.norm(Ah @ Vh - Vh * wh[None, :], axis=0).max()
        scale = np.linalg.norm(Ah)
        assert res / scale < 1e-12, res
        ref = np.sort_complex(np.linalg.eigvals(Ah))
        assert np.abs(np.sort_complex(wh) - ref).max() / np.abs(ref).max() \
            < 1e-10


def test_eig_mixed_guard_detects_cluster():
    """A sub-f32 cluster defeats the RQI polish; the eig() guard metric
    (reduced residual) must flag it so lax.cond falls back to full f64."""
    from feast_tpu.ops import eig as eigmod

    rng = np.random.default_rng(12)
    n = 24
    S = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    lam = 1.0 + 1e-8 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    Ah = S @ np.diag(lam) @ np.linalg.inv(S)
    A = cx.from_numpy(Ah, jnp.float64)
    w, V = eigmod.eig_mixed(A, ii_steps=3)
    wh = np.asarray(w.re) + 1j * np.asarray(w.im)
    Vh = np.asarray(V.re) + 1j * np.asarray(V.im)
    res = np.linalg.norm(Ah @ Vh - Vh * wh[None, :], axis=0).max()
    scale = float(np.linalg.norm(Ah))
    # the guard threshold used in eig(): 1e-12 * fro * sqrt(n)
    assert res > 1e-12 * scale * n ** 0.5, \
        "cluster unexpectedly converged; guard threshold may be too loose"


def test_gen_eig_mixed_accuracy():
    """Pencil analog: f32 Schur seed + batched f64 pencil RQI (the
    generalized fine-tier RR path on TPU)."""
    import scipy.linalg as sla

    from feast_tpu.ops import eig as eigmod

    rng = np.random.default_rng(14)
    n = 24
    Ah = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Bh = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)) \
        + 4 * np.eye(n)
    A = cx.from_numpy(Ah, jnp.float64)
    B = cx.from_numpy(Bh, jnp.float64)
    w, V = eigmod._gen_eig_mixed(A, B)
    wh = np.asarray(w.re) + 1j * np.asarray(w.im)
    Vh = np.asarray(V.re) + 1j * np.asarray(V.im)
    R = Ah @ Vh - (Bh @ Vh) * wh[None, :]
    scale = np.linalg.norm(Ah) + np.abs(wh).max() * np.linalg.norm(Bh)
    assert np.linalg.norm(R, axis=0).max() / scale < 1e-13
    ref = np.sort_complex(sla.eig(Ah, Bh, right=False))
    assert np.abs(np.sort_complex(wh) - ref).max() / np.abs(ref).max() < 1e-11


def test_schur_pallas_want_y_matches_xla_backsub():
    """want_y returns the in-kernel tri_eigvecs/tri_unit_inv results —
    must match the XLA back-substitutions on the same T."""
    from feast_tpu.ops import eig as eigmod

    rng = np.random.default_rng(21)
    n = 24
    Ah = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = cx.from_numpy(Ah, jnp.float32)
    T, Z, Y, X = pallas_eig.schur_pallas(A, want_y=True, interpret=True)
    Yx = eigmod.tri_eigvecs(T)
    Xx = eigmod.tri_unit_inv(Yx)
    for got, ref in ((Y, Yx), (X, Xx)):
        d = np.abs((np.asarray(got.re) + 1j * np.asarray(got.im))
                   - (np.asarray(ref.re) + 1j * np.asarray(ref.im))).max()
        assert d < 5e-5, d
    # V = Z Y are eigenvectors of A
    Th = np.asarray(T.re) + 1j * np.asarray(T.im)
    V = (np.asarray(Z.re) + 1j * np.asarray(Z.im)) @ \
        (np.asarray(Y.re) + 1j * np.asarray(Y.im))
    V = V / np.linalg.norm(V, axis=0, keepdims=True)
    lam = np.diag(Th)
    res = np.linalg.norm(Ah @ V - V * lam[None, :], axis=0).max()
    assert res / np.abs(Ah).max() < 5e-5


def test_pallas_gates_reject_batch_tracers(monkeypatch):
    """vmap + pallas is broken under x64 (Mosaic cannot legalize the i64
    index-map returns the grid-batching rule emits — measured on chip);
    both gates must route batch tracers to XLA even on a TPU backend."""
    import jax

    from feast_tpu.ops import eig as eigmod

    monkeypatch.setattr(eigmod.jax, "default_backend", lambda: "tpu")
    seen = []

    def probe(x):
        seen.append(eigmod._pallas_gate(jnp.float32, 8, x))
        return x

    jax.vmap(probe)(jnp.zeros((2, 8, 8), jnp.float32))
    assert seen == [False]  # batch tracer -> XLA
    assert eigmod._pallas_gate(jnp.float32, 8,
                               jnp.zeros((8, 8), jnp.float32)) is True
    assert eigmod._pallas_gate(jnp.float64, 8,
                               jnp.zeros((8, 8), jnp.float32)) is False
