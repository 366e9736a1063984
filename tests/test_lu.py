"""Blocked complex-pair LU vs numpy/scipy ground truth."""

import jax
import numpy as np
import pytest

from feast_tpu import cx
from feast_tpu.ops import lu


def _rand_c(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


@pytest.mark.parametrize("n,blk", [(5, 64), (64, 16), (130, 64), (257, 64)])
def test_solve_residual(n, blk):
    rng = np.random.default_rng(n)
    a = _rand_c(rng, n, n)
    b = _rand_c(rng, n, 7)
    X = cx.to_numpy(jax.jit(lambda A, B: lu.solve(A, B, block=blk))(
        cx.from_numpy(a), cx.from_numpy(b)))
    assert np.linalg.norm(a @ X - b) / np.linalg.norm(b) < 1e-11


def test_factor_then_multi_solve():
    # the FEAST `store=true` pattern: factor once, solve many RHS blocks
    rng = np.random.default_rng(0)
    n = 96
    a = _rand_c(rng, n, n)
    LU, perm = jax.jit(lu.lu_factor)(cx.from_numpy(a))
    for seed in (1, 2):
        b = _rand_c(np.random.default_rng(seed), n, 4)
        X = cx.to_numpy(jax.jit(lu.lu_solve)(LU, perm, cx.from_numpy(b)))
        assert np.linalg.norm(a @ X - b) < 1e-10


def test_batched_over_nodes():
    rng = np.random.default_rng(1)
    a = _rand_c(rng, 4, 50, 50)
    b = _rand_c(rng, 4, 50, 3)
    X = cx.to_numpy(jax.jit(lu.solve_batched)(cx.from_numpy(a), cx.from_numpy(b)))
    res = np.einsum("bij,bjk->bik", a, X) - b
    assert np.linalg.norm(res) < 1e-10


def test_pivoting_needed():
    # zero on the diagonal forces pivoting
    a = np.array([[0.0, 1.0], [1.0, 1.0]], dtype=np.complex128)
    b = np.array([[1.0], [2.0]], dtype=np.complex128)
    X = cx.to_numpy(lu.solve(cx.from_numpy(a), cx.from_numpy(b)))
    np.testing.assert_allclose(a @ X, b, atol=1e-14)


def test_ill_conditioned_graded():
    rng = np.random.default_rng(5)
    n = 60
    d = np.logspace(0, -10, n)
    q1, _ = np.linalg.qr(_rand_c(rng, n, n))
    q2, _ = np.linalg.qr(_rand_c(rng, n, n))
    a = q1 @ np.diag(d) @ q2
    b = _rand_c(rng, n, 2)
    X = cx.to_numpy(lu.solve(cx.from_numpy(a), cx.from_numpy(b)))
    # backward-stable: residual small even though forward error is large
    assert np.linalg.norm(a @ X - b) / np.linalg.norm(b) < 1e-5


def test_fori_loop_variant_matches_unrolled():
    """The large-n fori formulation (single aliased carry buffer, masked
    full-width trailing GEMMs, identity-extension padding) must match the
    unrolled path — it is the memory-bounded kernel that fits gun-scale
    factorizations on a 16 GB chip."""
    rng = np.random.default_rng(77)
    for n in (300, 520):
        A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        Ac = cx.from_numpy(A)
        B = cx.from_numpy(rng.standard_normal((n, 5)) + 0j)
        LU, p = lu.lu_factor(Ac, block=128, loop="fori")
        X = lu.lu_solve(LU, p, B)
        r = np.abs(A @ cx.to_numpy(X) - cx.to_numpy(B)).max()
        assert r < 1e-10 * np.abs(A).max(), (n, r)


@pytest.mark.slow
def test_lu_diag_inv_solve_matches():
    # dinv fast path (diagonal-block inverses -> GEMM substitutions) must
    # match the plain substitution solve, including a non-block-multiple n
    import jax.numpy as jnp
    from feast_tpu import cx
    from feast_tpu.ops import lu as lumod

    rng = np.random.default_rng(7)
    for n in (96, 130):
        a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        b = rng.standard_normal((n, 5)) + 1j * rng.standard_normal((n, 5))
        A = cx.from_numpy(a, jnp.float64)
        B = cx.from_numpy(b, jnp.float64)
        LU, perm = lumod.lu_factor(A)
        x_ref = cx.to_numpy(lumod.lu_solve(LU, perm, B, block=32))
        dinv = lumod.lu_diag_inv(LU, 32)
        x_fast = cx.to_numpy(lumod.lu_solve(LU, perm, B, dinv=dinv))
        np.testing.assert_allclose(x_fast, x_ref, atol=1e-10)
        # fori path with dinv
        x_fori = cx.to_numpy(lumod.lu_solve(LU, perm, B, loop="fori",
                                            dinv=dinv))
        np.testing.assert_allclose(x_fori, x_ref, atol=1e-10)
