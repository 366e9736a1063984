"""Pallas panel-LU kernel (ops/pallas_lu.py) — interpret-mode correctness
against the XLA blocked LU and scipy (the kernel itself is an f32 TPU
launch-fusion optimization; semantics must match ops/lu.py exactly)."""

import jax
import numpy as np
import pytest

from feast_tpu import cx
from feast_tpu.ops import lu as lumod
from feast_tpu.ops import pallas_lu


@pytest.mark.parametrize("n,block", [(64, 32), (96, 32)])
def test_pallas_lu_reconstructs(n, block):
    rng = np.random.default_rng(2)
    Ah = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = cx.from_numpy(Ah, np.float32)
    LU, perm = pallas_lu.lu_factor_pallas(A, block=block, interpret=True)
    LUh = np.asarray(LU.re) + 1j * np.asarray(LU.im)
    L = np.tril(LUh, -1) + np.eye(n)
    U = np.triu(LUh)
    err = np.abs(L @ U - Ah[np.asarray(perm)]).max() / np.abs(Ah).max()
    assert err < 5e-6, err
    # |L| <= 1 from partial pivoting
    assert np.abs(np.tril(LUh, -1)).max() <= 1.0 + 1e-6


def test_pallas_lu_solve_roundtrip_and_vmap():
    rng = np.random.default_rng(3)
    n, block, nodes = 96, 32, 2
    Ah = (rng.standard_normal((nodes, n, n))
          + 1j * rng.standard_normal((nodes, n, n))
          + 3.0 * np.eye(n)[None])
    A = cx.from_numpy(Ah, np.float32)
    fac = jax.vmap(lambda M: pallas_lu.lu_factor_pallas(
        M, block=block, interpret=True))
    LU, perm = fac(A)
    B = cx.from_numpy(rng.standard_normal((n, 3))
                      + 1j * rng.standard_normal((n, 3)), np.float32)
    for i in range(nodes):
        X = lumod.lu_solve(cx.CX(LU.re[i], LU.im[i]), perm[i], B)
        R = cx.to_numpy(B) - Ah[i] @ cx.to_numpy(X)
        assert np.abs(R).max() / np.abs(cx.to_numpy(B)).max() < 1e-4


def test_pallas_lu_zero_pivot_guard():
    # a singular matrix must produce finite output (eps-substituted pivot)
    n = 64
    Ah = np.zeros((n, n), complex)
    Ah[: n // 2, : n // 2] = np.eye(n // 2)  # rank n/2
    A = cx.from_numpy(Ah, np.float32)
    LU, perm = pallas_lu.lu_factor_pallas(A, block=32, interpret=True)
    assert np.isfinite(np.asarray(LU.re)).all()
    assert np.isfinite(np.asarray(LU.im)).all()


def test_explicit_pallas_selection_fails_fast():
    """ADVICE r4: explicit lu_factor(loop='pallas') bypasses the auto
    gating; it must fail with a readable error, not an opaque Mosaic
    lowering failure."""
    import jax.numpy as jnp
    import pytest

    from feast_tpu import cx as _cx
    from feast_tpu.ops import lu as lumod

    rng = np.random.default_rng(0)
    A64 = _cx.from_numpy(
        rng.standard_normal((256, 256)) + 1j * rng.standard_normal((256, 256)),
        jnp.float64)
    with pytest.raises(ValueError, match="f32"):
        lumod.lu_factor(A64, loop="pallas")
    A32 = A64.astype(jnp.float32)
    with pytest.raises(ValueError, match="TPU backend"):
        lumod.lu_factor(A32, loop="pallas")  # tests force the CPU backend
    # non-multiple block is rejected before dtype/backend dispatch too
    from feast_tpu.ops import pallas_lu
    with pytest.raises(ValueError, match="block"):
        pallas_lu.lu_factor_pallas(A32, block=100, interpret=True)
