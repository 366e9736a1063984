"""Multi-chip sharding: node-sharded execution matches single-device results.

The reference has NO working distributed path (SURVEY.md section 2.3); these
tests validate the new capability on the virtual 8-device CPU mesh: sharding
the contour-node axis across devices must reproduce the single-device answer
to bitwise-rounding tolerance (deterministic psum ordering).
"""

import jax
import numpy as np
import pytest

import feast_tpu as ft
from feast_tpu.parallel import node_mesh, shard_nodes


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    A = np.diag(np.arange(1.0, 26.0)).astype(np.complex128)
    X0 = rng.standard_normal((25, 5)) + 1j * rng.standard_normal((25, 5))
    return A, X0


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_feast_node_sharded_matches_single(problem):
    A, X0 = problem
    r_single = ft.feast(A, X0, c=1.5 + 0j, r=2.0, nodes=8)
    mesh = node_mesh(8)
    r_shard = ft.feast(A, X0, c=1.5 + 0j, r=2.0, nodes=8, mesh=mesh)
    lam_s, _, res_s = r_single.filtered()
    lam_p, _, res_p = r_shard.filtered()
    np.testing.assert_allclose(np.sort_complex(lam_p), np.sort_complex(lam_s),
                               atol=1e-12)
    assert res_p.max() < 1e-12


def test_gen_feast_node_sharded(problem):
    A, X0 = problem
    B = np.eye(25, dtype=np.complex128)
    mesh = node_mesh(4)  # nodes=8 over 4 devices: 2 nodes per device
    r_shard = ft.gen_feast(A, B, X0, c=1.5 + 0j, r=2.0, nodes=8, mesh=mesh)
    lam_p, _, res_p = r_shard.filtered()
    np.testing.assert_allclose(np.sort(lam_p.real), [1.0, 2.0, 3.0],
                               atol=1e-10)


def test_shard_nodes_places_on_devices():
    import jax.numpy as jnp
    from feast_tpu import cx
    mesh = node_mesh(8)
    x = cx.from_numpy(np.arange(16, dtype=np.complex128).reshape(16, 1))
    xs = shard_nodes(x, mesh)
    assert len(xs.re.sharding.device_set) == 8


@pytest.mark.slow
def test_feast_sliced_laplacian():
    from feast_tpu import problems
    from feast_tpu.parallel import feast_sliced

    n = 200
    L = problems.laplacian_1d(n)
    exact = 2.0 - 2.0 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1))
    out = feast_sliced(L, (0.0, 0.2), 3, nodes=8, iters=25, tol=1e-12)
    want = np.sort(exact[(exact > 0.0) & (exact < 0.2)])
    got = np.sort(out.lam.real)
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=1e-10)
    assert out.res.max() < 1e-11


def test_row_sharded_tsqr():
    """CholeskyQR over a row-sharded mesh: the Gram matrix is a psum over
    the `row` axis (the TSQR pattern); result matches the unsharded QR."""
    from jax.sharding import Mesh
    from feast_tpu import cx
    from feast_tpu.parallel import row_sharded_qr

    rng = np.random.default_rng(0)
    n, m = 512, 16
    a = rng.standard_normal((n, m)) + 1j * rng.standard_normal((n, m))
    mesh = Mesh(np.array(jax.devices()[:8]), ("row",))
    Q, R = row_sharded_qr(cx.from_numpy(a), mesh)
    Qn, Rn = cx.to_numpy(Q), cx.to_numpy(R)
    assert np.abs(Qn.conj().T @ Qn - np.eye(m)).max() < 1e-13
    assert np.abs(Qn @ Rn - a).max() < 1e-13


@pytest.mark.slow
def test_feast_sliced_parallel_matches_sequential():
    """Slice-axis parallel execution (VERDICT r1 #5): 4 slices stacked and
    sharded over a 4-device `slice` mesh in ONE jit; results must match the
    sequential host-loop driver, the per-device program must carry only
    S/d slices, and the module must contain no cross-slice collectives
    (wall ~ max over slices by construction)."""
    from jax.sharding import Mesh

    from feast_tpu.parallel import feast_sliced, feast_sliced_parallel
    from feast_tpu.parallel.rowsharded import largest_allgather_elems
    from feast_tpu.problems import laplacian_1d

    n = 120
    L = laplacian_1d(n)
    exact = 2 - 2 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    want = np.sort(exact[(exact > 0.0) & (exact < 0.2)])
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("slice",))
    hlo = []
    out = feast_sliced_parallel(L, (0.0, 0.2), 4, nodes=8, iters=25,
                                tol=1e-12, mesh=mesh, hlo_sink=hlo)
    np.testing.assert_allclose(np.sort(out.lam.real), want, atol=1e-9)
    assert out.res.max() < 1e-11
    ref = feast_sliced(L, (0.0, 0.2), 4, nodes=8, iters=25, tol=1e-12)
    np.testing.assert_allclose(np.sort(out.lam.real), np.sort(ref.lam.real),
                               atol=1e-9)
    # structural parallelism guarantees from the compiled SPMD module:
    txt = hlo[0]
    assert largest_allgather_elems(txt) == 0, "unexpected all-gather"
    # the ONLY cross-slice traffic allowed is the 1-bit while-loop
    # termination vote (pred[] all-reduce) — no data ever crosses slices
    import re

    for m in re.finditer(r"=\s*([^=\n]*?)\s*all-reduce", txt):
        shapes = re.findall(r"\[([0-9,]*)\]", m.group(1))
        for s in shapes:
            assert s == "", f"non-scalar all-reduce across slices: {s}"
    # per-device parameter shapes carry S/d = 1 slice of the LU batch
    assert f"f64[1,8,{n},{n}]" in txt, "slice batch not partitioned"


@pytest.mark.slow
def test_feast_sliced_parallel_generalized():
    """Slice-parallel driver with a generalized pencil (B != None)."""
    from jax.sharding import Mesh

    from feast_tpu.parallel import feast_sliced_parallel
    from feast_tpu.problems import laplacian_1d

    n = 100
    A = laplacian_1d(n)
    i = np.arange(n)
    B = np.diag(1.0 + 0.5 * np.sin(i)).astype(np.complex128)
    import scipy.linalg as sla

    w = np.sort(sla.eigh(A, B, eigvals_only=True))
    lo, hi = 0.0, float(w[14] + 0.3 * (w[15] - w[14]))
    want = w[(w > lo) & (w < hi)]
    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("slice",))
    out = feast_sliced_parallel(A, (lo, hi), 2, B=B, nodes=8, iters=25,
                                tol=1e-11, mesh=mesh)
    np.testing.assert_allclose(np.sort(out.lam.real), want, atol=1e-8)
    assert out.res.max() < 1e-10
