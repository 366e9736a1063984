"""Library-level crash-resilient checkpointed stepping
(feast_tpu.orchestrate): one refinement sweep per subprocess, atomic
checkpoints, restart-from-checkpoint after an injected mid-sweep worker
death (the VERDICT r2 'survives a killed worker in a test-style harness'
criterion)."""

import json
import os

import numpy as np
import pytest
import scipy.sparse as sp

from feast_tpu import cx, problems
from feast_tpu.orchestrate import feast_iterative_checkpointed
from feast_tpu.solvers.ifeast import feast_iterative


def _slice_problem(n=400):
    A = problems.laplacian_1d(n, sparse=True)
    exact = 2 - 2 * np.cos(np.arange(1, 8) * np.pi / (n + 1))
    c = (exact[0] + exact[4]) / 2
    r = (exact[4] - exact[0]) * 0.75
    rng = np.random.default_rng(3)
    X0 = rng.standard_normal((n, 8)) + 1j * rng.standard_normal((n, 8))
    return A, X0, complex(c), float(r), exact[:5]


@pytest.mark.slow
def test_checkpointed_matches_inprocess(tmp_path):
    """Sweep-per-subprocess must reproduce the in-process driver exactly
    (keep_q/nit0 continuation contract) and converge to the same slice."""
    A, X0, c, r, exact = _slice_problem()
    kw = dict(r=r, nodes=8, tol=1e-10, precondition="amg",
              solve_tol=1e-10, solve_iters=200)
    ref = feast_iterative(A, None, X0, c=c, iters=10, **kw)
    out = feast_iterative_checkpointed(
        A, None, X0, c=c, checkpoint_dir=str(tmp_path / "ck"),
        max_sweeps=10, platform="cpu", verbose=False, **kw)
    assert out.converged
    lam, _, res = out.filtered()
    assert len(lam) == 5
    np.testing.assert_allclose(np.sort(lam.real), exact, rtol=1e-8)
    assert res.max() < 1e-10
    assert out.n_iter == ref.n_iter + 1  # sweeps = refinement iters + final RR
    ref_lam, _, ref_res = ref.filtered()
    np.testing.assert_allclose(np.sort(lam.real), np.sort(ref_lam.real),
                               rtol=1e-12)


@pytest.mark.slow
def test_checkpointed_survives_killed_worker(tmp_path):
    """Inject a one-shot worker death AFTER the sweep's compute but BEFORE
    the checkpoint (the realistic mid-sweep loss).  The orchestrator must
    restart from the last checkpoint and still converge to 1e-10."""
    A, X0, c, r, exact = _slice_problem()
    marker = str(tmp_path / "crashed.marker")
    out = feast_iterative_checkpointed(
        A, None, X0, c=c, checkpoint_dir=str(tmp_path / "ck"),
        max_sweeps=10, max_restarts=3, platform="cpu", verbose=False,
        worker_env={"FEAST_ORCH_CRASH_ONCE": marker},
        r=r, nodes=8, tol=1e-10, precondition="amg",
        solve_tol=1e-10, solve_iters=200)
    assert os.path.exists(marker), "crash was never injected"
    assert out.converged
    lam, _, res = out.filtered()
    assert len(lam) == 5
    np.testing.assert_allclose(np.sort(lam.real), exact, rtol=1e-8)
    assert res.max() < 1e-10
    # the log must record the restart event
    with open(tmp_path / "ck" / "log.jsonl") as f:
        events = [json.loads(l)["event"] for l in f]
    assert "worker_restart" in events


def test_deterministic_failure_aborts_early_with_forensics(tmp_path):
    """A worker that dies the same way twice with zero progress must abort
    after exactly 2 attempts (not max_restarts), and each worker_restart
    event must carry the worker's stderr tail (r3 burned 11 blind retries
    with no recorded diagnosis)."""
    A, X0, c, r, _ = _slice_problem(100)
    with pytest.raises(RuntimeError, match="failed twice identically"):
        feast_iterative_checkpointed(
            builder="feast_tpu.orchestrate_testutil:build_broken",
            X0=X0, c=c, checkpoint_dir=str(tmp_path / "ck"),
            max_sweeps=5, max_restarts=10, platform="cpu", verbose=False,
            r=r, nodes=4, tol=1e-8)
    with open(tmp_path / "ck" / "log.jsonl") as f:
        events = [json.loads(l) for l in f]
    restarts = [e for e in events if e["event"] == "worker_restart"]
    assert len(restarts) == 2  # early abort, not max_restarts=10
    for e in restarts:
        tail = "\n".join(e["stderr_tail"])
        assert "injected deterministic builder failure" in tail
    from feast_tpu.orchestrate import read_restarts
    assert read_restarts(str(tmp_path / "ck")) == 2


@pytest.mark.slow
def test_checkpointed_resume_and_builder(tmp_path):
    """resume=True continues from state.npz; builder= delivers the problem
    without serialization (the path for problems too big to pickle)."""
    A, X0, c, r, exact = _slice_problem()
    cdir = str(tmp_path / "ck")
    kw = dict(r=r, nodes=8, tol=1e-10, precondition="amg",
              solve_tol=1e-10, solve_iters=200)
    # run 2 sweeps, stop, then resume to convergence with the builder path
    out1 = feast_iterative_checkpointed(
        builder="feast_tpu.orchestrate_testutil:build_slice_problem",
        builder_kwargs={"n": 400}, X0=np.asarray(cx.to_numpy(
            cx.from_numpy(X0))), c=c, checkpoint_dir=cdir,
        max_sweeps=2, platform="cpu", verbose=False, **kw)
    assert not out1.converged and out1.n_iter == 2
    out2 = feast_iterative_checkpointed(
        builder="feast_tpu.orchestrate_testutil:build_slice_problem",
        builder_kwargs={"n": 400}, c=c, checkpoint_dir=cdir,
        max_sweeps=10, platform="cpu", verbose=False, **kw)
    assert out2.converged and out2.n_iter > 2
    lam, _, res = out2.filtered()
    np.testing.assert_allclose(np.sort(lam.real), exact, rtol=1e-8)
    assert res.max() < 1e-10
