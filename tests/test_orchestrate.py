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


def test_n_sweeps_counts_executed_node_solves():
    """ADVICE r4: n_sweeps must count node-solve sweeps actually EXECUTED
    — the fused-step path sweeps before its convergence check (so a
    converged call still spent one sweep), while a chunked call that
    converges at entry spends zero."""
    A, X0, c, r, _ = _slice_problem(100)
    kw = dict(r=r, nodes=4, tol=1e-9, precondition="amg",
              solve_tol=1e-10, solve_iters=200)
    # fused-step path, fixed 3-sweep budget, far from converged after 0
    out = feast_iterative(A, None, X0, c=c, iters=2, keep_q=True, **kw)
    if not out.converged:
        assert out.n_sweeps == 3  # every loop iteration ran a sweep
    else:
        assert out.n_sweeps == out.n_iter + 1
    # run to convergence, then a converged-at-entry CHUNKED call
    full = feast_iterative(A, None, X0, c=c, iters=15, keep_q=True, **kw)
    assert full.converged
    again = feast_iterative(A, None, full.Q, c=c, iters=0, keep_q=True,
                            nit0=full.n_iter, node_chunk=2, **kw)
    assert again.converged
    assert again.n_sweeps == 0  # chunked path checks BEFORE the sweep


def test_warm_restart_continuation():
    """Two single-sweep calls stitched with (Q, warm) must reproduce the
    one two-sweep in-process call exactly — the cross-worker Krylov
    warm-start contract (VERDICT r4 #4)."""
    A, X0, c, r, _ = _slice_problem(200)
    # solve budget far below convergence (8 iters at tol 1e-12): the node
    # solutions then depend strongly on x0, so warm state is load-bearing
    kw = dict(r=r, nodes=4, tol=1e-13, precondition="jacobi",
              solve_tol=1e-12, solve_iters=8)
    full = feast_iterative(A, None, X0, c=c, iters=1, keep_q=True,
                           keep_warm=True, **kw)
    s1 = feast_iterative(A, None, X0, c=c, iters=0, keep_q=True,
                         keep_warm=True, **kw)
    assert s1.warm is not None and s1.warm.shape == (4, 200, 8)
    s2 = feast_iterative(A, None, s1.Q, c=c, iters=0, nit0=1,
                         warm0=cx.to_numpy(s1.warm), keep_q=True,
                         keep_warm=True, **kw)
    np.testing.assert_allclose(cx.to_numpy(s2.lam), cx.to_numpy(full.lam),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(cx.to_numpy(s2.Q), cx.to_numpy(full.Q),
                               rtol=1e-9, atol=1e-12)
    # and a COLD second sweep must NOT reproduce it (otherwise this test
    # proves nothing about warm starts at these loose solve budgets)
    cold = feast_iterative(A, None, s1.Q, c=c, iters=0, nit0=1,
                           keep_q=True, **kw)
    assert not np.allclose(cx.to_numpy(cold.Q), cx.to_numpy(full.Q),
                           rtol=1e-9, atol=1e-12)


def test_warm_roundtrips_through_reorder():
    """warm blocks follow the caller's row numbering across an RCM
    reorder: permuted problem + warm0 from a previous call must continue
    exactly like the unpermuted run."""
    rng = np.random.default_rng(5)
    n = 150
    A = problems.laplacian_1d(n, sparse=True)
    p = rng.permutation(n)
    Ap = sp.csr_matrix(A)[p][:, p].tocsr()  # scrambled: forces RCM
    X0 = rng.standard_normal((n, 6)) + 1j * rng.standard_normal((n, 6))
    exact = 2 - 2 * np.cos(np.arange(1, 6) * np.pi / (n + 1))
    c = complex((exact[0] + exact[3]) / 2)
    r = float((exact[3] - exact[0]) * 0.75)
    kw = dict(r=r, nodes=4, tol=1e-13, precondition="amg",
              solve_tol=1e-8, solve_iters=25, reorder="rcm")
    s1 = feast_iterative(Ap, None, X0[p], c=c, iters=0, keep_q=True,
                         keep_warm=True, **kw)
    s2 = feast_iterative(Ap, None, s1.Q, c=c, iters=0, nit0=1,
                         warm0=s1.warm, keep_q=True, keep_warm=True, **kw)
    full = feast_iterative(Ap, None, X0[p], c=c, iters=1, keep_q=True,
                           keep_warm=True, **kw)
    np.testing.assert_allclose(cx.to_numpy(s2.lam), cx.to_numpy(full.lam),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(cx.to_numpy(s2.warm), cx.to_numpy(full.warm),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_checkpointed_persists_warm_starts(tmp_path):
    """The orchestrator must checkpoint warm blocks in state.npz and the
    stitched run must still converge to the exact slice."""
    A, X0, c, r, exact = _slice_problem()
    cdir = str(tmp_path / "ck")
    kw = dict(r=r, nodes=8, tol=1e-10, precondition="amg",
              solve_tol=1e-10, solve_iters=200)
    out1 = feast_iterative_checkpointed(
        A, None, X0, c=c, checkpoint_dir=cdir, max_sweeps=2,
        platform="cpu", verbose=False, **kw)
    assert not out1.converged
    with np.load(os.path.join(cdir, "state.npz")) as st:
        assert "warm" in st.files
        assert st["warm"].shape == (8, 400, 8)
    out2 = feast_iterative_checkpointed(
        A, None, X0, c=c, checkpoint_dir=cdir, max_sweeps=12,
        platform="cpu", verbose=False, **kw)
    assert out2.converged
    lam, _, res = out2.filtered()
    np.testing.assert_allclose(np.sort(lam.real), exact, rtol=1e-8)
    assert res.max() < 1e-10


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


def test_transient_crash_signature_retries_to_max_restarts(tmp_path):
    """The remote-backend "TPU worker process crashed" signature is
    TRANSIENT: two identical ones in a row must NOT fire the
    deterministic-failure abort (r5: that misclassification aborted a
    healthy 100k run after two real axon crashes) — the orchestrator
    retries until max_restarts."""
    A, X0, c, r, _ = _slice_problem(100)
    with pytest.raises(RuntimeError, match="failed 4 times"):
        feast_iterative_checkpointed(
            builder="feast_tpu.orchestrate_testutil:build_transient_crash",
            X0=X0, c=c, checkpoint_dir=str(tmp_path / "ck"),
            max_sweeps=5, max_restarts=3, platform="cpu", verbose=False,
            r=r, nodes=4, tol=1e-8)
    with open(tmp_path / "ck" / "log.jsonl") as f:
        events = [json.loads(l) for l in f]
    restarts = [e for e in events if e["event"] == "worker_restart"]
    assert len(restarts) == 4  # max_restarts exhausted, no early abort


@pytest.mark.slow
def test_multi_sweep_worker_checkpoints_each_sweep(tmp_path):
    """sweeps_per_worker > 1 must still checkpoint after EVERY sweep (one
    fused block call only checkpointed at block end, so a mid-block
    worker loss erased completed sweeps — r5).  The log must carry one
    strictly-incrementing sweep event per executed sweep."""
    A, X0, c, r, exact = _slice_problem()
    out = feast_iterative_checkpointed(
        A, None, X0, c=c, checkpoint_dir=str(tmp_path / "ck"),
        max_sweeps=10, sweeps_per_worker=4, platform="cpu", verbose=False,
        r=r, nodes=8, tol=1e-10, precondition="amg",
        solve_tol=1e-10, solve_iters=200)
    assert out.converged
    lam, _, res = out.filtered()
    np.testing.assert_allclose(np.sort(lam.real), exact, rtol=1e-8)
    with open(tmp_path / "ck" / "log.jsonl") as f:
        sweep_nums = [json.loads(l)["sweep"] for l in f
                      if json.loads(l)["event"] == "sweep"]
    assert sweep_nums == list(range(1, out.n_iter + 1))


@pytest.mark.slow
def test_subsweep_chunk_checkpoint_resume(tmp_path):
    """A worker killed MID-sweep (right after persisting node chunk 1 of
    4) must leave a resumable partial.npz; the restarted worker resumes
    that sweep at chunk 2 instead of redoing it, and the run still
    converges to the exact slice.  This is the r5 armor for remote
    workers whose lifetime is shorter than one full sweep."""
    A, X0, c, r, exact = _slice_problem()
    marker = str(tmp_path / "chunk_crash.marker")
    out = feast_iterative_checkpointed(
        A, None, X0, c=c, checkpoint_dir=str(tmp_path / "ck"),
        max_sweeps=10, max_restarts=3, platform="cpu", verbose=False,
        worker_env={"FEAST_ORCH_CRASH_AFTER_CHUNK": marker + ":1"},
        r=r, nodes=8, node_chunk=2, tol=1e-10, precondition="amg",
        solve_tol=1e-10, solve_iters=200)
    assert os.path.exists(marker), "chunk crash was never injected"
    assert out.converged
    lam, _, res = out.filtered()
    assert len(lam) == 5
    np.testing.assert_allclose(np.sort(lam.real), exact, rtol=1e-8)
    assert res.max() < 1e-10
    with open(tmp_path / "ck" / "log.jsonl") as f:
        events = [json.loads(l) for l in f]
    assert any(e["event"] == "worker_restart" for e in events)
    # the post-crash worker must have RESUMED mid-sweep, not redone it
    assert any(e.get("resumed_from_chunk") == 2 for e in events
               if e["event"] == "sweep")
    # the partial file is cleaned up once its sweep checkpoints
    assert not os.path.exists(tmp_path / "ck" / "partial.npz")
