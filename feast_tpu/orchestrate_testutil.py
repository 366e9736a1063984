"""Builder functions for orchestrate tests (a worker `builder=` target
must be an importable module:function)."""

import numpy as np

from . import problems


def build_slice_problem(n: int = 400):
    """(A, B) for the 1-D Laplacian slice used by tests/test_orchestrate."""
    return problems.laplacian_1d(n, sparse=True), None


def build_broken(n: int = 400):
    """Deterministically-failing builder: every worker dies identically
    (forensics test — the stderr tail must land in log.jsonl and the
    orchestrator must abort after 2 identical failures, not max_restarts)."""
    raise RuntimeError("injected deterministic builder failure")


def build_transient_crash(n: int = 400):
    """Builder that mimics the remote TPU backend's transient worker death
    (axon: "UNAVAILABLE: TPU worker process crashed").  The orchestrator
    must keep retrying these up to max_restarts instead of firing the
    identical-failure deterministic abort (r5: two real axon crashes 8 min
    apart aborted a healthy 100k run)."""
    raise RuntimeError(
        "UNAVAILABLE: TPU worker process crashed or restarted. This can "
        "be caused by a kernel fault - check the kernel before re-running.")
