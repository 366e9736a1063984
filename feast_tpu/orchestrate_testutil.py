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
