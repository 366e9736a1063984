"""Builder functions for orchestrate tests (a worker `builder=` target
must be an importable module:function)."""

import numpy as np

from . import problems


def build_slice_problem(n: int = 400):
    """(A, B) for the 1-D Laplacian slice used by tests/test_orchestrate."""
    return problems.laplacian_1d(n, sparse=True), None
