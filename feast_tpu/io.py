"""Matrix I/O: MatrixMarket reading (native C++ fast path) and per-slice
checkpointing.

The reference loads fixtures through MatrixMarket.jl (test/paper.jl:35-48)
and has NO persistence subsystem (SURVEY.md section 5) — restart is only
implicit through the in/out X convention.  Here:

  * `read_matrix_market` parses .mtx via the bundled C++ extension
    (native/mmio.cpp, compiled on first use and cached) with a scipy
    fallback, returning dense complex numpy, scipy CSR, or a feast CSR
    operator;
  * `save_slice`/`load_slice` make "(lam, X, res) per slice" an explicit,
    resumable artifact — load_slice feeds straight back into any driver's
    X0 (warm restart).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Optional

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native_mmio():
    """Compile (once) and import the C++ reader; None if unavailable."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native", "mmio.cpp")
    build_dir = os.path.join(here, "native", "_build")
    os.makedirs(build_dir, exist_ok=True)
    so_path = os.path.join(build_dir, "feast_tpu_mmio.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src)):
            include = sysconfig.get_paths()["include"]
            cmd = ["g++", "-O3", "-shared", "-fPIC", f"-I{include}",
                   src, "-o", so_path]
            subprocess.run(cmd, check=True, capture_output=True)
        if build_dir not in sys.path:
            sys.path.insert(0, build_dir)
        import feast_tpu_mmio  # noqa: F401
        _NATIVE = feast_tpu_mmio
    except Exception:
        _NATIVE = None
    return _NATIVE


def _expand_symmetry(rows, cols, re, im, symmetry):
    if symmetry == "general":
        return rows, cols, re, im
    off = rows != cols
    if symmetry == "symmetric":
        sre, sim = re[off], im[off]
    elif symmetry == "hermitian":
        sre, sim = re[off], -im[off]
    elif symmetry == "skew-symmetric":
        sre, sim = -re[off], -im[off]
    else:
        raise ValueError(f"unknown symmetry {symmetry}")
    return (np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
            np.concatenate([re, sre]), np.concatenate([im, sim]))


def read_matrix_market(path: str, out: str = "scipy"):
    """Read a .mtx file.

    out: "scipy" (csr_matrix), "dense" (numpy complex128), or
         "csr" (feast_tpu.ops.sparse.CSR pair operator).
    """
    import scipy.sparse as sp

    native = _native_mmio()
    A = None
    if native is not None:
        # fall back to scipy on ANY native parse/expand failure, not just a
        # failed compile — a valid-but-unusual file must never become
        # unreadable because the fast path rejects it (ADVICE r1).
        try:
            (nrows, ncols, nnz, field, symmetry, fmt,
             rows_b, cols_b, re_b, im_b) = native.read(path)
            rows = np.frombuffer(rows_b, dtype=np.int64)
            cols = np.frombuffer(cols_b, dtype=np.int64)
            re = np.frombuffer(re_b, dtype=np.float64)
            im = (np.frombuffer(im_b, dtype=np.float64) if field == "complex"
                  else np.zeros_like(re))
            rows, cols, re, im = _expand_symmetry(rows, cols, re, im, symmetry)
            data = re + 1j * im
            A = sp.coo_matrix((data, (rows, cols)),
                              shape=(nrows, ncols)).tocsr()
        except Exception:
            A = None
    if A is None:  # scipy fallback
        from scipy.io import mmread
        m = mmread(path)
        A = sp.csr_matrix(m) if sp.issparse(m) else sp.csr_matrix(np.asarray(m))
        A = A.astype(np.complex128)
    if out == "scipy":
        return A
    if out == "dense":
        return np.asarray(A.todense(), dtype=np.complex128)
    if out == "csr":
        from .ops.sparse import CSR
        return CSR.from_scipy(A)
    raise ValueError(f"unknown out={out}")


# ---------------------------------------------------------------------------
# per-slice checkpointing
# ---------------------------------------------------------------------------

def save_slice(path: str, result, contour=None, meta: Optional[dict] = None):
    """Persist a solver result (lam, X, res, inside) as .npz."""
    from . import cx

    payload = {
        "lam": cx.to_numpy(result.lam),
        "X": cx.to_numpy(result.X),
        "res": np.asarray(result.res),
        "inside": np.asarray(result.inside),
        "n_iter": np.asarray(result.n_iter),
        "converged": np.asarray(result.converged),
    }
    if contour is not None:
        payload["contour_nodes"] = np.asarray(contour.nodes)
        payload["contour_weights"] = np.asarray(contour.weights)
        payload["contour_kind"] = np.asarray(contour.kind)
        payload["contour_params"] = np.asarray(contour.params)
    if meta:
        for k, v in meta.items():
            payload[f"meta_{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_slice(path: str) -> dict:
    """Load a saved slice; d["X"] feeds any driver's X0 for warm restart."""
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}
