"""Observability: per-iteration diagnostics, convergence summaries,
rational-filter inspection, and phase metrics.

Re-designs the reference's print-based observability (utils.jl:2-67,
contour.jl:102-108) and adds the phase-timing metrics the reference lacked
(nnz/s / solve wall time per node — the BASELINE north-star metrics).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import numpy as np

from .. import contour as ct
from .. import cx


def convergence_info(lam, X, residuals, contour: ct.Contour,
                     spurious: float = 1e-3) -> Dict:
    """Summary dict like the reference's convergence_info printout
    (utils.jl:44-67): counts inside / non-spurious, max residuals."""
    lam = cx.to_numpy(lam) if isinstance(lam, cx.CX) else np.asarray(lam)
    res = np.asarray(residuals)
    inside = np.asarray(ct.in_contour(lam, contour))
    res_in = res[inside]
    non_spur = res_in[res_in < spurious]
    info = {
        "inside": int(inside.sum()),
        "non_spurious": int((res_in < spurious).sum()),
        "max_res_inside": float(res_in.max()) if inside.any() else None,
        "max_res_non_spurious": float(non_spur.max()) if len(non_spur) else None,
        "min_res": float(res.min()) if len(res) else None,
    }
    return info


def print_convergence_info(lam, X, residuals, contour: ct.Contour,
                           spurious: float = 1e-3) -> None:
    info = convergence_info(lam, X, residuals, contour, spurious)
    print(f"eigenvalues inside contour:       {info['inside']}")
    print(f"  of which non-spurious (<{spurious:g}): {info['non_spurious']}")
    if info["max_res_inside"] is not None:
        print(f"max residual inside:              {info['max_res_inside']:.3e}")
    if info["max_res_non_spurious"] is not None:
        print(f"max non-spurious residual:        {info['max_res_non_spurious']:.3e}")


def filter_quality(contour: ct.Contour, n_grid: int = 200) -> Dict:
    """Quantify the rational filter: worst in-contour value and decay
    outside (generalizes the reference's pointwise rational_func probe)."""
    c = contour.center
    r = contour.radius
    theta = np.linspace(0, 2 * np.pi, n_grid, endpoint=False)
    inner = c + 0.5 * r * np.exp(1j * theta)
    outer2 = c + 2.0 * r * np.exp(1j * theta)
    outer4 = c + 4.0 * r * np.exp(1j * theta)
    rho_in = ct.rational_func(inner, contour)
    return {
        "max_inside_error": float(np.max(np.abs(rho_in - 1.0))),
        "max_at_2r": float(np.max(np.abs(ct.rational_func(outer2, contour)))),
        "max_at_4r": float(np.max(np.abs(ct.rational_func(outer4, contour)))),
    }


@dataclasses.dataclass
class PhaseTimer:
    """Wall-time per phase with derived throughput — the metrics hook the
    reference never had (its timing was ad-hoc @timev in scripts)."""

    records: List[Dict] = dataclasses.field(default_factory=list)
    _t0: Optional[float] = None
    _phase: Optional[str] = None
    _work: float = 0.0

    def start(self, phase: str, work_units: float = 0.0):
        self._phase = phase
        self._work = work_units
        self._t0 = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        rec = {"phase": self._phase, "wall_s": dt}
        if self._work:
            rec["units_per_s"] = self._work / dt
        self.records.append(rec)
        return rec

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for r in self.records:
            out[r["phase"]] = out.get(r["phase"], 0.0) + r["wall_s"]
        return out
