"""feast_tpu: TPU-native contour-integral eigensolvers (FEAST family).

A from-scratch JAX/XLA re-design with the capabilities of
spacedome/FEASTSolver.jl: linear FEAST (standard/generalized/two-sided),
nonlinear FEAST with higher moments, Beyn and block Sakurai-Sugiura methods,
companion linearization, and stochastic contour eigenvalue counting —
batched over contour nodes, sharded over device meshes.
"""

# NOTE on matmul precision: on TPU the DEFAULT matmul precision lowers
# even x64-emulated operands to ~bf16x3 passes (measured on-chip:
# CholeskyQR2 orthogonality 1.7e-5 instead of ~1e-14, capping every FEAST
# residual near f32 epsilon).  Every dot in this package therefore passes
# precision=HIGHEST explicitly (cx.cmatmul / cx.hdot / einsum precision
# args) — the package does NOT mutate the host program's global
# jax_default_matmul_precision.

from . import config, contour, cx, io, nep, ops, parallel, problems, solvers, utils
from .contour import (circular_contour_gauss, circular_contour_trapezoidal,
                      elliptical_contour_trapezoidal,
                      custom_contour, in_contour, rational_func,
                      rectangular_contour_gauss,
                      rectangular_contour_trapezoidal, zolotarev_contour)
from .nep import CallableNEP, LinearPencilNEP, PolynomialNEP, SPMF
from .utils import convergence_info, print_convergence_info
from .solvers import (beyn, block_ss, companion, contour_estimate_eig,
                      dual_gen_feast, feast, feast_compiled, feast_iterative, gen_feast,
                      ifeast, nlfeast, nlfeast_it, nlfeast_moments,
                      nlfeast_moments_all, nlfeast_moments_ss, nlfeast_rr)
