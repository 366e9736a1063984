"""Precision / platform policy.

TPU constraints discovered empirically (v5e, XLA remote-compile):
  * complex64 / complex128: rejected entirely ("Element type C128 is not
    supported on TPU", c64 matmul UNIMPLEMENTED) -> all complex arithmetic in
    this framework uses CX real-pairs (see cx.py);
  * float64: supported via emulation for matmul/qr/svd (slow but accurate);
    no built-in f64 LU/triangular-solve -> we ship our own (ops/lu.py).

Default policy: float64 pairs for driver math (residual targets 1e-10..1e-14
match the reference's ComplexF64), optional float32 pairs for the hot solve
phase ("mixed_prec" in the reference, feast.jl:19-25) with f64 iterative
refinement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_x64():
    jax.config.update("jax_enable_x64", True)


def default_rdtype():
    """Real dtype backing CX pairs: f64 when x64 is enabled, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps)
