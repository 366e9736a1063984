"""Device-mesh parallelism for contour solvers.

The reference's entire parallel story is `Threads.@threads` over contour
nodes with a lock-guarded accumulator (feast.jl:34-37, nlfeast.jl:36-61) —
`Distributed`/`SharedArrays` are imported but never used (FEASTSolver.jl:10-11).

The TPU-native design makes the quadrature node axis a first-class **mesh
axis**: the batched node tensors (shifted factorizations (N, n, n), per-node
moment terms) are sharded over `node`, and the moment accumulation
`Q .+= temp` (the reference's lock) becomes an XLA all-reduce inserted by the
SPMD partitioner.  A second `row` axis shards the matrix dimension for the
O(n^2 m0) GEMMs (Q^H A Q, A X) and, later, the sparse SpMM path.

Everything goes through `jax.sharding.NamedSharding` + jit: no explicit
collectives in user code; XLA lays psum/all-gather on ICI.

Axes (SURVEY.md section 2.3):
  node  — quadrature nodes (embarrassingly parallel; psum on accumulate)
  row   — matrix rows (TP-like; all-reduce on inner products / TSQR Gram)
  slice — independent spectral slices (DP-like; no communication until the
          final eigenpair gather) — handled at the driver level by running
          one solve per slice group (see slicing.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import cx
from ..cx import CX


def node_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the contour-node axis."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("node",))


def node_row_mesh(n_node: int, n_row: int,
                  devices: Optional[Sequence] = None) -> Mesh:
    """2-D (node, row) mesh: nodes x matrix-row shards."""
    devs = list(devices) if devices is not None else jax.devices()
    devs = np.array(devs[: n_node * n_row]).reshape(n_node, n_row)
    return Mesh(devs, axis_names=("node", "row"))


def shard_nodes(tree, mesh: Mesh):
    """Place a pytree of node-leading arrays with the leading axis sharded
    over `node` (CX pairs shard both parts identically)."""
    sh = NamedSharding(mesh, P("node"))

    def place(x):
        spec = P(*(("node",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    def place(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tree)


def shard_rows(tree, mesh: Mesh):
    """Shard the first (row) axis over `row`, replicate over other axes."""
    def place(x):
        spec = P(*(("row",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def row_sharded_qr(A: CX, mesh: Mesh, method: str = "cholqr2"):
    """Tall-skinny QR with rows sharded over the `row` mesh axis.

    The Gram matrices inside CholeskyQR become psums over `row` (the TSQR
    pattern, SURVEY.md N6): each device holds an (n/p, m) row block, the
    only communication is two m x m all-reduces per pass.  Returns (Q
    row-sharded, R replicated).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import qr as qrmod

    fn = {"cholqr2": qrmod.cholqr2, "cholqr3": qrmod.cholqr3}[method]

    def local(Ar, Ai):
        Q, R = fn(CX(Ar, Ai), psum_axis="row")
        return Q.re, Q.im, R.re, R.im

    f = shard_map(local, mesh=mesh,
                  in_specs=(P("row", None), P("row", None)),
                  out_specs=(P("row", None), P("row", None),
                             P(None, None), P(None, None)))
    Ar = jax.device_put(A.re, NamedSharding(mesh, P("row", None)))
    Ai = jax.device_put(A.im, NamedSharding(mesh, P("row", None)))
    qre, qim, rre, rim = jax.jit(f)(Ar, Ai)
    return CX(qre, qim), CX(rre, rim)
