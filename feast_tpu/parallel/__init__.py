from . import mesh, slicing
from .mesh import (node_mesh, node_row_mesh, replicate, row_sharded_qr,
                   shard_nodes, shard_rows)
from .slicing import feast_sliced, spectral_slices, SliceResult
