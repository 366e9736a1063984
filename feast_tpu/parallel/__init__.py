from . import mesh, slicing
from .mesh import node_mesh, node_row_mesh, shard_nodes, shard_rows, replicate
from .slicing import feast_sliced, spectral_slices, SliceResult
