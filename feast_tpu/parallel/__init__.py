from . import mesh
from .mesh import node_mesh, node_row_mesh, shard_nodes, shard_rows, replicate
