from tpu_rag.parallel.mesh import get_mesh, mesh_from_spec
from tpu_rag.parallel.sharded import (ShardedFlatIndex, ShardedIVFIndex,
                                      make_sharded_kill, make_sharded_search)

__all__ = ["get_mesh", "mesh_from_spec", "ShardedFlatIndex", "ShardedIVFIndex",
           "make_sharded_kill", "make_sharded_search"]
