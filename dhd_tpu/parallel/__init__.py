from .mesh import batch_sharding, make_mesh, replicated_sharding

__all__ = ["batch_sharding", "make_mesh", "replicated_sharding"]
