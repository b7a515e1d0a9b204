from .mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    process_batch_slice,
    replicated_sharding,
)

__all__ = [
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "process_batch_slice",
    "replicated_sharding",
]
