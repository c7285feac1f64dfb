from topopt_in_petsc_tpu.parallel.mesh import (
    make_device_mesh,
    elem_sharding,
    node_sharding,
    shard_fields,
)

__all__ = [
    "make_device_mesh",
    "elem_sharding",
    "node_sharding",
    "shard_fields",
]
