from .mesh import (make_mesh, build_mesh, parse_axis_spec,  # noqa: F401
                   batch_sharding, replicated_sharding,
                   shard_over, local_mesh_size)
