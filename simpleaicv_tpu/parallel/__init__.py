from .mesh import (MeshConfig, make_mesh, batch_sharding, replicated,
                   infer_param_sharding, shard_batch)  # noqa: F401
