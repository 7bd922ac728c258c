from emmax_tpu.parallel.mesh import make_mesh
from emmax_tpu.parallel.sharding import (batch_sharding, param_partition_specs,
                                         shard_params)

__all__ = ["make_mesh", "param_partition_specs", "shard_params",
           "batch_sharding"]
