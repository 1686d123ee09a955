from followyourclick_tpu.parallel.mesh import create_mesh  # noqa: F401
from followyourclick_tpu.parallel.sharding import (  # noqa: F401
    param_sharding_rules,
    shard_params,
)
