from .mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from .sharding import batch_sharding, param_sharding_rules, shard_params
from .distributed import (
    initialize as initialize_distributed,
    make_global_mesh,
    global_put,
)
