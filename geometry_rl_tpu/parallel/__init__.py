from .mesh import (  # noqa: F401
    ENV_AXIS,
    env_sharding,
    make_mesh,
    replicate_pytree,
    replicated,
    shard_env_pytree,
    shard_train_state,
)
from .multihost import is_main_process, maybe_initialize_distributed  # noqa: F401
