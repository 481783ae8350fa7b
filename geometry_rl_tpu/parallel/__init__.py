from .mesh import ENV_AXIS, env_sharding, make_mesh, replicated, shard_env_pytree, shard_train_state  # noqa: F401
