# Lazy re-exports (PEP 562) — keep `import geometry_rl_tpu.train.cli` free of
# backend-initializing jnp constants until after jax.distributed.initialize
# (see the package-root __init__ for the multi-host rationale).
_LAZY = ("Batch", "TrainConfig", "Trainer", "TrainState")


def __getattr__(name):
    if name in _LAZY:
        from . import ppo

        return getattr(ppo, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
