"""Checkpoint / resume via Orbax.

Replaces the reference's torch.save dict of {env VecNorm state, actor,
critic, reward} (examples/torchrl/train.py:335-368) and its fragile
recursively_merge_dict restore (train.py:99-102): here the WHOLE TrainState
pytree — params, optimizer state, normalizer stats, env state, RNG, update
counter — is one Orbax checkpoint, so resume continues optimization exactly
(the reference dropped optimizer state and collector counters; SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, step: int, state: Any, metrics: Optional[dict] = None) -> None:
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(
    directory: str, state: Any, step: Optional[int] = None, fields: Optional[tuple] = None
) -> Any:
    """Restore into the structure of `state` (an abstract/template TrainState
    from `trainer.init`).

    `fields`: restore only these TrainState fields, keeping the template's
    value for the rest — used by play.py when evaluating with a different
    env count than training (env-sized leaves like env_state/obs cannot be
    restored into a reshaped template; params/normalizer are env-independent).

    Forward-compatible with checkpoints written before fields were added to
    TrainState: on a structure mismatch, each stored field is restored
    individually and missing fields keep the template's (freshly
    initialized) value."""
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"No checkpoint found in {directory}")
    if fields is not None:
        # Structure must match the stored tree, so restore every STORED
        # field — requested ones into the template's shapes, the rest at
        # their STORED shapes (from checkpoint metadata; e.g. env-sized
        # leaves whose env count differs from the template) and discard
        # them. Requested fields absent from the checkpoint keep the
        # template's value (same forward-compat promise as the fallback
        # below). NOTE: `mgr.item_metadata(step)` returns None for a fresh
        # manager here (no registered handlers), hence the explicit
        # StandardCheckpointer metadata read of the manager's default
        # item layout.
        meta_path = os.path.join(os.path.abspath(directory), str(step), "default")
        with ocp.StandardCheckpointer() as meta_ckptr:
            meta = meta_ckptr.metadata(meta_path).item_metadata.tree
        # concrete sharding required when the checkpoint was saved sharded
        # (e.g. from a multi-device/multi-host run); the discarded fields are
        # just read onto one device
        one_dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def stored_sds(m):
            return jax.tree_util.tree_map(
                lambda v: jax.ShapeDtypeStruct(tuple(v.shape), v.dtype, sharding=one_dev), m
            )

        abstract_dict = {
            f: (
                jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, getattr(state, f))
                if f in fields
                else stored_sds(meta[f])
            )
            for f in state._fields
            if f in meta
        }
        restored_dict = mgr.restore(step, args=ocp.args.StandardRestore(abstract_dict))
        mgr.close()
        return state._replace(**{f: restored_dict[f] for f in fields if f in restored_dict})
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state)
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    except Exception:
        if not hasattr(state, "_fields"):
            mgr.close()
            raise
        meta = mgr.item_metadata(step)
        stored = set(meta.keys()) if hasattr(meta, "keys") else set(state._fields)
        abstract_dict = {
            f: jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, getattr(state, f))
            for f in state._fields
            if f in stored
        }
        restored_dict = mgr.restore(step, args=ocp.args.StandardRestore(abstract_dict))
        restored = type(state)(
            **{f: restored_dict.get(f, getattr(state, f)) for f in state._fields}
        )
    mgr.close()
    return restored


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step
