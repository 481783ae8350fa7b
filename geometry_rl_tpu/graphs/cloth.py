"""Cloth-task graph builder (reference: pyg_data/cloth_tasks_data.py).

Node types (NodeType enum: particles / grippers / hole_boundary /
target_hook). The POLICY graph drops `particles` (full_graph_obs=False,
cloth_tasks_data.py:87-91) and `target_hook` is always dropped — leaving a
tiny graph of 4 grippers + 10 hole-boundary nodes. The CRITIC graph
(full_graph_obs=True) keeps the 225 particles too.

Edges: hole-boundary fully-connected "internal" edges, gripper-gripper agent
pairs, hole-boundary -> gripper task edges (all static index patterns).
Features: one-hot over the 4 NodeType classes + 3 vectors [norm_pos,
corresponding_pos, velocity]; corresponding_pos = init particle positions
(particles) / repeated hook target (hole_boundary)
(construct_input_vector:169-186).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..envs.base import ObsSpec
from .rigid import split_group
from .types import EdgeSet, GraphFeatures, HeteroGraph, NodeSet

ONE_HOT = {
    "particles": (1.0, 0.0, 0.0, 0.0),
    "grippers": (0.0, 1.0, 0.0, 0.0),
    "hole_boundary": (0.0, 0.0, 1.0, 0.0),
    "target_hook": (0.0, 0.0, 0.0, 1.0),
}


@dataclasses.dataclass(frozen=True)
class ClothGraphBuilder:
    obs_spec: ObsSpec
    num_grippers: int
    num_particles: int
    num_boundary: int
    full_graph_obs: bool
    dist_as_pos: bool
    output_mask_key: str
    hole_mask: jnp.ndarray  # [B_env, P] 1 = removed particle
    training_noise: bool = False
    training_noise_std: float = 1e-2

    @staticmethod
    def from_env(env, dist_as_pos: bool = False, full_graph_obs: bool = False, training_noise: bool = False, training_noise_std: float = 1e-2):
        from ..envs.cloth import K_BOUNDARY, N_PARTICLES

        return ClothGraphBuilder(
            obs_spec=env.obs_spec,
            num_grippers=env.cfg.num_grippers,
            num_particles=N_PARTICLES,
            num_boundary=K_BOUNDARY,
            full_graph_obs=full_graph_obs,
            dist_as_pos=dist_as_pos,
            output_mask_key="grippers",
            hole_mask=env.hole_mask,
            training_noise=training_noise,
            training_noise_std=training_noise_std,
        )

    def build(
        self,
        tobs: Dict[str, jnp.ndarray],
        env_ids: Optional[jnp.ndarray] = None,
        noise_key: Optional[jnp.ndarray] = None,
    ) -> Tuple[HeteroGraph, GraphFeatures]:
        spec = self.obs_spec
        B = tobs["position_vectors"].shape[0]
        G, P, K = self.num_grippers, self.num_particles, self.num_boundary
        hole_mask = self.hole_mask if env_ids is None else self.hole_mask[env_ids]

        pos = split_group(tobs["position_vectors"], spec, "position_vectors")
        npos = split_group(tobs["norm_position_vectors"], spec, "position_vectors")
        nvel = split_group(tobs["norm_velocity_vectors"], spec, "velocity_vectors")

        grip_pos = pos["grippers"].reshape(B, G, 3)
        grip_npos = npos["grippers"].reshape(B, G, 3)
        bnd_pos = pos["hole_boundary"].reshape(B, K, 3)
        bnd_npos = npos["hole_boundary"].reshape(B, K, 3)
        hook_npos = npos["target_hook"].reshape(B, 1, 3)

        nodes = {
            "grippers": NodeSet(pos=grip_pos, norm_pos=grip_npos),
            "hole_boundary": NodeSet(pos=bnd_pos, norm_pos=bnd_npos),
        }
        one_hot = {
            nt: jnp.broadcast_to(jnp.asarray(ONE_HOT[nt]), (B, ns.num_nodes, 4))
            for nt, ns in nodes.items()
        }
        corr_bnd = bnd_npos - hook_npos if self.dist_as_pos else jnp.broadcast_to(hook_npos, (B, K, 3))
        vectors = {
            "grippers": jnp.stack(
                [grip_npos, jnp.zeros((B, G, 3)), nvel["grippers"].reshape(B, G, 3)], axis=2
            ),
            # hole_boundary has no velocity term in the obs groups
            "hole_boundary": jnp.stack([bnd_npos, corr_bnd, jnp.zeros((B, K, 3))], axis=2),
        }

        if self.full_graph_obs:
            part_pos = pos["particles"].reshape(B, P, 3)
            part_npos = npos["particles"].reshape(B, P, 3)
            init_npos = npos["init_particles"].reshape(B, P, 3)
            valid = 1.0 - hole_mask
            nodes["particles"] = NodeSet(pos=part_pos, norm_pos=part_npos, mask=valid)
            one_hot["particles"] = jnp.broadcast_to(jnp.asarray(ONE_HOT["particles"]), (B, P, 4))
            corr_p = part_npos - init_npos if self.dist_as_pos else init_npos
            vectors["particles"] = jnp.stack(
                [part_npos, corr_p, nvel["particles"].reshape(B, P, 3)], axis=2
            )

        # --- edges (all static patterns) ------------------------------------
        def full_pairs(n, m=None, exclude_diag=False):
            m = n if m is None else m
            src, dst = [], []
            for a in range(n):
                for b in range(m):
                    if exclude_diag and a == b:
                        continue
                    src.append(a)
                    dst.append(b)
            return (
                jnp.broadcast_to(jnp.asarray(src, jnp.int32), (B, len(src))),
                jnp.broadcast_to(jnp.asarray(dst, jnp.int32), (B, len(dst))),
            )

        b_src, b_dst = full_pairs(K, exclude_diag=True)
        a_src, a_dst = full_pairs(G, exclude_diag=True)
        t_src, t_dst = full_pairs(K, G)
        edges = {
            ("hole_boundary", "internal", "hole_boundary"): EdgeSet(
                src=b_src, dst=b_dst, mask=jnp.ones(b_src.shape)
            ),
            ("grippers", "agent", "grippers"): EdgeSet(src=a_src, dst=a_dst, mask=jnp.ones(a_src.shape)),
            ("hole_boundary", "task", "grippers"): EdgeSet(src=t_src, dst=t_dst, mask=jnp.ones(t_src.shape)),
        }

        graph = HeteroGraph(nodes=nodes, edges=edges, output_node_type=self.output_mask_key)
        if self.training_noise and noise_key is not None:
            from .rigid import apply_training_noise

            vectors = apply_training_noise(vectors, noise_key, self.training_noise_std)
        return graph, GraphFeatures(scalars=one_hot, vectors=vectors)
