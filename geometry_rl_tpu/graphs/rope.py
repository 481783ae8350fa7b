"""Rope-task graph builder (reference: pyg_data/rope_tasks_data.py).

Node types (all three KEPT, rope_tasks_data.py:89): links, grippers,
target_geometry (isolated nodes — no edges — but pooled by the DeepSets
critic and encoded by HEPi). Edge types: links kNN internal (computed from the
straight default layout, static — kNN of the rest shape, matching the
reference's one-time placeholder construction), gripper-gripper agent pairs,
links->grippers fully-connected task edges.

Features: 3 vectors per node [norm_pos, corresponding_pos, velocity]
(no angular velocity — construct_input_vector:163-190), one-hot dim 3.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..envs.base import ObsSpec
from .rigid import knn_edges_np, split_group
from .types import EdgeSet, GraphFeatures, HeteroGraph, NodeSet


@dataclasses.dataclass(frozen=True)
class RopeGraphBuilder:
    obs_spec: ObsSpec
    num_links: int
    num_grippers: int
    dist_as_pos: bool
    output_mask_key: str
    internal_src: jnp.ndarray  # [E] static chain topology (same for all envs)
    internal_dst: jnp.ndarray
    training_noise: bool = False
    training_noise_std: float = 1e-2

    @staticmethod
    def from_env(env, dist_as_pos: bool = True, knn_k: int = 3, training_noise: bool = False, training_noise_std: float = 1e-2):
        cfg = env.cfg
        L = cfg.num_links
        x = np.arange(L, dtype=np.float32) * cfg.link_spacing
        layout = np.stack([x, np.zeros(L), np.zeros(L)], axis=-1)
        e = knn_edges_np(layout, L, knn_k)
        return RopeGraphBuilder(
            obs_spec=env.obs_spec,
            num_links=L,
            num_grippers=cfg.num_grippers,
            dist_as_pos=dist_as_pos,
            output_mask_key="grippers",
            internal_src=jnp.asarray(e[:, 0], jnp.int32),
            internal_dst=jnp.asarray(e[:, 1], jnp.int32),
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
        L, G = self.num_links, self.num_grippers

        pos = split_group(tobs["position_vectors"], spec, "position_vectors")
        npos = split_group(tobs["norm_position_vectors"], spec, "position_vectors")
        nvel = split_group(tobs["norm_velocity_vectors"], spec, "velocity_vectors")

        grip_pos = pos["grippers"].reshape(B, G, 3)
        grip_npos = npos["grippers"].reshape(B, G, 3)
        link_pos = pos["links"].reshape(B, L, 3)
        link_npos = npos["links"].reshape(B, L, 3)
        tgt_pos = pos["target_geometry"].reshape(B, L, 3)
        tgt_npos = npos["target_geometry"].reshape(B, L, 3)

        nodes = {
            "links": NodeSet(pos=link_pos, norm_pos=link_npos),
            "grippers": NodeSet(pos=grip_pos, norm_pos=grip_npos),
            "target_geometry": NodeSet(pos=tgt_pos, norm_pos=tgt_npos),
        }

        i_src = jnp.broadcast_to(self.internal_src, (B, self.internal_src.shape[0]))
        i_dst = jnp.broadcast_to(self.internal_dst, (B, self.internal_dst.shape[0]))
        edges = {
            ("links", "internal", "links"): EdgeSet(
                src=i_src, dst=i_dst, mask=jnp.ones(i_src.shape)
            )
        }
        pairs = [(i, j) for i in range(G) for j in range(G) if i != j]
        edges[("grippers", "agent", "grippers")] = EdgeSet(
            src=jnp.broadcast_to(jnp.asarray([p[0] for p in pairs], jnp.int32), (B, len(pairs))),
            dst=jnp.broadcast_to(jnp.asarray([p[1] for p in pairs], jnp.int32), (B, len(pairs))),
            mask=jnp.ones((B, len(pairs))),
        )
        t_src = jnp.broadcast_to(jnp.tile(jnp.arange(L, dtype=jnp.int32), G), (B, L * G))
        t_dst = jnp.broadcast_to(jnp.repeat(jnp.arange(G, dtype=jnp.int32), L), (B, L * G))
        edges[("links", "task", "grippers")] = EdgeSet(src=t_src, dst=t_dst, mask=jnp.ones((B, L * G)))

        graph = HeteroGraph(nodes=nodes, edges=edges, output_node_type=self.output_mask_key)

        one_hot = {
            "links": jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (B, L, 3)),
            "grippers": jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (B, G, 3)),
            "target_geometry": jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, L, 3)),
        }
        corr_links = link_npos - tgt_npos if self.dist_as_pos else tgt_npos
        v_links = nvel["links"].reshape(B, L, 3)
        v_grip = nvel["grippers"].reshape(B, G, 3)
        vectors = {
            "links": jnp.stack([link_npos, corr_links, v_links], axis=2),
            "grippers": jnp.stack([grip_npos, jnp.zeros((B, G, 3)), v_grip], axis=2),
            "target_geometry": jnp.stack(
                [tgt_npos, jnp.zeros((B, L, 3)), jnp.zeros((B, L, 3))], axis=2
            ),
        }
        if self.training_noise and noise_key is not None:
            from .rigid import apply_training_noise

            vectors = apply_training_noise(vectors, noise_key, self.training_noise_std)
        return graph, GraphFeatures(scalars=one_hot, vectors=vectors)
