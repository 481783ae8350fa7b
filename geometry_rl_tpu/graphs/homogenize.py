"""Hetero -> homogeneous graph merging for the EMPN / GCN / Transformer
baselines (reference: ponita_gcn.py:65-83, gcn.py:52-70).

Node types are concatenated in `graph.nodes` insertion order; edge indices are
offset into the merged node array. All static-shaped, no per-env Python work.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp

from .types import EdgeSet, GraphFeatures, HeteroGraph


class HomogeneousGraph(NamedTuple):
    pos: jnp.ndarray  # [B, Ntot, 3]
    node_mask: jnp.ndarray  # [B, Ntot]
    edges: EdgeSet  # merged, with offset indices
    edge_type_onehot: jnp.ndarray  # [B, Etot, num_edge_types]
    node_slices: Dict[str, Tuple[int, int]]  # node type -> (start, stop)

    def output_slice(self, graph: HeteroGraph) -> Tuple[int, int]:
        return self.node_slices[graph.output_node_type]


def homogenize(graph: HeteroGraph) -> HomogeneousGraph:
    offsets: Dict[str, int] = {}
    slices: Dict[str, Tuple[int, int]] = {}
    pos_list, mask_list = [], []
    offset = 0
    for nt, ns in graph.nodes.items():
        offsets[nt] = offset
        slices[nt] = (offset, offset + ns.num_nodes)
        pos_list.append(ns.pos)
        if ns.mask is None:
            mask_list.append(jnp.ones(ns.pos.shape[:2], ns.pos.dtype))
        else:
            mask_list.append(ns.mask)
        offset += ns.num_nodes

    pos = jnp.concatenate(pos_list, axis=1)
    node_mask = jnp.concatenate(mask_list, axis=1)

    num_et = len(graph.edges)
    src_list, dst_list, emask_list, onehot_list = [], [], [], []
    for ei, (ek, es) in enumerate(graph.edges.items()):
        s_t, _, d_t = ek
        src_list.append(es.src + offsets[s_t])
        dst_list.append(es.dst + offsets[d_t])
        emask_list.append(es.mask)
        oh = jnp.zeros(es.src.shape + (num_et,), pos.dtype).at[..., ei].set(1.0)
        onehot_list.append(oh)

    edges = EdgeSet(
        src=jnp.concatenate(src_list, axis=1),
        dst=jnp.concatenate(dst_list, axis=1),
        mask=jnp.concatenate(emask_list, axis=1),
    )
    edge_type_onehot = jnp.concatenate(onehot_list, axis=1)
    return HomogeneousGraph(pos, node_mask, edges, edge_type_onehot, slices)


def concat_features(graph: HeteroGraph, feats: GraphFeatures) -> jnp.ndarray:
    """Merged flat node features [B, Ntot, F] in node-type order (all types
    padded to a common F — callers must build uniform feature widths)."""
    flat = feats.concat()
    return jnp.concatenate([flat[nt] for nt in graph.nodes.keys()], axis=1)
