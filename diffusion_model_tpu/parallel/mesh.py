"""Device mesh + sharding layout for data-parallel training and sharded
generation.

The reference is strictly single-GPU with batch_size=1 (SURVEY.md §2.6 —
no torch.distributed/NCCL anywhere), so this layer is new capability, built
the XLA way: annotate shardings on a ``jax.sharding.Mesh`` and let GSPMD
insert the collectives (grad all-reduce over ICI for DP; all-gathers for the
node-sharded message-passing path used by 1024+-atom cells — the
ring-attention analogue for dense EGNN, SURVEY.md §2.6).

Strategies:
  * DP   — shard the graph-batch axis over ``data``; parameters replicated;
           gradient psum inserted by XLA from the sharded loss.
  * SP-analogue (graph/node sharding) — for one huge graph, shard the
    *target-node* axis of ``[B, N, ...]`` tensors; the ``[B, N, N]`` pair
    tensor is then row-sharded and XLA all-gathers the (small) source-node
    features.
  * TP/PP/EP — not applicable at this model scale (documented in SURVEY.md
    §2.6); the 1024-wide MLPs fit one chip's VMEM many times over.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffusion_model_tpu.data.batch import GraphBatch


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a Mesh. Default: all visible devices on one ``data`` axis."""
    devices = devices if devices is not None else jax.devices()
    if shape is None or len(shape) == 0:
        shape = (len(devices),)
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names[: arr.ndim]))


def dp_batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading (batch) axis sharded over ``axis``."""
    return NamedSharding(mesh, P(axis))


def node_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Node axis (dim 1 of [B, N, ...]) sharded — the large-cell layout."""
    return NamedSharding(mesh, P(None, axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_graph_batch(batch: GraphBatch, mesh: Mesh, mode: str = "dp",
                      axis: str = "data") -> GraphBatch:
    """Place a GraphBatch on the mesh.

    mode='dp':   shard the batch axis (training / batched generation).
    mode='node': shard the node axis (single huge graph).
    """
    if mode == "dp":
        sh = dp_batch_sharding(mesh, axis)
    elif mode == "node":
        sh = node_sharding(mesh, axis)
    else:
        raise ValueError(mode)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
