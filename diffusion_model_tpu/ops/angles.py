"""Bond-angle / bond-length geometry ops (batched, on device).

Vectorised equivalents of the reference's per-graph helpers:
``calculate_angle_for_CN2`` / ``calculate_bond_length_for_CN2``
(ref CN2_evaluate.py:12-21, duplicated in
evaluate_by_angle_for_2_atoms_graph.py:6-15). Node 0 is the central exO atom;
nodes 1 and 2 are its two Si neighbours.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_sq_dist(pos: jnp.ndarray) -> jnp.ndarray:
    """Squared pairwise distances ``[..., N, N]`` from ``[..., N, 3]``."""
    diff = pos[..., :, None, :] - pos[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def cn2_angle_deg(pos: jnp.ndarray) -> jnp.ndarray:
    """Si–exO–Si angle in degrees for ``[..., >=3, 3]`` positions.

    Ref CN2_evaluate.py:12-16: angle at node 0 between bonds to nodes 1, 2.
    """
    v1 = pos[..., 1, :] - pos[..., 0, :]
    v2 = pos[..., 2, :] - pos[..., 0, :]
    cos = jnp.sum(v1 * v2, axis=-1) / (
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
    )
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def cn2_bond_lengths(pos: jnp.ndarray):
    """Bond lengths exO–node1, exO–node2 (ref CN2_evaluate.py:18-21)."""
    l1 = jnp.linalg.norm(pos[..., 1, :] - pos[..., 0, :], axis=-1)
    l2 = jnp.linalg.norm(pos[..., 2, :] - pos[..., 0, :], axis=-1)
    return l1, l2
