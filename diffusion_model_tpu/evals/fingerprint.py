"""Topological fingerprint similarity — native numpy replacement for the
reference's RDKit pipeline (ref evaluate_fingerprint.py:49-113), which this
image does not ship.

Pipeline parity:
  * bond guessing from covalent radii with a 1.2 scale factor
    (ref evaluate_fingerprint.py:58-84 — same rule, sans RDKit),
  * atom-pair fingerprint: counts of (type_i, type_j, topological distance)
    triples over the bond graph — the same invariant RDKit's
    ``GetAtomPairFingerprint`` hashes (unordered element pair + shortest
    bond-path length),
  * Tanimoto similarity on count vectors: sum(min)/sum(max), RDKit's
    count-fingerprint definition (ref :109-113).
"""

from __future__ import annotations

import numpy as np

# Covalent radii (Angstrom) — standard Cordero values for the species the
# pipeline handles (O, Si plus the overlay stand-ins Al, F).
COVALENT_RADII = {"O": 0.66, "Si": 1.11, "Al": 1.21, "F": 0.57}


def guess_bonds(pos: np.ndarray, symbols: list, threshold: float = 1.2
                ) -> np.ndarray:
    """Adjacency matrix: bond when distance < threshold * (r_i + r_j)."""
    pos = np.asarray(pos)
    n = pos.shape[0]
    radii = np.asarray([COVALENT_RADII[s] for s in symbols])
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    cut = threshold * (radii[:, None] + radii[None, :])
    adj = (d < cut) & ~np.eye(n, dtype=bool)
    return adj


def _shortest_paths(adj: np.ndarray, max_dist: int = 30) -> np.ndarray:
    """All-pairs shortest path lengths by BFS; unreachable = -1."""
    n = adj.shape[0]
    dist = np.full((n, n), -1, np.int32)
    for src in range(n):
        dist[src, src] = 0
        frontier = [src]
        d = 0
        while frontier and d < max_dist:
            d += 1
            nxt = []
            for u in frontier:
                for v in np.nonzero(adj[u])[0]:
                    if dist[src, v] < 0:
                        dist[src, v] = d
                        nxt.append(v)
            frontier = nxt
    return dist


def atom_pair_fingerprint(pos: np.ndarray, symbols: list,
                          threshold: float = 1.2) -> dict:
    """Count map {(sym_a, sym_b, path_len): count} with sym_a <= sym_b."""
    adj = guess_bonds(pos, symbols, threshold)
    dist = _shortest_paths(adj)
    fp: dict = {}
    n = len(symbols)
    for i in range(n):
        for j in range(i + 1, n):
            d = int(dist[i, j])
            if d <= 0:
                continue
            a, b = sorted([symbols[i], symbols[j]])
            key = (a, b, d)
            fp[key] = fp.get(key, 0) + 1
    return fp


def tanimoto_similarity(fp1: dict, fp2: dict) -> float:
    """Count-vector Tanimoto: sum(min)/sum(max) over the union of keys."""
    keys = set(fp1) | set(fp2)
    num = sum(min(fp1.get(k, 0), fp2.get(k, 0)) for k in keys)
    den = sum(max(fp1.get(k, 0), fp2.get(k, 0)) for k in keys)
    return num / den if den else 1.0


def fingerprint_similarity(pos1, symbols1, pos2, symbols2,
                           threshold: float = 1.2) -> float:
    """End-to-end equivalent of ``eval_by_xyz``
    (ref evaluate_fingerprint.py:96-113)."""
    fp1 = atom_pair_fingerprint(pos1, symbols1, threshold)
    fp2 = atom_pair_fingerprint(pos2, symbols2, threshold)
    return tanimoto_similarity(fp1, fp2)
