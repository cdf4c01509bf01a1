"""Oxygen-density evaluation for amorphous generation.

Rebuild of the density scatter/accuracy block in generate_amorphous.py
(ref generate_amorphous.py:109-144): fraction of O atoms per structure,
compared original vs generated, with exact-match accuracy.
"""

from __future__ import annotations

import numpy as np


def o_density(species: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Fraction of O (onehot [1,0]) per structure over real atoms.

    species: ``[G, N, 2]``; mask: ``[G, N]``.
    """
    m = np.asarray(mask)
    o = np.asarray(species)[..., 0] * m
    return o.sum(-1) / np.maximum(m.sum(-1), 1)


def density_accuracy(density_original: np.ndarray,
                     density_generated: np.ndarray) -> float:
    """Share of structures with exactly matching O density
    (ref generate_amorphous.py:144)."""
    a = np.asarray(density_original)
    b = np.asarray(density_generated)
    return float(np.mean(np.abs(a - b) == 0))
