"""Bonded local-environment extraction on the periodic cell (min-image).

Native equivalent of the reference's CrystalNN paths
(ref data_preparation.py:126-174 ``ex_O_vector`` and :248-282
``local_env_coords``): find the atoms bonded to the excited oxygen and
return minimum-image-convention (MIC) vectors / coordinates relative to it.

Where the reference delegates the bond decision to pymatgen's CrystalNN
(a bond-valence/Voronoi heuristic), this uses the covalent-radius rule the
rest of the framework already standardises on (evals/fingerprint.py
``guess_bonds``): bonded iff the MIC distance is below
``scale * (r_i + r_j)``. For SiO2 cells both heuristics select the same
first-shell Si neighbours. The MIC normalisation itself is exact parity:
``frac_vector - round(frac_vector)`` mapped through the lattice, precisely
the reference's ``vector_frac - np.round(vector_frac)``
(ref data_preparation.py:166) / ``adjust_coords`` (ref :244-250).
"""

from __future__ import annotations

import numpy as np

from diffusion_model_tpu.data.cell import CellStructure, mic_frac_deltas

# Single source of truth for the bond rule's radii — shared with
# guess_bonds so extraction and fingerprint bonding can't drift apart.
from diffusion_model_tpu.evals.fingerprint import COVALENT_RADII


def mic_vectors(struct: CellStructure, site_index: int) -> np.ndarray:
    """``[N, 3]`` cartesian MIC vectors from ``site_index`` to every site
    (the self-vector is zero). Uses the exact image search — component
    rounding alone picks a longer image in skewed cells (see
    data/cell.py mic_frac_deltas)."""
    frac_d = struct.frac_coords - struct.frac_coords[site_index]
    return mic_frac_deltas(frac_d, struct.lattice) @ struct.lattice


def bonded_neighbors(struct: CellStructure, site_index: int,
                     scale: float = 1.2,
                     radii: dict = COVALENT_RADII) -> list:
    """Indices of sites bonded to ``site_index`` under the periodic cell.

    Bond rule: MIC distance < scale * (r_i + r_j) (covalent radii). Returns
    a list of (index, symbol, mic_vector) sorted by distance.
    """
    vec = mic_vectors(struct, site_index)
    dist = np.linalg.norm(vec, axis=-1)
    r_c = radii[struct.species[site_index]]
    out = []
    for j in range(struct.num_sites):
        if j == site_index:
            continue
        if dist[j] < scale * (r_c + radii[struct.species[j]]):
            out.append((j, struct.species[j], vec[j]))
    out.sort(key=lambda t: np.linalg.norm(t[2]))
    return out


def ex_o_vectors(struct: CellStructure, scale: float = 1.2) -> list:
    """MIC-normalised cartesian vectors from the excited oxygen to each of
    its bonded neighbours (ref ``ex_O_vector``, data_preparation.py:126-174).

    Returns ``[{"index": i, "species": sym, "vector": [3]}, ...]``.
    """
    return [
        {"index": j, "species": sym, "vector": v}
        for j, sym, v in bonded_neighbors(struct, struct.exo_index, scale)
    ]


def local_env_coords(struct: CellStructure, scale: float = 1.2) -> dict:
    """Bonded-neighbour coordinates relative to the excited oxygen, MIC
    adjusted (ref ``local_env_coords``, data_preparation.py:252-282).

    Returns ``{"O:ex": [[0,0,0]], "Si": [vec...], "O": [vec...]}`` in the
    dict format consumed by frames.align (``base_convert``); species with no
    bonded neighbour map to empty lists, as in the reference.
    """
    env = {"O:ex": [np.zeros(3)], "Si": [], "O": []}
    for j, sym, v in bonded_neighbors(struct, struct.exo_index, scale):
        env.setdefault(sym, []).append(v)
    return env
