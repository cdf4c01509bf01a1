"""CASTEP ``.cell`` structure ingestion — pure numpy, no pymatgen.

Mirrors ``read_castep_output_structure`` (ref data_preparation.py:14-50 and
the exO->'C' marker variant in make_dataset.py:12-48): the file carries
lattice lengths (line 2), lattice angles (line 3), then fractional positions
until ``%ENDBLOCK POSITIONS_FRAC``, with the excited oxygen tagged ``O:ex``.

The reference leans on pymatgen ``Lattice``/``Structure``; here the lattice
matrix, cartesian conversion, supercell expansion and distance matrices are
small numpy routines (they feed the host pipeline only — device code never
sees them).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CellStructure:
    lattice: np.ndarray          # [3,3] row-vector lattice matrix
    frac_coords: np.ndarray      # [N,3]
    species: list                # element symbols, exO recorded as 'O'
    exo_index: int               # index of the excited oxygen

    @property
    def cart_coords(self) -> np.ndarray:
        return self.frac_coords @ self.lattice

    @property
    def num_sites(self) -> int:
        return self.frac_coords.shape[0]


def lattice_from_parameters(a, b, c, alpha, beta, gamma) -> np.ndarray:
    """Standard crystallographic lattice matrix (row vectors), matching
    pymatgen ``Lattice.from_parameters`` conventions:

        gamma* = arccos((cos(alpha) cos(beta) - cos(gamma)) /
                        (sin(alpha) sin(beta)))
        va = (a sin(beta), 0, a cos(beta))
        vb = (-b sin(alpha) cos(gamma*), b sin(alpha) sin(gamma*),
              b cos(alpha))
        vc = (0, 0, c)
    """
    alpha_r, beta_r, gamma_r = np.radians([alpha, beta, gamma])
    val = (np.cos(alpha_r) * np.cos(beta_r) - np.cos(gamma_r)) / (
        np.sin(alpha_r) * np.sin(beta_r)
    )
    val = np.clip(val, -1.0, 1.0)
    gamma_star = np.arccos(val)
    va = np.array([a * np.sin(beta_r), 0.0, a * np.cos(beta_r)])
    vb = np.array([
        -b * np.sin(alpha_r) * np.cos(gamma_star),
        b * np.sin(alpha_r) * np.sin(gamma_star),
        b * np.cos(alpha_r),
    ])
    vc = np.array([0.0, 0.0, float(c)])
    return np.stack([va, vb, vc])


def read_castep_cell(path: str) -> CellStructure:
    """Parse the reference's coreloss ``.cell`` layout."""
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    lengths = [float(x) for x in lines[1].split()]
    angles = [float(x) for x in lines[2].split()]
    lattice = lattice_from_parameters(*lengths, *angles)

    species, coords = [], []
    exo_index = -1
    i = 0
    for line in lines[6:]:
        if line.strip() == "%ENDBLOCK POSITIONS_FRAC":
            break
        parts = line.split()
        if len(parts) < 4:
            continue
        sym = parts[0]
        if sym == "O:ex":
            exo_index = i
            sym = "O"
        species.append(sym)
        coords.append([float(x) for x in parts[1:4]])
        i += 1
    if exo_index < 0:
        raise ValueError(f"no O:ex site found in {path}")
    return CellStructure(
        lattice=lattice,
        frac_coords=np.asarray(coords, np.float64),
        species=species,
        exo_index=exo_index,
    )


def supercell_333(struct: CellStructure) -> CellStructure:
    """3x3x3 supercell with the central image's exO kept as the excited atom
    (image copies become plain 'O'), as in ref make_dataset.py:79-92."""
    shifts = [
        np.array([i, j, k], np.float64)
        for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)
    ]
    frac, species = [], []
    exo_new = -1
    idx = 0
    for shift in shifts:
        central = np.all(shift == 0)
        for s_i in range(struct.num_sites):
            frac.append(struct.frac_coords[s_i] + shift)
            species.append(struct.species[s_i])
            if central and s_i == struct.exo_index:
                exo_new = idx
            idx += 1
    return CellStructure(
        lattice=struct.lattice,
        frac_coords=np.asarray(frac),
        species=species,
        exo_index=exo_new,
    )


def distance_matrix(struct: CellStructure) -> np.ndarray:
    cart = struct.cart_coords
    diff = cart[:, None, :] - cart[None, :, :]
    return np.sqrt(np.sum(diff * diff, axis=-1))


def min_image_distance_matrix(struct: CellStructure) -> np.ndarray:
    """Minimum-image-convention distances for the periodic cell (the
    reference reaches this through pymatgen's ``distance_matrix``)."""
    frac_d = struct.frac_coords[:, None, :] - struct.frac_coords[None, :, :]
    frac_d -= np.round(frac_d)
    cart_d = frac_d @ struct.lattice
    return np.sqrt(np.sum(cart_d * cart_d, axis=-1))
