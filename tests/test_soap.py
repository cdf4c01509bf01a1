"""SOAP power-spectrum descriptor tests (evals/soap.py).

Validates the invariances SOAP is defined by (rotation, neighbour
permutation), its sensitivity to structure and species, radial-basis
orthonormality, and the template-matching integration — the properties the
reference relies on from dscribe (ref template_matching.py:41-68).
"""

import numpy as np
import pytest

from diffusion_model_tpu.data.synthetic import synthetic_sio2_dataset
from diffusion_model_tpu.evals.soap import (
    _radial_basis,
    soap_descriptor,
)
from diffusion_model_tpu.evals import template_match

# small settings for speed; one test runs the reference's full (15, 10)
N_MAX, L_MAX = 4, 3


def _structure(seed=0, n_max=12):
    ds = synthetic_sio2_dataset(3, 1, n_max=n_max, spectrum_size=8,
                                shells=2)
    g = ds[seed % len(ds)]
    return np.asarray(g["pos"]), np.asarray(g["species"])


def _rotation(rng):
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def _cos(a, b):
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


class TestRadialBasis:
    def test_orthonormal(self):
        r = np.linspace(0, 8.0, 20001)
        g = _radial_basis(8.0, 6, r)
        gram = np.trapezoid(g[:, None] * g[None, :] * r * r, r, axis=-1)
        # Loewdin coefficients are large (near-dependent monomials), which
        # amplifies quadrature error — 1e-3 is the grid-limited accuracy.
        np.testing.assert_allclose(gram, np.eye(6), atol=1e-3)


class TestSoapInvariances:
    def test_rotation_invariant(self, rng):
        pos, species = _structure()
        rot = _rotation(rng)
        d1 = soap_descriptor(pos, species, n_max=N_MAX, l_max=L_MAX)
        d2 = soap_descriptor(pos @ rot.T, species, n_max=N_MAX, l_max=L_MAX)
        np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-9)

    def test_translation_invariant(self):
        pos, species = _structure()
        d1 = soap_descriptor(pos, species, n_max=N_MAX, l_max=L_MAX)
        d2 = soap_descriptor(pos + 7.3, species, n_max=N_MAX, l_max=L_MAX)
        np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-9)

    def test_neighbor_permutation_invariant(self, rng):
        pos, species = _structure()
        perm = np.concatenate([[0], 1 + rng.permutation(len(pos) - 1)])
        d1 = soap_descriptor(pos, species, n_max=N_MAX, l_max=L_MAX)
        d2 = soap_descriptor(pos[perm], species[perm],
                             n_max=N_MAX, l_max=L_MAX)
        np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-9)

    def test_mask_drops_padding(self):
        pos, species = _structure()
        padded_pos = np.concatenate([pos, [[1.0, 1.0, 1.0]]])
        padded_species = np.concatenate([species, [[1.0, 0.0]]])
        mask = np.ones(len(padded_pos))
        mask[-1] = 0
        d1 = soap_descriptor(pos, species, n_max=N_MAX, l_max=L_MAX)
        d2 = soap_descriptor(padded_pos, padded_species, mask=mask,
                             n_max=N_MAX, l_max=L_MAX)
        np.testing.assert_allclose(d1, d2, rtol=1e-6, atol=1e-9)


class TestSoapSensitivity:
    def test_structure_change_detected(self):
        pos, species = _structure()
        d1 = soap_descriptor(pos, species, n_max=N_MAX, l_max=L_MAX)
        d2 = soap_descriptor(pos * 1.15, species, n_max=N_MAX, l_max=L_MAX)
        assert _cos(d1, d2) < 0.999

    def test_species_swap_detected(self):
        pos, species = _structure()
        swapped = species.copy()
        swapped[1] = species[1][::-1]
        d1 = soap_descriptor(pos, species, n_max=N_MAX, l_max=L_MAX)
        d2 = soap_descriptor(pos, swapped, n_max=N_MAX, l_max=L_MAX)
        assert not np.allclose(d1, d2)

    def test_self_cosine_is_one(self):
        pos, species = _structure()
        d = soap_descriptor(pos, species, n_max=N_MAX, l_max=L_MAX)
        assert _cos(d, d) == pytest.approx(1.0)


class TestReferenceSettings:
    def test_full_size_and_finite(self):
        # the reference's exact settings: r_cut=8, n_max=15, l_max=10
        pos, species = _structure()
        d = soap_descriptor(pos, species)
        expected = 2 * (15 * 16 // 2) * 11 + 15 * 15 * 11
        assert d.shape == (expected,) == (5115,)
        assert np.isfinite(d).all()
        assert np.abs(d).max() > 0


class TestTemplateMatchSoap:
    def test_template_match_soap_descriptor(self):
        refs = synthetic_sio2_dataset(1, 5, n_max=10, spectrum_size=16)
        target = dict(refs[0])
        target["id"] = "target_0"
        out = template_match([target], refs, best_k=2, descriptor="soap")
        best = out["target_0"]
        assert len(best) == 2
        # best spectrum match is refs[0] itself (identical spectrum):
        # an identical structure must score cosine similarity ~1
        top_id, (mse, sim) = next(iter(best[0].items()))
        assert top_id == refs[0]["id"]
        assert mse == pytest.approx(0.0, abs=1e-12)
        assert sim == pytest.approx(1.0, abs=1e-6)

    def test_unknown_descriptor_rejected(self):
        with pytest.raises(ValueError):
            template_match([], [], descriptor="nope")
