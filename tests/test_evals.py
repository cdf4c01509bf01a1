"""Evaluation suite tests: RDF lists, RMSD variants, CN2, density,
fingerprints, template matching."""

import numpy as np
import pytest
from sklearn.metrics import r2_score as sklearn_r2

from diffusion_model_tpu.data.synthetic import synthetic_sio2_dataset
from diffusion_model_tpu.evals import (
    atom_pair_fingerprint,
    cn2_statistics,
    density_accuracy,
    evaluate_by_rmsd,
    evaluate_by_rmsd_and_atom_type,
    evaluate_rdf_lists,
    filter_si_o_si,
    fingerprint_similarity,
    hungarian_align,
    local_descriptor,
    morgan_fingerprint,
    o_density,
    per_graph_group_means,
    permutation_min_rmsd,
    r2score,
    tanimoto_similarity,
    template_match,
)
import jax.numpy as jnp


def random_rotation(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


class TestRDFEval:
    def test_identical_structures(self, rng):
        pos = np.stack([rng.normal(size=(8, 3)) * 1.5 for _ in range(3)])
        mask = np.ones((3, 8), np.float32)
        out = evaluate_rdf_lists(pos, mask, pos, mask)
        assert len(out) == 3
        for m in out:
            assert m["cos"] == pytest.approx(1.0, abs=1e-5)
            assert m["mse"] == pytest.approx(0.0, abs=1e-8)
            assert m["wasserstein"] == pytest.approx(0.0, abs=1e-6)

    def test_different_structures_lower_cos(self, rng):
        a = np.stack([rng.normal(size=(8, 3)) * 1.0])
        b = np.stack([rng.normal(size=(8, 3)) * 3.0])
        mask = np.ones((1, 8), np.float32)
        out = evaluate_rdf_lists(a, mask, b, mask)
        assert out[0]["cos"] < 0.999


class TestRMSDEval:
    def test_sorted_rmsd(self, rng):
        orig = rng.normal(size=(4, 6, 3)).astype(np.float32)
        gen = orig.copy()
        noise = [0.0, 0.3, 0.1, 0.2]
        for i, s in enumerate(noise):
            gen[i] += rng.normal(size=(6, 3)).astype(np.float32) * s
        mask = np.ones((4, 6), np.float32)
        pairs = evaluate_by_rmsd(orig, gen, mask, ids=list("abcd"))
        assert [p[0] for p in pairs] == ["a", "c", "d", "b"]
        assert pairs[0][1] == pytest.approx(0.0, abs=1e-5)

    def test_rmsd_and_atom_type(self, rng):
        orig = rng.normal(size=(2, 4, 3)).astype(np.float32)
        species = np.zeros((2, 4, 2), np.float32)
        species[0, :, 0] = 1           # all O
        species[1, :2, 0] = 1
        species[1, 2:, 1] = 1          # half Si
        mask = np.ones((2, 4), np.float32)
        rows = evaluate_by_rmsd_and_atom_type(
            orig, species, orig, species, mask
        )
        densities = sorted(r[2] for r in rows)
        assert densities == [(0.5, 0.5), (1.0, 1.0)]

    def test_permutation_min_rmsd(self, rng):
        orig = rng.normal(size=(6, 3)).astype(np.float32)
        perm = [0] + list(rng.permutation(np.arange(1, 6)))
        rot = random_rotation(rng)
        gen = (orig @ rot.T)[perm]
        rmsd, order, aligned = permutation_min_rmsd(orig, gen)
        assert rmsd == pytest.approx(0.0, abs=1e-4)
        np.testing.assert_array_equal(np.asarray(perm)[order][1:] >= 1, True)

    def test_permutation_skips_large(self, rng):
        out = permutation_min_rmsd(
            rng.normal(size=(11, 3)), rng.normal(size=(11, 3))
        )
        assert out is None

    def test_hungarian_align_recovers(self, rng):
        orig = rng.normal(size=(12, 3)).astype(np.float32) * 2
        orig -= orig[0]
        rot = random_rotation(rng)
        perm = [0] + list(rng.permutation(np.arange(1, 12)))
        gen = (orig @ rot.T)[perm]
        rmsd, row_ind, col_ind, aligned = hungarian_align(orig, gen)
        assert rmsd == pytest.approx(0.0, abs=1e-3)


class TestCN2:
    def test_statistics(self):
        pos = np.asarray([
            [[0, 0, 0], [1.6, 0, 0], [0, 1.6, 0]],
            [[0, 0, 0], [2.0, 0, 0], [-2.0, 0, 0]],
        ], np.float32)
        stats = cn2_statistics(pos)
        np.testing.assert_allclose(stats["angle_deg"], [90.0, 180.0],
                                   atol=1e-3)
        np.testing.assert_allclose(stats["bond1"], [1.6, 2.0], atol=1e-5)

    def test_group_means(self):
        vals = np.asarray([1, 2, 3, 10, 20, 30], np.float64)
        out = per_graph_group_means(vals, 3)
        np.testing.assert_allclose(out, [2.0, 20.0])

    def test_r2score_matches_regression(self, rng):
        x = rng.normal(size=50)
        y = 2 * x + 1 + rng.normal(size=50) * 0.1
        ours = r2score(x, y)
        # the hand-rolled score regresses y on x then scores predictions
        slope, intercept = np.polyfit(x, y, 1)
        want = sklearn_r2(y, slope * x + intercept)
        assert ours == pytest.approx(want, rel=1e-6)

    def test_filter_si_o_si(self):
        pos = np.zeros((2, 5, 3), np.float32)
        species = np.zeros((2, 5, 2), np.float32)
        mask = np.zeros((2, 5), np.float32)
        # graph 0: exO + 2 Si within 2 A -> keep
        pos[0, :3] = [[0, 0, 0], [1.6, 0, 0], [0, 1.6, 0]]
        species[0, 0] = [1, 0]
        species[0, 1] = [0, 1]
        species[0, 2] = [0, 1]
        mask[0, :3] = 1
        # graph 1: exO + 1 Si + 1 O -> drop
        pos[1, :3] = [[0, 0, 0], [1.6, 0, 0], [0, 1.6, 0]]
        species[1, 0] = [1, 0]
        species[1, 1] = [0, 1]
        species[1, 2] = [1, 0]
        mask[1, :3] = 1
        keep, triplets = filter_si_o_si(pos, species, mask)
        assert keep == [0]
        assert triplets.shape == (1, 3, 3)


class TestDensity:
    def test_o_density(self):
        species = np.zeros((2, 4, 2), np.float32)
        species[0, :, 0] = 1
        species[1, :2, 0] = 1
        species[1, 2:, 1] = 1
        mask = np.ones((2, 4), np.float32)
        d = o_density(species, mask)
        np.testing.assert_allclose(d, [1.0, 0.5])
        assert density_accuracy([1.0, 0.5], [1.0, 0.5]) == 1.0
        assert density_accuracy([1.0, 0.5], [1.0, 0.6]) == 0.5


class TestFingerprint:
    def _structure(self, rng):
        ds = synthetic_sio2_dataset(3, 1, n_max=16, spectrum_size=8,
                                    shells=2)
        g = ds[0]
        symbols = ["Si" if s[1] > 0.5 else "O" for s in g["species"]]
        return g["pos"], symbols

    def test_identical_similarity_one(self, rng):
        pos, symbols = self._structure(rng)
        assert fingerprint_similarity(pos, symbols, pos, symbols) == 1.0

    def test_rotation_invariant(self, rng):
        pos, symbols = self._structure(rng)
        rot = random_rotation(rng)
        assert fingerprint_similarity(pos, symbols, pos @ rot.T, symbols) \
            == 1.0

    def test_perturbation_reduces_similarity(self, rng):
        pos, symbols = self._structure(rng)
        other = pos * 1.8  # stretches bonds past the covalent cutoff
        sim = fingerprint_similarity(pos, symbols, other, symbols)
        assert sim < 1.0

    def test_tanimoto_counts(self):
        assert tanimoto_similarity({("O", "Si", 1): 2},
                                   {("O", "Si", 1): 1}) == 0.5
        assert tanimoto_similarity({}, {}) == 1.0


class TestSpeciesSymbols:
    def test_cli_maps_sio2_and_qm9_onehots(self):
        from diffusion_model_tpu.cli.evaluate_fingerprint import _symbols

        assert _symbols(np.asarray([[1, 0], [0, 1]])) == ["O", "Si"]
        eye5 = np.eye(5, dtype=np.float32)
        assert _symbols(eye5) == ["H", "C", "N", "O", "F"]

    def test_qm9_elements_have_radii(self):
        from diffusion_model_tpu.data.qm9 import QM9_SPECIES
        from diffusion_model_tpu.evals.fingerprint import COVALENT_RADII

        assert all(s in COVALENT_RADII for s in QM9_SPECIES)


class TestMorganFingerprint:
    def _structure(self, rng):
        ds = synthetic_sio2_dataset(3, 1, n_max=16, spectrum_size=8,
                                    shells=2)
        g = ds[0]
        symbols = ["Si" if s[1] > 0.5 else "O" for s in g["species"]]
        return g["pos"], symbols

    def test_identity_and_determinism(self, rng):
        pos, symbols = self._structure(rng)
        fp1 = morgan_fingerprint(pos, symbols)
        fp2 = morgan_fingerprint(pos, symbols)
        assert fp1 == fp2 and len(fp1) > 0
        assert fingerprint_similarity(pos, symbols, pos, symbols,
                                      method="morgan") == 1.0

    def test_rotation_and_permutation_invariant(self, rng):
        pos, symbols = self._structure(rng)
        rot = random_rotation(rng)
        assert morgan_fingerprint(pos @ rot.T, symbols) == \
            morgan_fingerprint(pos, symbols)
        perm = rng.permutation(len(symbols))
        assert morgan_fingerprint(pos[perm],
                                  [symbols[i] for i in perm]) == \
            morgan_fingerprint(pos, symbols)

    def test_counts_total(self, rng):
        # every atom contributes one identifier per radius level (0..2)
        pos, symbols = self._structure(rng)
        fp = morgan_fingerprint(pos, symbols, radius=2)
        assert sum(fp.values()) == 3 * len(symbols)

    def test_topology_change_reduces_similarity(self, rng):
        pos, symbols = self._structure(rng)
        sim = fingerprint_similarity(pos, symbols, pos * 1.8, symbols,
                                     method="morgan")
        assert sim < 1.0

    def test_environment_sensitivity_beyond_degree(self):
        # two 3-atom chains with identical degree sequences but different
        # composition at radius 1: O-Si-O vs Si-O-Si
        pos = np.array([[0.0, 0, 0], [1.6, 0, 0], [3.2, 0, 0]])
        fp_osio = morgan_fingerprint(pos, ["O", "Si", "O"])
        fp_sios = morgan_fingerprint(pos, ["Si", "O", "Si"])
        assert fp_osio != fp_sios


class TestTemplate:
    def test_self_match_found(self, rng):
        refs = synthetic_sio2_dataset(1, 6, n_max=12, spectrum_size=32)
        # target = copy of refs[0] under a new id
        target = dict(refs[0])
        target["id"] = "target_0"
        out = template_match([target], refs, best_k=3)
        best = out["target_0"]
        assert len(best) == 3
        top_id, (mse, sim) = next(iter(best[0].items()))
        assert top_id == refs[0]["id"]
        assert mse == pytest.approx(0.0, abs=1e-10)
        assert sim == pytest.approx(1.0, abs=1e-5)

    def test_descriptor_rotation_invariance(self, rng):
        ds = synthetic_sio2_dataset(5, 1, n_max=12, spectrum_size=8)
        g = ds[0]
        rot = random_rotation(rng)
        d1 = np.asarray(local_descriptor(jnp.asarray(g["pos"]),
                                         jnp.asarray(g["species"])))
        d2 = np.asarray(local_descriptor(jnp.asarray(g["pos"] @ rot.T),
                                         jnp.asarray(g["species"])))
        np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-4)


class TestAlignedGroupMeans:
    def test_symmetric_alignment(self):
        from diffusion_model_tpu.evals import aligned_group_means

        a = np.asarray([1, 2, 3, 10, 20, 30, 100, 200, 300], np.float64)
        b = a * 2
        b[4] = np.nan  # invalidates group 1 on ONE side only
        ga, gb = aligned_group_means(a, b, 3)
        # group 1 dropped from both; pairing preserved
        np.testing.assert_allclose(ga, [2.0, 200.0])
        np.testing.assert_allclose(gb, [4.0, 400.0])

    def test_invalid_mask(self):
        from diffusion_model_tpu.evals import aligned_group_means

        a = np.arange(6, dtype=np.float64)
        b = np.arange(6, dtype=np.float64) + 1
        invalid = np.asarray([False, False, True, False, False, False])
        ga, gb = aligned_group_means(a, b, 3, invalid=invalid)
        np.testing.assert_allclose(ga, [4.0])
        np.testing.assert_allclose(gb, [5.0])


class TestSpectrumNNBaseline:
    def test_recovers_spectrum_determined_target(self, rng):
        """When the target is a smooth function of the spectrum, the 1-NN
        ceiling is high; with shuffled labels it collapses."""
        from diffusion_model_tpu.evals import nn_ceiling_r2, \
            spectrum_nn_predict

        def spec(theta):
            ev = np.linspace(-1, 19, 64)
            return np.exp(-0.5 * ((ev - 4 * theta / 180.0 - 3) / 0.8) ** 2)

        tr_ang = rng.uniform(60, 180, 200)
        te_ang = rng.uniform(60, 180, 40)
        tr_sp = np.stack([spec(a) for a in tr_ang])
        te_sp = np.stack([spec(a) for a in te_ang])
        r2 = nn_ceiling_r2(tr_sp, tr_ang, te_sp, te_ang)
        assert r2 > 0.95, r2
        shuffled = rng.permutation(tr_ang)
        r2_bad = nn_ceiling_r2(tr_sp, shuffled, te_sp, te_ang)
        assert r2_bad < 0.5, r2_bad
        # exact match when a test spectrum equals a training spectrum
        pred = spectrum_nn_predict(tr_sp, tr_ang, tr_sp[:5])
        np.testing.assert_allclose(pred, tr_ang[:5])


class TestFingerprintGoldenDriftLock:
    """Frozen fingerprint outputs on a fixed structure: RDKit is absent
    from this image (VERDICT r2 missing #2), so these lock the native
    implementations' exact behaviour — hash scheme, bond guessing,
    folding — against silent drift."""

    POS = np.array([[0.0, 0.0, 0.0], [1.62, 0.0, 0.0],
                    [-0.5, 1.54, 0.0], [0.2, -0.9, 1.3],
                    [2.4, 1.1, -0.8]])
    SYMBOLS = ["O", "Si", "Si", "O", "O"]

    def test_atom_pair_frozen(self):
        from diffusion_model_tpu.evals.fingerprint import (
            atom_pair_fingerprint,
        )

        ap = atom_pair_fingerprint(self.POS, self.SYMBOLS)
        assert dict(ap) == {
            ("O", "O", 2): 1,
            ("O", "Si", 1): 3,
            ("O", "Si", 2): 1,
            ("Si", "Si", 1): 1,
        }

    def test_morgan_frozen(self):
        from diffusion_model_tpu.evals.fingerprint import (
            morgan_fingerprint,
        )

        mfp = morgan_fingerprint(self.POS, self.SYMBOLS)
        assert sorted(mfp.items()) == [
            (143, 1), (370, 1), (383, 1), (539, 1), (621, 1), (860, 1),
            (1039, 1), (1317, 1), (1545, 1), (1620, 1), (1624, 1),
            (1784, 1), (1855, 1), (2023, 1), (2044, 1),
        ]
