"""Ring-sharded message passing vs the dense single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.config import Config
from diffusion_model_tpu.data.batch import collate
from diffusion_model_tpu.data.synthetic import amorphous_cell
from diffusion_model_tpu.nn import DiffusionDenoiser
from diffusion_model_tpu.parallel import make_mesh
from diffusion_model_tpu.parallel.ring import ring_denoise_fn


class TestRing:
    @pytest.mark.parametrize("zero_init", [True, False])
    @pytest.mark.parametrize("n_max,num_atoms", [(32, 29), (256, 250)])
    def test_matches_dense_oracle(self, rng, zero_init, n_max, num_atoms):
        cfg = Config(
            n_max=n_max, L=2, m_hidden_size=32, h_hidden_size=32,
            x_hidden_size=32, m_size=16, spectrum_size=16,
            compressed_spectrum_size=8, compressor_hidden_dim=(8,),
            zero_init_x=zero_init,
        )
        mesh = make_mesh()
        assert mesh.devices.size == 8

        cell = amorphous_cell(seed=1, num_atoms=num_atoms,
                              spectrum_size=cfg.spectrum_size)
        batch = collate([cell], cfg.n_max)  # real + padded rows
        b, n = batch.mask.shape
        t_norm = jnp.full((b, n, 1), 0.4) * batch.mask[..., None]
        species = jnp.asarray(rng.normal(size=(b, n, 2)), jnp.float32)
        pos = batch.pos

        model = DiffusionDenoiser(cfg)
        args = (species, pos, batch.spectrum, batch.exo, t_norm, batch.mask)
        params = model.init(jax.random.key(0), *args, batch.pair_mask())
        want_x, want_h = model.apply(params, *args, batch.pair_mask())

        ring = ring_denoise_fn(cfg, params, mesh)
        # ring path is single-graph (no batch axis)
        got_x, got_h = jax.jit(ring)(
            species[0], pos[0], batch.spectrum[0], batch.exo[0],
            t_norm[0], batch.mask[0],
        )
        np.testing.assert_allclose(np.asarray(want_x[0]), np.asarray(got_x),
                                   rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(want_h[0]), np.asarray(got_h),
                                   rtol=3e-4, atol=3e-5)

    def test_indivisible_raises(self, rng):
        cfg = Config(n_max=30, L=1, m_hidden_size=8, h_hidden_size=8,
                     x_hidden_size=8, m_size=4, spectrum_size=8,
                     compressed_spectrum_size=4, compressor_hidden_dim=(4,))
        mesh = make_mesh()
        cell = amorphous_cell(seed=1, num_atoms=30, spectrum_size=8)
        batch = collate([cell], 30)
        model = DiffusionDenoiser(cfg)
        b, n = batch.mask.shape
        t_norm = jnp.zeros((b, n, 1))
        params = model.init(jax.random.key(0), batch.species, batch.pos,
                            batch.spectrum, batch.exo, t_norm, batch.mask,
                            batch.pair_mask())
        ring = ring_denoise_fn(cfg, params, mesh)
        with pytest.raises(ValueError):
            ring(batch.species[0], batch.pos[0], batch.spectrum[0],
                 batch.exo[0], t_norm[0], batch.mask[0])
