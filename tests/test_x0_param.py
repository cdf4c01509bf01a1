"""x0 coordinate parameterization (config.x_parameterization).

The denoiser's coordinate head can mean "noise prediction" (eps, the
reference-exact default, ref parts/train_per_iretation.py:161-166) or
"displacement toward the clean structure" (x0). Every consumer runs on
epsilon via diffusion/process.x0_out_to_eps, so the two modes share the
loss/sampler math exactly — these tests pin that conversion layer:

  * the oracle identity: feeding out = x0 - z_t returns the exact
    forward noise
  * sampler equivalence: an x0-mode denoise_fn built by algebraically
    inverting an eps-mode one reproduces the eps-mode chain sample for
    sample (incl. CFG, whose affine combination commutes with the
    conversion)
  * training: the x0 loss is finite at init (the c_z z-term cancels the
    blowup), decreases, and the ring path matches the dense path
  * validation: unknown values refuse loudly
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.config import Config
from diffusion_model_tpu.data.split import batch_iterator
from diffusion_model_tpu.data.synthetic import synthetic_sio2_dataset
from diffusion_model_tpu.diffusion import predefined_schedule, sample
from diffusion_model_tpu.diffusion.process import (
    diffuse_zero_to_t,
    v_out_to_eps,
    x0_out_to_eps,
    x_param_is_x0,
)
from diffusion_model_tpu.train import Trainer


def tiny_cfg(**kw):
    base = dict(
        n_max=8, L=2, m_hidden_size=32, h_hidden_size=32, x_hidden_size=32,
        m_size=16, spectrum_size=32, compressed_spectrum_size=8,
        compressor_hidden_dim=(16,), num_diffusion_timestep=20,
        batch_size=4, lr=1e-3, optimizer="Adam", noise_precision=0.05,
    )
    base.update(kw)
    return Config(**base)


def data_and_batch(cfg, num=8):
    graphs = synthetic_sio2_dataset(0, num, cfg.n_max,
                                    spectrum_size=cfg.spectrum_size)
    return graphs, next(batch_iterator(graphs, cfg.batch_size, cfg.n_max))


class TestConversion:
    @pytest.mark.parametrize("mode", ["x0", "v"])
    def test_oracle_identity(self, mode):
        """The mode's oracle output must convert back to the exact
        forward noise: out = x0 - z_t for "x0",
        out = alpha eps - sigma x0 for "v"."""
        cfg = tiny_cfg()
        schedule = predefined_schedule(cfg)
        _, batch = data_and_batch(cfg)
        t = jnp.array([1, 7, 13, 20])
        pos_t, eps = diffuse_zero_to_t(schedule, jax.random.key(3),
                                       batch.pos, t, mode="pos",
                                       mask=batch.mask)
        alpha = schedule.alpha(t)[:, None, None]
        sigma = schedule.sigma(t)[:, None, None]
        if mode == "x0":
            out = batch.pos - pos_t  # x0_hat = z_t + out == x0
            eps_back = x0_out_to_eps(schedule, t, pos_t, out)
        else:
            out = alpha * eps - sigma * batch.pos
            eps_back = v_out_to_eps(schedule, t, pos_t, out)
        np.testing.assert_allclose(np.asarray(eps_back), np.asarray(eps),
                                   rtol=2e-5, atol=2e-5)

    def test_validation(self):
        assert not x_param_is_x0(tiny_cfg())
        assert x_param_is_x0(tiny_cfg(x_parameterization="x0"))
        assert x_param_is_x0(tiny_cfg(x_parameterization="v"))
        with pytest.raises(ValueError, match="x_parameterization"):
            x_param_is_x0(tiny_cfg(x_parameterization="v_pred"))


class TestSamplerEquivalence:
    @pytest.mark.parametrize("guidance", [0.0, 1.5])
    @pytest.mark.parametrize("mode", ["x0", "v"])
    def test_converted_chain_matches_eps_chain(self, mode, guidance):
        """A non-eps denoise_fn built by inverting an eps-mode one must
        reproduce the eps-mode reverse chain exactly (same keys)."""
        cfg = tiny_cfg(guidance_scale=guidance, zero_init_x=False)
        schedule = predefined_schedule(cfg)
        T = cfg.num_diffusion_timestep
        _, batch = data_and_batch(cfg)

        k1, k2 = jax.random.split(jax.random.key(11))
        wx = jax.random.normal(k1, (cfg.atom_type_size, 3)) * 0.1
        wh = jax.random.normal(k2, (3, cfg.atom_type_size)) * 0.1

        def fn_eps(h, pos, spectrum, exo, t_norm, mask, edges):
            # a fixed nonlinear-ish map; spectrum enters so CFG's uncond
            # branch differs, mean-removed x-output like the real model
            sx = jnp.tanh(h) @ wx + 0.05 * pos \
                + 0.01 * jnp.mean(spectrum, axis=(1, 2))[:, None, None]
            m3 = mask[..., None]
            sx = (sx - jnp.sum(sx * m3, axis=1, keepdims=True)
                  / jnp.maximum(jnp.sum(m3, axis=1, keepdims=True), 1.0))
            eps_h = jnp.tanh(pos) @ wh * m3
            return sx * m3, eps_h

        def fn_conv(h, pos, spectrum, exo, t_norm, mask, edges):
            eps_x, eps_h = fn_eps(h, pos, spectrum, exo, t_norm, mask,
                                  edges)
            # recover the table index from t_norm (full-steps sampling:
            # t_norm = t/T exactly; padded rows are zeroed so take max)
            ti = jnp.round(jnp.max(t_norm) * T).astype(jnp.int32)
            alpha = schedule.alphas[ti]
            sigma = jnp.sqrt(1.0 - alpha**2)
            if mode == "x0":
                out = (pos - sigma * eps_x) / alpha - pos
            else:  # v: eps = alpha v + sigma z  =>  v = (eps - sigma z)/alpha
                out = (eps_x - sigma * pos) / alpha
            return out, eps_h

        key = jax.random.key(5)
        res_eps = sample(fn_eps, schedule, cfg, key, batch)
        res_x0 = sample(fn_conv, schedule,
                        cfg.replace(x_parameterization=mode), key, batch)
        np.testing.assert_allclose(np.asarray(res_x0.pos),
                                   np.asarray(res_eps.pos),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(res_x0.h),
                                   np.asarray(res_eps.h),
                                   rtol=2e-4, atol=2e-4)
        # padded rows stay inert through the conversion
        pad = np.asarray(1.0 - batch.mask, bool)
        assert np.all(np.asarray(res_x0.pos)[pad] == 0.0)


class TestTraining:
    @pytest.mark.slow
    @pytest.mark.parametrize("mode", ["x0", "v"])
    def test_loss_finite_at_init_and_decreases(self, mode):
        cfg = tiny_cfg(x_parameterization=mode)
        trainer = Trainer(cfg)
        _, batch = data_and_batch(cfg)
        state = trainer.init_state(jax.random.key(0), batch)
        losses = []
        for i in range(40):
            state, m = trainer.train_step(state, jax.random.key(i), batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        # init-scale sanity: the z-term cancellation keeps the first loss
        # O(eps-scale), not O((alpha/sigma)^2)
        assert losses[0] < 1e3
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    @pytest.mark.slow
    def test_sampling_from_x0_trained_model_finite(self):
        cfg = tiny_cfg(x_parameterization="x0")
        trainer = Trainer(cfg)
        _, batch = data_and_batch(cfg)
        state = trainer.init_state(jax.random.key(0), batch)
        for i in range(10):
            state, _ = trainer.train_step(state, jax.random.key(i), batch)
        res = sample(trainer.denoise_fn(state.eval_params(cfg)),
                     trainer.schedule_for(state.params), cfg,
                     jax.random.key(99), batch)
        assert bool(jnp.all(res.finite))
        # strided sampling shares the conversion (subsampled table)
        res250 = sample(trainer.denoise_fn(state.eval_params(cfg)),
                        trainer.schedule_for(state.params),
                        cfg.replace(sample_steps=10), jax.random.key(99),
                        batch)
        assert bool(jnp.all(res250.finite))

    @pytest.mark.slow
    def test_ring_train_step_matches_dense_x0(self):
        from diffusion_model_tpu.data.batch import collate
        from diffusion_model_tpu.data.synthetic import amorphous_cell
        from diffusion_model_tpu.parallel import make_mesh

        cfg = Config(
            n_max=32, L=2, m_hidden_size=32, h_hidden_size=32,
            x_hidden_size=32, m_size=16, spectrum_size=16,
            compressed_spectrum_size=8, compressor_hidden_dim=(8,),
            batch_size=1, optimizer="Adam", lr=1e-3,
            x_parameterization="x0",
        )
        mesh = make_mesh()
        cell = amorphous_cell(seed=5, num_atoms=32,
                              spectrum_size=cfg.spectrum_size)
        batch = collate([cell], cfg.n_max)
        trainer = Trainer(cfg)
        state0 = trainer.init_state(jax.random.key(0), batch)
        key = jax.random.key(7)
        _, dense_m = trainer.train_step(state0, key, batch)
        ring_state, ring_m = trainer.ring_train_step_fn(mesh)(
            state0, key, batch)
        assert np.isfinite(float(ring_m["loss"]))
        np.testing.assert_allclose(float(ring_m["loss"]),
                                   float(dense_m["loss"]), rtol=1e-4)

    def test_distill_refuses_x0(self):
        from diffusion_model_tpu.train.distill import distill_loss

        cfg = tiny_cfg(x_parameterization="x0")
        with pytest.raises(NotImplementedError, match="distillation"):
            distill_loss(None, None, None, cfg, None, None,
                         jax.random.key(0), data_and_batch(cfg)[1])
