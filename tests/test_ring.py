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
from diffusion_model_tpu.parallel.ring import (
    ring_denoise_apply,
    ring_denoise_fn,
)


def _liven_levers(params, rng):
    """Re-randomise the zero-init virtual-node / RBF heads (and the radius
    gate) so the lever channels actually contribute — at init they are
    exact no-ops by construction and a parity test would test nothing."""
    p = params["params"]
    for lp in p["egnn"].values():
        for name in ("vnode_out", "vnode_x_head", "rbf_m", "rbf_x"):
            if name in lp:
                k = lp[name]["kernel"]
                lp[name]["kernel"] = jnp.asarray(
                    rng.normal(size=k.shape) * 0.3, k.dtype)
    if "radius_feature_gate" in p:
        p["radius_feature_gate"] = jnp.asarray([0.7], jnp.float32)
    return params


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

    def test_lever_stack_matches_dense_oracle(self, rng):
        """The winning 512-atom recipe (h_residual + virtual_node +
        edge_rbf, plus the gated global-radius feature) through the ring
        must reproduce the dense oracle — the whole point of the ring path
        is cells too big for one chip, which are exactly the cells that
        need these levers (VERDICT r3 weak #2)."""
        cfg = Config(
            n_max=32, L=2, m_hidden_size=32, h_hidden_size=32,
            x_hidden_size=32, m_size=16, spectrum_size=16,
            compressed_spectrum_size=8, compressor_hidden_dim=(8,),
            zero_init_x=False, h_residual=True, virtual_node=True,
            edge_rbf=6, global_radius_feature=True,
        )
        mesh = make_mesh()
        cell = amorphous_cell(seed=11, num_atoms=29,
                              spectrum_size=cfg.spectrum_size)
        batch = collate([cell], cfg.n_max)
        b, n = batch.mask.shape
        t_norm = jnp.full((b, n, 1), 0.4) * batch.mask[..., None]
        species = jnp.asarray(rng.normal(size=(b, n, 2)), jnp.float32)

        model = DiffusionDenoiser(cfg)
        args = (species, batch.pos, batch.spectrum, batch.exo, t_norm,
                batch.mask)
        params = model.init(jax.random.key(0), *args, batch.pair_mask())
        params = _liven_levers(params, rng)
        want_x, want_h = model.apply(params, *args, batch.pair_mask())

        ring = ring_denoise_fn(cfg, params, mesh)
        got_x, got_h = jax.jit(ring)(
            species[0], batch.pos[0], batch.spectrum[0], batch.exo[0],
            t_norm[0], batch.mask[0],
        )
        np.testing.assert_allclose(np.asarray(want_x[0]), np.asarray(got_x),
                                   rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(want_h[0]), np.asarray(got_h),
                                   rtol=3e-4, atol=3e-5)

    @pytest.mark.slow
    def test_lever_stack_grad_parity(self, rng):
        """Parameter gradients through the ring with the full lever stack
        (psum-pooled virtual node, RBF edge features, radius-gate prologue)
        match the dense oracle."""
        cfg = Config(
            n_max=32, L=2, m_hidden_size=32, h_hidden_size=32,
            x_hidden_size=32, m_size=16, spectrum_size=16,
            compressed_spectrum_size=8, compressor_hidden_dim=(8,),
            zero_init_x=False, h_residual=True, virtual_node=True,
            edge_rbf=6, global_radius_feature=True,
        )
        mesh = make_mesh()
        cell = amorphous_cell(seed=13, num_atoms=29,
                              spectrum_size=cfg.spectrum_size)
        batch = collate([cell], cfg.n_max)
        b, n = batch.mask.shape
        t_norm = jnp.full((b, n, 1), 0.3) * batch.mask[..., None]
        species = jnp.asarray(rng.normal(size=(b, n, 2)), jnp.float32)
        args = (species, batch.pos, batch.spectrum, batch.exo, t_norm,
                batch.mask)

        model = DiffusionDenoiser(cfg)
        params = model.init(jax.random.key(0), *args, batch.pair_mask())
        params = _liven_levers(params, rng)
        tx = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        th = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)

        def dense_loss(p):
            ex, eh = model.apply(p, *args, batch.pair_mask())
            return jnp.sum(ex[0] * tx) + jnp.sum(eh[0] * th)

        ring = ring_denoise_apply(cfg, mesh)
        flat = [a[0] for a in args]

        def ring_loss(p):
            ex, eh = ring(p, *flat)
            return jnp.sum(ex * tx) + jnp.sum(eh * th)

        g_dense = jax.grad(dense_loss)(params)
        g_ring = jax.jit(jax.grad(ring_loss))(params)
        flat_d, _ = jax.tree_util.tree_flatten_with_path(g_dense)
        flat_r = jax.tree_util.tree_leaves(g_ring)
        assert len(flat_d) == len(flat_r)
        # ring psum vs dense-sum reduction orders differ; with the pooled
        # vn channel in the chain the noise floor on near-cancelled
        # entries is ~3e-4 absolute (measured 1/512 elements)
        for (path, d), r in zip(flat_d, flat_r):
            np.testing.assert_allclose(
                np.asarray(d), np.asarray(r), rtol=1e-2, atol=5e-4,
                err_msg=jax.tree_util.keystr(path),
            )

    @pytest.mark.slow
    def test_grad_parity_with_dense_oracle(self, rng):
        """shard_map is differentiable: parameter gradients through the
        ppermute ring must match the dense single-device oracle (the
        replicated-params broadcast transposes to a psum of per-device
        cotangents; ppermute to its inverse rotation)."""
        cfg = Config(
            n_max=32, L=2, m_hidden_size=32, h_hidden_size=32,
            x_hidden_size=32, m_size=16, spectrum_size=16,
            compressed_spectrum_size=8, compressor_hidden_dim=(8,),
            zero_init_x=False,
        )
        mesh = make_mesh()
        cell = amorphous_cell(seed=3, num_atoms=29,
                              spectrum_size=cfg.spectrum_size)
        batch = collate([cell], cfg.n_max)
        b, n = batch.mask.shape
        t_norm = jnp.full((b, n, 1), 0.3) * batch.mask[..., None]
        species = jnp.asarray(rng.normal(size=(b, n, 2)), jnp.float32)
        args = (species, batch.pos, batch.spectrum, batch.exo, t_norm,
                batch.mask)

        model = DiffusionDenoiser(cfg)
        params = model.init(jax.random.key(0), *args, batch.pair_mask())
        # fixed cotangent-style targets make the scalar loss generic
        tx = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        th = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)

        def dense_loss(p):
            ex, eh = model.apply(p, *args, batch.pair_mask())
            return jnp.sum(ex[0] * tx) + jnp.sum(eh[0] * th)

        ring = ring_denoise_apply(cfg, mesh)
        flat = [a[0] for a in args]

        def ring_loss(p):
            ex, eh = ring(p, *flat)
            return jnp.sum(ex * tx) + jnp.sum(eh * th)

        g_dense = jax.grad(dense_loss)(params)
        g_ring = jax.jit(jax.grad(ring_loss))(params)
        flat_d, _ = jax.tree_util.tree_flatten_with_path(g_dense)
        flat_r = jax.tree_util.tree_leaves(g_ring)
        assert len(flat_d) == len(flat_r)
        # ring psum vs dense-sum reduction orders differ -> ~0.3% element
        # noise on a few entries (measured 2/896 beyond 2e-3)
        for (path, d), r in zip(flat_d, flat_r):
            np.testing.assert_allclose(
                np.asarray(d), np.asarray(r), rtol=1e-2, atol=1e-4,
                err_msg=jax.tree_util.keystr(path),
            )

    @pytest.mark.slow
    def test_ring_train_step_matches_dense(self, rng):
        """One full optimizer step through the ring topology reproduces the
        dense train step (same key -> same noise draw -> same grads ->
        same updated params), upgrading ring support from forward-only
        sampling to training (SURVEY.md §2.6 SP-analogue row)."""
        from diffusion_model_tpu.train import Trainer

        cfg = Config(
            n_max=32, L=2, m_hidden_size=32, h_hidden_size=32,
            x_hidden_size=32, m_size=16, spectrum_size=16,
            compressed_spectrum_size=8, compressor_hidden_dim=(8,),
            batch_size=1, optimizer="Adam", lr=1e-3,
        )
        mesh = make_mesh()
        cell = amorphous_cell(seed=5, num_atoms=32,
                              spectrum_size=cfg.spectrum_size)
        batch = collate([cell], cfg.n_max)
        trainer = Trainer(cfg)
        state0 = trainer.init_state(jax.random.key(0), batch)

        key = jax.random.key(7)
        dense_state, dense_m = trainer.train_step(state0, key, batch)
        ring_step = trainer.ring_train_step_fn(mesh)
        ring_state, ring_m = ring_step(state0, key, batch)

        assert np.isfinite(float(ring_m["loss"]))
        np.testing.assert_allclose(float(ring_m["loss"]),
                                   float(dense_m["loss"]),
                                   rtol=1e-4)
        for (path, d), r in zip(
            jax.tree_util.tree_flatten_with_path(dense_state.params)[0],
            jax.tree_util.tree_leaves(ring_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(d), np.asarray(r), rtol=2e-3, atol=2e-6,
                err_msg=jax.tree_util.keystr(path),
            )
        # a second step keeps training (params keep moving, loss finite)
        ring_state2, m2 = ring_step(ring_state, jax.random.key(8), batch)
        assert np.isfinite(float(m2["loss"]))
        assert int(ring_state2.step) == 2

    @pytest.mark.slow
    def test_ring_train_learned_schedule_and_cfg_matches_dense(self, rng):
        """Ring training with the learned gamma schedule (trained through
        diffuse_batch + the VDM boundary terms, replicated outside
        shard_map) and classifier-free conditioning dropout reproduces the
        dense train step — the restrictions VERDICT r3 weak #2 flagged."""
        from diffusion_model_tpu.train import Trainer

        cfg = Config(
            n_max=32, L=2, m_hidden_size=32, h_hidden_size=32,
            x_hidden_size=32, m_size=16, spectrum_size=16,
            compressed_spectrum_size=8, compressor_hidden_dim=(8,),
            batch_size=1, optimizer="Adam", lr=1e-3,
            noise_schedule="learned", cond_dropout_prob=0.5,
            h_residual=True, virtual_node=True, edge_rbf=6,
        )
        mesh = make_mesh()
        cell = amorphous_cell(seed=17, num_atoms=32,
                              spectrum_size=cfg.spectrum_size)
        batch = collate([cell], cfg.n_max)
        trainer = Trainer(cfg)
        state0 = trainer.init_state(jax.random.key(0), batch)
        assert "gamma" in state0.params

        # a couple of keys so both branches of the dropout bernoulli are
        # plausibly exercised
        for seed in (7, 8):
            key = jax.random.key(seed)
            dense_state, dense_m = trainer.train_step(state0, key, batch)
            ring_step = trainer.ring_train_step_fn(mesh)
            ring_state, ring_m = ring_step(state0, key, batch)
            np.testing.assert_allclose(float(ring_m["loss"]),
                                       float(dense_m["loss"]), rtol=1e-4)
            for (path, d), r in zip(
                jax.tree_util.tree_flatten_with_path(
                    dense_state.params)[0],
                jax.tree_util.tree_leaves(ring_state.params),
            ):
                np.testing.assert_allclose(
                    np.asarray(d), np.asarray(r), rtol=2e-3, atol=2e-6,
                    err_msg=jax.tree_util.keystr(path),
                )

    def test_ring_train_step_guards(self, rng):
        """kabsch_loss must be rejected at construction (silently skipping
        the coordinate loss would train the wrong objective), and a B>1
        batch must be rejected at trace time (the single ring prediction
        would broadcast against every graph's noise targets)."""
        from diffusion_model_tpu.train import Trainer

        base = dict(
            n_max=16, L=2, m_hidden_size=32, h_hidden_size=32,
            x_hidden_size=32, m_size=16, spectrum_size=16,
            compressed_spectrum_size=8, compressor_hidden_dim=(8,),
            batch_size=1, optimizer="Adam", lr=1e-3,
        )
        mesh = make_mesh()
        with pytest.raises(NotImplementedError, match="kabsch_loss"):
            Trainer(Config(**base, kabsch_loss=True)) \
                .ring_train_step_fn(mesh)

        cfg = Config(**base)
        trainer = Trainer(cfg)
        cells = [amorphous_cell(seed=s, num_atoms=16,
                                spectrum_size=cfg.spectrum_size)
                 for s in (1, 2)]
        batch2 = collate(cells, cfg.n_max)
        state = trainer.init_state(jax.random.key(0),
                                   collate(cells[:1], cfg.n_max))
        step = trainer.ring_train_step_fn(mesh)
        with pytest.raises(ValueError, match="one node-sharded graph"):
            step(state, jax.random.key(1), batch2)

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


class TestRingSampling:
    """VERDICT r4 missing #3: end-to-end ring-sharded SAMPLING — the scan
    sampler driven through ring_sampler_denoise_fn must reproduce the
    dense-path sampler bit-comparably (same key stream, same shapes)."""

    def _setup(self, num_atoms=29, n_max=32):
        cfg = Config(
            n_max=n_max, L=2, m_hidden_size=32, h_hidden_size=32,
            x_hidden_size=32, m_size=16, spectrum_size=16,
            compressed_spectrum_size=8, compressor_hidden_dim=(8,),
            num_diffusion_timestep=8, zero_init_x=True,
            gen_num_per_spectrum=2,
            # untrained reverse chains amplify the init noise by
            # ~1/alpha_T; the default noise_precision puts |pos| past the
            # reference's 1000 A accept filter — keep the toy schedule
            # shallow so acceptance semantics are also exercised
            noise_precision=0.05,
        )
        cell = amorphous_cell(seed=3, num_atoms=num_atoms,
                              spectrum_size=cfg.spectrum_size)
        batch = collate([cell], cfg.n_max)
        model = DiffusionDenoiser(cfg)
        b, n = batch.mask.shape
        t_norm = jnp.full((b, n, 1), 0.4) * batch.mask[..., None]
        params = model.init(jax.random.key(0), batch.species, batch.pos,
                            batch.spectrum, batch.exo, t_norm, batch.mask,
                            batch.pair_mask())
        return cfg, cell, batch, model, params

    def test_sampler_matches_dense_path(self):
        from diffusion_model_tpu.diffusion.sampler import sample
        from diffusion_model_tpu.parallel.ring import (
            ring_sampler_denoise_fn,
        )

        cfg, cell, batch, model, params = self._setup()
        mesh = make_mesh()

        dense_fn = lambda *a: model.apply(params, *a)
        want = sample(dense_fn, _sched(cfg, params), cfg,
                      jax.random.key(7), batch)

        ring_cfg = cfg.replace(ring_sample=True)
        ring_fn = ring_sampler_denoise_fn(ring_cfg, params, mesh)
        got = sample(ring_fn, _sched(cfg, params), ring_cfg,
                     jax.random.key(7), batch)
        assert bool(jnp.all(got.finite))
        np.testing.assert_allclose(np.asarray(want.pos),
                                   np.asarray(got.pos),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(want.h), np.asarray(got.h),
                                   rtol=2e-4, atol=2e-4)

    def test_generate_ring_end_to_end(self, tmp_path):
        """api.generate_ring drives conditions x repeats at B=1 and its
        output dict feeds api.evaluate unchanged."""
        from diffusion_model_tpu import api
        from diffusion_model_tpu.train import Trainer, TrainState

        cfg, cell, batch, model, params = self._setup()
        ring_cfg = cfg.replace(ring_sample=True)
        trainer = Trainer(ring_cfg)
        state = trainer.init_state(jax.random.key(0), batch)
        state = TrainState(params={"denoiser": params},
                           opt_state=state.opt_state, step=state.step)
        res = api.generate_ring(
            ring_cfg.replace(optimizer="Adam"), trainer, state,
            [cell, dict(cell, id="second")],
        )
        g = cfg.gen_num_per_spectrum
        assert len(res["ids"]) == 2 * g
        assert res["generated_pos"].shape == (2 * g, cfg.n_max, 3)
        assert res["finite"].all()
        out = api.evaluate(res, str(tmp_path))
        assert out["num_accepted"] == 2 * g

    def test_rejects_knn_and_batches(self):
        from diffusion_model_tpu.parallel.ring import (
            ring_sampler_denoise_fn,
        )

        cfg, cell, batch, model, params = self._setup()
        mesh = make_mesh()
        with pytest.raises(ValueError, match="ring_sample"):
            ring_sampler_denoise_fn(cfg.replace(neighbor_k=4), params,
                                    mesh)
        fn = ring_sampler_denoise_fn(cfg, params, mesh)
        b2 = jax.tree.map(lambda a: jnp.concatenate([a, a]), batch)
        t2 = jnp.full((2, cfg.n_max, 1), 0.4)
        with pytest.raises(ValueError, match="batch_size=2"):
            fn(b2.species, b2.pos, b2.spectrum, b2.exo, t2, b2.mask, None)


def _sched(cfg, params):
    from diffusion_model_tpu.diffusion import predefined_schedule

    return predefined_schedule(cfg)
