"""Pallas fused EGCL kernel vs the XLA dense oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.config import Config
from diffusion_model_tpu.data.batch import collate
from diffusion_model_tpu.data.synthetic import synthetic_sio2_dataset
from diffusion_model_tpu.nn import DiffusionDenoiser
from diffusion_model_tpu.nn.fast_apply import fast_denoise_fn


def make_setup(n_max=16, b=2, zero_init=False):
    cfg = Config(
        n_max=n_max, L=2, m_hidden_size=32, h_hidden_size=32,
        x_hidden_size=32, m_size=16, spectrum_size=24,
        compressed_spectrum_size=8, compressor_hidden_dim=(16,),
        zero_init_x=zero_init,
    )
    graphs = synthetic_sio2_dataset(0, b, cfg.n_max,
                                    spectrum_size=cfg.spectrum_size,
                                    shells=2)
    batch = collate(graphs, cfg.n_max)
    model = DiffusionDenoiser(cfg)
    n = cfg.n_max
    t_norm = jnp.full((b, n, 1), 0.4) * batch.mask[..., None]
    rng = np.random.default_rng(5)
    species_ch = jnp.asarray(rng.normal(size=(b, n, 2)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    params = model.init(jax.random.key(0), species_ch, pos, batch.spectrum,
                        batch.exo, t_norm, batch.mask, batch.pair_mask())
    args = (species_ch, pos, batch.spectrum, batch.exo, t_norm, batch.mask,
            batch.pair_mask())
    return cfg, model, params, args


class TestPallasEGCL:
    @pytest.mark.slow
    def test_matches_xla_path(self):
        cfg, model, params, args = make_setup()
        want_x, want_h = model.apply(params, *args)
        fast = fast_denoise_fn(cfg, params, interpret=True)
        got_x, got_h = fast(*args)
        np.testing.assert_allclose(np.asarray(want_x), np.asarray(got_x),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(want_h), np.asarray(got_h),
                                   rtol=2e-4, atol=2e-5)

    def test_matches_with_nontrivial_x_branch(self):
        # zero_init_x=False so the coordinate branch carries real signal
        cfg, model, params, args = make_setup(zero_init=False, n_max=24, b=1)
        want_x, want_h = model.apply(params, *args)
        fast = fast_denoise_fn(cfg, params, interpret=True)
        got_x, got_h = fast(*args)
        np.testing.assert_allclose(np.asarray(want_x), np.asarray(got_x),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(want_h), np.asarray(got_h),
                                   rtol=5e-4, atol=5e-5)

    def test_padding_inert(self):
        cfg, model, params, args = make_setup(n_max=16, b=2)
        fast = fast_denoise_fn(cfg, params, interpret=True)
        eps_x, eps_h = fast(*args)
        mask = np.asarray(args[5])
        np.testing.assert_allclose(np.asarray(eps_x)[mask == 0], 0.0)
        np.testing.assert_allclose(np.asarray(eps_h)[mask == 0], 0.0)

    def test_knn_topology_matches_xla_sparse_path(self):
        """use_pallas + neighbor_k routes each layer through the fused kNN
        kernel (ops/egcl_pallas_sparse.py) — must match the XLA sparse
        path of the same params (the 512-atom model class)."""
        from diffusion_model_tpu.ops.edges import knn_edges

        cfg, model, params, args = make_setup(zero_init=False, n_max=24,
                                              b=2)
        cfg = cfg.replace(neighbor_k=6)
        species_ch, pos, spectrum, exo, t_norm, mask, _ = args
        edges = knn_edges(pos, mask, cfg.neighbor_k)
        want_x, want_h = model.apply(params, species_ch, pos, spectrum,
                                     exo, t_norm, mask, edges)
        fast = fast_denoise_fn(cfg, params, interpret=True)
        got_x, got_h = fast(species_ch, pos, spectrum, exo, t_norm, mask,
                            edges)
        np.testing.assert_allclose(np.asarray(want_x), np.asarray(got_x),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(want_h), np.asarray(got_h),
                                   rtol=5e-4, atol=5e-5)


class TestPallasSamplerIntegration:
    @pytest.mark.slow
    def test_api_generate_use_pallas(self, tmp_path):
        """cfg.use_pallas routes api.generate through the fused kernel
        (interpreter on CPU)."""
        from diffusion_model_tpu import api
        from diffusion_model_tpu.data.synthetic import synthetic_sio2_dataset

        cfg = Config(
            n_max=8, L=1, m_hidden_size=16, h_hidden_size=16,
            x_hidden_size=16, m_size=8, spectrum_size=16,
            compressed_spectrum_size=8, compressor_hidden_dim=(8,),
            num_diffusion_timestep=4, batch_size=8, optimizer="Adam",
            noise_precision=0.05, gen_num_per_spectrum=1,
        )
        graphs = synthetic_sio2_dataset(1, 16, cfg.n_max,
                                        spectrum_size=cfg.spectrum_size)
        trainer, state, (tr, va, te) = api.train(
            cfg, graphs, str(tmp_path / "r"), num_epochs=1
        )
        res_xla = api.generate(cfg, trainer, state, te)
        res_pallas = api.generate(cfg.replace(use_pallas=True), trainer,
                                  state, te)
        np.testing.assert_allclose(res_xla["generated_pos"],
                                   res_pallas["generated_pos"],
                                   rtol=1e-4, atol=1e-5)


class TestPallasVJP:
    """Custom VJP of the fused kernel: Pallas forward + XLA dense-math
    backward (ops/egcl_pallas.egcl_pair_edges)."""

    def _edge_args(self, f1=8, fm=8, n=8, b=1, seed=0):
        rng = np.random.default_rng(seed)

        def r(*shape, s=0.4):
            return jnp.asarray(rng.normal(size=shape) * s, jnp.float32)

        mask = np.ones((b, n, 1), np.float32)
        mask[:, -2:] = 0.0  # padded rows must stay inert in gradients too
        return (
            r(b, n, f1), r(b, n, f1), r(b, n, f1), r(b, n, f1),
            r(b, n, 3, s=1.5), jnp.asarray(mask),
            r(1, f1), r(1, f1), r(f1, fm), r(1, fm),
            r(fm, 1), r(1, 1), r(f1, f1), r(1, f1), r(f1, 1), r(1, 1),
        )

    def test_grad_equals_dense_math_autodiff(self):
        """Gradients through the custom-VJP'd kernel must equal autodiff of
        the f32 dense statement of the same math, for every tensor arg.
        (Finite differences are hopeless here: the quadratic loss sits at
        ~3e2 where f32 resolution swamps 1e-3 perturbations.)"""
        from diffusion_model_tpu.ops.egcl_pallas import (
            _edge_math_dense,
            egcl_pair_edges,
        )

        args = self._edge_args()

        def loss_pallas(*a):
            m_sum, x_out = egcl_pair_edges(*a, 8, True)
            return jnp.sum(m_sum**2) + jnp.sum(x_out**2)

        def loss_dense(*a):
            m_sum, x_out = _edge_math_dense(*a)
            return jnp.sum(m_sum**2) + jnp.sum(x_out**2)

        idxs = tuple(range(16))
        g_p = jax.grad(loss_pallas, argnums=idxs)(*args)
        g_d = jax.grad(loss_dense, argnums=idxs)(*args)
        for i, (a, b) in enumerate(zip(g_p, g_d)):
            # the cotangents entering the backward come from the bf16
            # kernel's forward output, hence the loose-ish tolerance
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-5,
                                       err_msg=f"grad arg {i}")
            assert np.isfinite(np.asarray(a)).all()

    @pytest.mark.slow
    def test_end_to_end_pos_grad_matches_dense_path(self):
        """d loss / d positions through the full fast path equals the XLA
        dense model's gradient (independent code path as oracle)."""
        cfg, model, params, args = make_setup(zero_init=False, n_max=16, b=1)

        def loss_dense(pos):
            a = (args[0], pos) + args[2:]
            eps_x, eps_h = model.apply(params, *a)
            return jnp.sum(eps_x**2) + jnp.sum(eps_h**2)

        fast = fast_denoise_fn(cfg, params, interpret=True)

        def loss_fast(pos):
            a = (args[0], pos) + args[2:]
            eps_x, eps_h = fast(*a)
            return jnp.sum(eps_x**2) + jnp.sum(eps_h**2)

        g_dense = jax.grad(loss_dense)(args[1])
        g_fast = jax.grad(loss_fast)(args[1])
        np.testing.assert_allclose(np.asarray(g_dense), np.asarray(g_fast),
                                   rtol=5e-3, atol=5e-4)

    def test_padded_rows_get_zero_grad(self):
        from diffusion_model_tpu.ops.egcl_pallas import egcl_pair_edges

        args = self._edge_args()

        def loss(pos):
            a = args[:4] + (pos,) + args[5:]
            m_sum, x_out = egcl_pair_edges(*a, 8, True)
            mask = args[5]
            return jnp.sum((m_sum * mask) ** 2) + jnp.sum(
                (x_out * mask) ** 2)

        g = np.asarray(jax.grad(loss)(args[4]))
        assert np.abs(g[:, -2:]).max() == 0.0
        assert np.abs(g[:, :-2]).max() > 0.0


class TestVirtualNodeFastPath:
    """VERDICT r4 #4: the vn channel is O(N) XLA work outside the edge
    loop — it must compose with BOTH Pallas kernels (the 512-atom recipe
    h_residual+virtual_node finally has a kernel customer)."""

    def _vn_setup(self, n_max=24, b=2, knn=0):
        cfg, model, params, args = make_setup(zero_init=False,
                                              n_max=n_max, b=b)
        cfg = cfg.replace(virtual_node=True, h_residual=True,
                          neighbor_k=knn)
        model = type(model)(cfg)
        species_ch, pos, spectrum, exo, t_norm, mask, pm = args
        if knn:
            from diffusion_model_tpu.ops.edges import knn_edges

            edges = knn_edges(pos, mask, knn)
        else:
            edges = pm
        params = model.init(jax.random.key(1), species_ch, pos, spectrum,
                            exo, t_norm, mask, edges)
        return cfg, model, params, (species_ch, pos, spectrum, exo,
                                    t_norm, mask, edges)

    def test_dense_kernel_with_virtual_node(self):
        cfg, model, params, args = self._vn_setup()
        want_x, want_h = model.apply(params, *args)
        fast = fast_denoise_fn(cfg, params, interpret=True)
        got_x, got_h = fast(*args)
        np.testing.assert_allclose(np.asarray(want_x), np.asarray(got_x),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(want_h), np.asarray(got_h),
                                   rtol=5e-4, atol=5e-5)

    def test_knn_kernel_with_virtual_node(self):
        cfg, model, params, args = self._vn_setup(knn=6)
        want_x, want_h = model.apply(params, *args)
        fast = fast_denoise_fn(cfg, params, interpret=True)
        got_x, got_h = fast(*args)
        np.testing.assert_allclose(np.asarray(want_x), np.asarray(got_x),
                                   rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose(np.asarray(want_h), np.asarray(got_h),
                                   rtol=5e-4, atol=5e-5)

    def test_padding_inert_with_virtual_node(self):
        """The vn CoM/pool must not leak padded nodes into real outputs."""
        cfg, model, params, args = self._vn_setup(n_max=16, b=2)
        fast = fast_denoise_fn(cfg, params, interpret=True)
        eps_x, eps_h = fast(*args)
        mask = np.asarray(args[5])
        np.testing.assert_allclose(np.asarray(eps_x)[mask == 0], 0.0)
        np.testing.assert_allclose(np.asarray(eps_h)[mask == 0], 0.0)

    def test_auto_route_accepts_virtual_node(self):
        from diffusion_model_tpu.api import sampling_uses_pallas

        base = dict(neighbor_k=32, n_max=2048)
        assert sampling_uses_pallas(Config(**base, virtual_node=True,
                                           h_residual=True))
        # n_max not divisible by the tile size must NOT auto-route
        # (ADVICE r4: the kernel raises on N % 8 != 0)
        assert not sampling_uses_pallas(Config(neighbor_k=32, n_max=2050))
        assert not sampling_uses_pallas(Config(**base, edge_rbf=8))
