"""Fused kNN Pallas kernel vs the XLA sparse oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.config import Config
from diffusion_model_tpu.nn.egnn import EGCL
from diffusion_model_tpu.ops.edges import knn_edges
from diffusion_model_tpu.ops.egcl_pallas_sparse import (
    _edge_math_sparse,
    egcl_knn_edges,
    egcl_knn_kernel,
)


def _setup(rng, b=2, n=16, k=4, h=10, f1=32, fm=16):
    """Random kernel inputs shaped like one EGCL layer's edge computation."""
    r = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, jnp.float32)
    h_feat = r(b, n, h)
    x = r(b, n, 3) * 2.0
    mask = jnp.asarray(rng.random((b, n)) > 0.2, jnp.float32)
    idx, em = knn_edges(x, mask, k)
    wm_i, wm_j, wm_d = r(h, f1), r(h, f1), r(1, f1)
    wx_i, wx_j, wx_d = r(h, f1), r(h, f1), r(1, f1)
    bm, bx = r(1, f1), r(1, f1)
    am_i = h_feat @ wm_i + bm
    ax_i = h_feat @ wx_i + bx
    weights = dict(
        wm_j=wm_j, wx_j=wx_j, w_dm=wm_d, w_dx=wx_d,
        w2m=r(f1, fm), b2m=r(1, fm), wa=r(fm, 1), ba=r(1, 1),
        w2x=r(f1, f1), b2x=r(1, f1), wx3=r(f1, 1), bx3=r(1, 1),
    )
    return am_i, ax_i, h_feat, x, idx, em, weights


class TestKnnKernel:
    def test_matches_sparse_math(self, rng):
        am_i, ax_i, h, x, idx, em, w = _setup(rng)
        want_m, want_x = _edge_math_sparse(am_i, ax_i, h, x, idx, em, **w)
        got_m, got_x = egcl_knn_kernel(am_i, ax_i, h, x, idx, em,
                                       w["wm_j"], w["wx_j"], w["w_dm"],
                                       w["w_dx"], w["w2m"], w["b2m"],
                                       w["wa"], w["ba"], w["w2x"],
                                       w["b2x"], w["wx3"], w["bx3"],
                                       ti=8, interpret=True)
        np.testing.assert_allclose(np.asarray(want_m), np.asarray(got_m),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(want_x), np.asarray(got_x),
                                   rtol=2e-5, atol=2e-5)

    def test_sparse_math_matches_egcl_layer(self, rng):
        """The backward-definition math (_edge_math_sparse) reproduces the
        real EGCL sparse path over the SAME flax parameters — so the
        kernel's oracle is the production layer, not a restatement."""
        cfg_kw = dict(m_hidden=32, m_out=16, x_hidden=32, h_hidden=32,
                      h_out=10, compute_dtype=jnp.float32,
                      zero_init_x=False)
        layer = EGCL(**cfg_kw)
        b, n, k, hdim = 2, 16, 4, 10
        h = jnp.asarray(rng.normal(size=(b, n, hdim)) * 0.3, jnp.float32)
        x = jnp.asarray(rng.normal(size=(b, n, 3)) * 2.0, jnp.float32)
        mask = jnp.asarray(rng.random((b, n)) > 0.2, jnp.float32)
        idx, em = knn_edges(x, mask, k)
        params = layer.init(jax.random.key(0), h, x, (idx, em))
        want_h, want_x = layer.apply(params, h, x, (idx, em))

        lp = params["params"]
        m0k = lp["mlp_m_dense0"]["kernel"]
        x0k = lp["mlp_x_dense0"]["kernel"]
        am_i = h @ m0k[:hdim] + lp["mlp_m_dense0"]["bias"]
        ax_i = h @ x0k[:hdim] + lp["mlp_x_dense0"]["bias"]
        m_sum, x_out = _edge_math_sparse(
            am_i, ax_i, h, x, idx, em,
            wm_j=m0k[hdim:2 * hdim], wx_j=x0k[hdim:2 * hdim],
            w_dm=m0k[2 * hdim:], w_dx=x0k[2 * hdim:],
            w2m=lp["mlp_m_dense1"]["kernel"],
            b2m=lp["mlp_m_dense1"]["bias"][None],
            wa=lp["attention_dense"]["kernel"],
            ba=lp["attention_dense"]["bias"][None],
            w2x=lp["mlp_x_dense1"]["kernel"],
            b2x=lp["mlp_x_dense1"]["bias"][None],
            wx3=lp["mlp_x_dense2"]["kernel"],
            bx3=lp["mlp_x_dense2"]["bias"][None],
        )
        # finish the layer: node MLP over [h | m_sum]
        cat = jnp.concatenate([h, m_sum], axis=-1)
        h0, h1 = lp["mlp_h_dense0"], lp["mlp_h_dense1"]
        h_new = jax.nn.silu(cat @ h0["kernel"] + h0["bias"]) \
            @ h1["kernel"] + h1["bias"]
        np.testing.assert_allclose(np.asarray(want_h), np.asarray(h_new),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(want_x), np.asarray(x_out),
                                   rtol=2e-5, atol=2e-5)

    def test_grads_flow(self, rng):
        """Custom VJP: gradients through the kernel (XLA sparse backward)
        are finite and match direct differentiation of the sparse math."""
        am_i, ax_i, h, x, idx, em, w = _setup(rng)
        worder = (w["wm_j"], w["wx_j"], w["w_dm"], w["w_dx"], w["w2m"],
                  w["b2m"], w["wa"], w["ba"], w["w2x"], w["b2x"],
                  w["wx3"], w["bx3"])

        def loss_kernel(am_i, x, w2m):
            m, xo = egcl_knn_edges(am_i, ax_i, h, x, idx, em,
                                   *worder[:4], w2m, *worder[5:],
                                   8, True)
            return jnp.sum(m ** 2) + jnp.sum(xo ** 2)

        def loss_math(am_i, x, w2m):
            m, xo = _edge_math_sparse(am_i, ax_i, h, x, idx, em,
                                      *worder[:4], w2m, *worder[5:])
            return jnp.sum(m ** 2) + jnp.sum(xo ** 2)

        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(am_i, x, w["w2m"])
        g_m = jax.grad(loss_math, argnums=(0, 1, 2))(am_i, x, w["w2m"])
        for a, b_ in zip(g_k, g_m):
            assert bool(jnp.all(jnp.isfinite(a)))
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4)

    def test_indivisible_raises(self, rng):
        am_i, ax_i, h, x, idx, em, w = _setup(rng, n=12)
        with pytest.raises(ValueError, match="multiple of ti"):
            egcl_knn_kernel(am_i, ax_i, h, x, idx, em,
                            w["wm_j"], w["wx_j"], w["w_dm"], w["w_dx"],
                            w["w2m"], w["b2m"], w["wa"], w["ba"],
                            w["w2x"], w["b2x"], w["wx3"], w["bx3"],
                            ti=8, interpret=True)


class TestKernelRouting:
    def test_sampling_uses_pallas_decision(self):
        """The measured default (docs/perf/pallas_sparse_check.json):
        kNN sampling auto-routes through the fused kernel only at the
        measured-win scale (>=2048 atoms); use_pallas forces it;
        virtual_node composes (its O(N) channel runs in XLA outside the
        kernel, nn/fast_apply.py vn_channel) while the edge-topology
        levers (edge_rbf, global_radius_feature) opt out."""
        from diffusion_model_tpu.api import sampling_uses_pallas

        base = dict(n_max=2048, neighbor_k=32)
        assert sampling_uses_pallas(Config(**base))
        assert not sampling_uses_pallas(Config(n_max=1024, neighbor_k=32))
        assert not sampling_uses_pallas(Config(n_max=4096))  # dense
        assert sampling_uses_pallas(
            Config(**base, virtual_node=True))
        # the kernel's tile size requires n_max % 8 == 0 — a config that
        # samples fine on XLA must never crash via the auto-route
        assert not sampling_uses_pallas(Config(n_max=2050, neighbor_k=32))
        assert not sampling_uses_pallas(Config(**base, edge_rbf=8))
        assert not sampling_uses_pallas(
            Config(**base, global_radius_feature=True))
        assert sampling_uses_pallas(
            Config(n_max=192, use_pallas=True))  # manual force
