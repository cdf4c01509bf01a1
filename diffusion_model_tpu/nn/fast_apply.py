"""Functional fast-path denoiser apply using the fused Pallas EGCL kernel.

Consumes the exact parameter pytree produced by ``DiffusionDenoiser.init``
(flax stays the source of truth for init/training); this path re-implements
the forward walk with the per-edge work dispatched to
``ops.egcl_pallas.egcl_pair_edges`` — differentiable (custom VJP with the
XLA dense-math backward), so both sampling and gradient-carrying uses (e.g.
Kabsch-loss reverse chains) can run it. The XLA dense path remains the
correctness oracle and the default (it measured faster — docs/ROADMAP.md).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from diffusion_model_tpu.config import Config
from diffusion_model_tpu.ops.com import remove_mean
from diffusion_model_tpu.ops.egcl_pallas import egcl_pair_edges
from diffusion_model_tpu.ops.egcl_pallas_sparse import egcl_knn_edges


def _dense(p, v):
    return v @ p["kernel"] + p["bias"]


def _compressor_apply(params, spectrum, dt):
    y = spectrum.astype(dt)
    i = 0
    while f"dense{i}" in params:
        y = jax.nn.relu(_dense(
            jax.tree.map(lambda a: a.astype(dt), params[f"dense{i}"]), y
        ))
        i += 1
    y = _dense(
        jax.tree.map(lambda a: a.astype(dt), params["dense_out"]), y
    )
    return y.astype(spectrum.dtype)


def fast_denoise_fn(cfg: Config, denoiser_params,
                    interpret: bool = False) -> Callable:
    """Build ``(species_ch, pos, spectrum, exo, t_norm, mask, pair_mask) ->
    (eps_x, eps_h)`` matching ``DiffusionDenoiser.apply`` over the same
    params, with Pallas EGCL edge kernels."""
    if cfg.global_radius_feature:
        raise NotImplementedError(
            "global_radius_feature is not wired into the Pallas fast path"
            " — use the XLA path (use_pallas=False)"
        )
    if cfg.edge_rbf:
        raise NotImplementedError(
            "edge_rbf is not wired into the Pallas fast path — use the "
            "XLA path (use_pallas=False)"
        )
    p = denoiser_params["params"]
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    hdim = cfg.h_size
    # Mosaic kernels need TPU hardware; on CPU fall back to the
    # interpreter automatically (slow, for tests/debug only).
    interpret = interpret or jax.default_backend() == "cpu"

    layers = []
    for l in range(cfg.L):
        lp = p["egnn"][f"egcl_{l}"]
        m0k = lp["mlp_m_dense0"]["kernel"]
        x0k = lp["mlp_x_dense0"]["kernel"]
        layers.append({
            "m_wi": m0k[:hdim].astype(dt),
            "m_wj": m0k[hdim : 2 * hdim].astype(dt),
            "m_wd": m0k[2 * hdim :].astype(dt),            # [1, F1]
            "m_b": lp["mlp_m_dense0"]["bias"].astype(dt),
            "x_wi": x0k[:hdim].astype(dt),
            "x_wj": x0k[hdim : 2 * hdim].astype(dt),
            "x_wd": x0k[2 * hdim :].astype(dt),
            "x_b": lp["mlp_x_dense0"]["bias"].astype(dt),
            "w2m": lp["mlp_m_dense1"]["kernel"].astype(dt),
            "b2m": lp["mlp_m_dense1"]["bias"][None].astype(jnp.float32),
            "wa": lp["attention_dense"]["kernel"].astype(jnp.float32),
            "ba": lp["attention_dense"]["bias"][None].astype(jnp.float32),
            "w2x": lp["mlp_x_dense1"]["kernel"].astype(dt),
            "b2x": lp["mlp_x_dense1"]["bias"][None].astype(jnp.float32),
            "wx3": lp["mlp_x_dense2"]["kernel"].astype(jnp.float32),
            "bx3": lp["mlp_x_dense2"]["bias"][None].astype(jnp.float32),
            "h0": lp["mlp_h_dense0"],
            "h1": lp["mlp_h_dense1"],
        })
        if cfg.virtual_node:
            # vn channel params (nn/egnn.py _virtual_channel layout)
            layers[-1]["vn"] = {
                k: jax.tree.map(lambda a: a, lp[k])
                for k in ("vnode_in", "vnode_pool", "vnode_out",
                          "vnode_x", "vnode_x_head")
            }
    comp = p.get("spectrum_compressor")
    hdim_feat = cfg.h_size

    def vn_channel(vp, h_c, x, mask):
        """Virtual-node global-context channel (VERDICT r4 #4): exactly
        the O(N) XLA math of nn/egnn.py ``_virtual_channel`` — computed
        OUTSIDE the edge loop, so it composes with both Pallas kernels
        without touching Mosaic code. Returns (vn_msg dt, x_vn f32)."""
        from diffusion_model_tpu.ops.com import masked_mean

        f32 = jnp.float32
        m3_f = mask[..., None].astype(f32)
        m3_dt = mask[..., None].astype(dt)
        h_m = h_c * m3_dt
        x_f = x.astype(f32)
        x_v = masked_mean(x_f, mask)                         # [B,1,3]
        diff = (x_f - x_v) * m3_f
        r2_f = jnp.sum(diff * diff, axis=-1, keepdims=True)  # [B,N,1]
        r2 = r2_f.astype(dt)

        vin = jax.tree.map(lambda a: a.astype(dt), vp["vnode_in"])
        vpool = jax.tree.map(lambda a: a.astype(dt), vp["vnode_pool"])
        u = jax.nn.silu(_dense(vin, jnp.concatenate([h_m, r2], axis=-1)))
        u = u * m3_dt
        h_v = jax.nn.silu(_dense(vpool, masked_mean(u, mask)))  # [B,1,V]
        vdim = h_v.shape[-1]

        def global_first(gp):
            k = gp["kernel"].astype(dt)
            return (h_m @ k[:hdim_feat]
                    + h_v @ k[hdim_feat:hdim_feat + vdim]
                    + r2 * k[hdim_feat + vdim]
                    + gp["bias"].astype(dt))

        vn_msg = global_first(vp["vnode_out"]) * m3_dt
        s_v = (
            jnp.sum(jax.nn.silu(global_first(vp["vnode_x"]))
                    * vp["vnode_x_head"]["kernel"][:, 0].astype(dt),
                    axis=-1, keepdims=True)
            + vp["vnode_x_head"]["bias"].astype(dt)
        )
        norm = jnp.sqrt(jnp.where(m3_f > 0, jnp.maximum(r2_f, 1e-12), 1.0))
        x_vn = diff * (s_v.astype(f32) / (norm + 1.0)) * m3_f
        return vn_msg, x_vn

    def fn(species_ch, pos, spectrum, exo, t_norm, mask, edges):
        feats = [species_ch]
        if cfg.conditional:
            if cfg.to_compress_spectrum:
                feats.append(_compressor_apply(comp, spectrum, dt))
            else:
                feats.append(spectrum)
        if cfg.give_exO:
            feats.append(exo)
        feats.append(t_norm)
        h = jnp.concatenate(feats, axis=-1)

        x = pos
        mask3 = mask[..., None]
        for lp in layers:
            h_c = h.astype(dt)
            vn = (vn_channel(lp["vn"], h_c, x, mask)
                  if cfg.virtual_node else None)
            am_i = h_c @ lp["m_wi"] + lp["m_b"]
            ax_i = h_c @ lp["x_wi"] + lp["x_b"]
            if isinstance(edges, tuple):
                # fixed-degree kNN topology: fused sparse kernel
                # (ops/egcl_pallas_sparse.py) — the j-projections run
                # in-kernel, so only h_c and the small gathered features
                # cross HBM
                idx, em = edges
                m_sum, x_new = egcl_knn_edges(
                    am_i, ax_i, h_c, x.astype(jnp.float32), idx, em,
                    lp["m_wj"], lp["x_wj"], lp["m_wd"], lp["x_wd"],
                    lp["w2m"], lp["b2m"], lp["wa"], lp["ba"], lp["w2x"],
                    lp["b2x"], lp["wx3"], lp["bx3"],
                    8, interpret,  # positional: custom_vjp nondiff args
                )
            else:
                am_j = h_c @ lp["m_wj"]
                ax_j = h_c @ lp["x_wj"]
                m_sum, x_new = egcl_pair_edges(
                    am_i, am_j, ax_i, ax_j, x.astype(jnp.float32),
                    mask3.astype(jnp.float32),
                    lp["m_wd"], lp["x_wd"], lp["w2m"], lp["b2m"],
                    lp["wa"], lp["ba"], lp["w2x"], lp["b2x"], lp["wx3"],
                    lp["bx3"],
                    8, interpret,
                )
            if vn is not None:
                m_sum = m_sum + vn[0].astype(m_sum.dtype)
                x_new = x_new + vn[1].astype(x_new.dtype)
            cat = jnp.concatenate([h_c, m_sum.astype(dt)], axis=-1)
            h0 = jax.tree.map(lambda a: a.astype(dt), lp["h0"])
            h1 = jax.tree.map(lambda a: a.astype(dt), lp["h1"])
            h_upd = _dense(h1, jax.nn.silu(_dense(h0, cat)))
            if cfg.h_residual and h_upd.shape[-1] == h_c.shape[-1]:
                h_upd = h_upd + h_c
            h = h_upd.astype(h.dtype)
            x = x_new.astype(pos.dtype)

        eps_x = remove_mean((x - pos) * mask3, mask)
        eps_h = h[..., : cfg.atom_type_size] * mask3
        return eps_x, eps_h

    return fn
