"""E(3)-equivariant graph network as dense masked message passing.

TPU-first redesign of the reference EGCL/EquivariantGNN
(ref EquivariantGraphNeuralNetwork.py:6-88). Instead of PyG edge lists +
scatter kernels, graphs are padded ``[B, N, *]`` tensors and the fully
connected edge set is the dense ``[B, N, N]`` pair tensor — every MLP
becomes one large batched matmul on the MXU and the scatter-sum becomes a
masked reduction over the source-node axis.

Message orientation matches the reference exactly: the reference uses PyG
``flow='target_to_source'`` over all ordered pairs (i, j), so node i
aggregates ``sum_j phi(h_i, h_j, |x_i - x_j|^2)``
(ref EquivariantGraphNeuralNetwork.py:10-11,55-65).

Layer semantics reproduced (ref :55-71):
  * edge MLP ``mlp_m``: Linear-SiLU-Linear-SiLU on [h_i | h_j | d2]
  * sigmoid attention gate applied on the h-branch only (the reference
    computes an ``attention`` flag for the x-branch but never uses it)
  * node MLP ``mlp_h``: Linear-SiLU-Linear on [h | sum_j m_ij]
  * coordinate MLP ``mlp_x``: Linear-SiLU-Linear-SiLU-Linear, scalar per
    edge, producing ``x_i += sum_j (x_i - x_j) * s_ij / (norm + 1)``.

The coordinate-update divisor has a ``compat_scalar_norm`` switch: the
reference divides by a *single Frobenius norm over the whole edge batch*
(``torch.norm(coords_i - coords_j)`` without dim=, ref :64). Default is the
correct per-edge norm; the compat flag reproduces the reference bit-for-bit
for validation.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from diffusion_model_tpu.ops.angles import pairwise_sq_dist


def _silu_mlp(features: Sequence[int], final_act: bool, dtype, name: str,
              zero_init_last: bool = False):
    """Linear/SiLU stack; ``features`` lists output sizes of each Linear."""
    layers = []
    for i, f in enumerate(features):
        last = i == len(features) - 1
        kinit = (
            nn.initializers.zeros if (last and zero_init_last)
            else nn.initializers.lecun_normal()
        )
        layers.append(
            nn.Dense(f, dtype=dtype, kernel_init=kinit, name=f"{name}_dense{i}")
        )
        if not last or final_act:
            layers.append(nn.silu)
    return nn.Sequential(layers)


class EGCL(nn.Module):
    """One equivariant graph convolution layer (dense, masked)."""

    m_hidden: int
    m_out: int
    x_hidden: int
    h_hidden: int
    h_out: int
    compat_scalar_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    zero_init_x: bool = True
    # ``zero_init_x`` zero-initialises the final coordinate-MLP layer so an
    # untrained network is the identity on positions. The reference instead
    # relies on a runtime NaN-retry loop to survive early-training reverse
    # chains (ref parts/train_per_iretation.py:376-389); zero output init is
    # the standard diffusion-model fix and changes nothing once trained.

    @nn.compact
    def __call__(self, h, x, pair_mask):
        """Apply the layer.

        Args:
          h: ``[B, N, H]`` node features.
          x: ``[B, N, 3]`` coordinates.
          pair_mask: ``[B, N, N]`` float mask (1 where edge i<-j is real).

        Returns:
          (h', x') with the same shapes; padded nodes pass through unchanged
          in ``x`` and produce zero-masked ``h`` updates.
        """
        dt = self.compute_dtype
        b, n, hdim = h.shape

        mlp_m = _silu_mlp([self.m_hidden, self.m_out], True, dt, "mlp_m")
        mlp_h = _silu_mlp([self.h_hidden, self.h_out], False, dt, "mlp_h")
        mlp_x = _silu_mlp([self.x_hidden, self.x_hidden, 1], False, dt,
                          "mlp_x", zero_init_last=self.zero_init_x)
        att = nn.Dense(1, dtype=dt, name="attention_dense")

        h_c = h.astype(dt)
        x_c = x.astype(dt)
        d2 = pairwise_sq_dist(x_c)[..., None]            # [B,N,N,1]
        h_i = jnp.broadcast_to(h_c[:, :, None, :], (b, n, n, hdim))
        h_j = jnp.broadcast_to(h_c[:, None, :, :], (b, n, n, hdim))
        edge_feat = jnp.concatenate([h_i, h_j, d2], axis=-1)

        # h-branch: edge messages, attention gate, masked sum over sources j.
        m = mlp_m(edge_feat)                              # [B,N,N,m_out]
        m = m * nn.sigmoid(att(m))
        m = m * pair_mask[..., None].astype(dt)
        m_sum = jnp.sum(m, axis=2)                        # [B,N,m_out]
        h_new = mlp_h(jnp.concatenate([h_c, m_sum], axis=-1))

        # x-branch: scalar weight per edge, equivariant difference update.
        s = mlp_x(edge_feat)                              # [B,N,N,1]
        if self.compat_scalar_norm:
            # Frobenius norm over the whole (masked) edge batch, as in
            # ref EquivariantGraphNeuralNetwork.py:64.
            norm = jnp.sqrt(
                jnp.sum(d2[..., 0] * pair_mask.astype(dt), axis=(-1, -2))
            )[..., None, None, None]
        else:
            # safe sqrt: masked (diagonal/padded) pairs have d2 == 0 whose
            # sqrt-gradient is inf; 0*inf = NaN would poison the backward
            # pass through the mask multiply, so substitute 1 under the mask.
            pm = pair_mask[..., None] > 0
            norm = jnp.sqrt(jnp.where(pm, jnp.maximum(d2, 1e-12), 1.0))
        diff = x_c[:, :, None, :] - x_c[:, None, :, :]    # [B,N,N,3]
        upd = diff * s / (norm + 1.0)
        upd = upd * pair_mask[..., None].astype(dt)
        x_new = x_c + jnp.sum(upd, axis=2)

        return h_new.astype(h.dtype), x_new.astype(x.dtype)


class EquivariantGNN(nn.Module):
    """Stack of L EGCLs (ref EquivariantGraphNeuralNetwork.py:73-88)."""

    L: int
    m_hidden: int
    m_out: int
    x_hidden: int
    h_hidden: int
    h_out: int
    compat_scalar_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    zero_init_x: bool = True

    @nn.compact
    def __call__(self, h, x, pair_mask):
        for l in range(self.L):
            h, x = EGCL(
                m_hidden=self.m_hidden,
                m_out=self.m_out,
                x_hidden=self.x_hidden,
                h_hidden=self.h_hidden,
                h_out=self.h_out,
                compat_scalar_norm=self.compat_scalar_norm,
                compute_dtype=self.compute_dtype,
                zero_init_x=self.zero_init_x,
                name=f"egcl_{l}",
            )(h, x, pair_mask)
        return h, x
