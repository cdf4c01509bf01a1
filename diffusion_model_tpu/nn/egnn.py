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

MXU optimisation — node-projection decomposition: the first Linear of an
edge MLP applied to ``[h_i | h_j | d2]`` is algebraically

    W [h_i | h_j | d2] + b = (W_i h_i) + (W_j h_j) + w_d * d2 + b

so the two H-wide blocks are computed per *node* (O(N) matmuls) and
broadcast-added over the pair grid, instead of per *edge* (O(N^2) matmuls
over a 2H+1-wide input that pads badly to the 128-lane MXU tile). Identical
math and identical parameter shapes — the kernel is stored exactly as the
fused ``[2H+1, F]`` matrix.

The coordinate-update divisor has a ``compat_scalar_norm`` switch: the
reference divides by a *single Frobenius norm over the whole edge batch*
(``torch.norm(coords_i - coords_j)`` without dim=, ref :64). Default is the
correct per-edge norm; the compat flag reproduces the reference bit-for-bit
for validation.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusion_model_tpu.ops.angles import pairwise_sq_dist


def _dense_init(key, shape, dtype=jnp.float32):
    return nn.initializers.lecun_normal()(key, shape, dtype)


class _EdgeFirstLayer(nn.Module):
    """First Linear of an edge MLP, evaluated via node projections.

    Parameters are stored as the fused ``kernel [2H+1, F]`` / ``bias [F]``
    (same layout a naive Dense over the concatenated edge feature would
    have), then split into the h_i / h_j / d2 blocks at apply time.
    """

    features: int
    hdim: int
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", _dense_init, (2 * self.hdim + 1, self.features)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )

    def node_projections(self, h):
        """(proj_i + bias ``[B,N,F]``, proj_j ``[B,N,F]``)."""
        dt = self.compute_dtype
        k = self.kernel.astype(dt)
        h = h.astype(dt)
        return h @ k[: self.hdim] + self.bias.astype(dt), \
            h @ k[self.hdim : 2 * self.hdim]

    def d2_row(self):
        return self.kernel[2 * self.hdim].astype(self.compute_dtype)

    def __call__(self, h, d2):
        """h: [B,N,H]; d2: [B,N,N,1] -> [B,N,N,features] pre-activation."""
        proj_i, proj_j = self.node_projections(h)
        return (
            proj_i[:, :, None, :]
            + proj_j[:, None, :, :]
            + d2.astype(self.compute_dtype) * self.d2_row()
        )


class _GlobalFirstLayer(nn.Module):
    """Dense over ``[h | h_v | r2]`` with the graph-constant ``h_v`` block
    projected once per graph.

    Parameter layout is the fused ``kernel [H + V + 1, F]`` / ``bias [F]``
    a plain Dense over the concatenation would have (same init
    distribution, same RNG path — swapping implementations preserves
    checkpoints bit-for-bit); at apply time the ``h_v`` rows multiply the
    ``[B, 1, V]`` vector and broadcast-add instead of re-multiplying the
    identical vector for all N nodes.
    """

    features: int
    hdim: int
    vdim: int
    compute_dtype: jnp.dtype = jnp.float32
    zero_init: bool = False

    def setup(self):
        init = nn.initializers.zeros if self.zero_init else _dense_init
        self.kernel = self.param(
            "kernel", init, (self.hdim + self.vdim + 1, self.features)
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )

    def __call__(self, h, h_v, r2):
        """h: [B,N,H]; h_v: [B,1,V]; r2: [B,N,1] -> [B,N,features]."""
        dt = self.compute_dtype
        k = self.kernel.astype(dt)
        return (
            h.astype(dt) @ k[: self.hdim]
            + h_v.astype(dt) @ k[self.hdim : self.hdim + self.vdim]
            + r2.astype(dt) * k[self.hdim + self.vdim]
            + self.bias.astype(dt)
        )


class _VectorHead(nn.Module):
    """Dense(features=1) evaluated as multiply-reduce on the VPU.

    Parameter layout identical to ``nn.Dense(1)`` (kernel ``[F, 1]``,
    bias ``[1]``) so checkpoints/oracles are unaffected.
    """

    zero_init: bool = False

    @nn.compact
    def __call__(self, v):
        f = v.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal(),
            (f, 1),
        )
        bias = self.param("bias", nn.initializers.zeros, (1,))
        w = kernel[:, 0].astype(v.dtype)
        return jnp.sum(v * w, axis=-1, keepdims=True) + bias.astype(v.dtype)


def _rbf_features(d2_f, valid, num, rmax):
    """Gaussian radial basis of the edge distance, ``[..., num]`` float32.

    ``d2_f`` is the squared distance (float32), ``valid`` a boolean mask of
    real edges. The sqrt is guarded under the mask (d2 == 0 on padded/
    diagonal pairs has an infinite sqrt-gradient; 0 * inf = NaN would
    poison the backward pass — same safe-where pattern as the coordinate
    norm). Centers are ``linspace(0, rmax, num)``, width = center spacing.
    """
    d = jnp.sqrt(jnp.where(valid, jnp.maximum(d2_f, 1e-12), 1.0))
    d = jnp.where(valid, d, 0.0)
    centers = jnp.linspace(0.0, rmax, num, dtype=jnp.float32)
    width = rmax / (num - 1)
    z = (d - centers) / width
    return jnp.exp(-0.5 * z * z)


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
    h_init_scale: float = 1.0
    h_residual: bool = False
    virtual_node: bool = False
    edge_rbf: int = 0
    edge_rbf_rmax: float = 8.0
    # ``edge_rbf`` (config.edge_rbf): K Gaussian radial-basis features of
    # the edge distance, injected into BOTH edge-MLP pre-activations
    # (message and coordinate branches) through separate bias-free
    # ZERO-initialised kernels ``rbf_m [K, m_hidden]`` / ``rbf_x
    # [K, x_hidden]`` — enabling the flag leaves the untrained network
    # bit-identical to the plain one, and the load-bearing fused
    # ``[2H+1, F]`` first-layer kernels are untouched. The reference's
    # only edge-geometry input is the squared distance (ref
    # EquivariantGraphNeuralNetwork.py:55-58); the RBF code gives the MLPs
    # sharp sensitivity at the ~0.1 A bond-length scale.
    # ``virtual_node`` adds a global context channel per layer (retrieved
    # technique: "Fast and Distributed Equivariant GNNs by Virtual Node
    # Learning", PAPERS.md): every node exchanges one extra message with a
    # virtual node sitting at the masked CoM whose feature is a pooled
    # transform of all node features. With kNN edges a node's receptive
    # field is ~L hops of local neighbourhoods — the score cannot
    # coordinate the GLOBAL density envelope / mid-range order of a large
    # cell; the virtual node restores O(1)-hop global communication at
    # O(N) cost. E(3)-correct: the h channel uses only invariants
    # (features, |x_i - x_v|^2), the coordinate update moves nodes along
    # (x_i - x_v) — equivariant because x_v is the masked CoM. Both output
    # heads are ZERO-initialised so enabling the flag leaves the untrained
    # network bit-identical to the plain one (globally-coherent features
    # otherwise re-ignite the ~K-per-layer init blowup, see
    # radius_feature_gate in nn/denoiser.py). Requires ``node_mask``.
    # ``h_residual`` switches the node update to ``h + mlp_h(...)`` when
    # input/output widths match (config.h_residual — conditioning fix for
    # the reference's non-residual update; False = exact reference form).
    # ``h_init_scale`` damps the variance of the node-MLP output kernel
    # (``mlp_h_dense1``) at initialisation. The reference h update is
    # non-residual (``updated_h = mlp_h([h | sum_j m_ij])``, ref
    # EquivariantGraphNeuralNetwork.py:68-69) and the attention-gated SiLU
    # messages are non-negative-biased, so the masked sum over K neighbours
    # adds coherently: at random init ``|h|`` grows ~0.2*K per layer
    # (1e6+ after 5 layers at K=192 dense; repeated first-step NaN at
    # 512-atom kNN-32). Setting the variance multiplier to ~1/K^2 holds
    # the init-time feature scale flat across layers. 1.0 reproduces the
    # default ``lecun_normal`` draw bit-for-bit (same distribution, same
    # key path) and the trained model family is unchanged either way —
    # this moves only the starting point.
    # ``zero_init_x`` zero-initialises the final coordinate-MLP layer so an
    # untrained network is the identity on positions. The reference instead
    # relies on a runtime NaN-retry loop to survive early-training reverse
    # chains (ref parts/train_per_iretation.py:376-389); zero output init is
    # the standard diffusion-model fix and changes nothing once trained.

    @nn.compact
    def __call__(self, h, x, edges, node_mask=None):
        """Apply the layer.

        Args:
          h: ``[B, N, H]`` node features.
          x: ``[B, N, 3]`` coordinates.
          edges: either a dense ``[B, N, N]`` pair mask (fully connected
            graphs, the reference topology) or a tuple
            ``(idx [B, N, K] int32, edge_mask [B, N, K])`` of fixed-degree
            neighbour lists — the padded large-cell topology (SURVEY.md §7:
            N^2 edges explode past ~1024 atoms).
          node_mask: ``[B, N]`` real-node mask; required (and used) only by
            the ``virtual_node`` channel.

        Returns:
          (h', x') with the same shapes; padded nodes pass through unchanged
          in ``x`` and produce zero-masked ``h`` updates.
        """
        dt = self.compute_dtype
        hdim = h.shape[-1]
        m_first = _EdgeFirstLayer(self.m_hidden, hdim, dt,
                                  name="mlp_m_dense0")
        m_second = nn.Dense(self.m_out, dtype=dt, name="mlp_m_dense1")
        # Width-1 output heads (attention logit, coordinate scalar) as
        # explicit multiply-reduce on the VPU: a Dense to 1 output pads the
        # MXU tile 1 -> 128 lanes, wasting a 128x wider matmul.
        att = _VectorHead(name="attention_dense")
        x_first = _EdgeFirstLayer(self.x_hidden, hdim, dt,
                                  name="mlp_x_dense0")
        x_second = nn.Dense(self.x_hidden, dtype=dt, name="mlp_x_dense1")
        x_last = _VectorHead(zero_init=self.zero_init_x, name="mlp_x_dense2")
        h_dense0 = nn.Dense(self.h_hidden, dtype=dt, name="mlp_h_dense0")
        h_dense1 = nn.Dense(
            self.h_out, dtype=dt, name="mlp_h_dense1",
            kernel_init=nn.initializers.variance_scaling(
                self.h_init_scale, "fan_in", "truncated_normal"),
        )
        mods = (m_first, m_second, att, x_first, x_second, x_last,
                h_dense0, h_dense1)

        rbf_mods = None
        if self.edge_rbf:
            # degenerate configs: num=1 makes the width rmax/(num-1) a
            # ZeroDivisionError at trace time; rmax <= 0 a zero/negative
            # width (NaN features). Reject both with a readable error.
            if self.edge_rbf < 2:
                raise ValueError(
                    f"edge_rbf={self.edge_rbf}: need >= 2 Gaussian centers "
                    "(width = rmax/(num-1)); use 0 to disable")
            if not self.edge_rbf_rmax > 0:
                raise ValueError(
                    f"edge_rbf_rmax={self.edge_rbf_rmax} must be > 0")
            rbf_mods = (
                nn.Dense(self.m_hidden, use_bias=False, dtype=dt,
                         kernel_init=nn.initializers.zeros, name="rbf_m"),
                nn.Dense(self.x_hidden, use_bias=False, dtype=dt,
                         kernel_init=nn.initializers.zeros, name="rbf_x"),
            )

        vn = None
        if self.virtual_node:
            if node_mask is None:
                raise ValueError("virtual_node=True requires node_mask")
            vn = self._virtual_channel(h, x, node_mask)

        if isinstance(edges, tuple):
            return self._sparse_call(mods, h, x, *edges, vn=vn,
                                     rbf_mods=rbf_mods)
        return self._dense_call(mods, h, x, edges, vn=vn,
                                rbf_mods=rbf_mods)

    def _virtual_channel(self, h, x, node_mask):
        """Global-context messages through a virtual node at the masked CoM.

        Returns ``(vn_msg [B,N,m_out], x_vn [B,N,3] float32)`` — the h-sum
        contribution (added to the neighbour message sum, so it flows
        through ``mlp_h`` without changing its width/params) and the
        equivariant radial coordinate update. Both heads are zero-init:
        exact no-op at initialisation.
        """
        from diffusion_model_tpu.ops.com import masked_mean

        dt = self.compute_dtype
        m3 = node_mask[..., None].astype(jnp.float32)
        h_c = (h * node_mask[..., None].astype(h.dtype)).astype(dt)
        x_f = x.astype(jnp.float32)
        x_v = masked_mean(x_f, node_mask)                        # [B,1,3]
        diff = (x_f - x_v) * m3                                  # [B,N,3]
        r2_f = jnp.sum(diff * diff, axis=-1, keepdims=True)      # [B,N,1]
        r2 = r2_f.astype(dt)

        # gather: nodes -> virtual feature (masked mean of a transform)
        u = nn.silu(nn.Dense(self.m_hidden, dtype=dt, name="vnode_in")(
            jnp.concatenate([h_c, r2], axis=-1)))
        u = u * m3.astype(dt)
        h_v = nn.silu(nn.Dense(self.m_out, dtype=dt, name="vnode_pool")(
            masked_mean(u, node_mask)))                          # [B,1,m_out]

        # scatter: virtual -> per-node message and radial coordinate
        # update. The h_v block of the fused [H+V+1, F] first layers is
        # graph-constant — project it once at [B,1,F] and broadcast-add
        # (the same node-projection decomposition _EdgeFirstLayer uses)
        # instead of re-multiplying the identical vector for all N nodes.
        vn_msg = _GlobalFirstLayer(
            self.m_out, h_c.shape[-1], h_v.shape[-1], dt,
            zero_init=True, name="vnode_out",
        )(h_c, h_v, r2) * m3.astype(dt)
        s_v = _VectorHead(zero_init=True, name="vnode_x_head")(
            nn.silu(_GlobalFirstLayer(
                self.x_hidden, h_c.shape[-1], h_v.shape[-1], dt,
                name="vnode_x",
            )(h_c, h_v, r2))
        )
        norm = jnp.sqrt(jnp.where(m3 > 0, jnp.maximum(r2_f, 1e-12), 1.0))
        x_vn = diff * (s_v.astype(jnp.float32) / (norm + 1.0)) * m3
        return vn_msg, x_vn

    def _dense_call(self, mods, h, x, pair_mask, vn=None, rbf_mods=None):
        (m_first, m_second, att, x_first, x_second, x_last,
         h_dense0, h_dense1) = mods
        dt = self.compute_dtype
        h_c = h.astype(dt)
        # Geometry stays float32 regardless of compute_dtype (matching the
        # Pallas fast path, nn/fast_apply.py:108): at large-cell scale
        # (|x| ~ 12 A for 512-atom cells) bfloat16 coordinate rounding is
        # ~0.05 A — the size of a Si-O bond-length error — so pair
        # distances, norms and the coordinate update run in f32; only the
        # MLP *feature* copy of d2 is cast down. The matmuls (where the
        # FLOPs are) stay in compute_dtype.
        x_f = x.astype(jnp.float32)
        d2_f = pairwise_sq_dist(x_f)[..., None]          # [B,N,N,1] f32
        d2 = d2_f.astype(dt)
        pm = pair_mask[..., None].astype(dt)
        pm_f = pair_mask[..., None].astype(jnp.float32)

        pre_m = m_first(h_c, d2)                          # [B,N,N,m_hidden]
        pre_x = x_first(h_c, d2)
        if rbf_mods is not None:
            rbf = _rbf_features(d2_f, pm_f > 0, self.edge_rbf,
                                self.edge_rbf_rmax).astype(dt)
            pre_m = pre_m + rbf_mods[0](rbf)
            pre_x = pre_x + rbf_mods[1](rbf)

        # h-branch: edge messages, attention gate, masked sum over sources j.
        m = nn.silu(m_second(nn.silu(pre_m)))             # [B,N,N,m_out]
        m = m * nn.sigmoid(att(m))
        m = m * pm
        m_sum = jnp.sum(m, axis=2)                        # [B,N,m_out]
        if vn is not None:
            m_sum = m_sum + vn[0].astype(m_sum.dtype)
        h_new = h_dense1(
            nn.silu(h_dense0(jnp.concatenate([h_c, m_sum], axis=-1)))
        )
        if self.h_residual and h_new.shape[-1] == h_c.shape[-1]:
            h_new = h_new + h_c

        # x-branch: scalar weight per edge, equivariant difference update.
        s = x_last(nn.silu(x_second(nn.silu(pre_x))))
        if self.compat_scalar_norm:
            # Frobenius norm over the whole (masked) edge batch, as in
            # ref EquivariantGraphNeuralNetwork.py:64.
            norm = jnp.sqrt(
                jnp.sum(d2_f[..., 0] * pair_mask.astype(jnp.float32),
                        axis=(-1, -2))
            )[..., None, None, None]
        else:
            # safe sqrt: masked (diagonal/padded) pairs have d2 == 0 whose
            # sqrt-gradient is inf; 0*inf = NaN would poison the backward
            # pass through the mask multiply, so substitute 1 under the mask.
            pmb = pm_f > 0
            norm = jnp.sqrt(jnp.where(pmb, jnp.maximum(d2_f, 1e-12), 1.0))
        # sum_j (x_i - x_j) w_ij  ==  x_i * sum_j w_ij  -  (w @ x): the
        # decomposed form never materialises the [B,N,N,3] difference
        # tensor — the j-reduction becomes one [N,N]x[N,3] MXU matmul.
        w = (s.astype(jnp.float32) / (norm + 1.0)) * pm_f  # [B,N,N,1]
        w_sum = jnp.sum(w, axis=2)                         # [B,N,1]
        x_new = x_f + x_f * w_sum - jnp.einsum(
            "bij,bjc->bic", w[..., 0], x_f)
        if vn is not None:
            x_new = x_new + vn[1]

        return h_new.astype(h.dtype), x_new.astype(x.dtype)

    def _sparse_call(self, mods, h, x, idx, edge_mask, vn=None,
                     rbf_mods=None):
        """Fixed-degree neighbour-list message passing: identical math to
        the dense path over the K gathered sources per node. The first-layer
        node-projection trick applies unchanged — the j-projections are
        computed per node then gathered per edge."""
        (m_first, m_second, att, x_first, x_second, x_last,
         h_dense0, h_dense1) = mods
        if self.compat_scalar_norm:
            raise NotImplementedError(
                "compat_scalar_norm is a dense-path-only validation mode"
            )
        dt = self.compute_dtype
        h_c = h.astype(dt)
        # f32 geometry (see _dense_call): diff/d2/norm/update in float32,
        # MLP feature copy of d2 cast to compute_dtype.
        x_f = x.astype(jnp.float32)

        gather = jax.vmap(lambda arr, ind: arr[ind])   # [N,*] , [N,K] -> [N,K,*]
        x_j = gather(x_f, idx)                          # [B,N,K,3]
        diff = x_f[:, :, None, :] - x_j
        d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)  # [B,N,K,1] f32
        em = edge_mask[..., None].astype(dt)
        em_f = edge_mask[..., None].astype(jnp.float32)

        # first layers via node projections + gather (no [.,2H+1] matmuls)
        pre_m_i, proj_m_j = m_first.node_projections(h_c)
        pre_x_i, proj_x_j = x_first.node_projections(h_c)
        pre_m = (
            pre_m_i[:, :, None, :] + gather(proj_m_j, idx)
            + d2.astype(dt) * m_first.d2_row()
        )
        pre_x = (
            pre_x_i[:, :, None, :] + gather(proj_x_j, idx)
            + d2.astype(dt) * x_first.d2_row()
        )
        if rbf_mods is not None:
            rbf = _rbf_features(d2, em_f > 0, self.edge_rbf,
                                self.edge_rbf_rmax).astype(dt)
            pre_m = pre_m + rbf_mods[0](rbf)
            pre_x = pre_x + rbf_mods[1](rbf)

        m = nn.silu(m_second(nn.silu(pre_m)))
        m = m * nn.sigmoid(att(m)) * em
        m_sum = jnp.sum(m, axis=2)
        if vn is not None:
            m_sum = m_sum + vn[0].astype(m_sum.dtype)
        h_new = h_dense1(
            nn.silu(h_dense0(jnp.concatenate([h_c, m_sum], axis=-1)))
        )
        if self.h_residual and h_new.shape[-1] == h_c.shape[-1]:
            h_new = h_new + h_c

        s = x_last(nn.silu(x_second(nn.silu(pre_x))))
        norm = jnp.sqrt(jnp.where(em_f > 0, jnp.maximum(d2, 1e-12), 1.0))
        upd = diff * (s.astype(jnp.float32) / (norm + 1.0)) * em_f
        x_new = x_f + jnp.sum(upd, axis=2)
        if vn is not None:
            x_new = x_new + vn[1]
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
    h_init_scale: float = 1.0
    h_residual: bool = False
    virtual_node: bool = False
    edge_rbf: int = 0
    edge_rbf_rmax: float = 8.0
    remat_egcl: bool = False
    # Rematerialise each layer under grad (config.remat_egcl): the live
    # activation set drops from L layers to ~1 at the cost of one extra
    # forward per layer on the backward pass. The lifted transform keeps
    # the parameter tree bit-identical (same scope names), so checkpoints,
    # the Pallas fast path and the ring path are unaffected.

    @nn.compact
    def __call__(self, h, x, edges, node_mask=None):
        layer_cls = nn.remat(EGCL) if self.remat_egcl else EGCL
        for l in range(self.L):
            h, x = layer_cls(
                m_hidden=self.m_hidden,
                m_out=self.m_out,
                x_hidden=self.x_hidden,
                h_hidden=self.h_hidden,
                h_out=self.h_out,
                compat_scalar_norm=self.compat_scalar_norm,
                compute_dtype=self.compute_dtype,
                zero_init_x=self.zero_init_x,
                h_init_scale=self.h_init_scale,
                h_residual=self.h_residual,
                virtual_node=self.virtual_node,
                edge_rbf=self.edge_rbf,
                edge_rbf_rmax=self.edge_rbf_rmax,
                name=f"egcl_{l}",
            )(h, x, edges, node_mask)
        return h, x
