"""Fused Pallas TPU kernel for the EGCL edge computation.

This is the framework's native hot-path kernel (SURVEY.md §2.7: the
reference's equivalent native surface is PyG's CUDA scatter kernels reached
through ``MessagePassing.propagate``). One kernel invocation fuses, per
(target-block i, source-block j) tile of the dense pair grid:

    pre_m = Am_i + Bm_j + d2 * w_dm          (node projections from XLA)
    m     = silu(silu(pre_m) @ W2m + b2m)
    m    *= sigmoid(m @ wa + ba)             (attention gate, h-branch only)
    m_sum += sum_j m * pair_mask             -> [TI, m_out]
    pre_x = Ax_i + Bx_j + d2 * w_dx
    u     = silu(silu(pre_x) @ W2x + b2x)
    s     = u @ wx3 + bx3                    (scalar per edge)
    x_out += sum_j (x_i - x_j) * s / (|x_i - x_j| + 1) * pair_mask

keeping every [edges, 1024] intermediate in VMEM — the XLA dense path
round-trips them through HBM. First-layer matmuls are hoisted to XLA as
per-node projections (see nn/egnn.py node-projection decomposition), so the
kernel's MXU work is exactly the two big second-layer matmuls.

Grid: (B, N/TI, N/TJ) with the j axis innermost; output blocks for (b, i)
are revisited across j and accumulated in VMEM (init at j == 0).

Differentiation: ``egcl_pair_edges`` wraps the kernel in a custom VJP whose
backward is the exact dense-math gradient evaluated by XLA
(``_edge_math_dense``). That pairing is deliberate, not a fallback — the
round-2 probes (benchmarks/probe_kernel_stages.py, docs/ROADMAP.md) measured
XLA *faster* than Mosaic at these shapes, so Pallas-forward + XLA-backward is
the optimal differentiable configuration on this toolchain. The
``compat_scalar_norm`` quirk mode is not supported here (use the XLA path
for bit-exact reference validation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(am_i_ref, am_j_ref, ax_i_ref, ax_j_ref, x_i_ref, x_j_ref,
            mask_i_ref, mask_j_ref, w_dm_ref, w_dx_ref, w2m_ref, b2m_ref,
            wa_ref, ba_ref, w2x_ref, b2x_ref, wx3_ref, bx3_ref,
            m_sum_ref, x_out_ref, *, ti: int, tj: int, n: int,
            acc_dtype):
    """Flat edge layout: the TI x TJ pair tile is flattened to E = TI*TJ
    edge rows so both big matmuls run with M = E on the MXU (a 3-D batched
    dot with M = TJ per slice measured ~30% slower). The i-side row-repeat
    is a one-hot selection matmul; the j-side tile uses pltpu.repeat."""
    j_step = pl.program_id(2)

    @pl.when(j_step == 0)
    def _init():
        m_sum_ref[...] = jnp.zeros_like(m_sum_ref)
        x_out_ref[...] = x_i_ref[0].astype(x_out_ref.dtype)[None]

    e = ti * tj
    cdt = am_i_ref.dtype

    # flat index helpers: edge k <-> (i_loc = k // tj, j_loc = k % tj)
    k_col = jax.lax.broadcasted_iota(jnp.int32, (e, 1), 0)
    i_loc = k_col // tj
    j_loc = k_col - i_loc * tj

    # i-side expansion: one-hot R [E, TI], rep_i(A) = R @ A (25 MFLOP at
    # F1=1024 vs ~4 GFLOP tile work — noise)
    sel_cols = jax.lax.broadcasted_iota(jnp.int32, (e, ti), 1)
    r_onehot = (i_loc == sel_cols).astype(cdt)

    def rep_i(block):
        return jax.lax.dot_general(
            r_onehot, block.astype(cdt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    def tile_j(block):  # [TJ, F] -> [E, F], j pattern cycling fastest
        return pltpu.repeat(block, ti, axis=0)

    x_if = rep_i(x_i_ref[0])                     # [E, 3] f32
    x_jf = tile_j(x_j_ref[0]).astype(acc_dtype)
    diff = x_if - x_jf
    d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)  # [E, 1]

    # pair mask: both endpoints real and i != j
    i_g = i_loc + pl.program_id(1) * ti
    j_g = j_loc + j_step * tj
    neq = (i_g != j_g).astype(acc_dtype)
    pm = (
        rep_i(mask_i_ref[0]) * tile_j(mask_j_ref[0]).astype(acc_dtype) * neq
    )                                            # [E, 1]

    def _silu(v):
        # dtype-stable silu: jax.nn.silu introduces f32 scalar broadcasts
        # that Mosaic rejects on bf16 vectors; compute the gate in f32.
        f = v.astype(acc_dtype)
        return (f * jax.nn.sigmoid(f)).astype(v.dtype)

    def edge_matmul(pre, w_ref, b_ref):
        act = _silu(pre)
        out = jax.lax.dot_general(
            act, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        return (out + b_ref[...].astype(acc_dtype)).astype(act.dtype)

    d2_c = d2.astype(cdt)

    # group-sum selection: S [TI, E], S[t, k] = (k // tj == t)
    grp_rows = jax.lax.broadcasted_iota(jnp.int32, (ti, e), 0)
    grp_cols = jax.lax.broadcasted_iota(jnp.int32, (ti, e), 1) // tj
    sel_sum = (grp_rows == grp_cols).astype(acc_dtype)

    def group_sum(v):  # [E, F] -> [TI, F]
        return jax.lax.dot_general(
            sel_sum, v.astype(acc_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    # --- h branch ---
    pre_m = (
        rep_i(am_i_ref[0]).astype(cdt) + tile_j(am_j_ref[0])
        + d2_c * w_dm_ref[...]
    )                                            # [E, F1]
    m = _silu(edge_matmul(pre_m, w2m_ref, b2m_ref))  # [E, Fm]
    att_logit = (
        jnp.sum(m.astype(acc_dtype) * wa_ref[...][:, 0].astype(acc_dtype),
                axis=-1, keepdims=True)
        + ba_ref[0, 0].astype(acc_dtype)
    )
    m = m.astype(acc_dtype) * jax.nn.sigmoid(att_logit) * pm
    m_sum_ref[...] += group_sum(m)[None].astype(m_sum_ref.dtype)

    # --- x branch ---
    pre_x = (
        rep_i(ax_i_ref[0]).astype(cdt) + tile_j(ax_j_ref[0])
        + d2_c * w_dx_ref[...]
    )
    u = _silu(edge_matmul(pre_x, w2x_ref, b2x_ref))  # [E, F1]
    s = (
        jnp.sum(u.astype(acc_dtype) * wx3_ref[...][:, 0].astype(acc_dtype),
                axis=-1, keepdims=True)
        + bx3_ref[0, 0].astype(acc_dtype)
    )
    norm = jnp.sqrt(jnp.where(pm > 0, jnp.maximum(d2, 1e-12), 1.0))
    upd = diff * s / (norm + 1.0) * pm
    x_out_ref[...] += group_sum(upd)[None].astype(x_out_ref.dtype)


def _pick_tj(n: int, f1: int, budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Largest divisor of n, multiple of 8, with an [8, TJ, F1] bf16 tile
    under the VMEM budget."""
    limit = max(8, budget_bytes // (8 * f1 * 2))
    best = 8
    for tj in range(8, min(n, limit) + 1, 8):
        if n % tj == 0:
            best = tj
    return best


@functools.partial(
    jax.jit,
    static_argnames=("ti", "interpret"),
)
def egcl_pair_kernel(am_i, am_j, ax_i, ax_j, x, mask, w_dm, w_dx, w2m, b2m,
                     wa, ba, w2x, b2x, wx3, bx3, *, ti: int = 8,
                     interpret: bool = False):
    """Fused edge computation over the dense pair grid.

    Args:
      am_i/am_j: ``[B, N, F1]`` m-branch node projections (i-part carries the
        first-layer bias).
      ax_i/ax_j: ``[B, N, F1]`` x-branch node projections.
      x: ``[B, N, 3]`` coordinates; mask: ``[B, N, 1]``.
      w_dm/w_dx: ``[1, F1]`` first-layer d2 rows.
      w2m/b2m: ``[F1, Fm]`` / ``[1, Fm]``; wa/ba: ``[Fm, 1]`` / ``[1, 1]``.
      w2x/b2x: ``[F1, F1]`` / ``[1, F1]``; wx3/bx3: ``[F1, 1]`` / ``[1, 1]``.

    Returns:
      (m_sum ``[B, N, Fm]`` f32, x_out ``[B, N, 3]`` f32 = x + update).
    """
    b, n, f1 = am_i.shape
    fm = w2m.shape[1]
    if n % ti != 0:
        raise ValueError(f"N={n} must be a multiple of ti={ti}")
    tj = _pick_tj(n, f1)
    grid = (b, n // ti, n // tj)

    # explicit index maps (i-blocks vs j-blocks)
    def i_spec(width):
        return pl.BlockSpec((1, ti, width), lambda bi, i, j: (bi, i, 0),
                            memory_space=pltpu.VMEM)

    def j_spec(width):
        return pl.BlockSpec((1, tj, width), lambda bi, i, j: (bi, j, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda bi, i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((b, n, fm), jnp.float32),
        jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, ti, fm), lambda bi, i, j: (bi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ti, 3), lambda bi, i, j: (bi, i, 0),
                     memory_space=pltpu.VMEM),
    )
    in_specs = [
        i_spec(f1), j_spec(f1),          # am_i, am_j
        i_spec(f1), j_spec(f1),          # ax_i, ax_j
        i_spec(3), j_spec(3),            # x_i, x_j
        i_spec(1), j_spec(1),            # mask_i, mask_j
        full_spec(1, f1), full_spec(1, f1),    # w_dm, w_dx
        full_spec(f1, fm), full_spec(1, fm),   # w2m, b2m
        full_spec(fm, 1), full_spec(1, 1),     # wa, ba
        full_spec(f1, f1), full_spec(1, f1),   # w2x, b2x
        full_spec(f1, 1), full_spec(1, 1),     # wx3, bx3
    ]

    kernel = functools.partial(
        _kernel, ti=ti, tj=tj, n=n, acc_dtype=jnp.float32
    )
    flops_per_edge = 2 * f1 * fm + 2 * f1 * f1
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * n * n * flops_per_edge,
            bytes_accessed=(4 * b * n * f1 + b * n * (fm + 3) * 4) * 2,
            transcendentals=b * n * n * (f1 * 2 + fm + 2),
        ),
    )(am_i, am_j, ax_i, ax_j, x, x, mask, mask, w_dm, w_dx, w2m, b2m,
      wa, ba, w2x, b2x, wx3, bx3)


def _edge_math_dense(am_i, am_j, ax_i, ax_j, x, mask, w_dm, w_dx, w2m, b2m,
                     wa, ba, w2x, b2x, wx3, bx3):
    """Pure-jnp dense statement of exactly the math the kernel computes
    (f32). Serves as the backward-pass definition for ``egcl_pair_edges``:
    its jax.vjp IS the gradient of the layer, evaluated by XLA.
    """
    f32 = jnp.float32
    am_i, am_j, ax_i, ax_j, x = (v.astype(f32)
                                 for v in (am_i, am_j, ax_i, ax_j, x))
    b, n, _ = am_i.shape
    diff = x[:, :, None, :] - x[:, None, :, :]            # [B,N,N,3]
    d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)     # [B,N,N,1]
    m3 = mask.astype(f32)                                  # [B,N,1]
    neq = 1.0 - jnp.eye(n, dtype=f32)[None, :, :, None]
    pm = m3[:, :, None, :] * m3[:, None, :, :] * neq       # [B,N,N,1]

    def silu(v):
        return v * jax.nn.sigmoid(v)

    pre_m = (am_i[:, :, None, :] + am_j[:, None, :, :]
             + d2 * w_dm.astype(f32))
    m = silu(silu(pre_m) @ w2m.astype(f32) + b2m.astype(f32))
    att = jax.nn.sigmoid(m @ wa.astype(f32) + ba.astype(f32))
    m_sum = jnp.sum(m * att * pm, axis=2)                  # [B,N,Fm]

    pre_x = (ax_i[:, :, None, :] + ax_j[:, None, :, :]
             + d2 * w_dx.astype(f32))
    u = silu(silu(pre_x) @ w2x.astype(f32) + b2x.astype(f32))
    s = u @ wx3.astype(f32) + bx3.astype(f32)              # [B,N,N,1]
    norm = jnp.sqrt(jnp.where(pm > 0, jnp.maximum(d2, 1e-12), 1.0))
    upd = diff * s / (norm + 1.0) * pm
    x_out = x + jnp.sum(upd, axis=2)
    return m_sum, x_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def egcl_pair_edges(am_i, am_j, ax_i, ax_j, x, mask, w_dm, w_dx, w2m, b2m,
                    wa, ba, w2x, b2x, wx3, bx3, ti=8, interpret=False):
    """Differentiable fused EGCL edge computation.

    Forward = the Pallas kernel (``egcl_pair_kernel``); backward = the
    XLA-evaluated gradient of ``_edge_math_dense`` (bit-identical math in
    f32; the forward/backward pairing is measured-optimal on this
    toolchain — see module docstring). Gradients flow to every tensor
    argument, so training configurations that drive full reverse chains
    (e.g. the Kabsch loss) can enable the kernel.
    """
    return egcl_pair_kernel(am_i, am_j, ax_i, ax_j, x, mask, w_dm, w_dx,
                            w2m, b2m, wa, ba, w2x, b2x, wx3, bx3,
                            ti=ti, interpret=interpret)


def _edges_fwd(am_i, am_j, ax_i, ax_j, x, mask, w_dm, w_dx, w2m, b2m,
               wa, ba, w2x, b2x, wx3, bx3, ti, interpret):
    out = egcl_pair_kernel(am_i, am_j, ax_i, ax_j, x, mask, w_dm, w_dx,
                           w2m, b2m, wa, ba, w2x, b2x, wx3, bx3,
                           ti=ti, interpret=interpret)
    residuals = (am_i, am_j, ax_i, ax_j, x, mask, w_dm, w_dx, w2m, b2m,
                 wa, ba, w2x, b2x, wx3, bx3)
    return out, residuals


def _edges_bwd(ti, interpret, residuals, cotangents):
    _, vjp_fn = jax.vjp(_edge_math_dense, *residuals)
    grads = vjp_fn(tuple(c.astype(jnp.float32) for c in cotangents))
    # cast each gradient back to its primal dtype (mask gets a zero grad —
    # it is data, not a parameter)
    return tuple(
        g.astype(r.dtype) for g, r in zip(grads, residuals)
    )


egcl_pair_edges.defvjp(_edges_fwd, _edges_bwd)
