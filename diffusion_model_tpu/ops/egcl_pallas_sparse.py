"""Fused Pallas TPU kernel for the kNN (fixed-degree) EGCL edge computation.

VERDICT r3 #4: the dense-grid kernel (ops/egcl_pallas.py) measured 1.07x
slower than XLA at the flagship dense shape — but the large-cell regime
(512-4096 atoms, kNN-32, nn/egnn.py _sparse_call) has a different cost
structure. There the XLA path materialises every ``[N, K, 1024]`` edge
intermediate in HBM (gathered first-layer projections, both pre-activations,
both SiLU outputs — the ~1 GiB/layer activations that forced remat_egcl at
512 atoms), so the path is HBM-bandwidth-bound, which is where a fused
kernel can actually win.

Design — keep HBM traffic O(N*K*H) instead of O(N*K*F1):

  * XLA gathers only the SMALL per-neighbour tensors: node features
    ``h_j [N, K, H]`` (H ~ 37, zero-padded to a lane-aligned width) and
    coordinates ``x_j [N, K, 3]``.
  * the kernel computes the wide j-projections on the fly per edge
    (``h_j @ Wj [H, F1]``) — K times more FLOPs than the hoisted per-node
    projection (nn/egnn.py decomposition) but a negligible fraction of the
    second-layer matmul work, and it keeps every ``[E, F1]`` tensor in VMEM.
  * grid = (B, N/TI); each step owns its target block outright (the
    K-reduction is complete per tile), so there is no cross-step output
    accumulation — simpler than the dense kernel's j-rotation.

Math is bit-comparable to nn/egnn.py ``_sparse_call`` (f32 geometry, dt
matmuls); the numpy/XLA sparse path remains the correctness oracle
(tests/test_pallas_sparse.py). Differentiation follows the dense kernel's
pattern: custom VJP with the XLA sparse math as the backward definition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(am_i_ref, ax_i_ref, h_j_ref, x_i_ref, x_j_ref, em_ref,
            wm_j_ref, wx_j_ref, w_dm_ref, w_dx_ref, w2m_ref, b2m_ref,
            wa_ref, ba_ref, w2x_ref, b2x_ref, wx3_ref, bx3_ref,
            m_sum_ref, x_out_ref, *, ti: int, k: int, acc_dtype):
    """One (batch, target-block) step: E = TI*K flat edge rows, i-major
    (edge e <-> (i_loc = e // K, k_loc = e % K))."""
    e = ti * k
    cdt = am_i_ref.dtype

    e_col = jax.lax.broadcasted_iota(jnp.int32, (e, 1), 0)
    i_loc = e_col // k

    # i-side row expansion as a one-hot selection matmul (dense-kernel
    # pattern; K consecutive edge rows share the same i row)
    sel_cols = jax.lax.broadcasted_iota(jnp.int32, (e, ti), 1)
    r_onehot = (i_loc == sel_cols).astype(cdt)

    def rep_i(block):
        return jax.lax.dot_general(
            r_onehot, block.astype(cdt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    def rep_i_f32(block):
        # f32-geometry variant: the cdt (bf16) one-hot matmul above would
        # truncate the i-side coordinates before diff/d2 — at large-cell
        # coordinate magnitudes (|x| ~ 12+ A) bf16 rounding is ~0.05 A,
        # a bond-length-scale error (nn/egnn.py _dense_call invariant).
        # precision=HIGHEST because the MXU's DEFAULT f32 dot is a single
        # bf16 pass — it would re-truncate the very payload this variant
        # exists to protect; with 0/1 selection entries the multi-pass
        # decomposition is exact. The [E, TI] x [TI, 3] cost is negligible.
        return jax.lax.dot_general(
            r_onehot.astype(acc_dtype), block.astype(acc_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    h_j = h_j_ref[0].reshape(e, h_j_ref.shape[-1])        # [E, Hp]
    x_jf = x_j_ref[0].reshape(e, 3).astype(acc_dtype)     # [E, 3]
    em = em_ref[0].reshape(e, 1).astype(acc_dtype)        # [E, 1]

    x_if = rep_i_f32(x_i_ref[0])                          # [E, 3] f32
    diff = x_if - x_jf
    d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)     # [E, 1] f32

    def _silu(v):
        f = v.astype(acc_dtype)
        return (f * jax.nn.sigmoid(f)).astype(v.dtype)

    def matmul(a, w_ref):
        return jax.lax.dot_general(
            a, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )

    def edge_matmul(pre, w_ref, b_ref):
        out = matmul(_silu(pre), w_ref)
        return (out + b_ref[...].astype(acc_dtype)).astype(pre.dtype)

    # group-sum selection: S [TI, E], S[t, e] = (e // K == t)
    grp_rows = jax.lax.broadcasted_iota(jnp.int32, (ti, e), 0)
    grp_cols = jax.lax.broadcasted_iota(jnp.int32, (ti, e), 1) // k
    sel_sum = (grp_rows == grp_cols).astype(acc_dtype)

    def group_sum(v):  # [E, F] -> [TI, F]
        # precision=HIGHEST: v is the f32-accumulated payload (attention-
        # weighted messages / coordinate updates); the MXU's DEFAULT f32
        # dot would truncate every element to bf16 before the K-reduction
        # — the systematic ~1-2% "f32" drift docs/perf/sparse_parity_f32
        # .json decomposed. 0/1 selection rows make HIGHEST exact; the
        # [TI, E] x [E, F] matmul is a negligible fraction of kernel FLOPs.
        return jax.lax.dot_general(
            sel_sum, v.astype(acc_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

    d2_c = d2.astype(cdt)
    h_j_c = h_j.astype(cdt)

    # --- h branch ---
    pre_m = (
        rep_i(am_i_ref[0]).astype(cdt)
        + matmul(h_j_c, wm_j_ref).astype(cdt)     # in-kernel j-projection
        + d2_c * w_dm_ref[...]
    )                                             # [E, F1]
    m = _silu(edge_matmul(pre_m, w2m_ref, b2m_ref))   # [E, Fm]
    att_logit = (
        jnp.sum(m.astype(acc_dtype) * wa_ref[...][:, 0].astype(acc_dtype),
                axis=-1, keepdims=True)
        + ba_ref[0, 0].astype(acc_dtype)
    )
    m = m.astype(acc_dtype) * jax.nn.sigmoid(att_logit) * em
    m_sum_ref[...] = group_sum(m)[None].astype(m_sum_ref.dtype)

    # --- x branch ---
    pre_x = (
        rep_i(ax_i_ref[0]).astype(cdt)
        + matmul(h_j_c, wx_j_ref).astype(cdt)
        + d2_c * w_dx_ref[...]
    )
    u = _silu(edge_matmul(pre_x, w2x_ref, b2x_ref))   # [E, F1]
    s = (
        jnp.sum(u.astype(acc_dtype) * wx3_ref[...][:, 0].astype(acc_dtype),
                axis=-1, keepdims=True)
        + bx3_ref[0, 0].astype(acc_dtype)
    )
    norm = jnp.sqrt(jnp.where(em > 0, jnp.maximum(d2, 1e-12), 1.0))
    upd = diff * s / (norm + 1.0) * em
    x_out_ref[...] = (
        x_i_ref[0][None].astype(x_out_ref.dtype)
        + group_sum(upd)[None].astype(x_out_ref.dtype)
    )


def _pad_lanes(v, width: int):
    pad = width - v.shape[-1]
    if pad == 0:
        return v
    cfg = [(0, 0)] * (v.ndim - 1) + [(0, pad)]
    return jnp.pad(v, cfg)


def _pad_rows(w, rows: int):
    pad = rows - w.shape[0]
    if pad == 0:
        return w
    return jnp.pad(w, [(0, pad), (0, 0)])


@functools.partial(jax.jit, static_argnames=("ti", "interpret"))
def egcl_knn_kernel(am_i, ax_i, h, x, idx, edge_mask, wm_j, wx_j, w_dm,
                    w_dx, w2m, b2m, wa, ba, w2x, b2x, wx3, bx3, *,
                    ti: int = 8, interpret: bool = False):
    """Fused edge computation over fixed-degree neighbour lists.

    Args:
      am_i/ax_i: ``[B, N, F1]`` i-side first-layer projections (+bias).
      h: ``[B, N, H]`` node features (the j-side projection runs in-kernel).
      x: ``[B, N, 3]``; idx/edge_mask: ``[B, N, K]`` neighbour lists.
      wm_j/wx_j: ``[H, F1]`` j-blocks of the fused first-layer kernels.
      Remaining weights as in ops/egcl_pallas.egcl_pair_kernel.

    Returns:
      (m_sum ``[B, N, Fm]`` f32, x_out ``[B, N, 3]`` f32).
    """
    b, n, f1 = am_i.shape
    kdeg = idx.shape[-1]
    fm = w2m.shape[1]
    if n % ti != 0:
        raise ValueError(f"N={n} must be a multiple of ti={ti}")

    # lane-align the small j-side feature dim (H ~ 37 -> 128): zero rows
    # of the weight contribute nothing, zero columns of h_j are free
    hp = max(128, -(-h.shape[-1] // 128) * 128)
    gather = jax.vmap(lambda arr, ind: arr[ind])          # [N,*],[N,K]
    h_j = gather(_pad_lanes(h, hp), idx)                  # [B, N, K, Hp]
    x_j = gather(x.astype(jnp.float32), idx)              # [B, N, K, 3]
    wm_jp = _pad_rows(wm_j, hp)
    wx_jp = _pad_rows(wx_j, hp)

    grid = (b, n // ti)

    def i_spec(width):
        return pl.BlockSpec((1, ti, width), lambda bi, i: (bi, i, 0),
                            memory_space=pltpu.VMEM)

    def edge_spec(width):
        return pl.BlockSpec((1, ti, kdeg, width),
                            lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda bi, i: (0, 0),
                            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((b, n, fm), jnp.float32),
        jax.ShapeDtypeStruct((b, n, 3), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, ti, fm), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ti, 3), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
    )
    in_specs = [
        i_spec(f1), i_spec(f1),                 # am_i, ax_i
        edge_spec(hp),                          # h_j
        i_spec(3), edge_spec(3),                # x_i, x_j
        edge_spec(1),                           # edge_mask
        full_spec(hp, f1), full_spec(hp, f1),   # wm_j, wx_j
        full_spec(1, f1), full_spec(1, f1),     # w_dm, w_dx
        full_spec(f1, fm), full_spec(1, fm),    # w2m, b2m
        full_spec(fm, 1), full_spec(1, 1),      # wa, ba
        full_spec(f1, f1), full_spec(1, f1),    # w2x, b2x
        full_spec(f1, 1), full_spec(1, 1),      # wx3, bx3
    ]

    kernel = functools.partial(_kernel, ti=ti, k=kdeg,
                               acc_dtype=jnp.float32)
    flops_per_edge = 2 * f1 * fm + 2 * f1 * f1 + 4 * hp * f1
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * n * kdeg * flops_per_edge,
            bytes_accessed=(b * n * (2 * f1 + hp * kdeg) * 2
                            + b * n * (fm + 3) * 4),
            transcendentals=b * n * kdeg * (f1 * 2 + fm + 2),
        ),
    )(am_i, ax_i, h_j, x.astype(jnp.float32), x_j,
      edge_mask[..., None], wm_jp, wx_jp, w_dm, w_dx, w2m, b2m,
      wa, ba, w2x, b2x, wx3, bx3)


def _edge_math_sparse(am_i, ax_i, h, x, idx, edge_mask, wm_j, wx_j, w_dm,
                      w_dx, w2m, b2m, wa, ba, w2x, b2x, wx3, bx3):
    """Pure-jnp statement of the kernel math (f32) over the neighbour
    lists — identical formulation to nn/egnn.py ``_sparse_call``. Backward
    definition for :func:`egcl_knn_edges` and the parity oracle."""
    f32 = jnp.float32
    am_i, ax_i, h, x = (v.astype(f32) for v in (am_i, ax_i, h, x))
    gather = jax.vmap(lambda arr, ind: arr[ind])
    h_j = gather(h, idx)                                   # [B,N,K,H]
    x_j = gather(x, idx)
    diff = x[:, :, None, :] - x_j
    d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)
    em = edge_mask[..., None].astype(f32)

    def silu(v):
        return v * jax.nn.sigmoid(v)

    pre_m = (am_i[:, :, None, :] + h_j @ wm_j.astype(f32)
             + d2 * w_dm.astype(f32))
    m = silu(silu(pre_m) @ w2m.astype(f32) + b2m.astype(f32))
    att = jax.nn.sigmoid(m @ wa.astype(f32) + ba.astype(f32))
    m_sum = jnp.sum(m * att * em, axis=2)

    pre_x = (ax_i[:, :, None, :] + h_j @ wx_j.astype(f32)
             + d2 * w_dx.astype(f32))
    u = silu(silu(pre_x) @ w2x.astype(f32) + b2x.astype(f32))
    s = u @ wx3.astype(f32) + bx3.astype(f32)
    norm = jnp.sqrt(jnp.where(em > 0, jnp.maximum(d2, 1e-12), 1.0))
    upd = diff * s / (norm + 1.0) * em
    x_out = x + jnp.sum(upd, axis=2)
    return m_sum, x_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19))
def egcl_knn_edges(am_i, ax_i, h, x, idx, edge_mask, wm_j, wx_j, w_dm,
                   w_dx, w2m, b2m, wa, ba, w2x, b2x, wx3, bx3,
                   ti=8, interpret=False):
    """Differentiable fused kNN EGCL edge computation (Pallas forward,
    XLA sparse-math backward — the dense kernel's measured-optimal
    pairing, ops/egcl_pallas.py)."""
    return egcl_knn_kernel(am_i, ax_i, h, x, idx, edge_mask, wm_j, wx_j,
                           w_dm, w_dx, w2m, b2m, wa, ba, w2x, b2x, wx3,
                           bx3, ti=ti, interpret=interpret)


def _knn_fwd(am_i, ax_i, h, x, idx, edge_mask, wm_j, wx_j, w_dm, w_dx,
             w2m, b2m, wa, ba, w2x, b2x, wx3, bx3, ti, interpret):
    out = egcl_knn_kernel(am_i, ax_i, h, x, idx, edge_mask, wm_j, wx_j,
                          w_dm, w_dx, w2m, b2m, wa, ba, w2x, b2x, wx3,
                          bx3, ti=ti, interpret=interpret)
    residuals = (am_i, ax_i, h, x, idx, edge_mask, wm_j, wx_j, w_dm,
                 w_dx, w2m, b2m, wa, ba, w2x, b2x, wx3, bx3)
    return out, residuals


def _knn_bwd(ti, interpret, residuals, cotangents):
    _, vjp_fn = jax.vjp(_edge_math_sparse, *residuals)
    grads = vjp_fn(tuple(c.astype(jnp.float32) for c in cotangents))
    # idx is int32: its cotangent comes back as float0 (symbolically zero);
    # materialise an int zero of the primal's shape instead of astype-ing
    return tuple(
        jnp.zeros(r.shape, r.dtype) if g.dtype == jax.dtypes.float0
        else g.astype(r.dtype)
        for g, r in zip(grads, residuals)
    )


egcl_knn_edges.defvjp(_knn_fwd, _knn_bwd)
