"""Staged probe for the int8 EGCL Pallas kernel at flagship shapes.

Measures, on the real tile geometry (N=192, F1=1024, FM=256, TI-row
i-tiles over the full 192-column j-range), what each stage of the planned
int8 kernel costs per layer call:

  mm           int8 matmuls only (prebuilt int8 activations, MXU-dot
               consumption) -> achievable MXU rate at these shapes
  mm_post      + dequant, silu, wx3/wa head dots, gate, group sums —
               all reduces ride the MXU as selection matmuls
  full_serial  + pre-activation build (node-projection broadcast + d2 row),
               silu, static-scale int8 quantize — natural dependency order,
               i.e. NO overlap between VPU build and MXU

The gap between full_serial and mm bounds what software pipelining must
hide (Mosaic overlaps independent VPU/MXU chains ~64%, probe_overlap.py).

Timing: host-transfer-forced sync; T_CALLS layer calls chained in one scan
with an int8 patch written back into the activations to defeat hoisting.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, N, F1, FM = 1, 192, 1024, 256
TI = 8
NT = N // TI
E = TI * N
T_CALLS = 50
MXU_OPS = 2 * N * N * (F1 * F1 + F1 * FM)   # per layer call


def _silu_f32(v):
    f = v.astype(jnp.float32)
    return f * jax.nn.sigmoid(f)


def _kernel(mode, am_i_ref, am_j_ref, ax_i_ref, ax_j_ref, x_ref, mask_ref,
            qm_ref, qx_ref, w_dm_ref, w_dx_ref, w2m_q_ref, w2x_q_ref,
            wx3_ref, wa_ref, m_sum_ref, x_out_ref):
    """One i-tile: [TI rows] x [N cols] edge block, flat E = TI*N rows."""
    i_step = pl.program_id(1)
    cdt = jnp.bfloat16

    # flat-edge index helpers (edge k <-> (i_loc = k // N, j_loc = k % N))
    k_col = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)
    i_loc = k_col // N
    sel = jax.lax.broadcasted_iota(jnp.int32, (E, TI), 1)
    r_onehot = (i_loc == sel).astype(cdt)                    # [E, TI]
    grp_rows = jax.lax.broadcasted_iota(jnp.int32, (TI, E), 0)
    grp_cols = jax.lax.broadcasted_iota(jnp.int32, (TI, E), 1) // N
    sel_sum = (grp_rows == grp_cols).astype(cdt)             # [TI, E]

    def mxu(a, b, prec=jnp.float32):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=prec)

    def rep_i(blk):          # [TI, F] -> [E, F]
        return mxu(r_onehot, blk.astype(cdt), jnp.float32).astype(cdt)

    def tile_j(blk):         # [N, F] -> [E, F]
        return pltpu.repeat(blk, TI, axis=0)

    def group_sum(v):        # [E, F] f32/bf16 -> [TI, F] f32
        return mxu(sel_sum, v.astype(cdt), jnp.float32)

    x_i = x_ref[0, pl.ds(i_step * TI, TI), :]                # [TI, 3]
    x_if = rep_i(x_i).astype(jnp.float32)
    x_jf = tile_j(x_ref[0]).astype(jnp.float32)
    diff = x_if - x_jf
    d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)        # [E, 1]
    mask_i = mask_ref[0, pl.ds(i_step * TI, TI), :]
    j_g = k_col - i_loc * N
    i_g = i_loc + i_step * TI
    pm = (rep_i(mask_i).astype(jnp.float32)
          * tile_j(mask_ref[0]).astype(jnp.float32)
          * (i_g != j_g).astype(jnp.float32))                # [E, 1]

    if mode == "full_serial":
        # --- S1: build pre-activations, silu, quantize (VPU) ---
        d2c = d2.astype(cdt)
        pre_m = rep_i(am_i_ref[0]) + tile_j(am_j_ref[0]) + d2c * w_dm_ref[...]
        pre_x = rep_i(ax_i_ref[0]) + tile_j(ax_j_ref[0]) + d2c * w_dx_ref[...]
        qm = jnp.clip(jnp.round(_silu_f32(pre_m) * 32.0),
                      -127, 127).astype(jnp.int8)
        qx = jnp.clip(jnp.round(_silu_f32(pre_x) * 32.0),
                      -127, 127).astype(jnp.int8)
    else:
        qm = qm_ref[0]
        qx = qx_ref[0]

    # --- S2: int8 MXU matmuls ---
    om = mxu(qm, w2m_q_ref[...], jnp.int32)                  # [E, FM]
    ox = mxu(qx, w2x_q_ref[...], jnp.int32)                  # [E, F1]

    if mode == "mm":
        # consume on the MXU: group sums of raw int32 (cast bf16)
        m_sum_ref[...] = group_sum(om.astype(cdt))[None]
        x_out_ref[...] = group_sum(
            ox[:, :8].astype(cdt))[None]
        return

    # --- S3: dequant + silu (VPU) + MXU head dots / group sums ---
    m = _silu_f32(om.astype(jnp.float32) * (1.0 / 2048.0)).astype(cdt)
    u = _silu_f32(ox.astype(jnp.float32) * (1.0 / 2048.0)).astype(cdt)
    s = mxu(u, wx3_ref[...].astype(cdt), jnp.float32)        # [E, 1]
    logit = mxu(m, wa_ref[...].astype(cdt), jnp.float32)     # [E, 1]
    m_g = m.astype(jnp.float32) * (jax.nn.sigmoid(logit) * pm).astype(
        jnp.float32)
    m_sum_ref[...] = group_sum(m_g)[None]
    norm = jnp.sqrt(jnp.where(pm > 0, jnp.maximum(d2, 1e-12), 1.0))
    upd = diff * (s * pm / (norm + 1.0))                     # [E, 3]
    pad = jnp.zeros((E, 5), jnp.float32)
    x_out_ref[...] = group_sum(
        jnp.concatenate([upd, pad], axis=1))[None]


def make_call(mode):
    kernel = functools.partial(_kernel, mode)
    grid = (B, NT)

    def i_spec(w):
        return pl.BlockSpec((1, TI, w), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    def full_j(w):
        return pl.BlockSpec((1, N, w), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def wfull(r, c):
        return pl.BlockSpec((r, c), lambda b, i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        i_spec(F1), full_j(F1),        # am_i, am_j
        i_spec(F1), full_j(F1),        # ax_i, ax_j
        full_j(3),                     # x (full rows: tile slice + repeat)
        full_j(1),                     # mask
        pl.BlockSpec((1, E, F1), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),   # qm prebuilt
        pl.BlockSpec((1, E, F1), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),   # qx prebuilt
        wfull(1, F1), wfull(1, F1),    # w_dm, w_dx
        wfull(F1, FM), wfull(F1, F1),  # w2m_q, w2x_q
        wfull(F1, 1), wfull(FM, 1),    # wx3, wa
    ]
    out_specs = (
        pl.BlockSpec((1, TI, FM), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TI, 8), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((B, N, FM), jnp.float32),
        jax.ShapeDtypeStruct((B, N, 8), jnp.float32),
    )
    return pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shape)


def make_call_x(dtype):
    """Minimal x-branch-only matmul kernel: isolates the int8-vs-bf16 MXU
    ratio at the exact [E, F1] x [F1, F1] shape with identical structure."""
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kernel(q_ref, w_ref, out_ref):
        grp_rows = jax.lax.broadcasted_iota(jnp.int32, (TI, E), 0)
        grp_cols = jax.lax.broadcasted_iota(jnp.int32, (TI, E), 1) // N
        sel_sum = (grp_rows == grp_cols).astype(jnp.bfloat16)
        ox = jax.lax.dot_general(
            q_ref[0], w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc)
        out_ref[...] = jax.lax.dot_general(
            sel_sum, ox[:, :8].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]

    return pl.pallas_call(
        kernel, grid=(B, NT),
        in_specs=[pl.BlockSpec((1, E, F1), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((F1, F1), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TI, 8), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, 8), jnp.float32),
    )


def run_mode_x(dtype_name):
    dtype = jnp.int8 if dtype_name == "x8" else jnp.bfloat16
    call = make_call_x(dtype)
    k1, k2 = jax.random.split(jax.random.key(7))
    if dtype == jnp.int8:
        q = jnp.clip(jax.random.normal(k1, (B, N * N, F1)) * 40,
                     -127, 127).astype(jnp.int8)
        w = jnp.clip(jax.random.normal(k2, (F1, F1)) * 40,
                     -127, 127).astype(jnp.int8)
    else:
        q = jax.random.normal(k1, (B, N * N, F1)).astype(jnp.bfloat16)
        w = jax.random.normal(k2, (F1, F1)).astype(jnp.bfloat16)

    @jax.jit
    def run(q, w):
        def step(carry, _):
            out = call(carry, w)
            patch = (out[:1, :1, :1] % 3).astype(q.dtype)
            return jax.lax.dynamic_update_slice(carry, patch, (0, 0, 0)), \
                out[0, 0, 0]
        _, outs = jax.lax.scan(step, q, None, length=T_CALLS)
        return outs

    ops = 2 * N * N * F1 * F1
    try:
        float(jnp.sum(run(q, w)))
        times = []
        for _ in range(2):
            t0 = time.time()
            float(jnp.sum(run(q, w)))
            times.append(time.time() - t0)
        best = min(times) / T_CALLS
        print(json.dumps({"mode": dtype_name,
                          "ms_per_call": round(best * 1e3, 4),
                          "tops": round(ops / best / 1e12, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"mode": dtype_name, "error": str(e)[:300]}),
              flush=True)


def make_call_xblk(dtype, ti=32, fb=256):
    """x-branch matmul with TI=32 row tiles and column-blocked consumption:
    the [E', F1] int32/f32 product never materialises — each [E', fb]
    column block is dequantised and dotted with its wx3 slice immediately,
    accumulating the per-edge scalar. Tests whether grid overhead (~10us a
    tile at TI=8) and the int32 VMEM blowup were hiding the true MXU rate."""
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    e = ti * N
    nt = N // ti
    nb = F1 // fb

    def kernel(q_ref, w_ref, wx3_ref, out_ref):
        s = jnp.zeros((e, 1), jnp.float32)
        for b in range(nb):  # static unroll: nb independent MXU dots
            ob = jax.lax.dot_general(
                q_ref[0], w_ref[pl.ds(0, F1), pl.ds(b * fb, fb)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc)
            ub = ob.astype(jnp.float32) * (1.0 / 2048.0)
            ub = ub * jax.nn.sigmoid(ub)        # silu stand-in (dequant+act)
            s = s + jax.lax.dot_general(
                ub.astype(jnp.bfloat16),
                wx3_ref[pl.ds(b * fb, fb), :].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        grp_rows = jax.lax.broadcasted_iota(jnp.int32, (ti, e), 0)
        grp_cols = jax.lax.broadcasted_iota(jnp.int32, (ti, e), 1) // N
        sel_sum = (grp_rows == grp_cols).astype(jnp.bfloat16)
        out_ref[...] = jax.lax.dot_general(
            sel_sum, jnp.broadcast_to(s, (e, 8)).astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None]

    return pl.pallas_call(
        kernel, grid=(B, nt),
        in_specs=[pl.BlockSpec((1, e, F1), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((F1, F1), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((F1, 1), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ti, 8), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, 8), jnp.float32),
    )


def run_mode_xblk(dtype_name):
    dtype = jnp.int8 if dtype_name == "xblk8" else jnp.bfloat16
    call = make_call_xblk(dtype)
    k1, k2, k3 = jax.random.split(jax.random.key(9), 3)
    if dtype == jnp.int8:
        q = jnp.clip(jax.random.normal(k1, (B, N * N, F1)) * 40,
                     -127, 127).astype(jnp.int8)
        w = jnp.clip(jax.random.normal(k2, (F1, F1)) * 40,
                     -127, 127).astype(jnp.int8)
    else:
        q = jax.random.normal(k1, (B, N * N, F1)).astype(jnp.bfloat16)
        w = jax.random.normal(k2, (F1, F1)).astype(jnp.bfloat16)
    wx3 = (jax.random.normal(k3, (F1, 1)) * 0.05).astype(jnp.float32)

    @jax.jit
    def run(q, w):
        def step(carry, _):
            out = call(carry, w, wx3)
            patch = (out[:1, :1, :1] % 3).astype(q.dtype)
            return jax.lax.dynamic_update_slice(carry, patch, (0, 0, 0)), \
                out[0, 0, 0]
        _, outs = jax.lax.scan(step, q, None, length=T_CALLS)
        return outs

    ops = 2 * N * N * F1 * F1
    try:
        float(jnp.sum(run(q, w)))
        times = []
        for _ in range(2):
            t0 = time.time()
            float(jnp.sum(run(q, w)))
            times.append(time.time() - t0)
        best = min(times) / T_CALLS
        print(json.dumps({"mode": dtype_name,
                          "ms_per_call": round(best * 1e3, 4),
                          "tops": round(ops / best / 1e12, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"mode": dtype_name, "error": str(e)[:300]}),
              flush=True)


def run_mode(mode, args):
    call = make_call(mode)

    @jax.jit
    def run(args):
        def step(carry, _):
            a = list(args)
            a[6] = carry  # qm carries the loop dependence
            m_sum, x_out = call(*a)
            patch = (m_sum[:1, :1, :1] % 3).astype(jnp.int8)
            nxt = jax.lax.dynamic_update_slice(carry, patch, (0, 0, 0))
            return nxt, m_sum[0, 0, 0]
        _, outs = jax.lax.scan(step, args[6], None, length=T_CALLS)
        return outs

    try:
        float(jnp.sum(run(args)))
        times = []
        for _ in range(2):
            t0 = time.time()
            float(jnp.sum(run(args)))
            times.append(time.time() - t0)
        best = min(times)
        ms_call = best / T_CALLS * 1e3
        print(json.dumps({
            "mode": mode, "ms_per_layer_call": round(ms_call, 4),
            "tops": round(MXU_OPS / (best / T_CALLS) / 1e12, 1),
            "ms_per_denoiser_step_5L": round(5 * ms_call, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"mode": mode, "error": str(e)[:300]}), flush=True)


def main():
    ks = jax.random.split(jax.random.key(0), 16)
    bf = jnp.bfloat16

    def rnd(i, shape, scale=0.5, dt=bf):
        return (jax.random.normal(ks[i], shape) * scale).astype(dt)

    def rndq(i, shape):
        return jnp.clip(jax.random.normal(ks[i], shape) * 40,
                        -127, 127).astype(jnp.int8)

    args = (
        rnd(0, (B, N, F1)), rnd(1, (B, N, F1)),
        rnd(2, (B, N, F1)), rnd(3, (B, N, F1)),
        rnd(4, (B, N, 3), 3.0, jnp.float32),
        jnp.ones((B, N, 1), jnp.float32),
        rndq(5, (B, N * N, F1)),
        rndq(6, (B, N * N, F1)),
        rnd(7, (1, F1)), rnd(8, (1, F1)),
        rndq(9, (F1, FM)), rndq(10, (F1, F1)),
        rnd(11, (F1, 1), 0.05, jnp.float32),
        rnd(12, (FM, 1), 0.05, jnp.float32),
    )
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "ti": TI, "grid": NT}), flush=True)
    modes = sys.argv[1:] or ["mm", "mm_post", "full_serial", "x8", "xbf"]
    for mode in modes:
        if mode in ("x8", "xbf"):
            run_mode_x(mode)
        elif mode in ("xblk8", "xblkbf"):
            run_mode_xblk(mode)
        else:
            run_mode(mode, args)


if __name__ == "__main__":
    main()
