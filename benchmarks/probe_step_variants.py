"""Ablation probe: what limits the 192-atom denoiser step on one v5e chip?

Replicates the flagship dense-path EGCL math (nn/egnn.py _dense_call with
node-projection decomposition; 5 layers, F1=1024, Fm=256, N=192) inside one
lax.scan and times variants that toggle the suspected cost centres:

  base_bf16      exact structure, bf16 matmuls          (expected ~2.9 ms/step)
  nosilu_bf16    silu/sigmoid -> identity               (VPU transcendental cost)
  noelem_bf16    also drop pre-activation broadcasts    (near-pure-MXU floor)
  base_int8dyn   second-layer matmuls dynamic int8      (row absmax quant)
  nosilu_int8dyn int8 + no transcendentals
  base_int8stat  int8 with static activation scale      (no rowmax reduce)

Decides whether the <2 s headline needs VPU reduction, int8 MXU, or both
(docs/ROADMAP.md round-2 perf plan). Timing methodology per CLAUDE.md:
everything inside a single jit'd scan — per-call RPC is ~30 ms.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

B, N, H, F1, FM, L = 1, 192, 36, 1024, 256, 5
T = 200  # steps per timing scan


def make_params(key):
    ks = iter(jax.random.split(key, 256))
    bf = jnp.bfloat16

    def w(shape, scale=0.05):
        return (jax.random.normal(next(ks), shape) * scale).astype(bf)

    layers = []
    for _ in range(L):
        layers.append(dict(
            m_wi=w((H, F1)), m_wj=w((H, F1)), m_wd=w((1, F1)), m_b=w((F1,)),
            w2m=w((F1, FM)), b2m=w((FM,)), wa=w((FM,)), ba=w(()),
            x_wi=w((H, F1)), x_wj=w((H, F1)), x_wd=w((1, F1)), x_b=w((F1,)),
            w2x=w((F1, F1)), b2x=w((F1,)), wx3=w((F1,)), bx3=w(()),
            h0=w((H + FM, F1)), h0b=w((F1,)), h1=w((F1, H)), h1b=w((H,)),
        ))
    return layers


def step_fn(layers, *, silu_on, elem_on, mm):
    bf = jnp.bfloat16

    def act(v):
        if not silu_on:
            return v
        f = v.astype(jnp.float32)
        return (f * jax.nn.sigmoid(f)).astype(v.dtype)

    def matmul(a, wk, bias):
        if mm == "bf16":
            out = jax.lax.dot_general(
                a.astype(bf), wk,
                dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mm == "int8dyn":
            a32 = a.astype(jnp.float32)
            rs = jnp.maximum(jnp.max(jnp.abs(a32), axis=-1, keepdims=True),
                             1e-8) / 127.0
            q = jnp.clip(jnp.round(a32 / rs), -127, 127).astype(jnp.int8)
            k32 = wk.astype(jnp.float32)
            cs = jnp.max(jnp.abs(k32), axis=0, keepdims=True) / 127.0
            kq = jnp.clip(jnp.round(k32 / cs), -127, 127).astype(jnp.int8)
            out = jax.lax.dot_general(
                q, kq, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = out.astype(jnp.float32) * (rs * cs)
        elif mm == "int8stat":
            q = jnp.clip(jnp.round(a.astype(jnp.float32) * 32.0),
                         -127, 127).astype(jnp.int8)
            k32 = wk.astype(jnp.float32)
            cs = jnp.max(jnp.abs(k32), axis=0, keepdims=True) / 127.0
            kq = jnp.clip(jnp.round(k32 / cs), -127, 127).astype(jnp.int8)
            out = jax.lax.dot_general(
                q, kq, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = out.astype(jnp.float32) * (cs / 32.0)
        else:
            raise ValueError(mm)
        return (out + bias.astype(jnp.float32)).astype(bf)

    eye = jnp.eye(N, dtype=jnp.float32)
    pm = (1.0 - eye)[None, :, :, None]  # [1,N,N,1]

    def one_step(carry, _):
        x, h = carry
        for lp in layers:
            h_c = h.astype(bf)
            x_c = x.astype(bf)
            diff = (x_c[:, :, None, :] - x_c[:, None, :, :]).astype(
                jnp.float32)
            d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)

            am_i = h_c @ lp["m_wi"] + lp["m_b"]
            am_j = h_c @ lp["m_wj"]
            ax_i = h_c @ lp["x_wi"] + lp["x_b"]
            ax_j = h_c @ lp["x_wj"]
            if elem_on:
                pre_m = (am_i[:, :, None, :] + am_j[:, None, :, :]
                         + d2.astype(bf) * lp["m_wd"])
                pre_x = (ax_i[:, :, None, :] + ax_j[:, None, :, :]
                         + d2.astype(bf) * lp["x_wd"])
            else:
                pre_m = jnp.broadcast_to(am_i[:, :, None, :], (B, N, N, F1))
                pre_x = jnp.broadcast_to(ax_i[:, :, None, :], (B, N, N, F1))

            m = act(matmul(act(pre_m), lp["w2m"], lp["b2m"]))  # [B,N,N,FM]
            logit = (jnp.sum(m.astype(jnp.float32) * lp["wa"].astype(
                jnp.float32), axis=-1, keepdims=True) + 1.0)
            gate = jax.nn.sigmoid(logit) if silu_on else logit
            m = m.astype(jnp.float32) * gate * pm
            m_sum = jnp.sum(m, axis=2)  # [B,N,FM]

            u = act(matmul(act(pre_x), lp["w2x"], lp["b2x"]))  # [B,N,N,F1]
            s = (jnp.sum(u.astype(jnp.float32) * lp["wx3"].astype(
                jnp.float32), axis=-1, keepdims=True) + 0.01)
            norm = jnp.sqrt(jnp.where(pm > 0, jnp.maximum(d2, 1e-12), 1.0))
            upd = diff * s / (norm + 1.0) * pm
            x_new = x.astype(jnp.float32) + jnp.sum(upd, axis=2)

            cat = jnp.concatenate([h_c, m_sum.astype(bf)], axis=-1)
            hh = jax.lax.dot_general(
                jax.nn.silu(cat @ lp["h0"] + lp["h0b"]) if silu_on
                else (cat @ lp["h0"] + lp["h0b"]),
                lp["h1"], dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + lp["h1b"].astype(
                jnp.float32)
            h = hh.astype(jnp.float32)
            # keep magnitudes bounded so 200 chained steps stay finite
            h = h / jnp.maximum(1.0, jnp.max(jnp.abs(h)) / 4.0)
            x = x_new / jnp.maximum(1.0, jnp.max(jnp.abs(x_new)) / 8.0)
        return (x, h), ()

    return one_step


def run_variant(name, layers, x0, h0, **flags):
    one_step = step_fn(layers, **flags)

    @jax.jit
    def run(x, h):
        (x, h), _ = jax.lax.scan(one_step, (x, h), None, length=T)
        return x, h

    t_c0 = time.time()
    jax.block_until_ready(run(x0, h0))
    compile_s = time.time() - t_c0
    times = []
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(run(x0, h0))
        times.append(time.time() - t0)
    ms_per_step = min(times) / T * 1e3
    print(json.dumps({"variant": name, "ms_per_step": round(ms_per_step, 4),
                      "compile_s": round(compile_s, 1), **flags}),
          flush=True)


def main():
    variants = [
        ("base_bf16", dict(silu_on=True, elem_on=True, mm="bf16")),
        ("nosilu_bf16", dict(silu_on=False, elem_on=True, mm="bf16")),
        ("noelem_bf16", dict(silu_on=False, elem_on=False, mm="bf16")),
        ("base_int8dyn", dict(silu_on=True, elem_on=True, mm="int8dyn")),
        ("nosilu_int8dyn", dict(silu_on=False, elem_on=True, mm="int8dyn")),
        ("base_int8stat", dict(silu_on=True, elem_on=True, mm="int8stat")),
    ]
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    layers = make_params(jax.random.key(0))
    x0 = jax.random.normal(jax.random.key(1), (B, N, 3))
    h0 = jax.random.normal(jax.random.key(2), (B, N, H))
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    for name, flags in variants:
        if only and name not in only:
            continue
        run_variant(name, layers, x0, h0, **flags)


if __name__ == "__main__":
    main()
