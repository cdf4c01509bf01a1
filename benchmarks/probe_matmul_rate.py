"""Raw MXU rate probe: bf16 vs int8, XLA dot vs Pallas kernel, one v5e chip.

Determines whether int8 matmuls actually execute at 2x the bf16 rate
(v5e datasheet: 394 INT8 TOPS vs 197 bf16 TFLOPS) — and through which
lowering path. This is the go/no-go for the in-kernel-int8 Pallas EGCL
plan (docs/ROADMAP.md round-2).

Anti-elision methodology (v1/v2 of this probe were constant-folded /
CSE'd away): the matmuls are SERIALLY CHAINED — each iteration's input is
the previous output cast back to the input dtype — so no loop transform
can remove work. The per-iteration cast is [M,N] elementwise, <1% of the
matmul cost. Reported number = TOP/s over K_INNER * T_OUTER matmuls; the
cast overhead makes it a slight underestimate of pure MXU rate.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 512, 1024, 1024  # N == K so outputs chain back as inputs
K_INNER = 256              # serial matmuls per kernel invocation
T_OUTER = 40
OPS_TOTAL = 2 * M * K * N * K_INNER * T_OUTER


def _requant(o, dtype):
    if dtype == jnp.int8:
        return jnp.clip(o >> 9, -127, 127).astype(jnp.int8)
    return (o * 0.03125).astype(dtype)


def _chain_body(w, dtype, acc_dtype):
    def body(_, x):
        o = jax.lax.dot_general(
            x, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)
        return _requant(o, dtype)
    return body


def pallas_chain(dtype, acc_dtype):
    def kernel(a_ref, w_ref, out_ref):
        out_ref[...] = jax.lax.fori_loop(
            0, K_INNER, _chain_body(w_ref[...], dtype, acc_dtype),
            a_ref[...])

    def call(a, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, w)

    return call


def xla_chain(dtype, acc_dtype):
    def call(a, w):
        return jax.lax.fori_loop(
            0, K_INNER, _chain_body(w, dtype, acc_dtype), a)

    return call


def pallas_chain_ilp(dtype, acc_dtype, ilp=4):
    """ilp independent serial chains per iteration — fills the MXU pipeline
    (a single dependent chain is latency-bound and underestimates peak)."""
    def kernel(a_ref, w_ref, out_ref):
        def body(_, xs):
            outs = [jax.lax.dot_general(
                x, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype) for x in xs]
            return tuple(_requant(o, dtype) for o in outs)

        xs = tuple(a_ref[pl.ds(i * (M // ilp), M // ilp), :]
                   for i in range(ilp))
        final = jax.lax.fori_loop(0, K_INNER, body, xs)
        for i in range(ilp):
            out_ref[pl.ds(i * (M // ilp), M // ilp), :] = final[i]

    def call(a, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, w)

    return call


def time_variant(name, call, a, w):
    @jax.jit
    def run(a, w):
        def step(x, _):
            x = call(x, w)
            return x, jnp.float32(0)
        x, _ = jax.lax.scan(step, a, None, length=T_OUTER)
        return x

    try:
        t0 = time.time()
        # axon quirk: block_until_ready is a no-op until the remote compile
        # has finished — force a host transfer to truly sync the warmup
        float(jnp.sum(run(a, w).astype(jnp.float32)))
        compile_s = time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(run(a, w))
            times.append(time.time() - t0)
        best = min(times)
        print(json.dumps({"variant": name,
                          "tops": round(OPS_TOTAL / best / 1e12, 1),
                          "s": round(best, 4),
                          "compile_s": round(compile_s, 1)}), flush=True)
    except Exception as e:  # remote compile can 500 on some kernels
        print(json.dumps({"variant": name, "error": str(e)[:200]}),
              flush=True)


def main():
    a_f = jax.random.normal(jax.random.key(0), (M, K))
    w_f = jax.random.normal(jax.random.key(1), (K, N))
    a_bf, w_bf = a_f.astype(jnp.bfloat16), w_f.astype(jnp.bfloat16)
    a_i8 = jnp.clip(a_f * 20, -127, 127).astype(jnp.int8)
    w_i8 = jnp.clip(w_f * 20, -127, 127).astype(jnp.int8)
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "ops_total_t": OPS_TOTAL / 1e12}), flush=True)
    time_variant("xla_bf16", xla_chain(jnp.bfloat16, jnp.float32),
                 a_bf, w_bf)
    time_variant("xla_int8", xla_chain(jnp.int8, jnp.int32), a_i8, w_i8)
    time_variant("pallas_bf16", pallas_chain(jnp.bfloat16, jnp.float32),
                 a_bf, w_bf)
    time_variant("pallas_int8", pallas_chain(jnp.int8, jnp.int32),
                 a_i8, w_i8)
    time_variant("pallas_bf16_ilp4",
                 pallas_chain_ilp(jnp.bfloat16, jnp.float32), a_bf, w_bf)
    time_variant("pallas_int8_ilp4",
                 pallas_chain_ilp(jnp.int8, jnp.int32), a_i8, w_i8)


if __name__ == "__main__":
    main()
