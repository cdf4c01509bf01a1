"""bf16 software-pipelining probe at TI<=8, one v5e chip.

Round 2 settled that int8 cannot beat bf16 here and that TI>8 Mosaic
grids fail remote compile (docs/ROADMAP.md). The surviving kernel idea
(VERDICT r2 next #9) is a bf16 EGCL edge-MLP kernel with <=8 grid steps
and an IN-KERNEL staggered loop that overlaps the silu (VPU) of chunk
k-1 with the matmul (MXU) of chunk k — hiding the measured 0.93 ms/step
of unfused VPU work. This probe measures exactly that viability at the
flagship second-layer shape (36864 edge rows x [1024 -> 1024]):

  xla        jnp silu(A @ W) baseline (what the shipped path does)
  seq        TI=8 grid, in-kernel loop: y_k = silu(a_k @ W) per chunk
  pipelined  TI=8 grid, staggered: matmul chunk k overlaps silu chunk k-1

If pipelined does not beat seq AND xla by a clear margin, the 3-stage
kernel stays unbuilt (the gate in VERDICT r2 #9). Timing is
host-transfer-synced (axon block_until_ready is a no-op pre-compile).
"""

import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, K, N = 36864, 1024, 1024     # flagship edge-MLP second layer
TI = 8                              # remote-compile-safe grid size
CHUNKS = 3                          # in-kernel sub-chunks per grid step
ROWS_PER_STEP = ROWS // TI          # 4608
ROWS_PER_CHUNK = ROWS_PER_STEP // CHUNKS  # 1536
T_OUTER = 20


def _silu(v):
    return v * jax.nn.sigmoid(v)


def make_seq():
    def kernel(a_ref, w_ref, o_ref):
        w = w_ref[...]
        for c in range(CHUNKS):
            sl = pl.dslice(c * ROWS_PER_CHUNK, ROWS_PER_CHUNK)
            x = jax.lax.dot_general(
                a_ref[sl, :], w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[sl, :] = _silu(x).astype(jnp.bfloat16)

    def call(a, w):
        return pl.pallas_call(
            kernel,
            grid=(TI,),
            in_specs=[
                pl.BlockSpec((ROWS_PER_STEP, K), lambda i: (i, 0)),
                pl.BlockSpec((K, N), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((ROWS_PER_STEP, N), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ROWS, N), jnp.bfloat16),
        )(a, w)

    return call


def make_pipelined():
    def kernel(a_ref, w_ref, o_ref):
        w = w_ref[...]

        def mm(c):
            sl = pl.dslice(c * ROWS_PER_CHUNK, ROWS_PER_CHUNK)
            return jax.lax.dot_general(
                a_ref[sl, :], w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # staggered: matmul for chunk c issues while silu for chunk c-1
        # (an independent value) retires — Mosaic can overlap MXU and VPU
        prev = mm(0)
        for c in range(1, CHUNKS):
            cur = mm(c)                      # MXU chunk c
            sl = pl.dslice((c - 1) * ROWS_PER_CHUNK, ROWS_PER_CHUNK)
            o_ref[sl, :] = _silu(prev).astype(jnp.bfloat16)  # VPU c-1
            prev = cur
        sl = pl.dslice((CHUNKS - 1) * ROWS_PER_CHUNK, ROWS_PER_CHUNK)
        o_ref[sl, :] = _silu(prev).astype(jnp.bfloat16)

    def call(a, w):
        return pl.pallas_call(
            kernel,
            grid=(TI,),
            in_specs=[
                pl.BlockSpec((ROWS_PER_STEP, K), lambda i: (i, 0)),
                pl.BlockSpec((K, N), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((ROWS_PER_STEP, N), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ROWS, N), jnp.bfloat16),
        )(a, w)

    return call


def timed(name, call, a, w):
    @jax.jit
    def run(a, w):
        def step(x, _):
            y = call(x, w)
            # feed a cheap reduction of y back so iterations chain
            return (x + y[:1, :1].astype(x.dtype) * 0.0), ()
        x, _ = jax.lax.scan(step, a, None, length=T_OUTER)
        return x

    try:
        x = run(a, w)
        float(jnp.sum(x.astype(jnp.float32)))  # forced host sync
        times = []
        for _ in range(3):
            t0 = time.time()
            x = run(a, w)
            float(jnp.sum(x.astype(jnp.float32)))
            times.append(time.time() - t0)
        best = min(times) / T_OUTER * 1e3
        print(json.dumps({"mode": name, "ms_per_call": round(best, 3)}),
              flush=True)
        return best
    except Exception as e:
        print(json.dumps({"mode": name, "error": str(e)[:300]}), flush=True)
        return None


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    key = jax.random.key(0)
    a = (jax.random.normal(key, (ROWS, K)) * 0.5).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.key(1), (K, N)) * 0.02).astype(
        jnp.bfloat16)

    def xla_call(a, w):
        return _silu(
            jax.lax.dot_general(
                a, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        ).astype(jnp.bfloat16)

    t_xla = timed("xla", xla_call, a, w)
    t_seq = timed("seq", make_seq(), a, w)
    t_pipe = timed("pipelined", make_pipelined(), a, w)
    if None not in (t_xla, t_seq, t_pipe):
        print(json.dumps({
            "xla_ms": round(t_xla, 3),
            "seq_ms": round(t_seq, 3),
            "pipelined_ms": round(t_pipe, 3),
            "pipelined_vs_xla": round(t_pipe / t_xla, 3),
            "verdict": ("BUILD the kernel" if t_pipe < 0.9 * t_xla
                        else "gate stays closed"),
        }), flush=True)


if __name__ == "__main__":
    main()
