"""Mosaic VPU/MXU overlap probe, one v5e chip.

The round-2 kernel plan (docs/ROADMAP.md) hides the EGCL's silu/quantize
VPU work behind the int8 MXU matmuls via software pipelining inside one
Pallas kernel. That only works if Mosaic's scheduler overlaps independent
VPU and MXU instruction chains. This probe measures exactly that:

  mxu_only   serial int8 matmul chain          -> T_m
  vpu_only   serial silu chain (f32, [M,N])    -> T_v
  combined   both chains in the same loop body, no data dependence
             between them                       -> T_c

overlap fraction = (T_m + T_v - T_c) / min(T_m, T_v): 1.0 = perfect
overlap, 0.0 = fully serialized. Timing: host-transfer-forced sync
(axon's block_until_ready is a no-op until remote compile completes).
"""

import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 512, 1024, 1024
K_INNER = 256
T_OUTER = 20
VPU_REPEAT = 4   # silu passes per iteration, scales VPU-side work


def _mxu_step(x, w):
    o = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return jnp.clip(o >> 9, -127, 127).astype(jnp.int8)


def _vpu_step(y):
    for _ in range(VPU_REPEAT):
        y = y * jax.nn.sigmoid(y) + 0.3  # silu, kept in a bounded orbit
    return y


def make_call(mode):
    def kernel(a_ref, w_ref, y_ref, out_a_ref, out_y_ref):
        def body(_, carry):
            x, y = carry
            if mode in ("mxu", "both"):
                x = _mxu_step(x, w_ref[...])
            if mode in ("vpu", "both"):
                y = _vpu_step(y)
            return (x, y)
        x, y = jax.lax.fori_loop(
            0, K_INNER, body, (a_ref[...], y_ref[...]))
        out_a_ref[...] = x
        out_y_ref[...] = y

    def call(a, w, y):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((M, N), jnp.int8),
                       jax.ShapeDtypeStruct((M, N), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        )(a, w, y)

    return call


def timed(mode, a, w, y):
    call = make_call(mode)

    @jax.jit
    def run(a, w, y):
        def step(carry, _):
            xa, xy = call(carry[0], w, carry[1])
            return (xa, xy), ()
        (xa, xy), _ = jax.lax.scan(step, (a, y), None, length=T_OUTER)
        return xa, xy

    try:
        xa, xy = run(a, w, y)
        float(jnp.sum(xy))  # forced host sync (compile + exec)
        times = []
        for _ in range(2):
            t0 = time.time()
            xa, xy = run(a, w, y)
            float(jnp.sum(xy))
            times.append(time.time() - t0)
        best = min(times)
        print(json.dumps({"mode": mode, "s": round(best, 4)}), flush=True)
        return best
    except Exception as e:
        print(json.dumps({"mode": mode, "error": str(e)[:200]}), flush=True)
        return None


def main():
    a = jnp.clip(jax.random.normal(jax.random.key(0), (M, K)) * 20,
                 -127, 127).astype(jnp.int8)
    w = jnp.clip(jax.random.normal(jax.random.key(1), (K, N)) * 20,
                 -127, 127).astype(jnp.int8)
    y = jax.random.normal(jax.random.key(2), (M, N))
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)
    t_m = timed("mxu", a, w, y)
    t_v = timed("vpu", a, w, y)
    t_c = timed("both", a, w, y)
    if None not in (t_m, t_v, t_c):
        overlap = (t_m + t_v - t_c) / min(t_m, t_v)
        print(json.dumps({"t_mxu": round(t_m, 4), "t_vpu": round(t_v, 4),
                          "t_both": round(t_c, 4),
                          "overlap_fraction": round(overlap, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
