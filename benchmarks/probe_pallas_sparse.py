"""Pallas kNN kernel vs the XLA sparse path on the real chip (VERDICT r3 #4).

Measures ONE EGCL edge computation (node projections + edge MLPs + masked
K-reductions, flagship widths F1=1024/Fm=256) over fixed-degree kNN-32
neighbour lists at N = 512 / 1024 / 4096 — the large-cell regime where the
XLA path materialises [N,K,1024] intermediates in HBM and the fused kernel
keeps them in VMEM (ops/egcl_pallas_sparse.py).

Timing: both variants iterate inside ONE jitted lax.scan (the ~30 ms
remote-RPC tax would otherwise dominate), warmed up with a forced host
transfer (the block_until_ready trap, bench.py). Parity is checked on the
same inputs first. Writes docs/perf/pallas_sparse_check.json.

Run on the TPU only when no training client is attached (single-client
rule, CLAUDE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_tpu.ops.edges import knn_edges
from diffusion_model_tpu.ops.egcl_pallas_sparse import egcl_knn_kernel

F1, FM, H, K = 1024, 256, 36, 32
ITERS = 50


def xla_sparse_edges(h, x, idx, em, w):
    """The production sparse formulation (nn/egnn.py _sparse_call math):
    hoisted node projections, gathered per edge, bf16 matmuls, f32
    geometry."""
    dt = jnp.bfloat16
    h_c = h.astype(dt)
    am_i = h_c @ w["wm_i"] + w["bm"]
    proj_m_j = h_c @ w["wm_j"]
    ax_i = h_c @ w["wx_i"] + w["bx"]
    proj_x_j = h_c @ w["wx_j"]
    gather = jax.vmap(lambda arr, ind: arr[ind])
    x_f = x.astype(jnp.float32)
    x_j = gather(x_f, idx)
    diff = x_f[:, :, None, :] - x_j
    d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)
    em4 = em[..., None]

    def silu(v):
        return v * jax.nn.sigmoid(v)

    pre_m = (am_i[:, :, None, :] + gather(proj_m_j, idx)
             + d2.astype(dt) * w["w_dm"])
    m = silu(silu(pre_m) @ w["w2m"] + w["b2m"])
    att = jax.nn.sigmoid(
        jnp.sum(m * w["wa"][:, 0], axis=-1, keepdims=True) + w["ba"])
    m_sum = jnp.sum(m * att * em4.astype(dt), axis=2)

    pre_x = (ax_i[:, :, None, :] + gather(proj_x_j, idx)
             + d2.astype(dt) * w["w_dx"])
    u = silu(silu(pre_x) @ w["w2x"] + w["b2x"])
    s = (jnp.sum(u * w["wx3"][:, 0], axis=-1, keepdims=True) + w["bx3"])
    norm = jnp.sqrt(jnp.where(em4 > 0, jnp.maximum(d2, 1e-12), 1.0))
    upd = diff * (s.astype(jnp.float32) / (norm + 1.0)) \
        * em4.astype(jnp.float32)
    return m_sum, x_f + jnp.sum(upd, axis=2)


def pallas_sparse_edges(h, x, idx, em, w):
    dt = jnp.bfloat16
    h_c = h.astype(dt)
    am_i = h_c @ w["wm_i"] + w["bm"]
    ax_i = h_c @ w["wx_i"] + w["bx"]
    return egcl_knn_kernel(
        am_i, ax_i, h_c, x.astype(jnp.float32), idx, em,
        w["wm_j"], w["wx_j"], w["w_dm"], w["w_dx"], w["w2m"],
        w["b2m"].astype(jnp.float32)[None] if w["b2m"].ndim == 1
        else w["b2m"].astype(jnp.float32),
        w["wa"].astype(jnp.float32), w["ba"].astype(jnp.float32),
        w["w2x"],
        w["b2x"].astype(jnp.float32)[None] if w["b2x"].ndim == 1
        else w["b2x"].astype(jnp.float32),
        w["wx3"].astype(jnp.float32), w["bx3"].astype(jnp.float32),
        ti=8,
    )


def timed_scan(fn, h, x, idx, em, w):
    """Scan ITERS applications, feeding x back (keeps every iteration
    live); returns seconds per application."""

    @jax.jit
    def run(x0):
        def body(x, _):
            # the CARRY feeds the computation — with loop-invariant
            # operands XLA hoists the whole call out of the scan and the
            # "per-iteration" time measures one call + 50 adds (the first
            # version of this probe made exactly that mistake: 0.76 ms
            # for a 343-GFLOP iteration = 450 TFLOP/s on a 197-peak chip)
            m_sum, x_new = fn(h, x, idx, em, w)
            return x + 1e-6 * x_new, jnp.sum(m_sum)
        xf, outs = jax.lax.scan(body, x0, None, length=ITERS)
        return jnp.sum(xf) + jnp.sum(outs)

    out = run(x)
    _ = float(np.asarray(out))  # forced host transfer: real warm-up
    t0 = time.perf_counter()
    out = run(x)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.bfloat16)
    w = dict(
        wm_i=r(H, F1), wm_j=r(H, F1), w_dm=r(1, F1), bm=r(1, F1),
        wx_i=r(H, F1), wx_j=r(H, F1), w_dx=r(1, F1), bx=r(1, F1),
        w2m=r(F1, FM), b2m=jnp.asarray(rng.normal(size=(1, FM)) * 0.1,
                                       jnp.float32),
        wa=jnp.asarray(rng.normal(size=(FM, 1)) * 0.1, jnp.float32),
        ba=jnp.asarray(rng.normal(size=(1, 1)), jnp.float32),
        w2x=r(F1, F1), b2x=jnp.asarray(rng.normal(size=(1, F1)) * 0.1,
                                       jnp.float32),
        wx3=jnp.asarray(rng.normal(size=(F1, 1)) * 0.1, jnp.float32),
        bx3=jnp.asarray(rng.normal(size=(1, 1)), jnp.float32),
    )
    # bf16 copies for the XLA variant's weight dtypes
    wx = dict(w)
    for k in ("w2m", "b2m", "wa", "ba", "w2x", "b2x", "wx3", "bx3"):
        wx[k] = w[k].astype(jnp.bfloat16)

    results = {"device": str(jax.devices()[0]), "iters": ITERS,
               "widths": {"F1": F1, "Fm": FM, "H": H, "K": K},
               "sizes": {}}
    for n in (512, 1024, 2048, 4096):
        h = jnp.asarray(rng.normal(size=(1, n, H)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(1, n, 3)) * (n ** (1 / 3)),
                        jnp.float32)
        mask = jnp.ones((1, n), jnp.float32)
        idx, em = knn_edges(x, mask, K)
        idx = jax.block_until_ready(idx)

        # parity on the real chip before timing
        m_x, xo_x = jax.jit(xla_sparse_edges)(h, x, idx, em, wx)
        m_p, xo_p = pallas_sparse_edges(h, x, idx, em, w)
        dm = float(jnp.max(jnp.abs(m_x.astype(jnp.float32)
                                   - m_p.astype(jnp.float32))))
        dx = float(jnp.max(jnp.abs(xo_x - xo_p)))
        scale = float(jnp.max(jnp.abs(m_x.astype(jnp.float32)))) + 1e-9

        t_xla = timed_scan(xla_sparse_edges, h, x, idx, em, wx)
        t_pal = timed_scan(pallas_sparse_edges, h, x, idx, em, w)
        row = {
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "pallas_over_xla": round(t_pal / t_xla, 3),
            "parity_max_abs_m": dm, "parity_rel_m": dm / scale,
            "parity_max_abs_x": dx,
        }
        results["sizes"][f"n{n}"] = row
        print(n, row, flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "perf",
        "pallas_sparse_check.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
