"""Fused kNN kernel timing with the virtual_node recipe (VERDICT r4 #4).

Round 4 measured the kernel's 1.75-1.78x win at 2048/4096 atoms on the
PLAIN EGCL edge computation only — while the one validated large-cell
recipe is h_residual + virtual_node, which the fast path then rejected.
Round 5 wired the vn channel through ``nn/fast_apply.py`` (it is O(N) XLA
work outside the edge loop); this probe re-measures the decision the
auto-route (``api.sampling_uses_pallas``) actually makes for that recipe:

  xla    : DiffusionDenoiser.apply, kNN sparse path (production default)
  pallas : fast_denoise_fn — fused kNN kernel + XLA vn channel

Both run the FULL flagship-width L=5 denoiser (not one layer) with
``h_residual=True, virtual_node=True`` at N = 2048 / 4096, kNN-32, and the
per-step ``knn_edges`` rebuild INSIDE the timed scan — i.e. the real
per-step sampling workload, carried on x so nothing hoists. Parity is
checked on the same inputs first (normalised h_init_scale weights — the
well-conditioned regime, CLAUDE.md). Writes
docs/perf/pallas_sparse_vn_check.json.

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

ITERS = 20
K = 32


def build(cfg, n, rng):
    from diffusion_model_tpu.nn import DiffusionDenoiser
    from diffusion_model_tpu.ops.edges import knn_edges

    model = DiffusionDenoiser(cfg)
    species = jnp.asarray(
        jax.nn.one_hot(rng.integers(0, cfg.atom_type_size, (1, n)),
                       cfg.atom_type_size))
    # amorphous-cell coordinate magnitudes (probe_sparse_parity.py)
    r_cell = (1.5 * n) ** (1 / 3) * 1.6
    u = rng.normal(size=(1, n, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    x = jnp.asarray(u * r_cell * rng.random((1, n, 1)) ** (1 / 3),
                    jnp.float32)
    spectrum = jnp.asarray(rng.normal(size=(1, n, cfg.spectrum_size)),
                           jnp.float32)
    exo = jnp.zeros((1, n, cfg.d_size), jnp.float32)
    mask = jnp.ones((1, n), jnp.float32)
    t_norm = jnp.full((1, n, 1), 0.4, jnp.float32)
    params = model.init(jax.random.key(0), species, x, spectrum, exo,
                        t_norm, mask, knn_edges(x, mask, K))
    return model, params, (species, x, spectrum, exo, t_norm, mask)


def timed_scan(step, x0):
    """step(x) -> (eps_x, eps_h); scan feeds eps_x back into the carry so
    the knn rebuild + full denoise stay live every iteration (the scan
    hoisting trap, CLAUDE.md)."""

    @jax.jit
    def run(x):
        def body(xc, _):
            eps_x, eps_h = step(xc)
            return xc + 1e-3 * eps_x.astype(xc.dtype), jnp.sum(
                eps_h.astype(jnp.float32))
        xf, outs = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(xf) + jnp.sum(outs)

    out = run(x0)
    _ = float(np.asarray(out))  # forced host transfer: real warm-up
    t0 = time.perf_counter()
    out = run(x0)
    _ = float(np.asarray(out))
    return (time.perf_counter() - t0) / ITERS


def main():
    from diffusion_model_tpu.config import Config
    from diffusion_model_tpu.nn.fast_apply import fast_denoise_fn
    from diffusion_model_tpu.ops.edges import knn_edges
    from diffusion_model_tpu.utils import apply_env_platform

    apply_env_platform()
    smoke = "--smoke" in sys.argv
    interpret = jax.default_backend() == "cpu"
    sizes = (64,) if smoke else (2048, 4096)
    rng = np.random.default_rng(11)

    results = {"device": str(jax.devices()[0]), "iters": ITERS,
               "what": __doc__.splitlines()[0], "sizes": {}}
    for n in sizes:
        cfg = Config(
            n_max=n, neighbor_k=K, compute_dtype="bfloat16",
            h_residual=True, virtual_node=True, h_init_scale=1e-3,
            # zero_init_x would zero the eps_x head and make the parity
            # check degenerate (0/0) — the probe wants a live x branch
            zero_init_x=False,
            **({"L": 2, "m_hidden_size": 64, "h_hidden_size": 64,
                "x_hidden_size": 64, "m_size": 32} if smoke else {}),
        )
        model, params, args = build(cfg, n, rng)
        species, x, spectrum, exo, t_norm, mask = args
        fast = fast_denoise_fn(cfg, params, interpret=interpret)

        def xla_step(xc, _m=model, _p=params):
            edges = knn_edges(xc, mask, K)
            return _m.apply(_p, species, xc, spectrum, exo, t_norm, mask,
                            edges)

        def pallas_step(xc, _f=fast):
            edges = knn_edges(xc, mask, K)
            return _f(species, xc, spectrum, exo, t_norm, mask, edges)

        # parity on the same inputs before timing
        ex_x, eh_x = jax.jit(xla_step)(x)
        ex_p, eh_p = jax.jit(pallas_step)(x)
        sx = float(jnp.max(jnp.abs(ex_x.astype(jnp.float32)))) + 1e-9
        dm = float(jnp.max(jnp.abs(ex_x.astype(jnp.float32)
                                   - ex_p.astype(jnp.float32))))
        row = {"parity_rel_eps_x": dm / sx}

        if not smoke:
            t_xla = timed_scan(xla_step, x)
            t_pal = timed_scan(pallas_step, x)
            row.update({
                "xla_ms_per_step": round(t_xla * 1e3, 3),
                "pallas_ms_per_step": round(t_pal * 1e3, 3),
                "pallas_over_xla": round(t_pal / t_xla, 3),
            })
        results["sizes"][f"n{n}"] = row
        print(n, row, flush=True)

    results["parity_reading"] = (
        "parity_rel_eps_x here is the RANDOM-INIT bf16 path-difference "
        "through the full L-layer model — the regime CLAUDE.md flags as "
        "ill-conditioned (it grows with N through the vn pooling and "
        "says nothing about trained-model drift). The kernel-specific "
        "error is bounded at 2e-4 by the f32 decomposition "
        "(docs/perf/sparse_parity_f32.json); exact wiring parity is "
        "pinned by tests/test_pallas_egcl.py TestVirtualNodeFastPath."
    )
    if smoke:
        # gross-wiring sanity only (exact parity lives in the interpret
        # tests); bf16 path-difference at toy widths is a few percent
        assert results["sizes"][f"n{sizes[0]}"]["parity_rel_eps_x"] < 0.05
        print("smoke ok (no artifact written)", flush=True)
        return
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "perf",
        "pallas_sparse_vn_check.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
