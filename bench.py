"""Headline benchmark: 1000-step generation of a 192-atom SiO2 cell.

Prints one JSON line:
  {"metric": "atoms*denoise_steps/sec/chip", "value": N, "unit": "...",
   "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); the driver's north-star
target is <2 s for this workload on one v5e chip, i.e. a baseline rate of
192 * 1000 / 2 = 96_000 atoms*steps/sec. ``vs_baseline`` is measured rate /
that target rate (>1 beats the target).

``--run_dir <dir>`` benches a *trained* checkpoint instead of random-init
parameters (same architecture — EGNN parameters are independent of the
padded node count, so quality-run checkpoints load directly); the JSON
line then carries "params": "trained:<dir>".
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _device_health_probe(timeout_s: float = 180.0) -> bool:
    """Fail fast if the (remote) device is unreachable.

    A wedged TPU-tunnel worker makes every device op hang forever rather
    than error (observed 2026-08-17: the relay process died and even a
    128x128 matmul blocked indefinitely). Running the probe in a daemon
    thread lets the bench emit a diagnostic JSON line and exit instead of
    hanging the driver.
    """
    import threading

    ok = []

    def probe():
        x = jnp.ones((128, 128))
        ok.append(float((x @ x).sum()))

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    return bool(ok)


def main():
    from diffusion_model_tpu.config import Config
    from diffusion_model_tpu.data.split import batch_iterator
    from diffusion_model_tpu.data.synthetic import amorphous_cell
    from diffusion_model_tpu.diffusion import predefined_schedule, sample
    from diffusion_model_tpu.nn import DiffusionDenoiser
    from diffusion_model_tpu.train import Trainer

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", type=str, default=None,
                   help="bench a trained checkpoint from this run dir")
    args = p.parse_args()

    if not _device_health_probe():
        print(json.dumps({
            "metric": "atoms*denoise_steps/sec/chip", "value": 0.0,
            "unit": "atoms*steps/s", "vs_baseline": 0.0,
            "error": "device unreachable: health probe (128x128 matmul) "
                     "did not complete in 180s — TPU tunnel/worker down",
        }))
        return

    n_atoms = 192
    steps = 1000
    cfg = Config(n_max=n_atoms, num_diffusion_timestep=steps,
                 compute_dtype="bfloat16")
    if args.run_dir:
        # Take the run's persisted config (architecture, noise schedule —
        # a learned-schedule run carries a gamma subtree the bench default
        # would not build) but keep the bench workload shapes.
        from diffusion_model_tpu.utils.logging import load_run_config

        cfg = load_run_config(args.run_dir).replace(
            n_max=n_atoms, num_diffusion_timestep=steps,
            compute_dtype="bfloat16", sample_steps=0)

    cell = amorphous_cell(seed=0, num_atoms=n_atoms,
                          spectrum_size=cfg.spectrum_size)
    cond = next(batch_iterator([cell], 1, cfg.n_max))

    if args.run_dir:
        from diffusion_model_tpu.train.checkpoint import (
            latest_step,
            restore_checkpoint,
        )

        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.key(0), cond)
        ckpt_dir = os.path.join(os.path.abspath(args.run_dir),
                                "checkpoints")
        state, _ = restore_checkpoint(ckpt_dir, state,
                                      step=latest_step(ckpt_dir))
        eval_params = state.eval_params(cfg)
        fn = trainer.denoise_fn(eval_params)
        schedule = trainer.schedule_for(eval_params)
        params_src = f"trained:{args.run_dir}"
    else:
        model = DiffusionDenoiser(cfg)
        b, n = cond.mask.shape
        t0 = jnp.full((b, n, 1), 0.5) * cond.mask[..., None]
        params = model.init(
            jax.random.key(0), cond.species, cond.pos, cond.spectrum,
            cond.exo, t0, cond.mask, cond.pair_mask(),
        )
        fn = lambda *a: model.apply(params, *a)
        schedule = predefined_schedule(cfg)
        params_src = "random-init"

    def timed(cfg_v):
        run = jax.jit(lambda key: sample(fn, schedule, cfg_v, key, cond))
        # compile + warm-up; the host transfer is load-bearing: on the axon
        # tunnel block_until_ready is a no-op until the remote compile has
        # landed, so np.asarray is the only reliable "compile finished"
        np.asarray(jax.tree.leaves(run(jax.random.key(1)))[0])
        times = []
        for i in range(3):
            t_start = time.perf_counter()
            jax.block_until_ready(run(jax.random.key(2 + i)))
            times.append(time.perf_counter() - t_start)
        return min(times)

    best = timed(cfg)
    # fast mode: 250-step strided sampler (RDF parity within noise of the
    # full 1000-step chain — docs/quality/strided_eval.json)
    strided = timed(cfg.replace(sample_steps=250))

    rate = n_atoms * steps / best  # atoms * denoise-steps per second
    baseline_rate = n_atoms * steps / 2.0  # driver target: <2 s
    print(json.dumps({
        "metric": "atoms*denoise_steps/sec/chip (192-atom cell, 1000-step sampler)",
        "value": round(rate, 1),
        "unit": "atoms*steps/s",
        "vs_baseline": round(rate / baseline_rate, 3),
        "seconds_per_structure": round(best, 3),
        "structures_per_hour": round(3600.0 / best, 1),
        "strided_250_seconds_per_structure": round(strided, 3),
        "strided_250_structures_per_hour": round(3600.0 / strided, 1),
        "params": params_src,
    }))


if __name__ == "__main__":
    main()
