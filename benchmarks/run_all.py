"""Benchmark suite over the five BASELINE.json driver configs.

Each config prints one JSON line. ``python benchmarks/run_all.py --configs
1,2,3`` selects a subset; config #5 (mesh DP) uses all visible devices —
run with XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU or on a
real multi-chip slice.

  1. small cell (~72 atoms): short train + 100-step sample
  2. joint (x,h) 192-atom cell, 1000-step sampling   (same as bench.py)
  3. batched generation: 256 structures per call + on-device RDF eval
  4. large cell (1024 atoms) via fixed-degree kNN lists
  5. data-parallel train step + sharded generation over the device mesh
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _flagship_cfg(**kw):
    from diffusion_model_tpu.config import Config

    base = dict(compute_dtype="bfloat16")
    base.update(kw)
    return Config(**base)


def _setup(cfg, graphs):
    from diffusion_model_tpu.data.split import batch_iterator
    from diffusion_model_tpu.train import Trainer

    trainer = Trainer(cfg)
    batch = next(batch_iterator(graphs, cfg.batch_size, cfg.n_max))
    state = trainer.init_state(jax.random.key(0), batch)
    return trainer, state, batch


def _time(fn, *args, repeats=3):
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t)
    return min(times)


def _emit(name, **kw):
    print(json.dumps({"config": name, **kw}), flush=True)


def config1():
    """Small cell, short train + 100-step sample."""
    from diffusion_model_tpu.data.synthetic import amorphous_cell
    from diffusion_model_tpu.diffusion import sample

    cfg = _flagship_cfg(n_max=72, num_diffusion_timestep=100, batch_size=1)
    cell = amorphous_cell(seed=0, num_atoms=72,
                          spectrum_size=cfg.spectrum_size)
    trainer, state, batch = _setup(cfg, [cell])
    step = lambda s, k: trainer.train_step(s, k, batch)
    t_train = _time(lambda: step(state, jax.random.key(1)))
    fn = trainer.denoise_fn(state.params)
    schedule = trainer.schedule_for(state.params)
    run = jax.jit(lambda k: sample(fn, schedule, cfg, k, batch))
    t_sample = _time(run, jax.random.key(2))
    _emit("1_small_cell_72atoms",
          train_step_ms=round(t_train * 1000, 2),
          sample_100step_s=round(t_sample, 3))


def config2():
    """Headline: 192-atom 1000-step generation."""
    from diffusion_model_tpu.data.synthetic import amorphous_cell
    from diffusion_model_tpu.diffusion import sample

    cfg = _flagship_cfg(n_max=192, num_diffusion_timestep=1000)
    cell = amorphous_cell(seed=0, num_atoms=192,
                          spectrum_size=cfg.spectrum_size)
    trainer, state, batch = _setup(cfg, [cell])
    fn = trainer.denoise_fn(state.params)
    schedule = trainer.schedule_for(state.params)
    run = jax.jit(lambda k: sample(fn, schedule, cfg, k, batch))
    t = _time(run, jax.random.key(2))
    _emit("2_joint_192atoms_1000steps",
          seconds_per_structure=round(t, 3),
          atoms_steps_per_sec=round(192 * 1000 / t, 1),
          vs_2s_target=round(2.0 / t, 3))


def config3():
    """Batched generation: 256 structures per call + on-device RDF."""
    from diffusion_model_tpu.data.split import batch_iterator
    from diffusion_model_tpu.data.synthetic import synthetic_sio2_dataset
    from diffusion_model_tpu.diffusion import sample
    from diffusion_model_tpu.ops.rdf import rdf_from_exo
    from diffusion_model_tpu.ops.angles import cn2_angle_deg

    cfg = _flagship_cfg(n_max=16, num_diffusion_timestep=100,
                        batch_size=256)
    graphs = synthetic_sio2_dataset(0, 256, cfg.n_max,
                                    spectrum_size=cfg.spectrum_size,
                                    shells=2)
    trainer, state, batch = _setup(cfg, graphs)
    fn = trainer.denoise_fn(state.params)
    schedule = trainer.schedule_for(state.params)

    def run(k):
        res = sample(fn, schedule, cfg, k, batch)
        rdf = jax.vmap(rdf_from_exo)(res.pos, batch.mask)
        ang = cn2_angle_deg(res.pos)
        return res.pos, rdf, ang

    t = _time(jax.jit(run), jax.random.key(3))
    _emit("3_batched_generation_256",
          seconds_per_call=round(t, 3),
          structures_per_sec=round(256 / t, 1))


def config4():
    """Large 1024-atom cell via kNN lists."""
    from diffusion_model_tpu.data.synthetic import amorphous_cell
    from diffusion_model_tpu.diffusion import sample

    cfg = _flagship_cfg(n_max=1024, neighbor_k=32,
                        num_diffusion_timestep=50, batch_size=1)
    cell = amorphous_cell(seed=0, num_atoms=1024,
                          spectrum_size=cfg.spectrum_size)
    trainer, state, batch = _setup(cfg, [cell])
    fn = trainer.denoise_fn(state.params)
    schedule = trainer.schedule_for(state.params)
    run = jax.jit(lambda k: sample(fn, schedule, cfg, k, batch))
    t = _time(run, jax.random.key(4))
    per_step = t / cfg.num_diffusion_timestep
    _emit("4_large_cell_1024atoms_knn32",
          ms_per_denoise_step=round(per_step * 1000, 2),
          projected_1000step_s=round(per_step * 1000_0 / 10, 2),
          atoms_steps_per_sec=round(1024 / per_step, 1))


def config5():
    """DP train step + sharded generation over the device mesh."""
    from diffusion_model_tpu.data.split import batch_iterator
    from diffusion_model_tpu.data.synthetic import synthetic_sio2_dataset
    from diffusion_model_tpu.diffusion import sample
    from diffusion_model_tpu.parallel import make_mesh, replicate, \
        shard_graph_batch

    ndev = len(jax.devices())
    cfg = _flagship_cfg(n_max=16, num_diffusion_timestep=100,
                        batch_size=8 * ndev)
    graphs = synthetic_sio2_dataset(0, cfg.batch_size, cfg.n_max,
                                    spectrum_size=cfg.spectrum_size)
    trainer, state, batch = _setup(cfg, graphs)
    mesh = make_mesh()
    sharded = shard_graph_batch(batch, mesh, mode="dp")
    state_r = jax.device_put(state, replicate(mesh))
    t_train = _time(
        lambda: trainer.train_step(state_r, jax.random.key(1), sharded)
    )
    fn = trainer.denoise_fn(state_r.params)
    schedule = trainer.schedule_for(state_r.params)
    run = jax.jit(lambda k: sample(fn, schedule, cfg, k, sharded))
    t_gen = _time(run, jax.random.key(2))
    _emit("5_mesh_dp", devices=ndev,
          dp_train_step_ms=round(t_train * 1000, 2),
          sharded_gen_100step_s=round(t_gen, 3),
          structures_per_sec=round(cfg.batch_size / t_gen, 1))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", type=str, default="1,2,3,4,5")
    args = p.parse_args()
    fns = {"1": config1, "2": config2, "3": config3, "4": config4,
           "5": config5}
    for c in args.configs.split(","):
        fns[c.strip()]()


if __name__ == "__main__":
    main()
