"""Amorphous/unconditional generation driver — equivalent of
ref generate_amorphous.py:25-147, with flags instead of interactive stdin.

Loads a trained run, generates for an arbitrary dataset's conditions, and
logs the O-density accuracy scatter.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from diffusion_model_tpu import api
from diffusion_model_tpu.data.batch import collate
from diffusion_model_tpu.data.io import load_dataset
from diffusion_model_tpu.data.synthetic import synthetic_sio2_dataset
from diffusion_model_tpu.evals import density_accuracy, o_density
from diffusion_model_tpu.utils.logging import RunLogger, load_run_config


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", type=str, required=True,
                   help="trained run directory (checkpoints + config)")
    p.add_argument("--dataset_path", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--gen_num_per_spectrum", type=int, default=None)
    args = p.parse_args(argv)

    cfg = load_run_config(args.run_dir)
    if args.synthetic:
        graphs = synthetic_sio2_dataset(cfg.seed + 1, args.synthetic,
                                        cfg.n_max,
                                        spectrum_size=cfg.spectrum_size)
    elif args.dataset_path:
        graphs = load_dataset(args.dataset_path)
    else:
        raise SystemExit("provide --dataset_path or --synthetic N")
    graphs = api.prepare_dataset(graphs, cfg)

    logger = RunLogger(args.run_dir)
    example = collate(graphs[:1], cfg.n_max)
    trainer, state = api.load_trained(args.run_dir, cfg, example)
    results = api.generate(cfg, trainer, state, graphs,
                           gen_num_per_spectrum=args.gen_num_per_spectrum)

    out = os.path.join(args.run_dir, "generated_amorphous.npz")
    np.savez_compressed(out, **{k: v for k, v in results.items()
                                if k != "ids"},
                        ids=np.asarray(results["ids"]))
    logger.register_artifact("generated_amorphous_save_path", out)

    d_orig = o_density(results["original_species"], results["mask"])
    d_gen = o_density(results["generated_species"], results["mask"])
    acc = density_accuracy(d_orig, d_gen)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1], linestyle="-", color="red")
    ax.plot(d_orig, d_gen, linestyle="None", marker="o")
    ax.set_xlabel("density of O in original")
    ax.set_ylabel("density of O in generated")
    ax.set_title(f"density of O (accuracy {acc:.5f})")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    logger.log_figure("atom_type_eval_amorphous", fig)
    plt.close(fig)
    print(f"generated {len(results['ids'])} structures; "
          f"O-density accuracy {acc:.5f}; saved at {out}")


if __name__ == "__main__":
    main()
