"""End-to-end pass on a REAL crystallographic corpus (VERDICT r3 missing #3).

Everything upstream of training has so far been exercised on synthetic
generators; this driver runs the actual production pipeline on public
crystallography:

  1. write the SiO2 polymorph corpus (alpha-quartz / alpha-cristobalite /
     coesite, data/polymorphs.py) as CASTEP ``coreloss.cell`` + OptaDOS
     edge files — one sample per excited-O site, spectra keyed to each
     site's REAL local geometry (Si-O-Si angles 137-180 deg across coesite
     sites, so conditioning carries genuine signal);
  2. ``cli.make_dataset`` ingestion (cell parser, spline fitter, shell
     extraction — ref make_dataset.py:60-143) at TWO ranges:
     ``--range 2NN`` (9-atom graphs: exO + 2 Si + 6 O) for the RDF /
     species readouts, and ``--range 1NN`` (3-atom CN2 graphs) for the
     Si-exO-Si angle-parity readout (the CN2 evaluator is defined on 3- or
     5-atom conditions, evals/cn2._cn2_sample_geometry);
  3. ``cli.main --mode train_and_generate`` on each dataset with the
     measured quality-run hyperparameters (lr 2e-4, batched — the
     reference defaults lr 1e-5 / batch 1 underfit a 46-condition corpus);
  4. evaluate: RDF cosine on the 2NN run; shell-agnostic CN2 angle parity
     + its 1-NN spectrum-space information ceiling on the 1NN run.

Writes ``docs/quality/real_data_e2e.json``.
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_range(nn_range, corpus, work_dir, epochs, overrides):
    import numpy as np
    import yaml

    from diffusion_model_tpu.cli import main as cli_main
    from diffusion_model_tpu.cli import make_dataset

    ds_dir = os.path.join(work_dir, f"dataset_{nn_range}")
    run_dir = os.path.join(work_dir, f"run_{nn_range}")
    make_dataset.main(["--range", nn_range, "--cell_dir_path", corpus,
                       "--save_dir_path", ds_dir])
    cfg_path = os.path.join(work_dir, f"config_{nn_range}.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(overrides, f)
    cli_main.main([
        "--mode", "train_and_generate", "--run_dir", run_dir,
        "--dataset_path", os.path.join(ds_dir, "dataset.npz"),
        "--num_epochs", str(epochs), "--config", cfg_path,
    ])
    metrics = {}
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            metrics.update(json.loads(line))
    results = np.load(os.path.join(run_dir, "generated.npz"),
                      allow_pickle=True)
    return run_dir, metrics, results


def main():
    from diffusion_model_tpu.utils import apply_env_platform
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work_dir", type=str, default="runs/real_data_e2e")
    p.add_argument("--epochs", type=int, default=1500)
    p.add_argument("--timesteps", type=int, default=1000,
                   help="diffusion T (reduce only for plumbing smokes)")
    p.add_argument("--out_json", type=str,
                   default="docs/quality/real_data_e2e.json")
    p.add_argument("--rattles", type=int, default=0,
                   help="thermally-rattled snapshots per O site (corpus "
                        "widening; spectrum recomputed from each rattled "
                        "cell's true geometry — polymorphs.write_corpus)")
    p.add_argument("--rattle_sigma", type=float, default=0.03,
                   help="cartesian rattle amplitude in Angstrom")
    p.add_argument("--batch_size", type=int, default=16,
                   help="training batch (32 keeps steps/epoch flat when "
                        "--rattles multiplies the corpus)")
    args = p.parse_args()

    import numpy as np

    from diffusion_model_tpu.data import polymorphs

    corpus = os.path.join(args.work_dir, "corpus")
    shutil.rmtree(args.work_dir, ignore_errors=True)
    manifest = polymorphs.write_corpus(
        corpus, seed=0, n_rattles=args.rattles,
        rattle_sigma_A=args.rattle_sigma)
    angles = [m[3] for m in manifest]
    print(f"corpus: {len(manifest)} samples, Si-O-Si angles "
          f"{min(angles):.1f}-{max(angles):.1f} deg", flush=True)

    # the measured quality-run hyperparameters (examples/quality_demo.py)
    overrides = {"batch_size": args.batch_size, "lr": 2e-4,
                 "optimizer": "RAdamScheduleFree",
                 "num_diffusion_timestep": args.timesteps}
    # compute_dtype stays float32: this driver runs CPU-side (the TPU is
    # reserved for the quality queue) and bf16 is emulated ~10x slow there

    # --- 2NN: RDF + species readouts -------------------------------
    run2, m2, _ = run_range("2NN", corpus, args.work_dir, args.epochs,
                            overrides)
    from diffusion_model_tpu.cli import evaluate_rdf
    evaluate_rdf.main(["--run_dir", run2])
    with open(os.path.join(run2, "metrics.jsonl")) as f:
        for line in f:
            m2.update(json.loads(line))

    # --- 1NN: CN2 angle parity + information ceiling -----------------
    run1, m1, res1 = run_range("1NN", corpus, args.work_dir, args.epochs,
                               overrides)
    from diffusion_model_tpu.cli import evaluate_cn2
    evaluate_cn2.main(["--run_dir", run1])
    with open(os.path.join(run1, "metrics.jsonl")) as f:
        for line in f:
            m1.update(json.loads(line))

    # 1-NN spectrum-space ceilings on the TRUE geometry of the corpus
    # (evals/baseline.py): bound what any conditional model can extract
    from diffusion_model_tpu.data.io import load_dataset
    from diffusion_model_tpu.data.split import split_dataset
    from diffusion_model_tpu.evals import nn_ceiling_r2
    from diffusion_model_tpu.ops.angles import cn2_angle_deg

    graphs = load_dataset(
        os.path.join(args.work_dir, "dataset_1NN", "dataset.npz"))
    tr, va, te = split_dataset(graphs, 2024)

    def bond_pair(gs):
        p = np.stack([g["pos"][:3] for g in gs])
        return np.stack([np.linalg.norm(p[:, 1] - p[:, 0], axis=-1),
                         np.linalg.norm(p[:, 2] - p[:, 0], axis=-1)], 1)

    ceiling = ceiling_bond = None
    if len(tr) >= 3 and len(te) >= 3:
        tr_sp = np.stack([g["spectrum"][0] for g in tr])
        te_sp = np.stack([g["spectrum"][0] for g in te])
        ceiling = nn_ceiling_r2(
            tr_sp,
            np.asarray(cn2_angle_deg(np.stack([g["pos"][:3] for g in tr]))),
            te_sp,
            np.asarray(cn2_angle_deg(np.stack([g["pos"][:3] for g in te]))),
        )
        ceiling_bond = nn_ceiling_r2(tr_sp, bond_pair(tr), te_sp,
                                     bond_pair(te))

    # Why the corpus bond R^2 is a denominator artifact, measured: the
    # spectra identify each of the 46 discrete sites exactly (1-NN bond
    # ceiling ~= 1.0), but the CORPUS bond spread is ~0.008 A sd — so
    # R^2 = 1 - MSE/var goes to 0 for any sampler whose per-bond noise
    # exceeds ~0.008 A, orders below a diffusion sampler's coordinate
    # noise floor. The chemically meaningful readout on a near-constant
    # target is the absolute error (bond MAE), reported per polymorph.
    all_bonds = bond_pair(graphs)
    bond_stats = {
        "bond_mean_A": round(float(all_bonds.mean()), 4),
        "bond_sd_A": round(float(all_bonds.std()), 4),
        "bond_range_A": [round(float(all_bonds.min()), 4),
                         round(float(all_bonds.max()), 4)],
    }

    # per-polymorph breakdown over the 1NN generation results
    from diffusion_model_tpu.cli.common import load_results
    from diffusion_model_tpu.evals import r2score
    from diffusion_model_tpu.evals.cn2 import (
        _cn2_sample_geometry,
        conditional_angle_parity,
    )

    from diffusion_model_tpu.utils.logging import load_run_config

    results1 = load_results(run1, accepted_only=False)
    geo = _cn2_sample_geometry(results1)
    gper = load_run_config(run1).gen_num_per_spectrum
    # results ids are PER-SAMPLE (condition id repeated gper times,
    # contiguous — api.generate) and carry the polymorph name
    # (data/polymorphs.write_corpus: sample_NNN_<poly>_oK)
    sample_ids = [str(i) for i in results1["ids"]]
    n_samples = len(geo["angle_o"])
    per_poly = {}
    for poly in sorted({i.split("_")[2] for i in sample_ids
                        if len(i.split("_")) > 2}):
        smask = np.asarray([i.split("_")[2] == poly for i in sample_ids])
        valid = smask & ~geo["invalid"]
        if valid.sum() < 2:
            continue
        bond_err = 0.5 * (
            np.abs(geo["bond1_g"][valid] - geo["bond1_o"][valid])
            + np.abs(geo["bond2_g"][valid] - geo["bond2_o"][valid])
        )
        # group means within the polymorph subset (reference readout) —
        # smask selects whole contiguous gper-blocks, so grouping holds
        th, ph = conditional_angle_parity(
            results1, gper, geo={k: v[smask] for k, v in geo.items()},
        )
        try:
            per_poly[poly] = {
                "conditions": int(smask.sum()) // gper,
                "angle_r2": round(float(r2score(th, ph)), 4),
                "angle_mae_deg": round(float(np.mean(np.abs(
                    geo["angle_g"][valid] - geo["angle_o"][valid]))), 2),
                "bond_mae_A": round(float(bond_err.mean()), 4),
            }
        except Exception as e:  # a readout edge case must not lose the
            per_poly[poly] = {"error": str(e)}  # full-budget run's JSON
    bond_mae_all = None
    valid_all = ~geo["invalid"]
    if valid_all.sum():
        bond_mae_all = round(float(np.mean(0.5 * (
            np.abs(geo["bond1_g"][valid_all] - geo["bond1_o"][valid_all])
            + np.abs(geo["bond2_g"][valid_all] - geo["bond2_o"][valid_all])
        ))), 4)

    out = {
        "corpus": {
            "samples": len(manifest),
            "polymorphs": sorted({m[1] for m in manifest}),
            "angle_deg_min": round(min(angles), 2),
            "angle_deg_max": round(max(angles), 2),
            "rattles_per_site": args.rattles,
            "rattle_sigma_A": args.rattle_sigma if args.rattles else 0.0,
            **bond_stats,
        },
        "epochs": args.epochs,
        "train_overrides": overrides,
        "2NN": {
            "rdf_cos_mean": m2.get("rdf_cos_mean"),
            "atom_type_accuracy": m2.get("atom_type_accuracy"),
            "final_train_loss": m2.get("train_loss"),
        },
        "1NN": {
            "cn2_angle_r2": m1.get("cn2_angle_r2"),
            "cn2_bond_r2": m1.get("cn2_bond_r2"),
            "cn2_angle_r2_nn_ceiling": ceiling,
            "cn2_bond_r2_nn_ceiling": ceiling_bond,
            "cn2_bond_mae_A": bond_mae_all,
            "atom_type_accuracy": m1.get("atom_type_accuracy"),
            "final_train_loss": m1.get("train_loss"),
        },
        "per_polymorph_1NN": per_poly,
        "bond_r2_reading": (
            (
                "bond R^2 on the rattled corpus is INFORMATION-limited, "
                "not a sampler failure: the synthesized edge "
                "(data/polymorphs.physical_edge_curve) encodes (CN, "
                "Si-O-Si angle) only, so once the rattle decorrelates "
                "bond length from the site identity the spectrum carries "
                "no bond signal — the 1-NN label-copy ceiling "
                f"({ceiling_bond}) stays ~1 because every spectrum is a "
                "unique fingerprint, but it is not an information bound "
                "for generative extraction. Read cn2_bond_mae_A "
                f"(corpus sd {bond_stats['bond_sd_A']} A) instead."
            )
            if args.rattles
            else (
                "bond R^2 on this corpus is a denominator artifact, not "
                "an extraction failure: the spectra identify each site "
                f"exactly (1-NN bond ceiling {ceiling_bond}), but the "
                f"corpus bond spread is {bond_stats['bond_sd_A']} A sd, "
                "so R^2 = 1 - MSE/var needs per-bond RMS error below "
                f"~{bond_stats['bond_sd_A']} A — under any diffusion "
                "sampler's coordinate noise floor. Read cn2_bond_mae_A "
                "(absolute error vs the ~1.61 A target) instead."
            )
        ),
    }
    os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
    with open(args.out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
