"""Digest the sampling-temperature sweep of a trained large-cell run.

Collects ``eval_n<size>_s<steps>[_ns*].json`` artifacts produced by
``examples/eval_512_checkpoint.py --sample_noise_scale ...`` into one
table keyed by temperature, so the jitter-vs-model split of a
distribution deficit (e.g. the 512-atom bond-peak blur,
docs/quality/size512net_per_t_profile.json) reads off a single JSON.

Usage:
    python benchmarks/digest_temperature.py --run_dir runs/size_gen_512net \
        --out docs/quality/size512net_temperature.json
"""

import argparse
import glob
import json
import os
import re

KEYS = (
    "aggregate_rdf_cos", "nn_dist_median_generated",
    "nn_dist_median_original", "o_density_mae", "finite_fraction",
    "accepted",
)
PANEL_KEYS = (
    "pair_dist_w1", "cn_si_mean_generated", "cn_o_mean_generated",
    "angle_osio_w1_deg", "angle_siosi_w1_deg",
    "envelope_scale_ratio_p95",
    "excess_rdf_cos",
    "bond_peak_center_original", "bond_peak_center_generated",
    "bond_peak_width_original", "bond_peak_width_generated",
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", type=str, required=True)
    p.add_argument("--glob", type=str, default="eval_n*_s*.json",
                   help="eval artifact pattern inside run_dir")
    p.add_argument("--out", type=str, default="")
    args = p.parse_args()

    rows = {}
    for path in sorted(glob.glob(os.path.join(args.run_dir, args.glob))):
        with open(path) as f:
            d = json.load(f)
        res = d.get("result", {})
        m = re.search(r"_ns([0-9.]+)\.json$", path)
        ns = float(m.group(1)) if m else res.get("sample_noise_scale", 1.0)
        row = {k: res[k] for k in KEYS if k in res}
        row.update({k: res["panel"][k] for k in PANEL_KEYS
                    if k in res.get("panel", {})})
        row["sample_steps"] = res.get("sample_steps")
        row["file"] = os.path.basename(path)
        rows[f"ns{ns:g}"] = row

    # reuse any artifact's resampling ceiling (protocol-level constant)
    ceiling = None
    for path in sorted(glob.glob(os.path.join(args.run_dir, args.glob))):
        with open(path) as f:
            d = json.load(f)
        if "rdf_ceiling" in d.get("result", {}):
            ceiling = d["result"]["rdf_ceiling"]
            break

    out = {"run_dir": args.run_dir, "temperatures": rows,
           "rdf_resampling_ceiling": ceiling}
    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
