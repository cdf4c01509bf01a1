"""Tabulate size_generalization sweep arms side by side.

Reads ``size_gen_summary.json`` from each given run dir and prints one
row per (run, size): the raw aggregate-RDF cosine and its resampling
ceiling, the envelope-subtracted excess score and ITS ceiling/floor
(the discriminative readout at dense cells — docs/quality/
size512net_eval.json), and the chemical-order panel (CN means, Si-O-Si
angle, NN distance) generated/original.

Usage: python benchmarks/digest_size_gen.py runs/size_gen_192net_b ...
"""

import json
import os
import sys


def rows(run_dir):
    path = os.path.join(run_dir, "size_gen_summary.json")
    if not os.path.exists(path):
        yield os.path.basename(run_dir), "(no summary yet)"
        return
    with open(path) as f:
        out = json.load(f)
    yield os.path.basename(run_dir), out.get("config", "")
    for size, r in sorted(out.get("sizes", {}).items()):
        panel = r.get("panel", {})
        ceil = r.get("rdf_ceiling", {})

        def pair(key, fmt="{:.2f}"):
            g = panel.get(f"{key}_generated")
            o = panel.get(f"{key}_original")
            if g is None or o is None:
                return "-"
            return f"{fmt.format(g)}/{fmt.format(o)}"

        nn_g = r.get("nn_dist_median_generated")
        nn_o = r.get("nn_dist_median_original")
        nn = f"{nn_g:.3f}/{nn_o:.3f}" if nn_g is not None else "-"
        yield f"  {size}", (
            f"raw {r.get('aggregate_rdf_cos', float('nan')):.3f}"
            f" (ceil {ceil.get('mean', float('nan')):.3f})"
            f" | excess {panel.get('excess_rdf_cos', float('nan')):.3f}"
            f" (floor {panel.get('excess_rdf_cos_structureless_floor', float('nan')):.3f}"
            f", ceil {ceil.get('excess_mean', float('nan')):.3f})"
            f" | CN_Si {pair('cn_si_mean')} CN_O {pair('cn_o_mean')}"
            f" | SiOSi {pair('angle_siosi_mean', '{:.1f}')}"
            f" | NNd {nn}"
            f" | finite {r.get('finite_fraction', float('nan')):.2f}"
        )


def main(argv):
    for run_dir in argv:
        for name, text in rows(run_dir):
            print(f"{name:26s} {text}")


if __name__ == "__main__":
    main(sys.argv[1:])
