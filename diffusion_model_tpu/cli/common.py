"""Shared helpers for evaluator CLIs: load a run's generated results."""

from __future__ import annotations

import numpy as np

from diffusion_model_tpu.utils.logging import RunLogger


def load_results(run_dir: str, artifact: str = "generated_graph_save_path"
                 ) -> dict:
    logger = RunLogger(run_dir)
    path = logger.artifact(artifact)
    z = np.load(path, allow_pickle=False)
    results = {k: z[k] for k in z.files if k != "ids"}
    results["ids"] = [str(i) for i in z["ids"]]
    return results


def trim(pos, mask, i):
    n = int(mask[i].sum())
    return np.asarray(pos[i][:n])
