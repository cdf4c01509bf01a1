"""Orbax checkpointing with optimizer state and true resume.

The reference only saves model state-dicts (never optimizer state) and has
no mid-training resume (ref main.py:219-228, SURVEY.md §5). Here a
checkpoint is the full TrainState (params + optimizer state + step) plus the
config dict, so training resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from diffusion_model_tpu.config import Config, from_dict


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(directory: str, state, cfg: Config, step: int) -> None:
    mgr = _manager(directory)
    mgr.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            config=ocp.args.JsonSave(cfg.to_dict()),
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, abstract_state: Any,
                       step: int | None = None):
    """Restore (state, cfg). ``abstract_state`` is a TrainState template
    (e.g. from ``Trainer.init_state``) defining the pytree structure."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract_state),
            config=ocp.args.JsonRestore(),
        ),
    )
    mgr.close()
    return restored["state"], from_dict(restored["config"])
