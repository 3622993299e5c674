"""Orbax checkpointing of the full train state.

Improvement over the reference, which saves model weights only — no optimizer
state, epoch counter, or RNG — and therefore cannot resume
(`/root/reference/mm_masking/train_icp_weights.py:534-537,577-578`; SURVEY.md §5).
Here the entire ``TrainState`` round-trips, giving deterministic resume.
"""
from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def _path(directory: str, name: str) -> str:
    return os.path.abspath(os.path.join(directory, name))


def save_checkpoint(directory: str, name: str, state: Any) -> str:
    path = _path(directory, name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(directory: str, name: str, template: Any) -> Any:
    path = _path(directory, name)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def load_policy_variables(directory: str, name: str = "best_policy") -> Any:
    """Restore ONLY the flax variables from a saved ``TrainState`` checkpoint,
    without reconstructing the optimizer (whose state tree a pure-inference
    consumer — e.g. the localization CLI's ``--checkpoint`` mode — neither has
    nor needs). Orbax restores the raw pytree when no template is given; the
    ``TrainState`` NamedTuple comes back as a sequence whose first leaf-tree
    is ``variables`` (see ``trainer.TrainState``)."""
    path = _path(directory, name)
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(path)
    if isinstance(raw, dict) and "variables" in raw:
        return raw["variables"]
    return raw[0]


def latest_epoch(directory: str) -> int | None:
    """Highest N among 'epoch_N' entries in the directory, if any."""
    if not os.path.isdir(directory):
        return None
    best = None
    for entry in os.listdir(directory):
        if entry.startswith("epoch_"):
            try:
                n = int(entry.split("_")[1])
            except (IndexError, ValueError):
                continue
            best = n if best is None else max(best, n)
    return best
