"""Checkpoint / resume via Orbax (async-capable).

The reference has no checkpointing at all (SURVEY.md §5.4: no
``torch.save``/``state_dict`` anywhere); this is the TPU-native equivalent:
the param pytree + optimizer state + step counter are saved with Orbax,
preserving the seeded-features reproducibility contract (the dataset seed
lives in the data layer, ``data/knowledge_graph.py``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(
    directory: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
) -> str:
    """Save ``{params, opt_state, step}`` to ``directory/step_<N>``."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    path = os.path.join(directory, f"step_{step}")
    ckpt = {"params": params, "step": step}
    if opt_state is not None:
        ckpt["opt_state"] = opt_state
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)
    return path


def restore_checkpoint(
    path: str,
    params_like: Any,
    opt_state_like: Any = None,
) -> dict:
    """Restore a checkpoint saved by :func:`save_checkpoint`.

    ``params_like`` / ``opt_state_like`` provide the pytree structure +
    shapes/dtypes (e.g. from a fresh ``init_hypergnn`` / ``optimizer.init``).
    """
    import orbax.checkpoint as ocp

    target = {"params": params_like, "step": 0}
    if opt_state_like is not None:
        target["opt_state"] = opt_state_like
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target)


def latest_checkpoint(directory: str) -> Optional[str]:
    """Path of the highest-step checkpoint under ``directory``, or None."""
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(directory, max(steps)[1])
