"""Checkpoint / resume via Orbax, with genuinely asynchronous saves.

The reference has no checkpointing at all (SURVEY.md §5.4: no
``torch.save``/``state_dict`` anywhere); this is the TPU-native equivalent:
the param pytree + optimizer state + step counter are saved with Orbax,
preserving the seeded-features reproducibility contract (the dataset seed
lives in the data layer, ``data/knowledge_graph.py``).

Asynchrony: Orbax's ``StandardCheckpointer`` subclasses
``AsyncCheckpointer`` — ``save`` snapshots device arrays and returns while
serialization runs on a background thread, so training overlaps the write.
The round-2 implementation defeated this by closing the checkpointer (a
blocking ``wait_until_finished``) inside each ``save_checkpoint`` call;
the module now keeps one long-lived checkpointer and exposes
:func:`wait_for_checkpoints` as the explicit barrier (called automatically
before restores and at interpreter exit).
"""

from __future__ import annotations

import atexit
import os
from typing import Any, Optional

import jax


_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
        atexit.register(wait_for_checkpoints)
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed to disk."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(
    directory: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    *,
    wait: bool = False,
) -> str:
    """Save ``{params, opt_state, step}`` to ``directory/step_<N>``.

    Returns as soon as device arrays are snapshotted (the write completes
    on a background thread — Orbax commits the directory atomically, so a
    crash mid-write leaves no partial checkpoint visible). Pass
    ``wait=True`` (or call :func:`wait_for_checkpoints`) to block until
    the checkpoint is durable.
    """
    directory = os.path.abspath(directory)
    path = os.path.join(directory, f"step_{step}")
    ckpt = {"params": params, "step": step}
    if opt_state is not None:
        ckpt["opt_state"] = opt_state
    ckptr = _checkpointer()
    ckptr.save(path, ckpt, force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def restore_checkpoint(
    path: str,
    params_like: Any,
    opt_state_like: Any = None,
) -> dict:
    """Restore a checkpoint saved by :func:`save_checkpoint`.

    ``params_like`` / ``opt_state_like`` provide the pytree structure +
    shapes/dtypes (e.g. from a fresh ``init_hypergnn`` / ``optimizer.init``).
    Any in-flight async saves are awaited first.
    """
    target = {"params": params_like, "step": 0}
    if opt_state_like is not None:
        target["opt_state"] = opt_state_like
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    return ckptr.restore(os.path.abspath(path), target)


def latest_checkpoint(directory: str) -> Optional[str]:
    """Path of the highest-step checkpoint under ``directory``, or None.

    Only committed checkpoints are visible (Orbax renames the temporary
    directory into place on completion), so a checkpoint from a process
    that died mid-save is never returned.
    """
    wait_for_checkpoints()
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
