"""Device-mesh construction helpers.

The reference is strictly single-process/single-device (SURVEY.md §2.3); the
TPU build scales via ``jax.sharding.Mesh`` + GSPMD/``shard_map``. Axis
conventions used throughout this package:

- ``"edge"``  — edge partitioning (the GNN analogue of sequence/context
  parallelism): each device owns a slice of the edge list and the two-phase
  mean aggregation is completed with a ``psum`` over this axis.
- ``"model"`` — tensor parallelism over the generated-weight output dim and
  the WeightGenerator MLP hidden/output dims.

On real hardware the mesh should be built so ``"edge"`` rides ICI
(``jax.experimental.mesh_utils.create_device_mesh`` does the right physical
layout); under tests this runs on virtual CPU devices
(``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("edge", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh; defaults to all devices on a 1-axis ``("edge",)`` mesh."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = (len(devices),)
        axis_names = tuple(axis_names[: 1])
    n_needed = int(np.prod(shape))
    if n_needed > len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {n_needed} devices, have {len(devices)}"
        )
    if len(shape) != len(tuple(axis_names)):
        axis_names = tuple(axis_names)[: len(shape)]
    try:
        from jax.experimental import mesh_utils

        device_array = mesh_utils.create_device_mesh(
            shape, devices=devices[:n_needed]
        )
    except Exception:
        device_array = np.asarray(devices[:n_needed]).reshape(shape)
    return Mesh(device_array, tuple(axis_names))


def mesh_axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis] if axis in mesh.shape else 1
