"""Multi-device execution: mesh configuration and sharded simulation.

The reference is strictly single-process (SURVEY.md §2: no DP/TP/PP, no
comms backend; the vmap boundary at qml_essentials/script.py:443-453 is
documented as the multi-device seam).  This package is the TPU-native
realisation of that seam:

* ``set_mesh``/``get_mesh`` — a process-global :class:`jax.sharding.Mesh`.
  When a mesh with a ``data`` axis is configured, every batched
  :meth:`Script.execute` dispatch places its batch arguments with a
  ``NamedSharding`` over that axis, so XLA partitions the single compiled
  program across devices and the batch rides the ICI (pure data
  parallelism, no code change for the user).
* :mod:`~qml_essentials_tpu.parallel.state_sharding` — statevector ("tensor")
  parallelism: the ``(2,)**n`` state is sharded over leading qubit axes on a
  ``state`` mesh axis inside ``shard_map``, with gates on sharded qubits
  executed via qubit-axis relabelling (all-to-all collective permutes).
* :mod:`~qml_essentials_tpu.parallel.density_sharding` — distributed
  density-matrix simulation: noisy tapes lower to the interleaved doubled
  register (2n-qubit pure state, channels as one-pass superoperators) and
  run through the same sharded machinery, with pair-diagonal measurements.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

from qml_essentials_tpu.parallel.density_sharding import (  # noqa: F401
    ShardedDensitySim,
)
from qml_essentials_tpu.parallel.state_sharding import (  # noqa: F401
    ShardedStateSim,
    ShardingUnavailable,
    sharded_expval_z,
)

_ACTIVE_MESH: Optional[Mesh] = None


def set_mesh(mesh: Optional[Mesh]) -> None:
    """Install (or clear, with ``None``) the process-global execution mesh."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_mesh() -> Optional[Mesh]:
    """Return the active execution mesh, or ``None``."""
    return _ACTIVE_MESH


def explain(target) -> str:
    """Report what sharded and what fell back (and why) for *target*.

    *target* is a :class:`~qml_essentials_tpu.core.executor.Script` or a
    :class:`~qml_essentials_tpu.models.model.Model` (its ``.script`` is
    read).  Returns a human-readable multi-line string of the script's
    recent routing decisions — ``sharded:state`` / ``sharded:density`` /
    ``sharded:cached`` per served request, or ``fallback: <reason>`` when a
    request ran single-device.  Fallbacks also warn (once per reason) at
    execution time; this is the post-hoc view.
    """
    script = getattr(target, "script", target)
    decisions = getattr(script, "sharding_decisions", None)
    mesh = get_mesh()
    header = (
        "mesh: none configured"
        if mesh is None
        else "mesh: "
        + " × ".join(f"{k}={v}" for k, v in mesh.shape.items())
    )
    if decisions is None:
        return header + "\n(target has no execution script)"
    if not decisions:
        return header + "\n(no sharding-routable executions recorded yet)"
    lines = [header]
    for request, route in decisions:
        lines.append(f"  {request} -> {route}")
    return "\n".join(lines)


def make_mesh(
    axis_sizes: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    A single ``-1`` axis size absorbs all remaining devices (numpy-reshape
    convention).
    """
    import math

    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    sizes = [s for s in axis_sizes if s != -1]
    n_needed = math.prod(sizes) if len(sizes) == len(axis_sizes) else None
    if n_needed is not None and n_needed <= len(devices):
        devices = devices[:n_needed]
    return Mesh(
        np.array(devices).reshape(tuple(axis_sizes)),
        axis_names=tuple(axis_names),
    )
