"""Orbax-backed checkpointing for models and long QOC runs.

The reference persists only per-gate CSV rows and Haar-integral caches
(SURVEY.md §5, "Checkpoint / resume"); this adds proper array-tree
checkpoints: model parameters (variational + encoding + pulse) and QOC
optimiser state, with atomic versioned saves and a latest-restore helper.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: Any, step: Optional[int] = None) -> str:
    """Save a pytree checkpoint; returns the concrete directory written.

    With *step*, checkpoints are versioned as ``<path>/step_<k>``;
    otherwise *path* itself is (over)written.
    """
    target = os.path.join(path, f"step_{step}") if step is not None else path
    target = os.path.abspath(target)
    _checkpointer().save(target, tree, force=True)
    return target


def restore_checkpoint(path: str, step: Optional[int] = None) -> Any:
    """Restore a pytree checkpoint saved by :func:`save_checkpoint`."""
    target = os.path.join(path, f"step_{step}") if step is not None else path
    return _checkpointer().restore(os.path.abspath(target))


def latest_step(path: str) -> Optional[int]:
    """Largest ``step_<k>`` version under *path*, or ``None``."""
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def save_model(path: str, model, step: Optional[int] = None) -> str:
    """Checkpoint a Model's trainable state (params, enc_params, pulse)."""
    tree = {
        "params": np.asarray(model.params),
        "enc_params": np.asarray(model.enc_params),
        "pulse_params": np.asarray(model.pulse_params),
    }
    return save_checkpoint(path, tree, step=step)


def restore_model(path: str, model, step: Optional[int] = None):
    """Restore a Model's trainable state in place; returns the model."""
    import jax.numpy as jnp

    tree = restore_checkpoint(path, step=step)
    model.params = jnp.asarray(tree["params"])
    model.enc_params = jnp.asarray(tree["enc_params"])
    model.pulse_params = jnp.asarray(tree["pulse_params"])
    return model
