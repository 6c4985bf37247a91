"""Small shared utilities.

Reference parity: qml_essentials/utils.py.
"""

from __future__ import annotations

import jax


def safe_random_split(random_key, *args, **kwargs):
    """``jax.random.split`` that tolerates ``None`` keys (returns ``(None, None)``)."""
    if random_key is None:
        return None, None
    return jax.random.split(random_key, *args, **kwargs)


def __getattr__(name):
    # Lazy re-export to avoid a circular import at package-init time.
    if name == "PauliCircuit":
        from qml_essentials_tpu.analysis.pauli import PauliCircuit

        return PauliCircuit
    raise AttributeError(name)
