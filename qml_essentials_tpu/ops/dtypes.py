"""Precision configuration for the TPU-native QML stack.

The simulator runs in ``complex64`` by default — the natural dtype on TPU,
where float64 is not supported in hardware.  Enabling JAX x64 mode switches
every kernel to ``complex128`` (useful for the host-side symbolic stack, e.g.
the Fourier tree, which relies on dyadic-rational exactness).

Reference parity: qml_essentials/operations.py:12-16 (``_cdtype``) and
qml_essentials/memory.py:26-33 (element-size detection).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cdtype() -> jnp.dtype:
    """Active complex dtype: complex128 under x64 mode, complex64 otherwise."""
    return jnp.complex128 if jax.config.x64_enabled else jnp.complex64


def rdtype() -> jnp.dtype:
    """Active real dtype: float64 under x64 mode, float32 otherwise."""
    return jnp.float64 if jax.config.x64_enabled else jnp.float32


def complex_itemsize() -> int:
    """Bytes per complex element for the active precision."""
    return 16 if jax.config.x64_enabled else 8


def real_itemsize() -> int:
    """Bytes per real element for the active precision."""
    return 8 if jax.config.x64_enabled else 4


# Backwards-compatible alias matching the reference's private helper name so
# downstream code written against qml-essentials keeps working.
_cdtype = cdtype
