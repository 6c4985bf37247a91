"""Backend runtime configuration.

Some TPU execution environments (notably the tunneled single-chip backend
this framework targets) compile complex arithmetic fine *inside* XLA
programs (the compiler expands complex ops into real pairs) but cannot
materialise complex buffers eagerly or transfer them to the host.  A
statevector simulator hits both paths: gate-matrix algebra runs eagerly at
trace time, and ``state``/``density`` results are complex outputs.

:func:`configure` probes the default accelerator once at import:

* if eager complex works (CPU, GPU, standard TPU) nothing changes;
* otherwise the JAX default device is pinned to the host CPU — so all
  eager / trace-time constant work (which is tiny) runs where complex is
  supported — while the executor places its compiled programs on the
  accelerator explicitly and splits complex outputs into (real, imag)
  pairs at the jit boundary.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np

log = logging.getLogger(__name__)

_configured = False
_accel_device = None
_split_complex = False


def _eager_complex_ok(device) -> bool:
    """Passive detection — a *failed* complex transfer poisons the backend
    (every subsequent transfer errors), so never probe by transferring.

    The known complex-free backend advertises itself in the PJRT
    ``platform_version`` string; ``QML_TPU_COMPLEX`` overrides ("0"/"1").
    """
    import os

    override = os.environ.get("QML_TPU_COMPLEX")
    if override is not None:
        return override not in ("0", "false", "no")
    version = getattr(getattr(device, "client", None), "platform_version", "") or ""
    return "axon" not in version.lower()


def _enable_compilation_cache() -> None:
    """Persist compiled XLA programs across processes.

    Large-state programs take tens of seconds to compile; the persistent
    cache makes repeat benchmark runs and the test suite pay compilation
    once per program signature.  ``QML_TPU_CACHE_DIR`` overrides the
    location; set it to ``""`` to disable.
    """
    import os

    cache_dir = os.environ.get(
        "QML_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "qml_essentials_tpu", "xla"),
    )
    if not cache_dir:
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        log.debug(f"Persistent compilation cache unavailable: {e}")


def configure() -> None:
    """Probe the default backend and set up the split-host mode if needed."""
    global _configured, _accel_device, _split_complex
    if _configured:
        return
    _configured = True

    _enable_compilation_cache()

    try:
        default = jax.devices()[0]
    except Exception as e:  # pragma: no cover - no backend at all
        log.warning(f"No JAX backend available: {e}")
        return

    if default.platform in ("tpu", "axon"):
        # Mosaic kernels only make sense on real TPU hardware; CPU sessions
        # keep the einsum path (and use interpret mode in kernel tests).
        from qml_essentials_tpu.ops import pallas_kernels

        pallas_kernels.ENABLED = True

    if default.platform == "cpu" or _eager_complex_ok(default):
        return

    try:
        cpu = jax.devices("cpu")[0]
    except Exception:  # pragma: no cover
        log.warning(
            "Accelerator lacks eager complex support and no CPU platform is "
            "available; complex eager operations will fail."
        )
        return

    jax.config.update("jax_default_device", cpu)
    _accel_device = default
    _split_complex = True
    log.info(
        f"Accelerator {default} lacks eager complex support: eager ops pinned "
        "to CPU; compiled programs placed on the accelerator with complex "
        "outputs split at the jit boundary."
    )


def accelerator_device() -> Optional[object]:
    """The compiled-program target device in split mode, else ``None``."""
    return _accel_device


def split_complex_outputs() -> bool:
    """Whether jit boundaries must return complex results as (re, im) pairs."""
    return _split_complex
