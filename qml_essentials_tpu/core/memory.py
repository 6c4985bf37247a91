"""Memory estimation and memory-aware batch chunking.

Decides whether a batched simulation fits in accelerator memory and, if not,
splits the batch into chunks that do.  The estimates are plain Python
arithmetic (zero overhead when everything fits).

TPU-first: available memory is read from the accelerator's HBM stats
(``device.memory_stats()``) when present, falling back to host RAM (psutil /
``/proc/meminfo``) on CPU backends.  The reference only ever consults host
RAM (qml_essentials/memory.py:153-183).

Reference parity: qml_essentials/memory.py (estimate 54-150, chunk sizing
186-261, chunked execution 264-345).
"""

from __future__ import annotations

import logging
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from qml_essentials_tpu.ops.dtypes import complex_itemsize, real_itemsize

log = logging.getLogger(__name__)

# Whether to call ``jax.clear_caches()`` between chunks.  Off by default:
# clearing forces XLA to recompile the batched program for every chunk.
CLEAR_CACHES_BETWEEN_CHUNKS: bool = False

# How many per-gate intermediate buffers the estimator assumes XLA keeps
# alive simultaneously.  The fused contraction plan plus XLA buffer reuse
# keeps this small and roughly depth-independent; the multiplier is exposed
# for tuning on memory-constrained hosts.
LIVE_BUFFERS: int = 4


def _output_bytes(
    type: str, batch_size: int, dim: int, elem: int, real_elem: int, n_obs: int
) -> int:
    """Bytes of the returned ``(batch_size, ...)`` measurement array."""
    if type == "density":
        return batch_size * dim * dim * elem
    if type == "expval":
        return batch_size * max(n_obs, 1) * real_elem
    if type == "probs":
        return batch_size * dim * real_elem
    return batch_size * dim * elem  # state


def estimate_peak_bytes(
    n_qubits: int,
    batch_size: int,
    type: str,
    use_density: bool,
    n_obs: int = 0,
    n_ops: int = 1,
) -> int:
    """Analytic peak-memory estimate for a batched simulation.

    Counts the batched state (or density) working set times the number of
    simultaneously-live contraction buffers, plus the output accumulator,
    with a 1.5x safety factor for XLA temporaries and padding.
    """
    dim = 2**n_qubits
    elem, real_elem = complex_itemsize(), real_itemsize()
    live = max(1, min(int(n_ops), LIVE_BUFFERS))

    state_bytes = batch_size * dim * elem
    if use_density:
        work = (1 + 2 * live) * batch_size * dim * dim * elem + state_bytes
    else:
        work = (1 + live) * state_bytes

    out = _output_bytes(type, batch_size, dim, elem, real_elem, n_obs)
    return int(max(work, out) * 1.5)


def available_memory_bytes() -> int:
    """Available accelerator HBM, or host RAM on CPU backends (bytes)."""
    # Accelerator HBM first: meaningful on TPU/GPU.
    try:
        dev = jax.local_devices()[0]
        if dev.platform not in ("cpu",):
            stats = dev.memory_stats()
            if stats and "bytes_limit" in stats:
                free = stats["bytes_limit"] - stats.get("bytes_in_use", 0)
                log.debug(f"HBM available: {free / 1024**3:.1f} GB")
                return int(free)
    except Exception:  # pragma: no cover - backend without memory_stats
        pass

    mem = 4 * 1024**3
    try:
        import psutil

        mem = psutil.virtual_memory().available
    except Exception:
        log.debug("psutil unavailable; falling back to /proc/meminfo")
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemAvailable:"):
                        mem = int(line.split()[1]) * 1024
                        break
        except Exception:
            log.debug("Could not read /proc/meminfo; using 4 GiB default")
    return mem


def compute_chunk_size(
    n_qubits: int,
    batch_size: int,
    type: str,
    use_density: bool,
    n_obs: int = 0,
    memory_fraction: float = 0.8,
    n_ops: int = 1,
) -> int:
    """Largest chunk size whose computation + output accumulator fits in memory.

    Returns *batch_size* (no chunking) when the full batch fits; minimum 1.
    """
    avail = int(available_memory_bytes() * memory_fraction)
    full_est = estimate_peak_bytes(n_qubits, batch_size, type, use_density, n_obs, n_ops)
    if full_est <= avail:
        return batch_size

    dim = 2**n_qubits
    elem, real_elem = complex_itemsize(), real_itemsize()
    accum = _output_bytes(type, batch_size, dim, elem, real_elem, n_obs)
    avail_for_chunks = max(avail - accum, elem)

    per_elem = estimate_peak_bytes(n_qubits, 1, type, use_density, n_obs, n_ops)
    if per_elem <= 0:
        return batch_size

    chunk = max(1, min(avail_for_chunks // per_elem, batch_size))
    if chunk == 1 and per_elem > avail:
        log.warning(
            f"A single batch element needs ~{per_elem / 1024**3:.2f} GB but only "
            f"~{avail / 1024**3:.2f} GB is available; proceeding with "
            f"chunk_size=1 — OOM is possible."
        )
    log.info(
        f"Batched run needs ~{full_est / 1024**3:.2f} GB (> {avail / 1024**3:.2f} GB "
        f"available); chunking with chunk size {chunk}."
    )
    return chunk


def execute_chunked(
    batched_fn: Callable,
    args: tuple,
    in_axes: Tuple,
    batch_size: int,
    chunk_size: int,
    clear_caches: bool = False,
) -> jnp.ndarray:
    """Run a vmapped function over the batch in memory-safe chunks.

    One chunk's intermediates are alive at a time; results are written into a
    pre-allocated output buffer so peak memory is roughly
    ``output + one chunk``.
    """
    n_chunks = (batch_size + chunk_size - 1) // chunk_size
    log.debug(f"Chunking batch of {batch_size} into {n_chunks} x <= {chunk_size}.")

    output = None
    for idx in range(n_chunks):
        start = idx * chunk_size
        end = min(start + chunk_size, batch_size)
        size = end - start
        chunk_args = tuple(
            jax.lax.dynamic_slice_in_dim(a, start, size, axis=ax)
            if ax is not None
            else a
            for a, ax in zip(args, in_axes)
        )
        chunk_result = batched_fn(*chunk_args)
        if output is None:
            output = jnp.zeros(
                (batch_size,) + chunk_result.shape[1:], dtype=chunk_result.dtype
            )
        output = output.at[start:end].set(chunk_result)
        del chunk_result, chunk_args
        if clear_caches:
            jax.clear_caches()
    return output
