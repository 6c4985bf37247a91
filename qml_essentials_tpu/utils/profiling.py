"""Profiling utilities: XLA profiler traces and steady-state timing.

The reference's observability is limited to wall-clock probes
(qml_essentials/qoc.py:2641-2757); this module adds the missing
``jax.profiler`` integration (SURVEY.md §5) so hot programs can be
inspected in TensorBoard / Perfetto, plus a small timing helper shared by
the benchmark harnesses.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/qml_tpu_trace") -> Iterator[str]:
    """Capture an XLA profiler trace of the enclosed block.

    Open the resulting directory with TensorBoard (``tensorboard
    --logdir <dir>``) or convert with Perfetto.  Usage::

        with xla_trace("/tmp/trace"):
            jax.block_until_ready(step(params, xs))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
    **kwargs,
) -> dict:
    """Compile + steady-state timing of a JAX callable.

    Returns ``{"compile_s", "mean_s", "result"}``; every measurement
    blocks on the result so async dispatch cannot skew it.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    for _ in range(max(0, warmup - 1)):
        jax.block_until_ready(fn(*args, **kwargs))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    mean_s = (time.perf_counter() - t0) / iters
    return {"compile_s": compile_s, "mean_s": mean_s, "result": out}


def device_memory_stats(device: Optional[object] = None) -> dict:
    """Best-effort device memory statistics (empty dict on CPU backends)."""
    dev = device if device is not None else jax.local_devices()[0]
    try:
        return dict(dev.memory_stats() or {})
    except Exception:
        return {}
