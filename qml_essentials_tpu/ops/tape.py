"""Thread-local recording tapes.

Circuit functions are plain Python callables whose body instantiates
:class:`~qml_essentials_tpu.ops.operations.Operation` objects.  While a
recording context is active, every freshly constructed operation appends
itself to the innermost tape.  Tapes are kept in ``threading.local`` storage
so concurrent test workers (pytest-xdist) and threads never interleave.

A second, independent tape collects pulse events emitted by
:class:`~qml_essentials_tpu.pulse.pulses.PulseGates` for schedule drawing.

Reference parity: qml_essentials/tape.py (recording/active_tape 37-55,
pulse tape 58-89, shift_and_append/copy_to_tape 92-138).
"""

from __future__ import annotations

import copy
import threading
from contextlib import contextmanager
from typing import TYPE_CHECKING, Callable, Iterator, List, Optional

if TYPE_CHECKING:  # pragma: no cover
    from qml_essentials_tpu.ops.operations import Operation

_tls = threading.local()


def _stack(attr: str) -> list:
    stack = getattr(_tls, attr, None)
    if stack is None:
        stack = []
        setattr(_tls, attr, stack)
    return stack


def active_tape() -> Optional[List["Operation"]]:
    """Innermost active operation tape, or ``None`` when not recording."""
    stack = _stack("ops")
    return stack[-1] if stack else None


@contextmanager
def recording() -> Iterator[List["Operation"]]:
    """Open a fresh operation tape; nested recordings stack independently."""
    stack = _stack("ops")
    tape: List["Operation"] = []
    stack.append(tape)
    try:
        yield tape
    finally:
        stack.pop()


def active_pulse_tape() -> Optional[list]:
    """Innermost active pulse-event tape, or ``None``."""
    stack = _stack("pulse")
    return stack[-1] if stack else None


@contextmanager
def pulse_recording() -> Iterator[list]:
    """Collect pulse events emitted by pulse-mode leaf gates."""
    stack = _stack("pulse")
    tape: list = []
    stack.append(tape)
    try:
        yield tape
    finally:
        stack.pop()


def shift_and_append(tape_ops: List["Operation"], offset: int) -> None:
    """Replay *tape_ops* on the active tape with all wires shifted by *offset*.

    Each operation is shallow-copied so the source tape stays intact.  Used
    to build multi-register circuits (Bell / SWAP-test style doubling).
    """
    current = active_tape()
    if current is None:
        return
    for o in tape_ops:
        shifted = copy.copy(o)
        shifted._wires = [w + offset for w in o.wires]
        current.append(shifted)


def copy_to_tape(fn: Callable, offset: int) -> None:
    """Record ``fn()`` on a side tape, then replay it shifted by *offset*."""
    with recording() as side_tape:
        fn()
    shift_and_append(side_tape, offset)
