"""Unitary gate frontend: noise-aware static gate wrappers.

``UnitaryGates`` methods (a) optionally perturb rotation angles with
Gaussian ``GateError`` noise, (b) emit the operation onto the active tape,
and (c) append the configured Kraus noise channels.  Also hosts the Golomb
ruler construction used by the Golomb data encoding.

Reference parity: qml_essentials/unitary.py (golomb 15-84, gate wrappers
87-701).
"""

from __future__ import annotations

import itertools
import logging
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from qml_essentials_tpu.ops import operations as op
from qml_essentials_tpu.utils import safe_random_split

log = logging.getLogger(__name__)

Wires = Union[int, List[int]]

_GOLOMB_RULER_CACHE: Dict[int, Tuple[int, ...]] = {}


def _greedy_golomb(d: int) -> Tuple[int, ...]:
    """Greedy Golomb ruler: each new mark keeps all pairwise differences distinct."""
    marks: list = [0] if d > 0 else []
    seen_diffs: set = set()
    candidate = 0
    while len(marks) < d:
        candidate += 1
        fresh = {candidate - m for m in marks}
        if len(fresh) == len(marks) and fresh.isdisjoint(seen_diffs):
            marks.append(candidate)
            seen_diffs.update(fresh)
    return tuple(marks)


def golomb_ruler(d: int) -> Tuple[int, ...]:
    """Valid (greedy, cached) Golomb ruler of order *d*.

    Used as the diagonal of the data-encoding Hamiltonian ``H = diag(marks)``
    to obtain a maximally non-degenerate Fourier spectrum
    (Peters et al., arXiv:2209.05523, App. C.4).
    """
    if d <= 0:
        raise ValueError(f"Golomb ruler order must be positive, got {d}")
    if d not in _GOLOMB_RULER_CACHE:
        _GOLOMB_RULER_CACHE[d] = _greedy_golomb(d)
    return _GOLOMB_RULER_CACHE[d]


class UnitaryGates:
    """Static unitary gate wrappers with optional noise insertion."""

    # Global toggle: when True, GateError draws an independent sample per
    # batch element (vmapped key); when False, a fixed key broadcasts one
    # sample across the batch.  Participates in the executor's jit cache key.
    batch_gate_error = True

    # ----------------------------------------------------------- noise glue
    @staticmethod
    def NQubitDepolarizingChannel(p: float, wires: List[int]) -> op.QubitChannel:
        """n-qubit depolarizing channel from the full Pauli basis (4^n Kraus ops)."""
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"Probability p must be between 0 and 1, got {p}")
        n = len(wires)
        if n < 2:
            raise ValueError(f"Number of qubits must be >= 2, got {n}")

        paulis = [jnp.eye(2), op.PauliX._matrix, op.PauliY._matrix, op.PauliZ._matrix]
        dim = 2**n
        kraus = [jnp.sqrt(1 - p * (4**n - 1) / (4**n)) * jnp.eye(dim)]
        first = True
        for idxs in itertools.product(range(4), repeat=n):
            if first:
                first = False  # identity handled by K0
                continue
            P = paulis[idxs[0]]
            for i in idxs[1:]:
                P = jnp.kron(P, paulis[i])
            kraus.append(jnp.sqrt(p / (4**n)) * P)
        return op.QubitChannel(kraus, wires=wires)

    @staticmethod
    def Noise(
        wires: Wires, noise_params: Optional[Dict[str, float]] = None
    ) -> None:
        """Append the configured per-gate Kraus channels to the tape.

        Supported keys: BitFlip, PhaseFlip, Depolarizing,
        MultiQubitDepolarizing (for multi-qubit gates); all default to 0.
        """
        if noise_params is None:
            return
        wires_list = [wires] if isinstance(wires, int) else list(wires)
        single = (
            ("BitFlip", op.BitFlip),
            ("PhaseFlip", op.PhaseFlip),
            ("Depolarizing", op.DepolarizingChannel),
        )
        for wire in wires_list:
            for knob, channel in single:
                prob = noise_params.get(knob, 0.0)
                if prob > 0:
                    channel(prob, wires=wire)
        mq = noise_params.get("MultiQubitDepolarizing", 0.0)
        if mq > 0 and len(wires_list) > 1:
            UnitaryGates.NQubitDepolarizingChannel(mq, wires_list)

    @staticmethod
    def GateError(
        w,
        noise_params: Optional[Dict[str, float]] = None,
        random_key: Optional[jax.Array] = None,
    ):
        """Gaussian angle noise: returns ``(w + sigma * N(0, 1), new_key)``."""
        sigma = (noise_params or {}).get("GateError")
        if sigma is None:
            return w, random_key
        assert random_key is not None, (
            "A random_key must be provided when using GateError"
        )
        batched = UnitaryGates.batch_gate_error
        if batched:
            random_key, sub_key = safe_random_split(random_key)
        else:
            sub_key = jax.random.key(0)
        shape = w.shape if (batched and isinstance(w, jnp.ndarray)) else ()
        return w + sigma * jax.random.normal(sub_key, shape), random_key

    # --------------------------------------------------------------- gates
    @staticmethod
    def Rot(phi, theta, omega, wires, noise_params=None, random_key=None) -> None:
        """General rotation with optional GateError on each angle."""
        if noise_params is not None and "GateError" in noise_params:
            angles = []
            for a in (phi, theta, omega):
                a, random_key = UnitaryGates.GateError(a, noise_params, random_key)
                angles.append(a)
            phi, theta, omega = angles
        op.Rot(phi, theta, omega, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def PauliRot(theta, pauli, wires, noise_params=None, random_key=None) -> None:
        """Multi-qubit Pauli rotation with optional GateError."""
        theta, random_key = UnitaryGates.GateError(theta, noise_params, random_key)
        op.PauliRot(theta, pauli, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    # Data encoding -------------------------------------------------------------
    @staticmethod
    def GolombEncoding(w, wires, noise_params=None, random_key=None) -> None:
        """Diagonal encoding ``S(x) = exp(-i diag(golomb marks) x)`` on all wires.

        Applied as a broadcast-multiply diagonal gate (single HBM pass).
        """
        wires_list = [wires] if isinstance(wires, int) else list(wires)
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        marks = jnp.asarray(golomb_ruler(2 ** len(wires_list)), dtype=float)
        op.DiagonalQubitUnitary(jnp.exp(-1j * marks * w), wires=wires_list)
        UnitaryGates.Noise(wires_list, noise_params)


def _install_gate_wrappers() -> None:
    """Generate the uniform UnitaryGates wrappers from one table.

    Every wrapper does the same three things — perturb the angle with
    GateError (rotations only), emit the operation, append the configured
    noise channels — so the zoo is one loop instead of 14 hand-written
    methods.
    """
    rotations = {
        "RX": op.RX, "RY": op.RY, "RZ": op.RZ,
        "CRX": op.CRX, "CRY": op.CRY, "CRZ": op.CRZ,
        "RXX": op.RXX, "RYY": op.RYY, "RZZ": op.RZZ, "RZX": op.RZX,
        "CPhase": op.ControlledPhaseShift,
    }
    fixed = {"CX": op.CX, "CY": op.CY, "CZ": op.CZ, "H": op.H}

    def rotation_wrapper(name, ctor):
        def gate(w, wires, noise_params=None, random_key=None):
            w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
            ctor(w, wires=wires)
            UnitaryGates.Noise(wires, noise_params)

        gate.__name__ = name
        gate.__qualname__ = f"UnitaryGates.{name}"
        gate.__doc__ = f"{name} rotation with optional GateError + noise."
        return staticmethod(gate)

    def fixed_wrapper(name, ctor):
        def gate(wires, noise_params=None, random_key=None):
            ctor(wires=wires)
            UnitaryGates.Noise(wires, noise_params)

        gate.__name__ = name
        gate.__qualname__ = f"UnitaryGates.{name}"
        gate.__doc__ = f"{name} gate with configured noise channels."
        return staticmethod(gate)

    for name, ctor in rotations.items():
        setattr(UnitaryGates, name, rotation_wrapper(name, ctor))
    for name, ctor in fixed.items():
        setattr(UnitaryGates, name, fixed_wrapper(name, ctor))


_install_gate_wrappers()
