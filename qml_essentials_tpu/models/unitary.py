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
    if d <= 0:
        return ()
    marks = [0]
    diffs: set = set()
    candidate = 1
    while len(marks) < d:
        new_diffs = {candidate - m for m in marks}
        if len(new_diffs) == len(marks) and not (new_diffs & diffs):
            marks.append(candidate)
            diffs |= new_diffs
        candidate += 1
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
        for wire in wires_list:
            bf = noise_params.get("BitFlip", 0.0)
            if bf > 0:
                op.BitFlip(bf, wires=wire)
            pf = noise_params.get("PhaseFlip", 0.0)
            if pf > 0:
                op.PhaseFlip(pf, wires=wire)
            dp = noise_params.get("Depolarizing", 0.0)
            if dp > 0:
                op.DepolarizingChannel(dp, wires=wire)
        if len(wires_list) > 1:
            p = noise_params.get("MultiQubitDepolarizing", 0.0)
            if p > 0:
                UnitaryGates.NQubitDepolarizingChannel(p, wires_list)

    @staticmethod
    def GateError(
        w,
        noise_params: Optional[Dict[str, float]] = None,
        random_key: Optional[jax.Array] = None,
    ):
        """Gaussian angle noise: returns ``(w + sigma * N(0, 1), new_key)``."""
        if noise_params is not None and noise_params.get("GateError", None) is not None:
            assert random_key is not None, (
                "A random_key must be provided when using GateError"
            )
            if UnitaryGates.batch_gate_error:
                random_key, sub_key = safe_random_split(random_key)
            else:
                sub_key = jax.random.key(0)
            shape = (
                w.shape
                if isinstance(w, jnp.ndarray) and UnitaryGates.batch_gate_error
                else ()
            )
            w = w + noise_params["GateError"] * jax.random.normal(sub_key, shape)
        return w, random_key

    # --------------------------------------------------------------- gates
    @staticmethod
    def Rot(phi, theta, omega, wires, noise_params=None, random_key=None) -> None:
        """General rotation with optional GateError on each angle."""
        if noise_params is not None and "GateError" in noise_params:
            phi, random_key = UnitaryGates.GateError(phi, noise_params, random_key)
            theta, random_key = UnitaryGates.GateError(theta, noise_params, random_key)
            omega, random_key = UnitaryGates.GateError(omega, noise_params, random_key)
        op.Rot(phi, theta, omega, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def PauliRot(theta, pauli, wires, noise_params=None, random_key=None) -> None:
        """Multi-qubit Pauli rotation with optional GateError."""
        if noise_params is not None and "GateError" in noise_params:
            theta, random_key = UnitaryGates.GateError(theta, noise_params, random_key)
        op.PauliRot(theta, pauli, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    # Single-qubit rotations -------------------------------------------------
    @staticmethod
    def RX(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.RX(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def RY(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.RY(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def RZ(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.RZ(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    # Controlled rotations ---------------------------------------------------
    @staticmethod
    def CRX(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.CRX(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def CRY(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.CRY(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def CRZ(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.CRZ(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    # Two-qubit Pauli rotations ----------------------------------------------
    @staticmethod
    def RXX(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.RXX(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def RYY(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.RYY(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def RZZ(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.RZZ(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def RZX(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.RZX(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def CPhase(w, wires, noise_params=None, random_key=None) -> None:
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        op.ControlledPhaseShift(w, wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    # Fixed gates --------------------------------------------------------------
    @staticmethod
    def CX(wires, noise_params=None, random_key=None) -> None:
        op.CX(wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def CY(wires, noise_params=None, random_key=None) -> None:
        op.CY(wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def CZ(wires, noise_params=None, random_key=None) -> None:
        op.CZ(wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    @staticmethod
    def H(wires, noise_params=None, random_key=None) -> None:
        op.H(wires=wires)
        UnitaryGates.Noise(wires, noise_params)

    # Data encoding -------------------------------------------------------------
    @staticmethod
    def GolombEncoding(w, wires, noise_params=None, random_key=None) -> None:
        """Diagonal encoding ``S(x) = exp(-i diag(golomb marks) x)`` on all wires.

        Applied as a broadcast-multiply diagonal gate (single HBM pass).
        """
        wires_list = list(wires) if isinstance(wires, (list, tuple)) else [wires]
        d = 2 ** len(wires_list)
        marks = jnp.array(golomb_ruler(d), dtype=float)
        w, random_key = UnitaryGates.GateError(w, noise_params, random_key)
        diag = jnp.exp(-1j * marks * w)
        op.DiagonalQubitUnitary(diag, wires=wires_list)
        UnitaryGates.Noise(wires_list, noise_params)
