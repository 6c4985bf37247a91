"""Dynamic gate dispatcher routing to the unitary or pulse backend.

``Gates.RX(w, wires, gate_mode="unitary"|"pulse")`` resolves the named gate
on :class:`UnitaryGates` or :class:`PulseGates`; pulse mode additionally
validates / slices pulse parameters via the active
:class:`PulseParamManager`.

Reference parity: qml_essentials/gates.py (dispatcher 24-161, manager
context 163-171, parse_gates 173-207, classifiers 209-225).
"""

from __future__ import annotations

import logging
import numbers
from contextlib import contextmanager
from typing import Callable, List, Union

import jax
import jax.numpy as jnp

from qml_essentials_tpu.models.unitary import UnitaryGates
from qml_essentials_tpu.ops.operations import Barrier as BarrierOp
from qml_essentials_tpu.pulse.pulses import (  # noqa: F401 (re-exports)
    PulseEnvelope,
    PulseGates,
    PulseInformation,
    PulseParamManager,
    PulseParams,
)

log = logging.getLogger(__name__)


class GatesMeta(type):
    """Metaclass turning attribute access into gate dispatch handlers."""

    def __getattr__(cls, gate_name):
        def handler(*args, **kwargs):
            return cls._inner_getattr(gate_name, *args, **kwargs)

        handler.__name__ = gate_name
        return handler


def Barrier(wires: Union[int, List[int]], *args, **kwargs):
    """Record a Barrier operation (visual separator)."""
    return BarrierOp(wires)


class Gates(metaclass=GatesMeta):
    """Dynamic accessor: ``Gates.RX(w, wires)`` with backend routing.

    ``gate_mode="unitary"`` (default) dispatches to :class:`UnitaryGates`;
    ``gate_mode="pulse"`` to :class:`PulseGates` with pulse-parameter
    validation and (when a :class:`PulseParamManager` is active) slicing +
    scaling of the optimized parameters.
    """

    _pulse_mgr = None

    def __getattr__(self, gate_name):
        def handler(**kwargs):
            return self._inner_getattr(gate_name, **kwargs)

        return handler

    @classmethod
    def _inner_getattr(cls, gate_name, *args, **kwargs):
        if gate_name == "Barrier":
            return Barrier(*args, **kwargs)

        gate_mode = kwargs.pop("gate_mode", "unitary")
        allowed = ["w", "wires", "phi", "theta", "omega", "noise_params", "random_key"]
        if gate_mode == "unitary":
            backend = UnitaryGates
        elif gate_mode == "pulse":
            backend = PulseGates
            allowed = allowed + ["pulse_params"]
        else:
            raise ValueError(
                f"Unknown gate mode: {gate_mode}. Use 'unitary' or 'pulse'."
            )

        dropped = kwargs.keys() - allowed
        if dropped:
            log.debug(f"Unsupported keyword arguments: {sorted(dropped)}")
        kwargs = {k: v for k, v in kwargs.items() if k in allowed}

        pulse_params = kwargs.get("pulse_params")
        pulse_mgr = getattr(cls, "_pulse_mgr", None)

        if pulse_params is not None:
            if isinstance(pulse_params, (list, tuple)):
                flat = pulse_params
            elif isinstance(pulse_params, jax.core.Tracer):
                flat = jnp.ravel(pulse_params)
            elif isinstance(pulse_params, jnp.ndarray):
                flat = pulse_params.flatten().tolist()
            elif isinstance(pulse_params, PulseParams):
                kwargs["pulse_params"] = pulse_params.params
                flat = pulse_params.params.flatten().tolist()
            else:
                raise TypeError(f"Unsupported pulse_params type: {type(pulse_params)}")

            if not all(
                isinstance(x, (numbers.Real, jax.core.Tracer)) for x in flat
            ):
                raise TypeError(
                    "All elements in pulse_params must be int or float, "
                    f"got {pulse_params}, type {type(pulse_params)}."
                )

            if not isinstance(pulse_mgr, PulseParamManager):
                n_params = PulseInformation.gate_by_name(gate_name).size
                if len(flat) != n_params:
                    raise ValueError(
                        f"Gate '{gate_name}' expects {n_params} pulse "
                        f"parameters, got {len(flat)}"
                    )

        # Model pulse parameters act as element-wise scalers on the gate's
        # optimized pulse parameters.
        if gate_mode == "pulse" and isinstance(pulse_mgr, PulseParamManager):
            n_params = PulseInformation.gate_by_name(gate_name).size
            scalers = pulse_mgr.get(n_params)
            base = PulseInformation.gate_by_name(gate_name).params
            kwargs["pulse_params"] = base * scalers

        gate = getattr(backend, gate_name, None)
        if gate is None:
            raise AttributeError(
                f"'{backend.__name__}' object has no attribute '{gate_name}'"
            )
        return gate(*args, **kwargs)

    @classmethod
    @contextmanager
    def pulse_manager_context(cls, pulse_params: jnp.ndarray):
        """Temporarily install the pulse-parameter slicer for circuit building."""
        cls._pulse_mgr = PulseParamManager(pulse_params)
        try:
            yield
        finally:
            cls._pulse_mgr = None

    @classmethod
    def parse_gates(
        cls,
        gates: Union[str, Callable, List[Union[str, Callable]], None],
        set_of_gates=None,
    ) -> List[Callable]:
        """Normalise a gate spec (name / callable / list / None) to callables."""
        set_of_gates = set_of_gates or cls

        if isinstance(gates, str):
            return [getattr(set_of_gates, gates)]
        if isinstance(gates, list):
            parsed = []
            for enc in gates:
                if isinstance(enc, str):
                    parsed.append(getattr(set_of_gates, enc))
                elif callable(enc):
                    parsed.append(enc)
                else:
                    raise ValueError(
                        f"Operation {enc} is not a valid gate or callable. "
                        f"Got {type(enc)}"
                    )
            return parsed
        if callable(gates):
            return [gates]
        if gates is None:
            return [lambda *args, **kwargs: None]
        raise ValueError(
            f"Operation {gates} is not a valid gate or callable or list of both."
        )

    @classmethod
    def is_rotational(cls, gate) -> bool:
        """Whether a gate consumes rotation angle parameter(s)."""
        return gate.__name__ in [
            "RX",
            "RY",
            "RZ",
            "Rot",
            "CRX",
            "CRY",
            "CRZ",
            "GolombEncoding",
            "CPhase",
        ]

    @classmethod
    def is_entangling(cls, gate) -> bool:
        """Whether a gate is a two-qubit entangler."""
        return gate.__name__ in ["CX", "CY", "CZ", "CRX", "CRY", "CRZ", "CPhase"]
