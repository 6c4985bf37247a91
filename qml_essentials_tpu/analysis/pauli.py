"""Pauli-Clifford circuit transform (canonical normal form).

Transpiles a recorded tape into the Nemkov et al. canonical form
(https://doi.org/10.1103/PhysRevA.108.032406): decompose composite gates to
Clifford + Pauli-rotation primitives, commute every Clifford past the
rotations to the end of the circuit, and absorb the trailing Cliffords into
the observables.  All Clifford conjugation is symbolic
(:class:`~qml_essentials_tpu.ops.operations.PauliWord` tableau updates,
O(n) per gate) — no matrices touch the transform.

Reference parity: qml_essentials/pauli.py (full module).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from qml_essentials_tpu.ops.dtypes import cdtype as _cdtype
from qml_essentials_tpu.ops.operations import (
    RX,
    RY,
    RZ,
    Barrier,
    Hermitian,
    Operation,
    PauliRot,
    PauliWord,
)


class PauliCircuit:
    """Pauli-Clifford circuit wrapper (Nemkov et al. normal form).

    A Pauli circuit consists solely of parameterised Pauli rotations followed
    by Clifford gates; the transform brings any Clifford+rotation circuit
    into that shape.
    """

    PAULI_ROTATION_GATES = (RX, RY, RZ, PauliRot)
    SKIPPABLE_OPERATIONS = (Barrier,)

    @staticmethod
    def from_parameterised_circuit(
        tape: List[Operation],
        observables: Optional[List[Operation]] = None,
        n_qubits: Optional[int] = None,
    ) -> Tuple[List[Operation], List[Operation]]:
        """Transform a tape into (Pauli rotations, Clifford-evolved observables)."""
        if observables is None:
            observables = []

        operations = PauliCircuit.get_clifford_pauli_gates(tape)
        if n_qubits is None:
            n_qubits = PauliCircuit._infer_n_qubits(operations, observables)

        pauli_gates, final_cliffords = PauliCircuit.commute_all_cliffords_to_the_end(
            operations, n_qubits
        )
        observables = PauliCircuit.cliffords_in_observable(
            final_cliffords, observables, n_qubits
        )
        return pauli_gates, observables

    @staticmethod
    def get_parameters(operations: List[Operation]) -> list:
        """Flatten the parameter values of a tape."""
        return [p for op in operations for p in op.parameters]

    @staticmethod
    def _infer_n_qubits(
        operations: List[Operation], observables: List[Operation]
    ) -> int:
        max_wire = -1
        for op in list(operations) + list(observables):
            if op.wires:
                max_wire = max(max_wire, max(op.wires))
        return max_wire + 1

    @staticmethod
    def commute_all_cliffords_to_the_end(
        operations: List[Operation],
        n_qubits: int,
    ) -> Tuple[List[Operation], List[Operation]]:
        """Bubble every Clifford gate rightward past the Pauli rotations.

        Each exchange ``C R_P(phi) -> R_{C P C†}(phi) C`` is a symbolic
        tableau update.  Returns the rotation prefix and the Clifford tail.
        """
        first_clifford = -1
        for i in range(len(operations) - 2, -1, -1):
            j = i
            while (
                j + 1 < len(operations)
                and PauliCircuit._is_clifford(operations[j])
                and PauliCircuit._is_pauli_rotation(operations[j + 1])
            ):
                pauli, clifford = PauliCircuit._evolve_clifford_rotation(
                    operations[j], operations[j + 1], n_qubits
                )
                operations[j] = pauli
                operations[j + 1] = clifford
                j += 1
                first_clifford = j

        if not PauliCircuit._is_clifford(operations[-1]):
            return operations, []
        return operations[:first_clifford], operations[first_clifford:]

    @staticmethod
    def get_clifford_pauli_gates(tape: List[Operation]) -> List[Operation]:
        """Express the tape in Clifford + Pauli-rotation primitives only."""
        operations: List[Operation] = []
        for operation in tape:
            if PauliCircuit._is_clifford(operation) or PauliCircuit._is_pauli_rotation(
                operation
            ):
                operations.append(operation)
            elif PauliCircuit._is_skippable(operation):
                continue
            else:
                try:
                    operations.extend(operation.decompose())
                except NotImplementedError:
                    raise NotImplementedError(
                        f"Gate {operation.name} cannot be decomposed into "
                        "Pauli rotations and Clifford gates. Consider using a "
                        "circuit ansatz that only uses RX, RY, RZ, PauliRot, "
                        "Rot, and standard Clifford gates."
                    )
        return operations

    @staticmethod
    def _is_skippable(operation: Operation) -> bool:
        return isinstance(operation, PauliCircuit.SKIPPABLE_OPERATIONS)

    @staticmethod
    def _is_clifford(operation: Operation) -> bool:
        return getattr(operation, "is_clifford", False)

    @staticmethod
    def _is_pauli_rotation(operation: Operation) -> bool:
        return isinstance(operation, PauliCircuit.PAULI_ROTATION_GATES)

    @staticmethod
    def _evolve_clifford_rotation(
        clifford: Operation, pauli: Operation, n_qubits: int
    ) -> Tuple[Operation, Operation]:
        """Exchange ``C R_P(phi)`` into ``R_{C P C†}(phi) C`` symbolically."""
        if not any(p_c in clifford.wires for p_c in pauli.wires):
            return pauli, clifford

        param = pauli.parameters[0]
        gen_word = PauliWord.from_operation(pauli, n_qubits)
        evolved = gen_word.conjugate_by_clifford(clifford, adjoint_left=False)
        bare, phase = evolved.to_pauli_string_and_phase()

        # Clifford conjugation of a Hermitian Pauli generator yields ±1.
        param_factor = float(np.real(phase))

        pauli_str, qubits = PauliCircuit._remove_identities_from_paulistr(
            bare, list(range(n_qubits))
        )
        return PauliRot(param * param_factor, pauli_str, qubits), clifford

    @staticmethod
    def _remove_identities_from_paulistr(
        pauli_str: str, qubits: List[int]
    ) -> Tuple[str, List[int]]:
        """Strip identity factors and their qubits from a Pauli string."""
        reduced_qubits: List[int] = []
        reduced_str = ""
        for i, p in enumerate(pauli_str):
            if p != "I":
                reduced_str += p
                reduced_qubits.append(qubits[i])
        return reduced_str, reduced_qubits

    @staticmethod
    def cliffords_in_observable(
        operations: List[Operation],
        original_obs: List[Operation],
        n_qubits: int,
    ) -> List[Operation]:
        """Absorb the Clifford tail into each observable (``O -> C† O C``)."""
        observables = []
        for ob in original_obs:
            word = PauliWord.from_operation(ob, n_qubits)
            for clifford in operations[::-1]:
                word = word.conjugate_by_clifford(clifford, adjoint_left=True)
            observables.append(PauliCircuit._pauli_operation_from_word(word))
        return observables

    @staticmethod
    def _pauli_operation_from_word(word: PauliWord) -> Operation:
        """Observable Operation carrying both a matrix and the symbolic word."""
        bare, phase = word.to_pauli_string_and_phase()
        reduced_str, reduced_wires = PauliCircuit._remove_identities_from_paulistr(
            bare, list(range(word.n_qubits))
        )

        if not reduced_str:
            obs = Hermitian(
                matrix=phase * jnp.eye(2, dtype=_cdtype()), wires=[0], record=False
            )
            obs._pauli_label = "I"
        else:
            reduced_word = PauliWord.from_pauli_string(
                reduced_str, list(range(len(reduced_str))), len(reduced_str)
            )
            obs = Hermitian(
                matrix=phase * reduced_word.to_matrix(),
                wires=reduced_wires,
                record=False,
            )
            obs._pauli_label = reduced_str
        obs._pauli_word = word
        return obs
