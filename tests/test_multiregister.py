"""Multi-register tape tests: Bell / SWAP-test style circuit doubling.

Drives :func:`~qml_essentials_tpu.ops.tape.copy_to_tape` /
:func:`shift_and_append` through full Model circuits — the register-doubling
machinery the entanglement estimators build on (ref
qml_essentials/entanglement.py:147-161,510-524 and the TestPennylane tier
breadth of ref tests/test_jaqsi.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qml_essentials_tpu.core.jaqsi import Script
from qml_essentials_tpu.models.model import Model
from qml_essentials_tpu.ops import operations as op
from qml_essentials_tpu.ops.tape import copy_to_tape, recording, shift_and_append


def _model_state(model, inputs):
    return np.asarray(
        model(model.params, inputs=inputs, execution_type="state")
    ).reshape(-1)


class TestShiftAndAppend:
    @pytest.mark.unittest
    def test_source_tape_intact_and_wires_shifted(self):
        with recording() as src:
            op.H(wires=0)
            op.CX(wires=[0, 1])
        with recording() as dst:
            shift_and_append(src, offset=2)
        assert [o.wires for o in src] == [[0], [0, 1]]
        assert [o.wires for o in dst] == [[2], [2, 3]]
        # Shallow copies: parameters shared, operation objects distinct.
        assert all(a is not b for a, b in zip(src, dst))

    @pytest.mark.unittest
    def test_no_active_tape_is_noop(self):
        with recording() as src:
            op.H(wires=0)
        shift_and_append(src, offset=1)  # outside any recording: no error
        assert len(src) == 1


class TestDoubledRegister:
    """Model circuits doubled onto a second register via copy_to_tape."""

    @pytest.mark.unittest
    @pytest.mark.parametrize("circuit_type", ["Circuit_19", "Hardware_Efficient"])
    def test_doubled_state_is_tensor_product(self, circuit_type):
        n = 3
        model = Model(
            n_qubits=n, n_layers=1, circuit_type=circuit_type, random_seed=42
        )
        inputs = jnp.array([0.37])
        psi = _model_state(model, inputs)

        def doubled():
            def vari():
                model._variational(
                    model.params[0] if model.params.ndim == 3 else model.params,
                    inputs,
                )

            vari()
            copy_to_tape(vari, offset=n)

        got = np.asarray(
            Script(doubled, n_qubits=2 * n).execute(type="state")
        ).reshape(-1)
        want = np.kron(psi, psi)
        assert np.abs(np.vdot(want, got)) == pytest.approx(1.0, abs=1e-5)

    @pytest.mark.unittest
    def test_swap_test_fidelity_identical_copies(self):
        """SWAP test between two identical copies reads fidelity 1:
        the ancilla's <Z> equals |<psi|phi>|^2."""
        n = 2
        model = Model(
            n_qubits=n, n_layers=1, circuit_type="Circuit_19", random_seed=7
        )
        inputs = jnp.array([0.8])

        def vari():
            model._variational(
                model.params[0] if model.params.ndim == 3 else model.params,
                inputs,
            )

        def swap_test():
            # Registers at [1, n] and [n+1, 2n]; ancilla at 0.
            copy_to_tape(vari, offset=1)
            copy_to_tape(vari, offset=n + 1)
            op.H(wires=0)
            for q in range(n):
                op.CSWAP(wires=[0, 1 + q, 1 + n + q])
            op.H(wires=0)

        ez = np.asarray(
            Script(swap_test, n_qubits=2 * n + 1).execute(
                type="expval", obs=[op.PauliZ(wires=0)]
            )
        )
        assert float(ez.reshape(())) == pytest.approx(1.0, abs=1e-5)

    @pytest.mark.unittest
    def test_bell_doubled_registers_correlate(self):
        """Transversal CX + H between two model registers produces Bell-type
        parity correlations: <Z_i Z_{i+n}> = 1 for identical copies fed
        through a CX ladder from register A to register B prepared in |0>."""
        n = 2
        model = Model(
            n_qubits=n, n_layers=1, circuit_type="Circuit_1", random_seed=3
        )
        inputs = jnp.array([0.25])

        def bell_pairs():
            model._variational(
                model.params[0] if model.params.ndim == 3 else model.params,
                inputs,
            )
            # Entangle each qubit with its mirror (register B starts in |0>).
            for q in range(n):
                op.CX(wires=[q, q + n])

        probs = np.asarray(
            Script(bell_pairs, n_qubits=2 * n).execute(type="probs")
        ).reshape([2] * (2 * n))
        # Mirror-qubit parity: outcomes where bit q != bit q+n never occur.
        for q in range(n):
            marg = np.moveaxis(probs, [q, q + n], [0, 1]).reshape(2, 2, -1).sum(-1)
            assert marg[0, 1] == pytest.approx(0.0, abs=1e-6)
            assert marg[1, 0] == pytest.approx(0.0, abs=1e-6)

    @pytest.mark.unittest
    def test_triple_register_copy(self):
        """Three shifted replays (the concentratable-entanglement layout,
        ref entanglement.py:510-524) tensor up correctly."""
        n = 2
        model = Model(
            n_qubits=n, n_layers=1, circuit_type="Circuit_2", random_seed=11
        )
        inputs = jnp.array([1.1])
        psi = _model_state(model, inputs)

        def vari():
            model._variational(
                model.params[0] if model.params.ndim == 3 else model.params,
                inputs,
            )

        def tripled():
            copy_to_tape(vari, offset=0)
            copy_to_tape(vari, offset=n)
            copy_to_tape(vari, offset=2 * n)

        got = np.asarray(
            Script(tripled, n_qubits=3 * n).execute(type="state")
        ).reshape(-1)
        want = np.kron(np.kron(psi, psi), psi)
        assert np.abs(np.vdot(want, got)) == pytest.approx(1.0, abs=1e-5)
