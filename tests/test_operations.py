"""Unit tests for the operation algebra (L0).

Oracle strategy: hard-coded analytic matrices and physics identities
(unitarity, CPTP trace preservation, decomposition-product equality) —
this build has no PennyLane, so the oracles are closed-form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qml_essentials_tpu.ops.operations as op
from qml_essentials_tpu.ops import kernels
from qml_essentials_tpu.ops.tape import recording


def mat(o):
    return np.asarray(o.matrix)


@pytest.mark.unittest
def test_fixed_gate_matrices():
    isq = 1 / np.sqrt(2)
    assert np.allclose(mat(op.PauliX(record=False)), [[0, 1], [1, 0]])
    assert np.allclose(mat(op.PauliY(record=False)), [[0, -1j], [1j, 0]])
    assert np.allclose(mat(op.PauliZ(record=False)), [[1, 0], [0, -1]])
    assert np.allclose(mat(op.H(record=False)), isq * np.array([[1, 1], [1, -1]]))
    assert np.allclose(mat(op.S(wires=0)), [[1, 0], [0, 1j]])
    swap = np.eye(4)[[0, 2, 1, 3]]
    assert np.allclose(mat(op.SWAP(wires=[0, 1], record=False)), swap)


@pytest.mark.unittest
def test_rotation_gates_analytic():
    theta = 0.7312
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    assert np.allclose(
        mat(op.RX(theta, record=False)), [[c, -1j * s], [-1j * s, c]], atol=1e-6
    )
    assert np.allclose(
        mat(op.RY(theta, record=False)), [[c, -s], [s, c]], atol=1e-6
    )
    assert np.allclose(
        mat(op.RZ(theta, record=False)),
        [[np.exp(-1j * theta / 2), 0], [0, np.exp(1j * theta / 2)]],
        atol=1e-6,
    )


@pytest.mark.unittest
def test_controlled_gates_block_structure():
    theta = 1.234
    for name, cls in [("CRX", op.CRX), ("CRY", op.CRY), ("CRZ", op.CRZ)]:
        M = mat(cls(theta, wires=[0, 1], record=False))
        # |0><0| block is the identity
        assert np.allclose(M[:2, :2], np.eye(2), atol=1e-6), name
        assert np.allclose(M[:2, 2:], 0, atol=1e-6), name
        # |1><1| block is the corresponding rotation
        R = mat(getattr(op, name[1:])(theta, record=False))
        assert np.allclose(M[2:, 2:], R, atol=1e-6), name

    # CX / CY / CZ
    assert np.allclose(
        mat(op.CX(wires=[0, 1], record=False)),
        np.eye(4)[[0, 1, 3, 2]],
    )
    CZ = np.diag([1, 1, 1, -1])
    assert np.allclose(mat(op.CZ(wires=[0, 1], record=False)), CZ)

    # CPhase at pi is CZ
    assert np.allclose(
        mat(op.ControlledPhaseShift(np.pi, wires=[0, 1], record=False)), CZ, atol=1e-6
    )


@pytest.mark.unittest
def test_three_qubit_gates():
    ccx = mat(op.CCX(wires=[0, 1, 2], record=False))
    perm = list(range(8))
    perm[6], perm[7] = 7, 6
    assert np.allclose(ccx, np.eye(8)[perm])

    cswap = mat(op.CSWAP(wires=[0, 1, 2], record=False))
    perm = list(range(8))
    perm[5], perm[6] = 6, 5
    assert np.allclose(cswap, np.eye(8)[perm])


@pytest.mark.unittest
@pytest.mark.parametrize("cls,args", [
    (op.CZ, ()),
    (op.Rot, (0.3, 1.1, -0.8)),
    (op.CRX, (0.9,)),
    (op.CRY, (1.7,)),
    (op.CRZ, (-0.4,)),
])
def test_decompositions_reproduce_matrix(cls, args):
    wires = [0, 1] if cls is not op.Rot else [0]
    gate = cls(*args, wires=wires, record=False)
    decomp = gate.decompose()
    n = max(w for w in gate.wires) + 1
    U = np.eye(2**n, dtype=complex)
    for g in decomp:
        U = np.asarray(kernels.lift_matrix(g.matrix, g.wires, list(range(n)))) @ U
    target = np.asarray(kernels.lift_matrix(gate.matrix, gate.wires, list(range(n))))
    # Equality up to global phase
    idx = np.unravel_index(np.argmax(np.abs(target)), target.shape)
    phase = U[idx] / target[idx]
    assert np.isclose(np.abs(phase), 1.0, atol=1e-5)
    assert np.allclose(U, phase * target, atol=1e-5)


@pytest.mark.unittest
def test_pauli_rot_gates():
    theta = 0.5
    for cls, word in [(op.RXX, "XX"), (op.RYY, "YY"), (op.RZZ, "ZZ"), (op.RZX, "ZX")]:
        M = mat(cls(theta, record=False))
        P = np.asarray(op._PAULI_MATRICES[word[0]])
        P = np.kron(P, np.asarray(op._PAULI_MATRICES[word[1]]))
        expected = np.cos(theta / 2) * np.eye(4) - 1j * np.sin(theta / 2) * P
        assert np.allclose(M, expected, atol=1e-6)
    # generator
    g = op.PauliRot(0.2, "XY", wires=[0, 1], record=False).generator()
    assert np.allclose(
        np.asarray(g.matrix),
        np.kron([[0, 1], [1, 0]], [[0, -1j], [1j, 0]]),
    )


@pytest.mark.unittest
def test_operation_algebra():
    x = op.PauliX(wires=0, record=False)
    z = op.PauliZ(wires=0, record=False)
    # dagger of S
    s = op.S(wires=0)
    sd = s.dagger()
    assert np.allclose(np.asarray(sd.matrix), [[1, 0], [0, -1j]])
    # power
    x2 = op.PauliX(wires=0, record=False).power(2)
    assert np.allclose(np.asarray(x2.matrix), np.eye(2))
    # scalar mul
    assert np.allclose(np.asarray((2.0 * op.PauliX(wires=0, record=False)).matrix),
                       2 * mat(x))
    # add
    assert np.allclose(np.asarray((x + z).matrix), [[1, 1], [1, -1]])
    # product on same wire = matmul
    xz = x @ z
    assert np.allclose(np.asarray(xz.matrix), mat(x) @ mat(z))
    # product on disjoint wires = kron
    x0 = op.PauliX(wires=0, record=False)
    z1 = op.PauliZ(wires=1, record=False)
    assert np.allclose(np.asarray((x0 @ z1).matrix), np.kron(mat(x0), mat(z1)))


@pytest.mark.unittest
def test_lifted_matrix_ordering():
    # X on wire 1 of a 2-qubit space: I (x) X
    x1 = op.PauliX(wires=1, record=False)
    assert np.allclose(
        np.asarray(x1.lifted_matrix(2)), np.kron(np.eye(2), [[0, 1], [1, 0]])
    )
    # CX with reversed wires [1, 0] - control is qubit 1
    cx = op.CX(wires=[1, 0], record=False)
    lifted = np.asarray(cx.lifted_matrix(2))
    # basis |q0 q1>: |01> -> |11>, |11> -> |01>
    expected = np.eye(4)[[0, 3, 2, 1]]
    assert np.allclose(lifted, expected)


@pytest.mark.unittest
def test_tape_recording():
    with recording() as tape:
        op.H(wires=0)
        op.CX(wires=[0, 1])
        inner_op = op.RX(0.1, wires=0)
        inner_op.dagger()  # replaces on tape
    assert len(tape) == 3
    assert tape[0].name == "H"
    assert tape[1].name == "CX"
    # dagger replaced the RX
    assert np.allclose(
        np.asarray(tape[2].matrix), np.conj(mat(op.RX(0.1, record=False))).T
    )


@pytest.mark.unittest
def test_kraus_channels_cptp():
    channels = [
        op.BitFlip(0.1, wires=0),
        op.PhaseFlip(0.2, wires=0),
        op.DepolarizingChannel(0.3, wires=0),
        op.AmplitudeDamping(0.25, wires=0),
        op.PhaseDamping(0.15, wires=0),
        op.ThermalRelaxationError(0.1, 2.0, 1.5, 0.5, wires=0),
        op.ThermalRelaxationError(0.1, 1.0, 1.8, 0.5, wires=0),  # t2 > t1 regime
    ]
    for ch in channels:
        K = [np.asarray(k) for k in ch.kraus_matrices()]
        total = sum(k.conj().T @ k for k in K)
        assert np.allclose(total, np.eye(2), atol=1e-6), ch.name

        # apply to a random density matrix: trace preserved, positivity kept
        rng = np.random.default_rng(0)
        A = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        rho = A @ A.conj().T
        rho = rho / np.trace(rho)
        rho_full = np.kron(rho, np.eye(2) / 2)  # 2 qubits, channel on first
        out = np.asarray(ch.apply_to_density(jnp.asarray(rho_full), 2))
        assert np.isclose(np.trace(out).real, 1.0, atol=1e-6), ch.name
        evals = np.linalg.eigvalsh(out)
        assert (evals > -1e-6).all(), ch.name


@pytest.mark.unittest
def test_kraus_validation():
    with pytest.raises(ValueError):
        op.BitFlip(1.5, wires=0)
    with pytest.raises(ValueError):
        op.ThermalRelaxationError(0.5, 1.0, 2.5, 0.1, wires=0)  # t2 > 2 t1
    ch = op.BitFlip(0.1, wires=0)
    with pytest.raises(TypeError):
        _ = ch.matrix
    with pytest.raises(TypeError):
        ch.apply_to_state(jnp.zeros(2), 1)


@pytest.mark.unittest
def test_parametrized_hamiltonian_algebra():
    X = jnp.array([[0.0, 1.0], [1.0, 0.0]])
    Y = jnp.array([[0.0, -1j], [1j, 0.0]])

    def f(p, t):
        return p[0] * t

    def g(p, t):
        return p[0]

    H1 = f * op.Hermitian(X, wires=0, record=False)
    H2 = g * op.Hermitian(Y, wires=0, record=False)
    assert isinstance(H1, op.ParametrizedHamiltonian)
    H = H1 + H2
    assert H.n_terms == 2
    Hneg = -H
    assert float(Hneg.coeff_fns[0](jnp.array([2.0]), 3.0)) == -6.0
    Hsub = H1 - H2
    assert Hsub.n_terms == 2

    with pytest.raises(ValueError):
        op.ParametrizedHamiltonian(terms=[])
    with pytest.raises(ValueError):
        op.ParametrizedHamiltonian(terms=[(f, X, 0), (g, Y, 1)])


@pytest.mark.unittest
def test_diagonal_unitary():
    diag = jnp.exp(1j * jnp.arange(4).astype(jnp.float32))
    d = op.DiagonalQubitUnitary(diag, wires=[0, 1], record=False)
    state = jax.random.normal(jax.random.PRNGKey(0), (8,)) + 0j
    out = np.asarray(d.apply_to_state(state, 3))
    full = np.kron(np.diag(np.asarray(diag)), np.eye(2))
    assert np.allclose(out, full @ np.asarray(state), atol=1e-6)

    with pytest.raises(ValueError):
        op.DiagonalQubitUnitary(diag, wires=[0], record=False)


@pytest.mark.unittest
def test_pauli_decompose():
    coeff, o = op.pauli_decompose(jnp.asarray(0.5 * np.kron([[1, 0], [0, -1]],
                                                            [[1, 0], [0, -1]])))
    assert o._pauli_label == "ZZ"
    assert np.isclose(complex(coeff).real, 0.5, atol=1e-6)

    coeff, o = op.pauli_decompose(jnp.asarray(np.array([[0, 1], [1, 0]])) * 2.0)
    assert op.pauli_string_from_operation(o) == "X"
    assert np.isclose(complex(coeff).real, 2.0, atol=1e-6)


class TestPauliWord:
    @pytest.mark.unittest
    def test_compose_and_phase(self):
        n = 2
        X0 = op.PauliWord.from_pauli_string("X", [0], n)
        Z0 = op.PauliWord.from_pauli_string("Z", [0], n)
        Y0 = op.PauliWord.from_pauli_string("Y", [0], n)
        # X Z = -i Y
        xz = X0.compose(Z0)
        assert xz.to_pauli_string() == "YI"
        assert np.isclose(complex(xz.leading_phase()), -1j)
        # Z X = +i Y
        zx = Z0.compose(X0)
        assert np.isclose(complex(zx.leading_phase()), 1j)
        # Y Y = I
        yy = Y0.compose(Y0)
        assert yy.to_pauli_string() == "II"
        assert np.isclose(complex(yy.leading_phase()), 1.0)

    @pytest.mark.unittest
    def test_commutes(self):
        n = 2
        X0 = op.PauliWord.from_pauli_string("X", [0], n)
        Z0 = op.PauliWord.from_pauli_string("Z", [0], n)
        Z1 = op.PauliWord.from_pauli_string("Z", [1], n)
        assert not X0.commutes_with(Z0)
        assert X0.commutes_with(Z1)

    @pytest.mark.unittest
    @pytest.mark.parametrize("gate,wires", [
        ("H", [0]), ("S", [0]), ("CX", [0, 1]), ("CZ", [0, 1]),
        ("SWAP", [0, 1]), ("CY", [0, 1]),
    ])
    @pytest.mark.parametrize("word", ["XI", "ZI", "YI", "XZ", "YY", "IZ", "IX"])
    def test_conjugation_matches_matrix(self, gate, wires, word):
        n = 2
        cls = getattr(op, gate if gate != "H" else "H")
        g = cls(wires=wires) if gate in ("S",) else cls(wires=wires, record=False)
        pw = op.PauliWord.from_pauli_string(word, [0, 1], n)
        for adjoint_left in (False, True):
            result = pw.conjugate_by_clifford(g, adjoint_left=adjoint_left)
            C = np.asarray(kernels.lift_matrix(g.matrix, g.wires, list(range(n))))
            P = np.asarray(pw.to_matrix())
            expected = (
                C.conj().T @ P @ C if adjoint_left else C @ P @ C.conj().T
            )
            assert np.allclose(np.asarray(result.to_matrix()), expected, atol=1e-5), (
                gate, word, adjoint_left
            )

    @pytest.mark.unittest
    def test_matrix_roundtrip(self):
        pw = op.PauliWord.from_pauli_string("XY", [0, 1], 2)
        back = op.PauliWord.from_matrix(pw.to_matrix())
        assert back == pw

    @pytest.mark.unittest
    def test_zero_expectation(self):
        n = 2
        assert complex(op.PauliWord.from_pauli_string("ZZ", [0, 1], n).zero_expectation()) == 1.0
        assert complex(op.PauliWord.from_pauli_string("XZ", [0, 1], n).zero_expectation()) == 0.0

    @pytest.mark.unittest
    def test_list_repr(self):
        pw = op.PauliWord.from_pauli_string("XYZ", [0, 1, 2], 3)
        assert list(pw.to_list_repr()) == [0, 1, 2]
