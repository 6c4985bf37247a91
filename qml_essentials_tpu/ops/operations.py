"""Operation algebra: gates, observables, channels, Hamiltonians, Pauli words.

This is the L0 layer of the TPU-native stack.  An :class:`Operation` couples
a matrix (a pure function of its parameters, traced under jit) with the
wires it acts on and self-registers on the active recording tape.  All
numeric application paths delegate to the matmul-shaped kernels in
:mod:`qml_essentials_tpu.ops.kernels` (see that module for the TPU design
rationale) instead of the reference's cached-einsum scheme.

Reference parity: qml_essentials/operations.py — Operation 80-512, gate zoo
719-1487, Kraus channels 1490-1929, Hamiltonians 515-716, Pauli helpers
1932-2164, PauliWord 2174-2521.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from qml_essentials_tpu.ops import kernels
from qml_essentials_tpu.ops.dtypes import cdtype, _cdtype  # noqa: F401 (re-export)
from qml_essentials_tpu.ops.tape import active_tape, recording  # noqa: F401

Wires = Union[int, List[int]]


def _as_wire_list(wires: Wires) -> List[int]:
    return list(wires) if isinstance(wires, (list, tuple)) else [wires]


class Operation:
    """Base class for quantum gates, observables and channels.

    Instantiating an operation inside a :func:`~qml_essentials_tpu.ops.tape.recording`
    context appends it to the active tape.  Operations double as observables:
    their matrix feeds expectation-value measurement.

    Class attributes set by subclasses:
        _matrix: fixed unitary for non-parametrised gates.
        _num_wires: enforced wire count (``None`` = any).
        _param_names: attribute names of scalar gate parameters.
        is_controlled / is_clifford: structure flags used by the Pauli
            transpiler and drawing backends.
    """

    is_controlled = False
    is_clifford = False

    _matrix: Optional[jnp.ndarray] = None
    _num_wires: Optional[int] = None
    _param_names: Tuple[str, ...] = ()

    def __init__(
        self,
        wires: Wires = 0,
        matrix: Optional[jnp.ndarray] = None,
        record: bool = True,
        name: Optional[str] = None,
    ) -> None:
        self.name = name or self.__class__.__name__
        self.wires = _as_wire_list(wires)

        if self._num_wires is not None and len(self.wires) != self._num_wires:
            raise ValueError(
                f"wire count mismatch for {self.name}: needs "
                f"{self._num_wires}, got {self.wires}"
            )
        if len(set(self.wires)) != len(self.wires):
            raise ValueError(f"duplicate wires passed to {self.name}: {self.wires}")

        if matrix is not None:
            self._matrix = matrix

        if record:
            tape = active_tape()
            if tape is not None:
                tape.append(self)

    # ------------------------------------------------------------------ API
    @property
    def parameters(self) -> list:
        """Numeric parameters in canonical (``_param_names``) order."""
        return [getattr(self, name) for name in self._param_names]

    def __repr__(self) -> str:
        params = self.parameters
        if params:
            parts = []
            for v in params:
                try:
                    parts.append(f"{float(v):.4f}")
                except (TypeError, ValueError):
                    parts.append(str(v))
            return f"{self.name}({', '.join(parts)}, wires={self.wires})"
        return f"{self.name}(wires={self.wires})"

    @property
    def matrix(self) -> jnp.ndarray:
        if self._matrix is None:
            raise NotImplementedError(
                f"{self.__class__.__name__} does not define a matrix."
            )
        return self._matrix

    def decompose(self) -> List["Operation"]:
        """Decompose into primitive operations (created with ``record=False``)."""
        raise NotImplementedError(
            f"{self.__class__.__name__} does not define a decomposition."
        )

    @property
    def wires(self) -> List[int]:
        return self._wires

    @wires.setter
    def wires(self, wires: Wires) -> None:
        self._wires = _as_wire_list(wires)

    # --------------------------------------------------------------- algebra
    def _replace_on_tape(self, op: "Operation") -> None:
        """Swap self for *op* on the active tape (used by chained dagger/power)."""
        tape = active_tape()
        if tape is not None:
            if tape and tape[-1] is self:
                tape[-1] = op
            else:
                tape.append(op)

    def dagger(self) -> "Operation":
        """Conjugate transpose, replacing this op on the active tape."""
        op = Operation(wires=self.wires, matrix=jnp.conj(self._matrix).T, record=False)
        self._replace_on_tape(op)
        return op

    def power(self, power) -> "Operation":
        """Integer matrix power, replacing this op on the active tape."""
        op = Operation(
            wires=self.wires,
            matrix=jnp.linalg.matrix_power(self._matrix, power),
            record=False,
        )
        self._replace_on_tape(op)
        return op

    def __mul__(self, other: Union[float, "Operation"]) -> "Operation":
        if isinstance(other, Operation):
            return self.__matmul__(other)
        op = Operation(wires=self.wires, matrix=other * self._matrix, record=False)
        self._replace_on_tape(op)
        return op

    __rmul__ = __mul__

    def __add__(self, other: "Operation") -> "Operation":
        if sorted(self.wires) != sorted(other.wires):
            raise ValueError(
                f"Can only add operations acting on the same set of wires, "
                f"got {self.wires} and {other.wires}"
            )
        return Operation(
            wires=self.wires, matrix=self.matrix + other.matrix, record=False
        )

    def prod(self, *ops: "Operation") -> "Operation":
        """Generalised product on the union wire set (kron if disjoint)."""
        if not ops:
            return self
        all_ops = (self,) + ops
        union: List[int] = []
        for o in all_ops:
            for w in o.wires:
                if w not in union:
                    union.append(w)
        mat = kernels.lift_matrix(all_ops[0].matrix, all_ops[0].wires, union)
        for o in all_ops[1:]:
            mat = mat @ kernels.lift_matrix(o.matrix, o.wires, union)
        names = "*".join(o.name for o in all_ops)
        return Operation(wires=union, matrix=mat, name=f"Prod({names})", record=False)

    def __matmul__(self, other: "Operation") -> "Operation":
        if not isinstance(other, Operation):
            return NotImplemented
        return self.prod(other)

    # ----------------------------------------------------------- application
    def lifted_matrix(self, n_qubits: int) -> jnp.ndarray:
        """Full ``(2**n, 2**n)`` embedding via identity-kron + qubit permute."""
        return kernels.lift_matrix(self.matrix, self.wires, list(range(n_qubits)))

    def apply_to_state(self, state: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        """Apply to a flat ``(2**n,)`` statevector (the simulation hot path)."""
        return kernels.apply_matrix_flat(state, self.matrix, self.wires, n_qubits)

    def apply_to_state_tensor(self, psi: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        """Apply to a ``(2,)*n`` state tensor (legacy rank-n entry point)."""
        return kernels.apply_matrix(psi, self.matrix, self.wires)

    def apply_to_density(self, rho: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        """Apply ``rho -> U rho U†`` to a ``(2**n, 2**n)`` density matrix."""
        flat = kernels.apply_unitary_to_density_flat(
            rho.reshape(-1), self.matrix, self.wires, n_qubits
        )
        return flat.reshape(2**n_qubits, 2**n_qubits)

    def apply_to_density_flat(self, rho_flat: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        """Apply to a flat density state over ``2n`` conceptual qubits."""
        return kernels.apply_unitary_to_density_flat(
            rho_flat, self.matrix, self.wires, n_qubits
        )

    def apply_to_state_ri(self, psi2: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        """Apply to a real-split ``(2, 2**n)`` state (simulation hot path)."""
        return kernels.apply_matrix_flat_ri(psi2, self.matrix, self.wires, n_qubits)

    def apply_to_density_ri(self, rho2: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        """Apply to a real-split ``(2, 4**n)`` density state."""
        return kernels.apply_unitary_to_density_flat_ri(
            rho2, self.matrix, self.wires, n_qubits
        )


# ---------------------------------------------------------------------------
# Hamiltonians
# ---------------------------------------------------------------------------


class Hermitian(Operation):
    """Generic Hermitian observable / gate defined by an explicit matrix."""

    def __init__(
        self,
        matrix: jnp.ndarray,
        wires: Wires = 0,
        record: bool = True,
    ) -> None:
        super().__init__(
            wires=wires, matrix=jnp.asarray(matrix, dtype=cdtype()), record=record
        )

    def __rmul__(self, coeff_fn: Callable) -> "ParametrizedHamiltonian":
        """``coeff_fn * H`` builds a one-term :class:`ParametrizedHamiltonian`."""
        if not callable(coeff_fn):
            raise TypeError(
                f"Left operand of `* Hermitian` must be callable, got {type(coeff_fn)}"
            )
        return ParametrizedHamiltonian(terms=[(coeff_fn, self.matrix, self.wires)])

    def evolve(self, name: Optional[str] = None, **odeint_kwargs) -> Callable:
        """Gate factory for static evolution ``U = exp(-i t H)``."""
        from qml_essentials_tpu.pulse.evolution import Evolution

        return Evolution.evolve(self, name=name, **odeint_kwargs)


class ParametrizedHamiltonian:
    """Time-dependent Hamiltonian ``H(t) = sum_i f_i(p_i, t) * H_i``.

    Built from explicit ``(coeff_fn, H_mat, wires)`` triples, usually via the
    ``coeff_fn * Hermitian(...)`` shorthand; combine instances with ``+``.
    All terms must currently share the same wire set.
    """

    def __init__(
        self,
        terms: List[Tuple[Callable, jnp.ndarray, Wires]],
    ) -> None:
        if len(terms) == 0:
            raise ValueError("ParametrizedHamiltonian needs at least one term.")

        first_wires = _as_wire_list(terms[0][2])
        for _, _, w in terms[1:]:
            if _as_wire_list(w) != first_wires:
                raise ValueError(
                    "All terms of a ParametrizedHamiltonian must currently "
                    f"act on the same wires; got {_as_wire_list(w)} vs. "
                    f"{first_wires}. Multi-wire broadcasting across terms is "
                    "not yet supported."
                )

        first_shape = jnp.asarray(terms[0][1]).shape
        for _, H, _ in terms[1:]:
            if jnp.asarray(H).shape != first_shape:
                raise ValueError(
                    f"All term matrices must have the same shape; got "
                    f"{jnp.asarray(H).shape} vs. {first_shape}."
                )

        self._terms: Tuple[Tuple[Callable, jnp.ndarray, List[int]], ...] = tuple(
            (fn, jnp.asarray(H, dtype=cdtype()), _as_wire_list(w)) for fn, H, w in terms
        )
        self.wires: List[int] = list(first_wires)

    @property
    def coeff_fns(self) -> Tuple[Callable, ...]:
        return tuple(fn for fn, _, _ in self._terms)

    @property
    def H_mats(self) -> Tuple[jnp.ndarray, ...]:
        return tuple(H for _, H, _ in self._terms)

    @property
    def n_terms(self) -> int:
        return len(self._terms)

    def __add__(self, other: "ParametrizedHamiltonian") -> "ParametrizedHamiltonian":
        if not isinstance(other, ParametrizedHamiltonian):
            return NotImplemented
        return ParametrizedHamiltonian(terms=list(self._terms) + list(other._terms))

    def __neg__(self) -> "ParametrizedHamiltonian":
        return ParametrizedHamiltonian(
            terms=[
                ((lambda f: lambda p, t: -f(p, t))(fn), H, w)
                for fn, H, w in self._terms
            ]
        )

    def __sub__(self, other: "ParametrizedHamiltonian") -> "ParametrizedHamiltonian":
        if not isinstance(other, ParametrizedHamiltonian):
            return NotImplemented
        return self + (-other)

    def evolve(self, name: Optional[str] = None, **odeint_kwargs) -> Callable:
        """Gate factory solving ``dU/dt = -i [sum_i f_i(p_i, t) H_i] U``."""
        from qml_essentials_tpu.pulse.evolution import Evolution

        return Evolution.evolve(self, name=name, **odeint_kwargs)


# ---------------------------------------------------------------------------
# Fixed gates
# ---------------------------------------------------------------------------


class Id(Operation):
    """Identity gate on an arbitrary number of wires."""

    _matrix = jnp.eye(2, dtype=cdtype())
    _num_wires = None
    is_clifford = True

    def __init__(self, wires: Wires = 0, **kwargs) -> None:
        k = len(_as_wire_list(wires))
        if k > 1:
            kwargs["matrix"] = jnp.eye(2**k, dtype=cdtype())
        super().__init__(wires=wires, **kwargs)

    def apply_to_state(self, state: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return state  # no-op; skip the contraction entirely

    def apply_to_state_tensor(self, psi: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return psi

    def apply_to_density(self, rho: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return rho

    def apply_to_density_flat(self, rho_flat: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return rho_flat

    def apply_to_state_ri(self, psi2: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return psi2

    def apply_to_density_ri(self, rho2: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return rho2


class PauliX(Operation):
    """Pauli-X gate / observable."""

    _matrix = jnp.array([[0, 1], [1, 0]], dtype=cdtype())
    _num_wires = 1
    is_clifford = True


class PauliY(Operation):
    """Pauli-Y gate / observable."""

    _matrix = jnp.array([[0, -1j], [1j, 0]], dtype=cdtype())
    _num_wires = 1
    is_clifford = True


class PauliZ(Operation):
    """Pauli-Z gate / observable."""

    _matrix = jnp.array([[1, 0], [0, -1]], dtype=cdtype())
    _num_wires = 1
    is_clifford = True


class H(Operation):
    """Hadamard gate."""

    _matrix = jnp.array([[1, 1], [1, -1]], dtype=cdtype()) / jnp.sqrt(2.0)
    _num_wires = 1
    is_clifford = True


class S(Operation):
    """S (phase) gate, sqrt(Z)."""

    _matrix = jnp.array([[1, 0], [0, 1j]], dtype=cdtype())
    _num_wires = 1
    is_clifford = True


class SWAP(Operation):
    """SWAP gate."""

    _matrix = jnp.array(
        [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=cdtype()
    )
    _num_wires = 2
    is_clifford = True


class RandomUnitary(Operation):
    """Gate whose matrix is a random Hermitian draw (Frobenius-normalised)."""

    def __init__(
        self,
        wires: Wires,
        key: jax.Array,
        scale: float = 1.0,
        record: bool = True,
    ) -> None:
        dim = 2 ** len(_as_wire_list(wires))
        key_a, key_b = jax.random.split(key)
        A = (
            jax.random.normal(key_a, (dim, dim))
            + 1j * jax.random.normal(key_b, (dim, dim))
        ).astype(cdtype())
        Hm = (A + A.conj().T) / 2.0
        Hm = Hm * (scale / jnp.linalg.norm(Hm, ord="fro"))
        super().__init__(wires, matrix=Hm, record=record)


class DiagonalQubitUnitary(Operation):
    """Diagonal unitary ``U = diag(d_0, ..., d_{2^k-1})``.

    Used by the Golomb data encoding (Peters et al., arXiv:2209.05523).
    Application is a broadcast multiply (no transpose, one HBM pass) via
    :func:`~qml_essentials_tpu.ops.kernels.apply_diagonal` — unlike the
    reference, the fast path covers *any* wire subset, not only full-register
    gates (qml_essentials/operations.py:922-961).
    """

    _param_names = ()

    def __init__(self, diag: jnp.ndarray, wires: Wires = 0, **kwargs) -> None:
        self.diag = diag
        wires_list = _as_wire_list(wires)
        expected = 2 ** len(wires_list)
        if diag.shape != (expected,):
            raise ValueError(
                f"DiagonalQubitUnitary expects {expected} diagonal entries "
                f"for {len(wires_list)} wire(s), got shape {diag.shape}"
            )
        kwargs.setdefault("name", "DiagU")
        super().__init__(wires=wires, matrix=jnp.diag(diag), **kwargs)

    def apply_to_state(self, state: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return kernels.apply_diagonal_flat(state, self.diag, self.wires, n_qubits)

    def apply_to_state_tensor(self, psi: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return kernels.apply_diagonal(psi, self.diag, self.wires)

    def apply_to_density(self, rho: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        flat = self.apply_to_density_flat(rho.reshape(-1), n_qubits)
        return flat.reshape(2**n_qubits, 2**n_qubits)

    def apply_to_density_flat(self, rho_flat: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        rho_flat = kernels.apply_diagonal_flat(
            rho_flat, self.diag, self.wires, 2 * n_qubits
        )
        bra = [w + n_qubits for w in self.wires]
        return kernels.apply_diagonal_flat(
            rho_flat, jnp.conj(self.diag), bra, 2 * n_qubits
        )

    def apply_to_state_ri(self, psi2: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return kernels.apply_diagonal_flat_ri(psi2, self.diag, self.wires, n_qubits)

    def apply_to_density_ri(self, rho2: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        rho2 = kernels.apply_diagonal_flat_ri(rho2, self.diag, self.wires, 2 * n_qubits)
        bra = [w + n_qubits for w in self.wires]
        return kernels.apply_diagonal_flat_ri(rho2, jnp.conj(self.diag), bra, 2 * n_qubits)


class Barrier(Operation):
    """Visual separator; a no-op for every simulation path."""

    _matrix = None

    def apply_to_state(self, state: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return state

    def apply_to_state_tensor(self, psi: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return psi

    def apply_to_density(self, rho: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return rho

    def apply_to_density_flat(self, rho_flat: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return rho_flat

    def apply_to_state_ri(self, psi2: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return psi2

    def apply_to_density_ri(self, rho2: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return rho2


_PAULI_LABELS = ["I", "X", "Y", "Z"]
_PAULI_CLASSES = [Id, PauliX, PauliY, PauliZ]
_PAULI_MATRICES = {
    label: cls._matrix for label, cls in zip(_PAULI_LABELS, _PAULI_CLASSES)
}
_PAULI_MATS = [_PAULI_MATRICES[label] for label in _PAULI_LABELS]


def _pauli_exponential(theta, P: jnp.ndarray) -> jnp.ndarray:
    """``exp(-i theta/2 P) = cos(theta/2) I - i sin(theta/2) P`` for P²=I."""
    dim = P.shape[0]
    return jnp.cos(theta / 2) * jnp.eye(dim, dtype=cdtype()) - 1j * jnp.sin(
        theta / 2
    ) * P


def _make_rotation_gate(pauli_class: type, name: str) -> type:
    """Single-qubit rotation factory for RX / RY / RZ."""
    pauli_mat = pauli_class._matrix

    class _Rotation(Operation):
        __doc__ = f"{name}(theta) = exp(-i theta/2 {name[1]})."
        _num_wires = 1
        _param_names = ("theta",)

        def __init__(self, theta, wires: Wires = 0, **kwargs) -> None:
            self.theta = theta
            super().__init__(
                wires=wires, matrix=_pauli_exponential(theta, pauli_mat), **kwargs
            )

        def generator(self) -> Operation:
            return pauli_class(wires=self.wires[0], record=False)

    _Rotation.__name__ = name
    _Rotation.__qualname__ = name
    return _Rotation


RX = _make_rotation_gate(PauliX, "RX")
RY = _make_rotation_gate(PauliY, "RY")
RZ = _make_rotation_gate(PauliZ, "RZ")


_P0 = jnp.array([[1, 0], [0, 0]], dtype=cdtype())
_P1 = jnp.array([[0, 0], [0, 1]], dtype=cdtype())


def _make_controlled_gate(target_class: type, name: str) -> type:
    """Controlled-Pauli factory for CX / CY / CZ."""
    target_mat = target_class._matrix

    class _Controlled(Operation):
        __doc__ = f"Controlled-{target_class.__name__[5:]} gate."
        _matrix = jnp.kron(_P0, Id._matrix) + jnp.kron(_P1, target_mat)
        _num_wires = 2
        is_controlled = True
        is_clifford = True

        def __init__(self, wires: List[int] = [0, 1], **kwargs) -> None:
            super().__init__(wires=wires, **kwargs)

        def decompose(self) -> List["Operation"]:
            if name != "CZ":
                return super().decompose()
            c, t = self.wires
            return [
                H(wires=t, record=False),
                CX(wires=[c, t], record=False),
                H(wires=t, record=False),
            ]

    _Controlled.__name__ = name
    _Controlled.__qualname__ = name
    return _Controlled


CX = _make_controlled_gate(PauliX, "CX")
CY = _make_controlled_gate(PauliY, "CY")
CZ = _make_controlled_gate(PauliZ, "CZ")


class CCX(Operation):
    """Toffoli gate (stress-tests the arbitrary-k contraction path)."""

    _matrix = jnp.eye(8, dtype=cdtype()).at[6:8, 6:8].set(PauliX._matrix)
    is_controlled = True
    _num_wires = 3

    def __init__(self, wires: List[int] = [0, 1, 2], **kwargs) -> None:
        super().__init__(wires=wires, **kwargs)


class CSWAP(Operation):
    """Fredkin gate; wires are ``[control, target0, target1]``."""

    _matrix = jnp.eye(8, dtype=cdtype()).at[5:7, 5:7].set(PauliX._matrix)
    is_controlled = True
    _num_wires = 3

    def __init__(self, wires: List[int] = [0, 1, 2], **kwargs) -> None:
        super().__init__(wires=wires, **kwargs)


class ControlledPhaseShift(Operation):
    """CPhase(phi) = diag(1, 1, 1, exp(i phi)); reduces to CZ at phi = pi."""

    _num_wires = 2
    _param_names = ("phi",)
    is_controlled = True

    def __init__(self, phi, wires: List[int] = [0, 1], **kwargs) -> None:
        self.phi = phi
        ones = jnp.ones(3, dtype=cdtype())
        diag = jnp.concatenate([ones, jnp.exp(1j * jnp.asarray(phi))[None].astype(cdtype())])
        super().__init__(wires=wires, matrix=jnp.diag(diag), **kwargs)


class Rot(Operation):
    """General SU(2) rotation ``Rot(phi, theta, omega) = RZ(omega) RY(theta) RZ(phi)``."""

    _num_wires = 1
    _param_names = ("phi", "theta", "omega")

    def __init__(self, phi, theta, omega, wires: Wires = 0, **kwargs) -> None:
        self.phi = phi
        self.theta = theta
        self.omega = omega
        mat = (
            _pauli_exponential(omega, PauliZ._matrix)
            @ _pauli_exponential(theta, PauliY._matrix)
            @ _pauli_exponential(phi, PauliZ._matrix)
        )
        super().__init__(wires=wires, matrix=mat, **kwargs)

    def decompose(self) -> List["Operation"]:
        w = self.wires[0]
        return [
            RZ(self.phi, wires=w, record=False),
            RY(self.theta, wires=w, record=False),
            RZ(self.omega, wires=w, record=False),
        ]


class PauliRot(Operation):
    """Multi-qubit Pauli rotation ``exp(-i theta/2 P)`` for a Pauli word P."""

    _param_names = ("theta",)
    _PAULI_MAP = _PAULI_MATRICES

    def __init__(self, theta, pauli_word: str, wires: Wires = 0, **kwargs) -> None:
        self.theta = theta
        self.pauli_word = pauli_word
        P = reduce(jnp.kron, [self._PAULI_MAP[c] for c in pauli_word])
        super().__init__(wires=wires, matrix=_pauli_exponential(theta, P), **kwargs)

    def generator(self) -> Operation:
        P = reduce(jnp.kron, [self._PAULI_MAP[c] for c in self.pauli_word])
        return Hermitian(matrix=P, wires=self.wires, record=False)


def _make_pauli_rotation_subclass(name: str, word: str) -> type:
    """Two-qubit Pauli-rotation subclasses RXX/RYY/RZZ/RZX."""

    class _FixedWordRot(PauliRot):
        __doc__ = f"{name}(theta) = exp(-i theta/2 {' x '.join(word)})."
        _num_wires = len(word)

        def __init__(self, theta, wires: Wires = None, **kwargs) -> None:
            if wires is None:
                wires = list(range(len(word)))
            super().__init__(theta, word, wires=wires, **kwargs)

    _FixedWordRot.__name__ = name
    _FixedWordRot.__qualname__ = name
    return _FixedWordRot


RXX = _make_pauli_rotation_subclass("RXX", "XX")
RYY = _make_pauli_rotation_subclass("RYY", "YY")
RZZ = _make_pauli_rotation_subclass("RZZ", "ZZ")
RZX = _make_pauli_rotation_subclass("RZX", "ZX")


class ControlledPauliRot(Operation):
    """Multi-controlled multi-qubit Pauli rotation.

    Wire layout ``[controls..., targets...]``; the rotation acts on the
    targets conditioned on all controls being |1>.
    """

    _param_names = ("theta",)
    is_controlled = True

    def __init__(
        self,
        theta,
        pauli_word: str,
        wires: List[int],
        n_controls: int = 1,
        **kwargs,
    ) -> None:
        self.theta = theta
        self.pauli_word = pauli_word
        self.n_controls = n_controls

        wires_list = _as_wire_list(wires)
        n_targets = len(pauli_word)
        if len(wires_list) != n_controls + n_targets:
            raise ValueError(
                f"ControlledPauliRot expects {n_controls + n_targets} wires "
                f"({n_controls} control + {n_targets} target), got "
                f"{len(wires_list)}."
            )

        P = reduce(jnp.kron, [PauliRot._PAULI_MAP[c] for c in pauli_word])
        R = _pauli_exponential(theta, P)
        d_t = P.shape[0]
        d_c = 2**n_controls
        dim = d_c * d_t
        start = (d_c - 1) * d_t
        mat = jnp.eye(dim, dtype=cdtype()).at[start:, start:].set(R)
        super().__init__(wires=wires_list, matrix=mat, **kwargs)

    def generator(self) -> Operation:
        P = reduce(jnp.kron, [PauliRot._PAULI_MAP[c] for c in self.pauli_word])
        d_t = P.shape[0]
        d_c = 2**self.n_controls
        dim = d_c * d_t
        start = (d_c - 1) * d_t
        gen = jnp.zeros((dim, dim), dtype=cdtype()).at[start:, start:].set(P)
        return Hermitian(matrix=gen, wires=self.wires, record=False)


def _make_controlled_rotation_subclass(name: str, axis: str) -> type:
    """Single-control rotation subclasses CRX / CRY / CRZ."""

    class _CRot(ControlledPauliRot):
        __doc__ = f"Controlled rotation around the {axis} axis."
        _num_wires = 2

        def __init__(self, theta, wires: List[int] = [0, 1], **kwargs) -> None:
            super().__init__(theta, axis, wires=wires, n_controls=1, **kwargs)

        def decompose(self) -> List["Operation"]:
            c, t = self.wires
            theta = self.theta
            core = [
                RZ(theta / 2, wires=t, record=False),
                CX(wires=[c, t], record=False),
                RZ(-theta / 2, wires=t, record=False),
                CX(wires=[c, t], record=False),
            ]
            if axis == "Z":
                return core
            if axis == "X":
                return (
                    [H(wires=t, record=False)] + core + [H(wires=t, record=False)]
                )
            # axis == "Y": CRY = RX(-pi/2)_t · CRZ · RX(pi/2)_t  (exact; the
            # basis change maps Z -> Y on the target).
            return (
                [RX(jnp.pi / 2, wires=t, record=False)]
                + core
                + [RX(-jnp.pi / 2, wires=t, record=False)]
            )

    _CRot.__name__ = name
    _CRot.__qualname__ = name
    return _CRot


CRX = _make_controlled_rotation_subclass("CRX", "X")
CRY = _make_controlled_rotation_subclass("CRY", "Y")
CRZ = _make_controlled_rotation_subclass("CRZ", "Z")


# ---------------------------------------------------------------------------
# Kraus channels
# ---------------------------------------------------------------------------


class KrausChannel(Operation):
    """Base class for noise channels ``rho -> sum_k K_k rho K_k†``.

    Channels have no single unitary matrix and cannot act on pure states;
    :meth:`apply_to_density` consumes the stacked-Kraus kernel (one batched
    contraction per half instead of a Python loop of per-operator einsums).
    """

    def kraus_matrices(self) -> List[jnp.ndarray]:
        raise NotImplementedError

    @property
    def matrix(self) -> jnp.ndarray:
        raise TypeError(
            f"{self.__class__.__name__} is a noise channel and has no single "
            "unitary matrix. Use apply_to_density() instead."
        )

    def apply_to_state(self, state: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        raise TypeError(
            f"{self.__class__.__name__} is a noise channel and cannot be "
            "applied to a pure statevector. Use execute(type='density') instead."
        )

    def apply_to_state_tensor(self, psi: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        raise TypeError(
            f"{self.__class__.__name__} is a noise channel and cannot be "
            "applied to a pure statevector. Use execute(type='density') instead."
        )

    def apply_to_density(self, rho: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        flat = kernels.apply_kraus_to_density_flat(
            rho.reshape(-1), self.kraus_matrices(), self.wires, n_qubits
        )
        return flat.reshape(2**n_qubits, 2**n_qubits)

    def apply_to_density_flat(self, rho_flat: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return kernels.apply_kraus_to_density_flat(
            rho_flat, self.kraus_matrices(), self.wires, n_qubits
        )

    def apply_to_state_ri(self, psi2: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        raise TypeError(
            f"{self.__class__.__name__} is a noise channel and cannot be "
            "applied to a pure statevector. Use execute(type='density') instead."
        )

    def apply_to_density_ri(self, rho2: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
        return kernels.apply_kraus_to_density_flat_ri(
            rho2, self.kraus_matrices(), self.wires, n_qubits
        )


def _check_prob(p: float, name: str = "p") -> None:
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"{name} must be in [0, 1].")


class BitFlip(KrausChannel):
    """Bit-flip channel: K0 = sqrt(1-p) I, K1 = sqrt(p) X."""

    _num_wires = 1
    _param_names = ("p",)

    def __init__(self, p: float, wires: Wires = 0) -> None:
        _check_prob(p)
        self.p = p
        super().__init__(wires=wires)

    def kraus_matrices(self) -> List[jnp.ndarray]:
        return [
            jnp.sqrt(1 - self.p) * Id._matrix,
            jnp.sqrt(self.p) * PauliX._matrix,
        ]


class PhaseFlip(KrausChannel):
    """Phase-flip channel: K0 = sqrt(1-p) I, K1 = sqrt(p) Z."""

    _num_wires = 1
    _param_names = ("p",)

    def __init__(self, p: float, wires: Wires = 0) -> None:
        _check_prob(p)
        self.p = p
        super().__init__(wires=wires)

    def kraus_matrices(self) -> List[jnp.ndarray]:
        return [
            jnp.sqrt(1 - self.p) * Id._matrix,
            jnp.sqrt(self.p) * PauliZ._matrix,
        ]


class DepolarizingChannel(KrausChannel):
    """Single-qubit depolarizing channel (I, X, Y, Z Kraus set)."""

    _num_wires = 1
    _param_names = ("p",)

    def __init__(self, p: float, wires: Wires = 0) -> None:
        _check_prob(p)
        self.p = p
        super().__init__(wires=wires)

    def kraus_matrices(self) -> List[jnp.ndarray]:
        p = self.p
        return [
            jnp.sqrt(1 - p) * Id._matrix,
            jnp.sqrt(p / 3) * PauliX._matrix,
            jnp.sqrt(p / 3) * PauliY._matrix,
            jnp.sqrt(p / 3) * PauliZ._matrix,
        ]


class AmplitudeDamping(KrausChannel):
    """Amplitude damping: energy loss |1> -> |0> with probability gamma."""

    _num_wires = 1
    _param_names = ("gamma",)

    def __init__(self, gamma: float, wires: Wires = 0) -> None:
        _check_prob(gamma, "gamma")
        self.gamma = gamma
        super().__init__(wires=wires)

    def kraus_matrices(self) -> List[jnp.ndarray]:
        g = self.gamma
        K0 = jnp.array([[1.0, 0.0], [0.0, jnp.sqrt(1 - g)]], dtype=cdtype())
        K1 = jnp.array([[0.0, jnp.sqrt(g)], [0.0, 0.0]], dtype=cdtype())
        return [K0, K1]


class PhaseDamping(KrausChannel):
    """Phase damping (dephasing) with probability gamma."""

    _num_wires = 1
    _param_names = ("gamma",)

    def __init__(self, gamma: float, wires: Wires = 0) -> None:
        _check_prob(gamma, "gamma")
        self.gamma = gamma
        super().__init__(wires=wires)

    def kraus_matrices(self) -> List[jnp.ndarray]:
        g = self.gamma
        K0 = jnp.array([[1.0, 0.0], [0.0, jnp.sqrt(1 - g)]], dtype=cdtype())
        K1 = jnp.array([[0.0, 0.0], [0.0, jnp.sqrt(g)]], dtype=cdtype())
        return [K0, K1]


class ThermalRelaxationError(KrausChannel):
    """Thermal relaxation: simultaneous T1 relaxation and T2 dephasing.

    Two regimes (reference parity: qml_essentials/operations.py:1782-1895):
    ``t2 <= t1`` uses the six-operator Markovian set; ``t2 > t1`` builds the
    Choi matrix and eigendecomposes it into four Kraus operators.
    """

    _num_wires = 1
    _param_names = ("pe", "t1", "t2", "tg")

    def __init__(self, pe: float, t1: float, t2: float, tg: float, wires: Wires = 0) -> None:
        _check_prob(pe, "pe")
        if t1 <= 0:
            raise ValueError("t1 must be > 0.")
        if t2 <= 0:
            raise ValueError("t2 must be > 0.")
        if t2 > 2 * t1:
            raise ValueError("t2 must be <= 2·t1.")
        if tg < 0:
            raise ValueError("tg must be >= 0.")
        self.pe, self.t1, self.t2, self.tg = pe, t1, t2, tg
        super().__init__(wires=wires)

    def kraus_matrices(self) -> List[jnp.ndarray]:
        pe, t1, t2, tg = self.pe, self.t1, self.t2, self.tg
        eT1 = jnp.exp(-tg / t1)
        p_reset = 1.0 - eT1
        eT2 = jnp.exp(-tg / t2)

        if t2 <= t1:
            pz = (1.0 - p_reset) * (1.0 - eT2 / eT1) / 2.0
            pr0 = (1.0 - pe) * p_reset
            pr1 = pe * p_reset
            pid = 1.0 - pz - pr0 - pr1
            return [
                jnp.sqrt(pid) * Id._matrix,
                jnp.sqrt(pz) * PauliZ._matrix,
                jnp.sqrt(pr0) * jnp.array([[1, 0], [0, 0]], dtype=cdtype()),
                jnp.sqrt(pr0) * jnp.array([[0, 1], [0, 0]], dtype=cdtype()),
                jnp.sqrt(pr1) * jnp.array([[0, 0], [1, 0]], dtype=cdtype()),
                jnp.sqrt(pr1) * jnp.array([[0, 0], [0, 1]], dtype=cdtype()),
            ]

        # Non-Markovian regime: Choi matrix eigendecomposition, column-major
        # vec convention matching the reference / PennyLane.
        choi = jnp.array(
            [
                [1 - pe * p_reset, 0, 0, eT2],
                [0, pe * p_reset, 0, 0],
                [0, 0, (1 - pe) * p_reset, 0],
                [eT2, 0, 0, 1 - (1 - pe) * p_reset],
            ],
            dtype=cdtype(),
        )
        lams, vecs = jnp.linalg.eigh(choi)
        kraus = []
        for i in range(4):
            mat = jnp.sqrt(jnp.abs(lams[i])) * vecs[:, i].reshape(2, 2).T
            kraus.append(mat.astype(cdtype()))
        return kraus


class QubitChannel(KrausChannel):
    """Generic channel from a user-supplied Kraus operator list."""

    def __init__(self, kraus_ops: List[jnp.ndarray], wires: Wires = 0) -> None:
        self._kraus_ops = [jnp.asarray(K, dtype=cdtype()) for K in kraus_ops]
        super().__init__(wires=wires)

    def kraus_matrices(self) -> List[jnp.ndarray]:
        return self._kraus_ops


# ---------------------------------------------------------------------------
# Pauli helpers (dense)
# ---------------------------------------------------------------------------


def evolve_pauli_with_clifford(
    clifford: Operation,
    pauli: Operation,
    adjoint_left: bool = True,
) -> Operation:
    """Dense ``C† P C`` (or ``C P C†``) on the union wire set, as a Hermitian."""
    all_wires = sorted(set(clifford.wires) | set(pauli.wires))
    C = kernels.lift_matrix(clifford.matrix, clifford.wires, all_wires)
    P = kernels.lift_matrix(pauli.matrix, pauli.wires, all_wires)
    Cd = jnp.conj(C).T
    result = (Cd @ P @ C) if adjoint_left else (C @ P @ Cd)
    return Hermitian(matrix=result, wires=all_wires, record=False)


def _dominant_pauli_label(matrix: jnp.ndarray) -> Tuple[complex, str]:
    """Dominant Pauli term ``(coeff, label)`` via the trace formula.

    Brute-force O(4^n); only used on small matrices (Clifford-conjugated
    Paulis in the Fourier tree).  Computed with a single vectorised trace
    over the stacked Pauli basis rather than a Python-level argmax loop.
    """
    from itertools import product as _product

    dim = matrix.shape[0]
    n_qubits = int(round(float(np.log2(dim))))

    labels = []
    coeffs = []
    for idxs in _product(range(4), repeat=n_qubits):
        P = reduce(jnp.kron, [_PAULI_MATS[i] for i in idxs]) if n_qubits else None
        coeffs.append(jnp.trace(P @ matrix) / dim)
        labels.append("".join(_PAULI_LABELS[i] for i in idxs))
    coeffs = jnp.stack(coeffs)
    best = int(jnp.argmax(jnp.abs(coeffs)))
    return coeffs[best], labels[best]


def pauli_decompose(matrix: jnp.ndarray, wire_order: Optional[List[int]] = None):
    """Dominant Pauli term of a Hermitian matrix as ``(coeff, Operation)``."""
    dim = matrix.shape[0]
    n_qubits = int(round(float(np.log2(dim))))
    if wire_order is None:
        wire_order = list(range(n_qubits))

    coeff, label = _dominant_pauli_label(matrix)
    label_to_idx = {lbl: i for i, lbl in enumerate(_PAULI_LABELS)}

    if sum(1 for ch in label if ch != "I") <= 1:
        for q, ch in enumerate(label):
            if ch != "I":
                result = _PAULI_CLASSES[label_to_idx[ch]](
                    wires=wire_order[q], record=False
                )
                result._pauli_label = ch
                return coeff, result
        result = Id(wires=wire_order[0], record=False)
        result._pauli_label = "I" * n_qubits
        return coeff, result

    P = reduce(jnp.kron, [_PAULI_MATRICES[ch] for ch in label])
    result = Hermitian(matrix=P, wires=wire_order, record=False)
    result._pauli_label = label
    return coeff, result


def pauli_string_from_operation(op: Operation) -> str:
    """Pauli word string of a Pauli-like operation (``"X"``, ``"ZZ"``, ...)."""
    label = (
        getattr(op, "pauli_word", None)
        if isinstance(op, PauliRot)
        else getattr(op, "_pauli_label", None)
    )
    if label is not None:
        return label
    builtin = {"PauliX": "X", "PauliY": "Y", "PauliZ": "Z", "I": "I"}.get(op.name)
    if builtin is not None:
        return builtin
    _, pauli_op = pauli_decompose(op.matrix, wire_order=op.wires)
    return pauli_op._pauli_label


def prod(*ops: Operation) -> Operation:
    """Module-level product: ``prod(op1, op2, ...) == op1.prod(op2, ...)``."""
    if not ops:
        raise ValueError("prod() needs at least one operation")
    head, *rest = ops
    return head.prod(*rest)


# ---------------------------------------------------------------------------
# PauliWord — packed-bitmask symplectic Pauli algebra
# ---------------------------------------------------------------------------

# Local Pauli code c = x + 2z per qubit: 0=I, 1=X, 2=Z, 3=Y (Y = i·X·Z).
_CODE_CHARS = "IXZY"
_CHAR_CODE = {ch: c for c, ch in enumerate(_CODE_CHARS)}

# conjugation lookup tables, keyed by the Clifford's matrix bytes:
#   table[c_in] = (c_out, dphase)  over local codes of the gate's wires.
_CONJ_LUTS: dict = {}


def _local_xz_matrix(code: int, k: int) -> np.ndarray:
    """Dense ``2^k x 2^k`` operator ``⊗_i X^{x_i} Z^{z_i}`` for a local code.

    Wire ``i = 0`` (lowest base-4 digit of *code*) is the most significant
    kron factor, matching the gate-matrix convention used throughout.
    """
    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Z = np.array([[1, 0], [0, -1]], dtype=complex)
    out = np.eye(1, dtype=complex)
    for i in range(k):
        c = (code >> (2 * i)) & 3
        f = np.eye(2, dtype=complex)
        if c & 1:
            f = f @ X
        if c & 2:
            f = f @ Z
        out = np.kron(out, f)
    return out


def _build_conj_lut(C: np.ndarray, k: int) -> Optional[List[Tuple[int, int]]]:
    """Conjugation table ``X^x Z^z -> i^d X^x' Z^z'`` under ``P -> C P C†``.

    Returns ``None`` when *C* is not a Clifford (some image is not a single
    signed Pauli), signalling the dense fallback.
    """
    Cd = C.conj().T
    table: List[Tuple[int, int]] = []
    for c_in in range(4**k):
        M = C @ _local_xz_matrix(c_in, k) @ Cd
        hit = None
        for c_out in range(4**k):
            P = _local_xz_matrix(c_out, k)
            # ratio i^d with d integer <=> M == i^d P elementwise
            for d in range(4):
                if np.allclose(M, (1j**d) * P, atol=1e-9):
                    hit = (c_out, d)
                    break
            if hit:
                break
        if hit is None:
            return None
        table.append(hit)
    return table


def _conj_lut_for(clifford: "Operation", adjoint_left: bool):
    """Cached LUT for ``C P C†`` (or ``C† P C``) of a <=2-qubit gate."""
    mat = clifford._matrix
    if mat is None or isinstance(mat, jax.core.Tracer):
        return None
    C = np.asarray(mat)
    k = len(clifford.wires)
    if C.shape != (2**k, 2**k) or k > 2:
        return None
    if adjoint_left:
        C = C.conj().T
    key = (C.tobytes(), k)
    if key not in _CONJ_LUTS:
        _CONJ_LUTS[key] = _build_conj_lut(C, k)
    return _CONJ_LUTS[key]


class PauliWord:
    r"""Symbolic n-qubit Pauli ``P = i^phase · X^{x} Z^{z}`` on packed bits.

    The X- and Z-components are stored as integer *bitmasks* (bit ``q`` of
    ``xm``/``zm`` is qubit ``q``'s exponent) with the scalar tracked as
    ``i^phase`` mod 4; ``Y = i X Z`` contributes set bits in both masks.
    Products and commutators are two XORs / popcounts on machine words, and
    Clifford conjugation is a per-gate table lookup — the tables are derived
    at first use from the gate's dense matrix (so *any* 1–2 qubit Clifford,
    e.g. CY, gets an exact symbolic rule automatically), with a dense
    conjugation fallback for wider gates.

    Feature parity target: the stabilizer-tableau PauliWord of
    qml_essentials/operations.py:2174-2521 (different representation:
    bit arrays + per-name image rules there, bitmasks + matrix-derived
    LUTs here).
    """

    __slots__ = ("xm", "zm", "n", "phase")

    def __init__(self, x, z, phase: int = 0) -> None:
        if isinstance(x, (int, np.integer)):
            raise TypeError("use _make() for mask construction")
        x = np.asarray(x)
        z = np.asarray(z)
        self.n = int(x.shape[0])
        self.xm = int.from_bytes(np.packbits(x.astype(bool), bitorder="little"), "little")
        self.zm = int.from_bytes(np.packbits(z.astype(bool), bitorder="little"), "little")
        self.phase = int(phase) % 4

    @classmethod
    def _make(cls, xm: int, zm: int, n: int, phase: int) -> "PauliWord":
        w = cls.__new__(cls)
        w.xm, w.zm, w.n, w.phase = xm, zm, n, phase % 4
        return w

    # ---- constructors ----------------------------------------------------
    @classmethod
    def identity(cls, n_qubits: int) -> "PauliWord":
        return cls._make(0, 0, n_qubits, 0)

    @classmethod
    def from_pauli_string(
        cls, pauli_string: str, wires: List[int], n_qubits: int
    ) -> "PauliWord":
        xm = zm = 0
        phase = 0
        for ch, w in zip(pauli_string, wires):
            c = _CHAR_CODE[ch]
            xm |= (c & 1) << w
            zm |= (c >> 1) << w
            phase += c == 3  # each Y carries one factor of i
        return cls._make(xm, zm, n_qubits, phase)

    @classmethod
    def from_operation(cls, op: "Operation", n_qubits: int) -> "PauliWord":
        cached = getattr(op, "_pauli_word", None)
        if isinstance(cached, PauliWord) and cached.n == n_qubits:
            return cached
        label = (
            op.pauli_word
            if isinstance(op, PauliRot)
            else {
                "RX": "X", "RY": "Y", "RZ": "Z",
                "PauliX": "X", "PauliY": "Y", "PauliZ": "Z", "I": "I",
            }.get(op.name)
        )
        if label is None:
            label = pauli_string_from_operation(op)
        return cls.from_pauli_string(label, op.wires, n_qubits)

    # ---- views ------------------------------------------------------------
    @property
    def n_qubits(self) -> int:
        return self.n

    def _unpack(self, mask: int) -> np.ndarray:
        raw = mask.to_bytes((self.n + 7) // 8, "little")
        return np.unpackbits(
            np.frombuffer(raw, np.uint8), count=self.n, bitorder="little"
        ).astype(np.int8)

    @property
    def x(self) -> np.ndarray:
        return self._unpack(self.xm)

    @property
    def z(self) -> np.ndarray:
        return self._unpack(self.zm)

    @property
    def xy_mask(self) -> np.ndarray:
        """Boolean mask of qubits carrying X or Y (off-diagonal support)."""
        return self._unpack(self.xm).astype(bool)

    @property
    def is_diagonal(self) -> bool:
        return self.xm == 0

    # ---- algebra ----------------------------------------------------------
    def commutes_with(self, other: "PauliWord") -> bool:
        """Vanishing symplectic form: popcount parity of the cross terms."""
        anti = ((self.xm & other.zm).bit_count() + (self.zm & other.xm).bit_count()) & 1
        return anti == 0

    def compose(self, other: "PauliWord") -> "PauliWord":
        r"""Product: reordering each ``Z^{z1} X^{x2}`` crossing costs ``-1``."""
        cross = (self.zm & other.xm).bit_count()
        return PauliWord._make(
            self.xm ^ other.xm,
            self.zm ^ other.zm,
            self.n,
            self.phase + other.phase + 2 * cross,
        )

    # ---- Clifford conjugation ---------------------------------------------
    def conjugate_by_clifford(
        self, clifford: "Operation", adjoint_left: bool = False
    ) -> "PauliWord":
        """``C P C†`` (or ``C† P C`` with *adjoint_left*) via the gate LUT."""
        wires = list(clifford.wires)
        lut = _conj_lut_for(clifford, adjoint_left)
        if lut is None:
            return self._conjugate_via_matrix(clifford, adjoint_left)
        # Local code of this word on the gate's wires (gate wire order).
        c_in = 0
        for i, w in enumerate(wires):
            c_in |= (((self.xm >> w) & 1) | (((self.zm >> w) & 1) << 1)) << (2 * i)
        c_out, dphase = lut[c_in]
        xm, zm = self.xm, self.zm
        for i, w in enumerate(wires):
            loc = (c_out >> (2 * i)) & 3
            xm = (xm & ~(1 << w)) | ((loc & 1) << w)
            zm = (zm & ~(1 << w)) | (((loc >> 1) & 1) << w)
        return PauliWord._make(xm, zm, self.n, self.phase + dphase)

    def _conjugate_via_matrix(
        self, clifford: "Operation", adjoint_left: bool
    ) -> "PauliWord":
        """Exact dense fallback for Cliffords wider than the LUT covers."""
        C = kernels.lift_matrix(clifford.matrix, clifford.wires, list(range(self.n)))
        Cd = jnp.conj(C).T
        mat = self.to_matrix()
        out = (Cd @ mat @ C) if adjoint_left else (C @ mat @ Cd)
        return PauliWord.from_matrix(out)

    # ---- expectation / conversions -----------------------------------------
    def zero_expectation(self) -> complex:
        """``<0…0|P|0…0>`` — nonzero only for I/Z words."""
        return complex(1j**self.phase) if self.xm == 0 else 0.0 + 0.0j

    def _codes(self) -> List[int]:
        return [
            ((self.xm >> q) & 1) | (((self.zm >> q) & 1) << 1) for q in range(self.n)
        ]

    def to_pauli_string(self) -> str:
        return "".join(_CODE_CHARS[c] for c in self._codes())

    def leading_phase(self) -> complex:
        """Scalar relating this word to its bare Pauli string (Y = i·X·Z)."""
        n_y = (self.xm & self.zm).bit_count()
        return complex(1j ** ((self.phase - n_y) % 4))

    def to_pauli_string_and_phase(self) -> Tuple[str, complex]:
        return self.to_pauli_string(), self.leading_phase()

    def to_matrix(self) -> jnp.ndarray:
        """Dense matrix (host-side, exact integer entries times ``i^phase``)."""
        out = np.eye(1, dtype=complex)
        for c in self._codes():
            out = np.kron(out, _local_xz_matrix(c, 1))
        return jnp.asarray((1j**self.phase) * out, dtype=cdtype())

    @classmethod
    def from_matrix(cls, matrix: jnp.ndarray) -> "PauliWord":
        """Word for a matrix known to be a single (phase-scaled) Pauli."""
        coeff, label = _dominant_pauli_label(matrix)
        word = cls.from_pauli_string(label, list(range(len(label))), len(label))
        quarter_turns = int(round(np.angle(complex(coeff)) / (np.pi / 2)))
        word.phase = (word.phase + quarter_turns) % 4
        return word

    def to_list_repr(self) -> np.ndarray:
        """Legacy int list representation (I=-1, X=0, Y=1, Z=2)."""
        remap = np.array([-1, 0, 2, 1])  # code order I,X,Z,Y -> legacy ints
        return remap[np.asarray(self._codes())]

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, PauliWord):
            return NotImplemented
        return (self.xm, self.zm, self.n, self.phase) == (
            other.xm, other.zm, other.n, other.phase,
        )

    def __repr__(self) -> str:
        sign = ("+", "+i", "-", "-i")[self.phase]
        return f"PauliWord({sign}{self.to_pauli_string()})"
