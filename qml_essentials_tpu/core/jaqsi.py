"""Public circuit-building entry point (the "jaqsi" surface).

Exposes :class:`Script`, the :func:`Hamiltonian` factory and general
quantum-information utilities (partial trace, probability marginalisation,
parity observables).

Reference parity: qml_essentials/jaqsi.py (full module).
"""

from __future__ import annotations

from functools import reduce
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp

from qml_essentials_tpu.core.executor import Script  # noqa: F401
from qml_essentials_tpu.ops.operations import (  # noqa: F401
    Hermitian,
    ParametrizedHamiltonian,
    PauliZ,
)
from qml_essentials_tpu.pulse.evolution import Evolution  # noqa: F401


def Hamiltonian(
    matrix: jnp.ndarray,
    wires: Union[int, List[int]] = 0,
    record: bool = False,
) -> Hermitian:
    """Static Hamiltonian factory — a :class:`Hermitian` with ``record=False``.

    Multiply by a ``f(params, t)`` callable to obtain a time-dependent
    :class:`ParametrizedHamiltonian`; both expose ``.evolve()``.
    """
    return Hermitian(matrix, wires=wires, record=record)


def _partial_trace_single(
    rho: jnp.ndarray, n_qubits: int, keep: List[int]
) -> jnp.ndarray:
    """Partial trace of one ``(2**n, 2**n)`` density matrix."""
    rho_t = rho.reshape((2,) * (2 * n_qubits))
    trace_out = sorted(set(range(n_qubits)) - set(keep))
    for q in reversed(trace_out):
        half = rho_t.ndim // 2
        rho_t = jnp.trace(rho_t, axis1=q, axis2=q + half)
    dim = 2 ** len(keep)
    return rho_t.reshape(dim, dim)


def partial_trace(
    rho: jnp.ndarray, n_qubits: int, keep: List[int]
) -> jnp.ndarray:
    """Partial trace keeping only the *keep* qubits; supports a batch axis."""
    dim = 2**n_qubits
    if rho.shape == (dim, dim):
        return _partial_trace_single(rho, n_qubits, keep)
    return jax.vmap(lambda r: _partial_trace_single(r, n_qubits, keep))(rho)


def marginalize_probs(
    probs: jnp.ndarray, n_qubits: int, keep: Tuple[int, ...]
) -> jnp.ndarray:
    """Marginalise a probability vector onto the *keep* qubits (batch-safe)."""
    dim = 2**n_qubits
    reduce_axes = tuple(q for q in range(n_qubits) if q not in keep)

    def _single(p: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(p.reshape((2,) * n_qubits), axis=reduce_axes).ravel()

    return jax.vmap(_single)(probs.reshape(-1, dim))


def build_parity_observable(qubit_group: List[int]) -> Hermitian:
    """Multi-qubit Z-parity observable Z⊗...⊗Z on *qubit_group*.

    Tagged with ``_pauli_label`` so the diagonal measurement fast path and
    the symbolic stack never need the dense matrix.
    """
    Z = PauliZ._matrix
    mat = reduce(jnp.kron, [Z] * len(qubit_group))
    obs = Hermitian(matrix=mat, wires=qubit_group, record=False)
    obs._pauli_label = "Z" * len(qubit_group)
    return obs
