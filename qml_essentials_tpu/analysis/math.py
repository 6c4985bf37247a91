"""Quantum-information math utilities: fidelity, distances, QFI.

Everything runs on-device through eigendecompositions (no scipy ``sqrtm``);
only :func:`logm_v` delegates to the host (scipy) since XLA has no matrix
logarithm.

Reference parity: qml_essentials/math.py (logm_v 7-28, fidelity 104-144,
trace_distance 147-170, phase_difference 173-207, Fubini-Study/QFI 210-431).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qml_essentials_tpu.ops.dtypes import cdtype as _cdtype


def logm_v(A: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Matrix logarithm, batched over an optional leading axis (host scipy)."""
    from scipy.linalg import logm

    if A.ndim == 2:
        return logm(A, **kwargs)
    if A.ndim == 3:
        out = jnp.zeros(A.shape, dtype=_cdtype())
        for i in range(A.shape[0]):
            out = out.at[i].set(logm(A[i], **kwargs))
        return out
    raise NotImplementedError("Unsupported shape of input matrix")


def _sqrt_matrix(density_matrix: jnp.ndarray) -> jnp.ndarray:
    """PSD matrix square root via eigendecomposition (batch-aware).

    Negative eigenvalues (numerical noise) are clamped to zero.
    """
    evs, vecs = jnp.linalg.eigh(density_matrix)
    evs = jnp.clip(jnp.real(evs), 0.0, None)
    sqrt_evs = jnp.sqrt(evs)
    # V diag(sqrt) V† via broadcasting over the optional batch axis.
    scaled = vecs * sqrt_evs[..., None, :]
    return scaled @ jnp.conj(jnp.swapaxes(vecs, -1, -2))


def _fidelity_statevector(state0: jnp.ndarray, state1: jnp.ndarray) -> jnp.ndarray:
    """``|<psi|phi>|^2`` with defensive normalisation; batch-aware."""
    norm0 = jnp.linalg.norm(state0, axis=-1, keepdims=True)
    norm1 = jnp.linalg.norm(state1, axis=-1, keepdims=True)
    state0 = state0 / jnp.where(norm0 > 0, norm0, 1.0)
    state1 = state1 / jnp.where(norm1 > 0, norm1, 1.0)
    overlap = jnp.sum(jnp.conj(state0) * state1, axis=-1)
    return jnp.abs(overlap) ** 2


def _fidelity_dm(state0: jnp.ndarray, state1: jnp.ndarray) -> jnp.ndarray:
    """Uhlmann fidelity ``(Tr sqrt(sqrt(r0) r1 sqrt(r0)))^2``; batch-aware."""
    sqrt0 = _sqrt_matrix(state0)
    product = sqrt0 @ state1 @ sqrt0
    evs = jnp.clip(jnp.real(jnp.linalg.eigvalsh(product)), 0.0, None)
    return jnp.sum(jnp.sqrt(evs), axis=-1) ** 2


def _is_statevector(state: jnp.ndarray) -> bool:
    return state.ndim <= 2 and (
        state.ndim == 1 or state.shape[-2] != state.shape[-1]
    )


def fidelity(state0: jnp.ndarray, state1: jnp.ndarray) -> jnp.ndarray:
    """Fidelity of two states; dispatches on vectors vs density matrices."""
    state0 = jnp.asarray(state0, dtype=_cdtype())
    state1 = jnp.asarray(state1, dtype=_cdtype())

    if state0.shape[-1] != state1.shape[-1]:
        raise ValueError("The two states must have the same number of wires.")

    is_sv0 = _is_statevector(state0)
    is_sv1 = _is_statevector(state1)
    if is_sv0 != is_sv1:
        raise ValueError(
            "Both states must be of the same kind "
            "(both state vectors or both density matrices)."
        )
    return _fidelity_statevector(state0, state1) if is_sv0 else _fidelity_dm(
        state0, state1
    )


def trace_distance(state0: jnp.ndarray, state1: jnp.ndarray) -> jnp.ndarray:
    """Trace distance ``0.5 * ||r0 - r1||_1`` of density matrices (batch-aware)."""
    state0 = jnp.asarray(state0, dtype=_cdtype())
    state1 = jnp.asarray(state1, dtype=_cdtype())
    if state0.shape[-1] != state1.shape[-1]:
        raise ValueError("The two states must have the same number of wires.")
    eigvals = jnp.abs(jnp.linalg.eigvalsh(state0 - state1))
    return jnp.sum(eigvals, axis=-1) / 2


def phase_difference(state0: jnp.ndarray, state1: jnp.ndarray) -> jnp.ndarray:
    """Relative phase ``angle(<psi0|psi1>)`` of two state vectors (batch-aware)."""
    state0 = jnp.asarray(state0, dtype=_cdtype())
    state1 = jnp.asarray(state1, dtype=_cdtype())
    if state0.shape[-1] != state1.shape[-1]:
        raise ValueError("The two states must have the same number of wires.")
    inner = jnp.sum(jnp.conj(state0) * state1, axis=-1)
    return jnp.angle(inner)


def _fubini_study_statevector(jac: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
    """``g_ij = Re[<d_i psi|d_j psi> - <d_i psi|psi><psi|d_j psi>]``."""
    A = jnp.conj(jac.T) @ jac
    v = jnp.conj(jac.T) @ state
    return jnp.real(A - jnp.outer(v, jnp.conj(v)))


def _qfi_statevector(jac: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
    """Pure-state QFI: four times the Fubini-Study metric."""
    return 4.0 * _fubini_study_statevector(jac, state)


def _qfi_density(
    jac: jnp.ndarray, state: jnp.ndarray, eps: float = 1e-12
) -> jnp.ndarray:
    """Mixed-state QFI via the symmetric logarithmic derivative eigen-sum."""
    evals, evecs = jnp.linalg.eigh(state)
    evals = jnp.clip(jnp.real(evals), 0.0, None)

    drho = jnp.moveaxis(jac, -1, 0)  # (P, d, d)
    M = jnp.conj(evecs.T) @ drho @ evecs

    s = evals[:, None] + evals[None, :]
    weights = jnp.where(s > eps, 2.0 / jnp.where(s > eps, s, 1.0), 0.0)

    F = jnp.einsum("ikl,jkl->ij", M * weights[None], jnp.conj(M))
    return jnp.real(F)


def _state_and_jacobian(state_fn, params: jnp.ndarray):
    """State and its forward-mode Jacobian at *params*, as complex arrays."""
    state = jnp.asarray(state_fn(params), dtype=_cdtype())
    jac = jnp.asarray(jax.jacfwd(state_fn)(params), dtype=_cdtype())
    return state, jac


def quantum_fisher_information(state_fn, params: jnp.ndarray) -> jnp.ndarray:
    """QFI matrix at *params*; dispatches pure (Fubini-Study) vs mixed (SLD).

    ``state_fn`` maps parameters to a state vector or density matrix, e.g.
    ``lambda p: model(params=p, inputs=x)`` with ``execution_type="state"``.
    """
    state, jac = _state_and_jacobian(state_fn, params)
    if state.ndim == 1:
        return _qfi_statevector(jac.reshape(state.shape[0], -1), state)
    if state.ndim == 2 and state.shape[-1] == state.shape[-2]:
        return _qfi_density(jac.reshape(state.shape[0], state.shape[1], -1), state)
    raise ValueError(
        "state_fn must return a state vector of shape (d,) or a density "
        f"matrix of shape (d, d), got shape {state.shape}."
    )


def fubini_study_metric(state_fn, params: jnp.ndarray) -> jnp.ndarray:
    """Fubini-Study metric at *params* (pure states only): ``F = 4 g``."""
    state, jac = _state_and_jacobian(state_fn, params)
    if state.ndim != 1:
        raise ValueError(
            "The Fubini-Study metric is only defined for pure states; "
            f"state_fn must return a state vector of shape (d,), got shape "
            f"{state.shape}."
        )
    return _fubini_study_statevector(jac.reshape(state.shape[0], -1), state)
