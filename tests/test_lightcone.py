"""Light-cone zero-state prefix: the leading disjoint windows of a plan
collapse to an outer product of their first columns (simulation.
_zero_state_prefix).  Correctness pins: prefix state == dense application
of the peeled windows to |0...0>, and the full pallas-regime simulation
with peeling equals the einsum reference path.

Reference parity: the reference always starts from the dense zero state
(qml_essentials/simulation.py:65-104); the light-cone start is new.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qml_essentials_tpu.ops import kernels, pallas_kernels, simulation
from qml_essentials_tpu.ops import operations as op
from qml_essentials_tpu.ops.tape import recording

N = 18


def _ring_tape(n, seed=3):
    rng = np.random.RandomState(seed)
    with recording() as tape:
        for w in range(n):
            op.RY(rng.uniform(-np.pi, np.pi), wires=w)
            op.RZ(rng.uniform(-np.pi, np.pi), wires=w)
        for w in range(n - 1):
            op.CRX(rng.uniform(-np.pi, np.pi), wires=[w, w + 1])
        op.CRX(rng.uniform(-np.pi, np.pi), wires=[n - 1, 0])
        for w in range(n):
            op.RX(0.37 * (w + 1), wires=w)
    return tape


@pytest.mark.unittest
def test_prefix_matches_dense_application():
    """psi2 from the peel == applying the peeled windows to |0> densely."""
    n = 12
    tape = _ring_tape(n, seed=5)
    plan = simulation.plan_contractions(tape, max_width=4)
    peeled, psi2 = simulation._zero_state_prefix(plan, n)
    assert len(peeled) >= 2

    ref = kernels.zero_state_ri(n)
    for i in peeled:
        kind, payload, wires = plan[i]
        assert kind == "mat"
        ref = kernels.apply_matrix_flat_ri(ref, payload, wires, n)

    assert np.abs(np.asarray(psi2) - np.asarray(ref)).max() < 1e-6


@pytest.mark.unittest
def test_prefix_hops_disjoint_blockers():
    """A window after a non-peelable step with disjoint support peels."""
    n = 6
    w_a = jnp.asarray(np.eye(4, dtype=np.complex64) * 1j)
    w_b = jnp.asarray(np.eye(4, dtype=np.complex64))
    plan = [
        ("mat", w_a, [0, 1]),
        ("op", op.Barrier(wires=[0], record=False), [0]),
        ("mat", w_b, [2, 3]),  # disjoint from the channel: peels
        ("mat", w_b, [0, 1]),  # overlaps the channel: must not peel
    ]
    peeled, psi2 = simulation._zero_state_prefix(plan, n)
    assert peeled == [0, 2]
    assert psi2 is not None


@pytest.mark.unittest
def test_no_prefix_for_single_window():
    plan = [("mat", jnp.eye(4, dtype=jnp.complex64), [0, 1])]
    peeled, psi2 = simulation._zero_state_prefix(plan, 6)
    assert peeled == [] and psi2 is None


@pytest.mark.unittest
def test_pallas_regime_simulation_with_peel_matches_reference(monkeypatch):
    """End-to-end at n=18 with Pallas interpret: the peeled scheduled plan
    equals the plain einsum path bit-for-bit (up to split3 error)."""
    monkeypatch.setattr(pallas_kernels, "ENABLED", True)
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_N", N)
    monkeypatch.setattr(pallas_kernels, "INTERPRET", True)
    monkeypatch.setattr(simulation, "USE_CHAINS", False)

    tape = _ring_tape(N)
    plan = simulation.plan_contractions(tape, n_qubits=N)
    peeled, _ = simulation._zero_state_prefix(plan, N)
    assert len(peeled) >= 2  # the peel actually engages on this tape

    got = np.asarray(jax.jit(lambda: simulation.simulate_pure_ri(tape, N))())

    monkeypatch.setattr(pallas_kernels, "ENABLED", False)
    ref = np.asarray(jax.jit(lambda: simulation.simulate_pure_ri(tape, N))())

    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 5e-5


@pytest.mark.unittest
def test_gradients_flow_through_prefix(monkeypatch):
    """Parameter gradients through the outer-product start match the
    reference path."""
    monkeypatch.setattr(pallas_kernels, "ENABLED", True)
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_N", N)
    monkeypatch.setattr(pallas_kernels, "INTERPRET", True)
    monkeypatch.setattr(simulation, "USE_CHAINS", False)
    monkeypatch.setattr(simulation, "BACKWARD_MODE", "autodiff")

    rng = np.random.RandomState(7)
    thetas0 = jnp.asarray(rng.uniform(-np.pi, np.pi, size=2 * N))

    def forward(thetas):
        with recording() as tape:
            for w in range(N):
                RY_theta = thetas[2 * w]
                op.RY(RY_theta, wires=w)
                op.RZ(thetas[2 * w + 1], wires=w)
            for w in range(N - 1):
                op.CRX(0.3, wires=[w, w + 1])
        psi2 = simulation.simulate_pure_ri(tape, N)
        probs = psi2[0] ** 2 + psi2[1] ** 2
        half = probs.reshape(2, -1).sum(axis=1)
        return half[0] - half[1]

    val_p, grad_p = jax.jit(jax.value_and_grad(forward))(thetas0)

    monkeypatch.setattr(pallas_kernels, "ENABLED", False)
    val_r, grad_r = jax.jit(jax.value_and_grad(forward))(thetas0)

    assert abs(float(val_p) - float(val_r)) < 5e-5
    assert float(jnp.abs(grad_p - grad_r).max()) < 5e-4
