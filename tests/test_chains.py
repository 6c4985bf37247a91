"""Chain-plan correctness: planner structure, forward/gradient equivalence.

The chain executor (ops/chains.py + the pallas chain kernels) is the
large-state fast path; these tests run it in interpret mode at n=18 on CPU
and compare against the plain einsum path bit-for-bit (up to the split3
MXU decomposition's ~1e-5 relative error).

Reference parity: the reference's only execution strategy is the per-gate
einsum loop (qml_essentials/simulation.py:91-104); chains must be exactly
equivalent to it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qml_essentials_tpu.ops import adjoint, chains, kernels, pallas_kernels, simulation
from qml_essentials_tpu.ops.operations import (
    CRX,
    CRY,
    CRZ,
    CX,
    CY,
    CZ,
    ControlledPhaseShift,
    RXX,
    RYY,
    RZX,
    RZZ,
    H,
    RX,
    RY,
    RZ,
)
from qml_essentials_tpu.ops.tape import recording

# The chain executor is an opt-in experimental path (simulation.USE_CHAINS
# defaults to False; docs/performance.md records it as slower than the
# scheduled plan on real hardware) — its interpret-mode equivalence sweeps
# are minutes of cold XLA compiles, so they run in the slow tier.
pytestmark = pytest.mark.slow

N = 18  # smallest register the L geometry (bit span 17) supports


def _ring_tape(n, seed=3, layers=2):
    """Ring ansatz: per layer RY+RZ on every wire, CRX chain + wrap."""
    rng = np.random.RandomState(seed)
    with recording() as tape:
        for _ in range(layers):
            for w in range(n):
                RY(rng.uniform(-np.pi, np.pi), wires=w)
                RZ(rng.uniform(-np.pi, np.pi), wires=w)
            for w in range(n - 1):
                CRX(rng.uniform(-np.pi, np.pi), wires=[w, w + 1])
            CRX(rng.uniform(-np.pi, np.pi), wires=[n - 1, 0])
            for w in range(n):
                RX(0.37 * (w + 1), wires=w)
    return tape


@pytest.fixture
def chain_mode(monkeypatch):
    """Force the chain path with interpret-mode kernels on CPU."""
    monkeypatch.setattr(pallas_kernels, "ENABLED", True)
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_N", N)
    monkeypatch.setattr(pallas_kernels, "INTERPRET", True)
    monkeypatch.setattr(simulation, "USE_CHAINS", True)
    # These tests check chain-vs-window *structural* equivalence; run the
    # gram at full precision so the default bf16 gram's ~1e-3-relative
    # parameter-gradient noise doesn't blur the comparison (the bf16 gram
    # itself is bounded by tests/test_pallas.py).
    monkeypatch.setattr(pallas_kernels, "GRAM_MODE", "split3")
    yield


@pytest.mark.unittest
def test_plan_structure():
    tape = _ring_tape(N)
    steps = chains.plan_chains(tape, N)
    assert steps is not None
    assert all(k == "chain" for k, _, _ in steps)
    # 2 layers + encodings should group into a handful of passes.
    assert 2 <= len(steps) <= 8
    # Every descriptor carries exactly one payload.
    for _, (geom, descs, pays), _ in steps:
        assert len(descs) == len(pays)
        for d in descs:
            assert d[0] in ("win", "diag")


@pytest.mark.unittest
def test_seam_decomposition_matrices():
    """(K1 x K2) D (K1 x K2)^dag must reproduce every wrap entangler."""
    gates = [
        CRX(0.73, wires=[N - 1, 0], record=False),
        CRY(-1.21, wires=[N - 1, 0], record=False),
        CRZ(0.4, wires=[N - 1, 0], record=False),
        CX(wires=[N - 1, 0], record=False),
        CY(wires=[N - 1, 0], record=False),
        CZ(wires=[N - 1, 0], record=False),
        ControlledPhaseShift(0.9, wires=[N - 1, 0], record=False),
        RXX(0.61, wires=[N - 1, 0], record=False),
        RYY(-0.5, wires=[N - 1, 0], record=False),
        RZZ(1.3, wires=[N - 1, 0], record=False),
        RZX(0.8, wires=[N - 1, 0], record=False),
    ]
    for g in gates:
        items = chains._decompose_seam(g)
        assert items is not None, g.__class__.__name__
        # Rebuild the 4x4 from the emitted items (application order).
        m = np.eye(4, dtype=np.complex64)
        for kind, payload, wires in items:
            if kind == "diag":
                full = np.diag(np.asarray(payload))
            else:
                k1 = np.asarray(payload)
                full = (
                    np.kron(k1, np.eye(2))
                    if wires[0] == g.wires[0]
                    else np.kron(np.eye(2), k1)
                )
            m = full @ m
        ref = np.asarray(g.matrix)
        assert np.abs(m - ref).max() < 1e-6, g.__class__.__name__


def _forward_state(tape, n):
    return simulation.simulate_pure_ri(tape, n)


@pytest.mark.unittest
def test_forward_equivalence(chain_mode):
    tape = _ring_tape(N)
    # Chain path is selected (sanity): plan exists and is shorter.
    steps = chains.plan_chains(tape, N)
    assert steps is not None and len(steps) > 0

    got = np.asarray(jax.jit(lambda: _forward_state(tape, N))())

    pallas_kernels.ENABLED = False  # plain einsum path
    ref = np.asarray(jax.jit(lambda: _forward_state(tape, N))())
    pallas_kernels.ENABLED = True

    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 5e-5


@pytest.mark.unittest
def test_gradient_equivalence(chain_mode):
    """Adjoint-chain gradients must match plain-autodiff gradients."""
    rng = np.random.RandomState(7)
    thetas0 = jnp.asarray(rng.uniform(-np.pi, np.pi, size=2 * N + N))

    def forward(thetas):
        with recording() as tape:
            for w in range(N):
                RY(thetas[2 * w], wires=w)
                RZ(thetas[2 * w + 1], wires=w)
            for w in range(N - 1):
                CRX(thetas[2 * N + w], wires=[w, w + 1])
            CRX(thetas[2 * N + N - 1], wires=[N - 1, 0])
        psi2 = simulation.simulate_pure_ri(tape, N)
        probs = psi2[0] ** 2 + psi2[1] ** 2
        # <Z_0>: wire 0 is the flat MSB.
        half = probs.reshape(2, -1).sum(axis=1)
        return half[0] - half[1]

    val_c, grad_c = jax.jit(jax.value_and_grad(forward))(thetas0)
    val_c, grad_c = float(val_c), np.asarray(grad_c)

    pallas_kernels.ENABLED = False
    val_r, grad_r = jax.jit(jax.value_and_grad(forward))(thetas0)
    val_r, grad_r = float(val_r), np.asarray(grad_r)
    pallas_kernels.ENABLED = True

    assert abs(val_c - val_r) < 5e-5
    assert np.abs(grad_c - grad_r).max() < 5e-4


@pytest.mark.unittest
def test_expanded_path_equivalence():
    """With Pallas off, chain plans expand to the plain step vocabulary
    and must agree with the un-chained plan exactly."""
    tape = _ring_tape(N, seed=11, layers=1)
    steps = chains.plan_chains(tape, N)
    assert steps is not None

    psi0 = kernels.zero_state_ri(N)
    norm = adjoint.normalize_plan(steps, N)
    assert norm is not None
    static, payloads = norm
    # Pallas disabled: every chain step must have been expanded.
    assert all(s[0] != "chain" for s in static)
    got = np.asarray(adjoint._forward(psi0, payloads, static, N))

    ref = np.asarray(simulation.simulate_pure_ri(tape, N))
    assert np.abs(got - ref).max() < 1e-5


@pytest.mark.unittest
def test_chain_vs_scheduled_plan_selection():
    """plan_chains must bail (None) on tapes it cannot express."""
    from qml_essentials_tpu.ops.operations import BitFlip

    with recording() as tape:
        RY(0.3, wires=0)
        BitFlip(0.1, wires=0)
    assert chains.plan_chains(tape, N) is None

    # A wide scattered gate (no region) with no conjugator form.
    from qml_essentials_tpu.ops.operations import SWAP

    with recording() as tape:
        SWAP(wires=[N - 1, 0])
    assert chains.plan_chains(tape, N) is None
