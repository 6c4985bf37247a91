"""Tests for the pulse stack: evolution solvers, pulse gates, global config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qml_essentials_tpu.ops.operations as op
from qml_essentials_tpu.core import jaqsi as js
from qml_essentials_tpu.ops.tape import recording
from qml_essentials_tpu.pulse.evolution import Evolution
from qml_essentials_tpu.pulse.pulses import (
    PulseEnvelope,
    PulseGates,
    PulseInformation,
    PulseParams,
)

X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.array([[1, 0], [0, -1]], dtype=complex)


def gate_fidelity(U, V):
    """Global-phase-invariant unitary fidelity |Tr(U† V)| / dim."""
    U, V = np.asarray(U), np.asarray(V)
    return float(np.abs(np.trace(U.conj().T @ V)) / U.shape[0])


def phase_error(U, V):
    """Global phase difference angle between two unitaries."""
    tr = complex(np.trace(np.asarray(U).conj().T @ np.asarray(V)))
    return abs(np.angle(tr))


def recorded_unitary(fn, n):
    """Unitary of everything *fn* records, via column-stacked basis states."""
    from qml_essentials_tpu.ops import kernels

    with recording() as tape:
        fn()
    U = np.eye(2**n, dtype=complex)
    for g in tape:
        U = np.asarray(kernels.lift_matrix(g.matrix, g.wires, list(range(n)))) @ U
    return U


class TestEvolutionStatic:
    @pytest.mark.unittest
    def test_static_expm(self):
        H = js.Hamiltonian(jnp.asarray(X), wires=0)
        gate = H.evolve(name="test")
        with recording() as tape:
            gate(0.5)
        expected = np.cos(0.5) * np.eye(2) - 1j * np.sin(0.5) * X
        assert np.allclose(np.asarray(tape[0].matrix), expected, atol=1e-6)


class TestEvolutionParametrized:
    def _solve(self, solver, coeff_fn, H, params, T, **kw):
        Ht = coeff_fn * js.Hamiltonian(jnp.asarray(H), wires=0)
        with recording() as tape:
            Ht.evolve(solver=solver, **kw)([params], T)
        return np.asarray(tape[0].matrix)

    @pytest.mark.unittest
    @pytest.mark.parametrize("solver", ["magnus2", "magnus4", "dopri5", "dopri8"])
    def test_constant_coefficient_matches_expm(self, solver):
        def f(p, t):
            return p[0]

        U = self._solve(solver, f, X, jnp.array([0.8]), 1.0, magnus_steps=64)
        expected = np.cos(0.8) * np.eye(2) - 1j * np.sin(0.8) * X
        assert np.allclose(U, expected, atol=1e-4), solver

    @pytest.mark.unittest
    def test_time_dependent_agreement_magnus_vs_adaptive(self):
        # Commuting time dependence: exact result is exp(-i integral f dt X).
        def f(p, t):
            return p[0] * jnp.sin(3.0 * t)

        params = jnp.array([1.3])
        T = 2.0
        exact_angle = 1.3 * (1 - np.cos(3 * T)) / 3.0
        expected = np.cos(exact_angle) * np.eye(2) - 1j * np.sin(exact_angle) * X

        U_m4 = self._solve("magnus4", f, X, params, T, magnus_steps=128)
        U_ad = self._solve("dopri5", f, X, params, T, atol=1e-9, rtol=1e-9)
        assert np.allclose(U_m4, expected, atol=1e-5)
        assert np.allclose(U_ad, expected, atol=1e-4)
        assert np.allclose(U_m4, U_ad, atol=1e-4)

    @pytest.mark.unittest
    def test_noncommuting_two_term_agreement(self):
        def fx(p, t):
            return p[0] * jnp.cos(2 * t)

        def fy(p, t):
            return p[0] * jnp.sin(2 * t)

        p = jnp.array([0.9])
        Ht = fx * js.Hamiltonian(jnp.asarray(X), wires=0) + fy * js.Hamiltonian(
            jnp.asarray(Y), wires=0
        )
        with recording() as t1:
            Ht.evolve(solver="magnus4", magnus_steps=256)([p, p], 1.5)
        with recording() as t2:
            Ht.evolve(solver="dopri5", atol=1e-10, rtol=1e-10)([p, p], 1.5)
        U1, U2 = np.asarray(t1[0].matrix), np.asarray(t2[0].matrix)
        assert gate_fidelity(U1, U2) > 1 - 1e-5
        # unitarity (f32 working precision over 256 expm steps)
        assert np.allclose(U1 @ U1.conj().T, np.eye(2), atol=1e-3)

    @pytest.mark.unittest
    def test_magnus4_convergence_order(self):
        # Error should drop by ~2^4 when halving the step size (x64 so the
        # discretisation error stays above the float noise floor).
        jax.config.update("jax_enable_x64", True)
        try:
            def fx(p, t):
                return p[0] * jnp.cos(5 * t)

            def fy(p, t):
                return p[0] * jnp.sin(5 * t)

            p = jnp.array([1.0])

            def run(steps):
                Ht = fx * js.Hamiltonian(
                    jnp.asarray(X), wires=0
                ) + fy * js.Hamiltonian(jnp.asarray(Y), wires=0)
                with recording() as tape:
                    Ht.evolve(solver="magnus4", magnus_steps=steps)([p, p], 1.0)
                return np.asarray(tape[0].matrix)

            ref = run(2048)
            e1 = np.linalg.norm(run(16) - ref)
            e2 = np.linalg.norm(run(32) - ref)
            order = np.log2(e1 / e2)
            assert order > 3.0, f"observed order {order}"
        finally:
            jax.config.update("jax_enable_x64", False)

    @pytest.mark.unittest
    def test_solver_cache_shared_and_evicted(self):
        Evolution.clear_evolve_solver_cache()

        def f(p, t):
            return p[0]

        Ht = f * js.Hamiltonian(jnp.asarray(X), wires=0)
        with recording():
            Ht.evolve(solver="magnus2")([jnp.array([0.1])], 1.0)
        n1 = len(Evolution._evolve_solver_cache)
        with recording():
            Ht.evolve(solver="magnus2")([jnp.array([0.7])], 1.0)
        assert len(Evolution._evolve_solver_cache) == n1  # cache hit
        Evolution.clear_evolve_solver_cache()
        assert len(Evolution._evolve_solver_cache) == 0

    @pytest.mark.unittest
    def test_solver_validation(self):
        with pytest.raises(ValueError):
            Evolution.set_solver_defaults(solver="bogus")
        prev = Evolution.set_solver_defaults(magnus_steps=128)
        Evolution.set_solver_defaults(**prev)

    @pytest.mark.unittest
    def test_dopri8_is_genuinely_higher_order(self):
        """DOP853 must agree with high-res Magnus4 to near machine precision
        and beat dopri5 at equal (loose) tolerance — the signature of a real
        8th-order method, not an aliased dopri5 (ref: Magnus-vs-Dopri8
        agreement, qml_essentials tests/test_jaqsi.py:2278-2656)."""
        prev_x64 = jax.config.x64_enabled
        jax.config.update("jax_enable_x64", True)
        try:
            Evolution.clear_evolve_solver_cache()

            def fx(p, t):
                return p[0] * jnp.sin(3.1 * t) * jnp.exp(-0.3 * t)

            def fy(p, t):
                return p[1] * jnp.cos(1.7 * t)

            Ht = fx * js.Hamiltonian(jnp.asarray(X), wires=0) + fy * js.Hamiltonian(
                jnp.asarray(Y), wires=0
            )
            params = [jnp.array([0.8, 0.4]), jnp.array([0.8, 0.4])]

            def solve(**kw):
                with recording() as tape:
                    Ht.evolve(**kw)(params, 2.0)
                return np.asarray(tape[0].matrix)

            U_ref = solve(solver="magnus4", magnus_steps=2048)
            U8 = solve(solver="dopri8", atol=1e-12, rtol=1e-12)
            # tight tolerance: agreement to near machine precision + unitary
            assert np.abs(U8 - U_ref).max() < 1e-10
            assert np.abs(U8.conj().T @ U8 - np.eye(2)).max() < 1e-10

            # loose tolerance: the 8th-order method must be far more
            # accurate than the 5th-order one at the same tolerance.
            err5 = np.abs(solve(solver="dopri5", atol=1e-6, rtol=1e-6) - U_ref).max()
            err8 = np.abs(solve(solver="dopri8", atol=1e-6, rtol=1e-6) - U_ref).max()
            assert err8 < err5 / 5, (err5, err8)
        finally:
            jax.config.update("jax_enable_x64", prev_x64)
            Evolution.clear_evolve_solver_cache()

    @pytest.mark.unittest
    def test_grad_through_evolution(self):
        def f(p, t):
            return p[0]

        def loss(a):
            Ht = f * js.Hamiltonian(jnp.asarray(X), wires=0, record=False)
            with recording() as tape:
                Ht.evolve(solver="magnus2", magnus_steps=32)([jnp.array([a])], 1.0)
            psi = tape[0].apply_to_state(jnp.array([1.0, 0.0], dtype=complex), 1)
            return jnp.abs(psi[0]) ** 2  # = cos(a)^2

        g = float(jax.grad(loss)(0.6))
        assert np.isclose(g, -2 * np.cos(0.6) * np.sin(0.6), atol=1e-4)


class TestPulseGates:
    @pytest.mark.unittest
    @pytest.mark.parametrize("envelope", ["gaussian", "square", "drag"])
    @pytest.mark.parametrize("w", [np.pi / 2, np.pi, 0.7])
    def test_pulse_rx_fidelity(self, envelope, w):
        PulseInformation.set_envelope(envelope, rwa=True)
        U = recorded_unitary(lambda: PulseGates.RX(w, wires=0), 1)
        target = np.cos(w / 2) * np.eye(2) - 1j * np.sin(w / 2) * X
        assert gate_fidelity(U, target) > 0.99, (envelope, w)

    @pytest.mark.unittest
    @pytest.mark.parametrize("w", [np.pi / 2, 1.1])
    def test_pulse_ry_fidelity(self, w):
        PulseInformation.set_envelope("gaussian", rwa=True)
        U = recorded_unitary(lambda: PulseGates.RY(w, wires=0), 1)
        target = np.cos(w / 2) * np.eye(2) - 1j * np.sin(w / 2) * Y
        assert gate_fidelity(U, target) > 0.99

    @pytest.mark.unittest
    def test_virtual_rz_exact(self):
        PulseInformation.set_envelope("gaussian", rwa=True)
        w = 0.9
        U = recorded_unitary(lambda: PulseGates.RZ(w, wires=0), 1)
        target = np.diag([np.exp(-1j * w / 2), np.exp(1j * w / 2)])
        assert gate_fidelity(U, target) > 1 - 1e-4
        assert phase_error(U, target) < 1e-2

    @pytest.mark.unittest
    def test_pulse_cz(self):
        PulseInformation.set_envelope("gaussian", rwa=True)
        U = recorded_unitary(lambda: PulseGates.CZ(wires=[0, 1]), 2)
        target = np.diag([1, 1, 1, -1])
        assert gate_fidelity(U, target) > 0.999

    @pytest.mark.unittest
    def test_pulse_h_composite(self):
        PulseInformation.set_envelope("gaussian", rwa=True)
        U = recorded_unitary(lambda: PulseGates.H(wires=0), 1)
        target = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
        assert gate_fidelity(U, target) > 0.99
        assert phase_error(U, target) < 0.05

    @pytest.mark.unittest
    def test_pulse_cx_composite(self):
        PulseInformation.set_envelope("gaussian", rwa=True)
        U = recorded_unitary(lambda: PulseGates.CX(wires=[0, 1]), 2)
        target = np.eye(4)[[0, 1, 3, 2]]
        assert gate_fidelity(U, target) > 0.98

    @pytest.mark.unittest
    @pytest.mark.parametrize("gate,target_fn", [
        ("CRZ", lambda w: np.diag([1, 1, np.exp(-1j * w / 2), np.exp(1j * w / 2)])),
        ("RZZ", lambda w: np.diag([np.exp(-1j * w / 2), np.exp(1j * w / 2),
                                   np.exp(1j * w / 2), np.exp(-1j * w / 2)])),
    ])
    def test_pulse_two_qubit_composites(self, gate, target_fn):
        PulseInformation.set_envelope("gaussian", rwa=True)
        w = 0.8
        U = recorded_unitary(
            lambda: getattr(PulseGates, gate)(w, wires=[0, 1]), 2
        )
        assert gate_fidelity(U, target_fn(w)) > 0.98, gate

    @pytest.mark.unittest
    def test_pulse_rot_composite(self):
        PulseInformation.set_envelope("gaussian", rwa=True)
        phi, theta, omega = 0.3, 0.9, -0.5
        U = recorded_unitary(
            lambda: PulseGates.Rot(phi, theta, omega, wires=0), 1
        )
        target = np.asarray(op.Rot(phi, theta, omega, record=False).matrix)
        assert gate_fidelity(U, target) > 0.98


class TestPulseInformation:
    @pytest.mark.unittest
    def test_envelope_registry(self):
        assert set(PulseEnvelope.available()) >= {
            "gaussian", "square", "cosine", "drag", "sech", "general",
        }
        with pytest.raises(ValueError):
            PulseEnvelope.get("bogus")

    @pytest.mark.unittest
    def test_param_counts(self):
        PulseInformation.set_envelope("gaussian")
        assert PulseInformation.num_params("RX") == 3
        assert PulseInformation.num_params("RZ") == 1
        assert PulseInformation.num_params("CZ") == 1
        # H = RZ + RY = 1 + 3
        assert PulseInformation.num_params("H") == 4
        # CX = H + CZ + H
        assert PulseInformation.num_params("CX") == 9
        PulseInformation.set_envelope("drag")
        assert PulseInformation.num_params("RX") == 4

    @pytest.mark.unittest
    def test_snapshot_restore(self):
        PulseInformation.set_envelope("gaussian", rwa=True)
        snap = PulseInformation.snapshot_state()
        old_rx = np.asarray(PulseInformation.RX.params).copy()

        PulseInformation.set_envelope("square", rwa=False, frame="lab")
        PulseInformation.RX.params = jnp.zeros_like(PulseInformation.RX.params)
        assert PulseInformation.get_envelope() == "square"
        assert not PulseInformation.get_rwa()

        PulseInformation.restore_state(snap)
        assert PulseInformation.get_envelope() == "gaussian"
        assert PulseInformation.get_rwa()
        assert np.allclose(np.asarray(PulseInformation.RX.params), old_rx)

    @pytest.mark.unittest
    def test_preserve_state_context(self):
        PulseInformation.set_envelope("gaussian")
        with PulseInformation.preserve_state():
            PulseInformation.set_envelope("sech")
            assert PulseInformation.get_envelope() == "sech"
        assert PulseInformation.get_envelope() == "gaussian"

    @pytest.mark.unittest
    def test_envelope_switch_evicts_solver_cache(self):
        PulseInformation.set_envelope("gaussian", rwa=True)
        with recording():
            PulseGates.RX(0.5, wires=0)
        assert len(Evolution._evolve_solver_cache) > 0
        PulseInformation.set_envelope("square")
        assert len(Evolution._evolve_solver_cache) == 0

    @pytest.mark.unittest
    def test_preserve_state_restores_after_exception(self):
        """preserve_state must roll back config AND leaf params when the
        body raises (ref tests/test_pulse_state.py:38-53)."""
        snap = PulseInformation.snapshot_state()
        with pytest.raises(RuntimeError, match="boom"):
            with PulseInformation.preserve_state():
                PulseInformation.set_envelope("gaussian", rwa=False, frame="lab")
                PulseInformation.RY.params = (
                    jnp.ones_like(PulseInformation.RY.params) * 0.456
                )
                raise RuntimeError("boom")
        assert PulseInformation.get_envelope() == snap.envelope
        assert PulseInformation.get_rwa() is snap.rwa
        assert PulseInformation.get_frame() == snap.frame
        assert np.allclose(
            np.asarray(PulseInformation.RY.params),
            np.asarray(snap.leaf_params["RY"]),
        )

    @pytest.mark.unittest
    def test_stale_solver_cache_does_not_contaminate_fidelity(self):
        """Switching envelopes must never serve a stale compiled solver for
        the new pulse shape (ref tests/test_pulse_state.py:68-113)."""
        # Prime the cache under one envelope...
        PulseInformation.set_envelope("gaussian", rwa=True)
        U1 = recorded_unitary(lambda: PulseGates.RX(np.pi / 4, wires=0), 1)
        assert len(Evolution._evolve_solver_cache) >= 1
        # ...switch shapes; stale gaussian programs must not be reused.
        PulseInformation.set_envelope("drag", rwa=True)
        assert len(Evolution._evolve_solver_cache) == 0
        U = recorded_unitary(lambda: PulseGates.RX(np.pi / 2, wires=0), 1)
        target = np.cos(np.pi / 4) * np.eye(2) - 1j * np.sin(np.pi / 4) * X
        assert gate_fidelity(U, target) > 0.99
        del U1

    @pytest.mark.unittest
    def test_pulse_params_tree(self):
        PulseInformation.set_envelope("gaussian")
        h = PulseInformation.H
        assert not h.is_leaf
        assert h.size == 4
        assert len(h.childs) == 2
        assert {leaf.name for leaf in h.leafs} <= {"RX", "RY", "RZ", "CZ"}
        parts = h.split_params(jnp.arange(4.0))
        assert len(parts) == 2
        with pytest.raises(AssertionError):
            PulseParams(name="bad")


class TestPulseStateIsolation:
    """Ordered pair validating the conftest autouse snapshot fixture
    (ref tests/test_pulse_state.py:56-66): a test may mutate global pulse
    state without restoring it, and the next test sees defaults again."""

    @pytest.mark.unittest
    def test_00_unrestored_mutation_allowed(self):
        PulseInformation.set_envelope("gaussian", rwa=False, frame="lab")
        PulseInformation.RX.params = (
            jnp.ones_like(PulseInformation.RX.params) * 0.789
        )
        assert PulseInformation.get_envelope() == "gaussian"
        assert PulseInformation.get_rwa() is False
        assert PulseInformation.get_frame() == "lab"

    @pytest.mark.unittest
    def test_01_autouse_fixture_restored_previous_mutation(self):
        assert PulseInformation.get_envelope() == PulseInformation.DEFAULT_ENVELOPE
        assert PulseInformation.get_rwa() is PulseInformation.DEFAULT_RWA
        assert PulseInformation.get_frame() == PulseInformation.DEFAULT_FRAME
        assert not np.allclose(
            np.asarray(PulseInformation.RX.params), 0.789
        )


class TestPulseModel:
    @pytest.mark.unittest
    def test_model_pulse_mode_matches_unitary(self):
        from qml_essentials_tpu.models.model import Model

        m = Model(
            n_qubits=2,
            n_layers=1,
            circuit_type="Circuit_1",
            data_reupload=False,
            pulse_shape="gaussian",
            random_seed=9,
        )
        x = jnp.array([0.4])
        exact = np.asarray(m(inputs=x))
        pulsed = np.asarray(m(inputs=x, gate_mode="pulse"))
        assert np.allclose(pulsed, exact, atol=0.05)

    @pytest.mark.smoketest
    def test_model_pulse_mode_entangling(self):
        from qml_essentials_tpu.models.model import Model

        m = Model(
            n_qubits=2,
            n_layers=1,
            circuit_type="Circuit_19",
            data_reupload=False,
            pulse_shape="gaussian",
        )
        out = np.asarray(m(inputs=jnp.array([0.3]), gate_mode="pulse"))
        assert np.all(np.isfinite(out))
