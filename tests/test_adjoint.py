"""Adjoint-state differentiation: equality with plain autodiff + param shift.

The adjoint path (ops/adjoint.py) reconstructs states in the backward sweep
by inverting unitary steps instead of saving residuals; these tests pin its
gradients against (a) plain autodiff with the adjoint disabled, (b) the
parameter-shift rule, across plan shapes: fused windows, diagonal gates,
scattered/ring-wrap supports, scheduled plans with rotation steps, and the
fused Pallas backward kernel in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qml_essentials_tpu.ops import adjoint, kernels, pallas_kernels, simulation
from qml_essentials_tpu.ops import operations as op
from qml_essentials_tpu.ops.tape import recording


@pytest.fixture(autouse=True)
def force_adjoint_mode():
    """These tests exercise the adjoint path explicitly: pin the backward
    strategy so the size-based "auto" mode cannot silently route small
    registers through plain autodiff (making the comparisons vacuous)."""
    simulation.set_backward_mode("adjoint")
    yield
    simulation.set_backward_mode("auto")


@pytest.fixture
def no_adjoint():
    adjoint.set_adjoint(False)
    yield
    adjoint.set_adjoint(True)


def _circuit_expval(theta, n):
    with recording() as tape:
        for q in range(n):
            op.RY(theta[q], wires=q)
        for q in range(n):
            op.CX(wires=[q, (q + 1) % n])
        op.H(wires=0)
        for q in range(n):
            op.RX(theta[q] * 0.7, wires=q)
    obs = [op.PauliZ(wires=q, record=False) for q in range(n)]
    return jnp.sum(simulation.simulate_and_measure(tape, n, "expval", obs, False))


class TestAdjointEquality:
    @pytest.mark.unittest
    @pytest.mark.parametrize("n", [2, 4, 6])
    def test_matches_autodiff(self, n):
        theta = jnp.linspace(0.1, 1.3, n)
        adjoint.set_adjoint(True)
        v1, g1 = jax.value_and_grad(_circuit_expval)(theta, n)
        adjoint.set_adjoint(False)
        try:
            v0, g0 = jax.value_and_grad(_circuit_expval)(theta, n)
        finally:
            adjoint.set_adjoint(True)
        assert np.allclose(v0, v1, atol=1e-6)
        assert np.allclose(g0, g1, atol=1e-5)

    @pytest.mark.unittest
    def test_matches_parameter_shift(self):
        """Adjoint gradient equals the exact parameter-shift rule."""
        n = 3

        def f(theta):
            with recording() as tape:
                op.RY(theta, wires=0)
                op.CX(wires=[0, 1])
                op.CX(wires=[1, 2])
            obs = [op.PauliZ(wires=2, record=False)]
            return simulation.simulate_and_measure(tape, n, "expval", obs, False)[0]

        theta = 0.37
        g = float(jax.grad(f)(theta))
        shift = np.pi / 2
        ps = (float(f(theta + shift)) - float(f(theta - shift))) / 2
        assert np.isclose(g, ps, atol=1e-6)

    @pytest.mark.unittest
    def test_diagonal_gate_gradient(self):
        """Diagonal payload cotangents (GolombEncoding-style gates)."""
        n = 3

        def f(x):
            with recording() as tape:
                for q in range(n):
                    op.H(wires=q)
                # dtype-explicit: x64 may be enabled process-wide by the
                # QOC module import when the full suite runs.
                phases = jnp.asarray(x, dtype=jnp.float32) * jnp.arange(
                    4, dtype=jnp.float32
                )
                op.DiagonalQubitUnitary(
                    jnp.exp(1j * phases.astype(jnp.complex64)), wires=[0, 2]
                )
                op.RY(0.4, wires=1)
            obs = [op.PauliX(wires=0, record=False)]
            return simulation.simulate_and_measure(tape, n, "expval", obs, False)[0]

        x = 0.53
        adjoint.set_adjoint(True)
        g1 = float(jax.grad(f)(x))
        adjoint.set_adjoint(False)
        try:
            g0 = float(jax.grad(f)(x))
        finally:
            adjoint.set_adjoint(True)
        assert np.isclose(g0, g1, atol=1e-5)

    @pytest.mark.unittest
    def test_vmap_of_grad(self):
        n = 4
        thetas = jnp.stack([jnp.linspace(0.1, 1.0, n), jnp.linspace(-0.5, 0.5, n)])
        adjoint.set_adjoint(True)
        g1 = jax.vmap(jax.grad(_circuit_expval), in_axes=(0, None))(thetas, n)
        adjoint.set_adjoint(False)
        try:
            g0 = jax.vmap(jax.grad(_circuit_expval), in_axes=(0, None))(thetas, n)
        finally:
            adjoint.set_adjoint(True)
        assert np.allclose(g0, g1, atol=1e-5)

    @pytest.mark.unittest
    def test_grad_through_model(self):
        """End-to-end: Model training-step gradient, adjoint vs autodiff."""
        from qml_essentials_tpu.models.model import Model

        model = Model(
            n_qubits=4, n_layers=2, circuit_type="Circuit_19", random_seed=5
        )
        x = jnp.array([0.42])

        def loss(params):
            return jnp.mean(model(params=params, inputs=x, force_mean=True))

        adjoint.set_adjoint(True)
        g1 = jax.grad(loss)(model.params)
        adjoint.set_adjoint(False)
        try:
            g0 = jax.grad(loss)(model.params)
        finally:
            adjoint.set_adjoint(True)
        assert np.allclose(g0, g1, atol=1e-5)


class TestScheduledPlan:
    @pytest.mark.unittest
    def test_rot_steps_forward_and_grad(self):
        """Manual plan with rotation steps: adjoint inverts them exactly."""
        n = 14
        theta = jnp.float32(0.81)

        def build(theta):
            g = op.RY(theta, wires=0, record=False)
            static = (("mat", (0,)), ("rot", 7), ("mat", (7,)), ("rot", 7))
            payloads = (
                jnp.stack([g.matrix.real, g.matrix.imag]),
                jnp.stack([g.matrix.real, g.matrix.imag]),
            )
            return static, payloads

        def f(theta):
            static, payloads = build(theta)
            psi2 = kernels.zero_state_ri(n)
            out = adjoint.execute_plan_ri(psi2, payloads, static, n)
            probs = out[0] ** 2 + out[1] ** 2
            # After rot by 7 (q -> q+7), physical position 7 holds logical
            # qubit 0, so the second payload acts on qubit 0 again.
            return kernels.reduce_diagonal_expectation(
                probs, [(1.0, -1.0)] + [None] * (n - 1)
            )

        # Reference: rotation semantics are q -> (q + r) % n, so after
        # rot 7 physical position 7 holds logical qubit 0 — the second
        # payload hits wire 0 again (RY(2*theta) on qubit 0 in total).
        def f_ref(theta):
            with recording() as tape:
                op.RY(theta, wires=0)
                op.RY(theta, wires=0)
            obs = [op.PauliZ(wires=0, record=False)]
            return simulation.simulate_and_measure(tape, n, "expval", obs, False)[0]

        # rot by 7 twice = rot by 14 = identity layout at the end.
        v, g = jax.value_and_grad(f)(theta)
        v_ref, g_ref = jax.value_and_grad(f_ref)(theta)
        assert np.isclose(float(v), float(v_ref), atol=1e-6)
        assert np.isclose(float(g), float(g_ref), atol=1e-5)


class TestPallasAdjointKernel:
    @pytest.mark.unittest
    def test_adjoint_step_matches_fallback(self):
        """Fused Pallas adjoint step (interpret mode) == XLA fallback."""
        n, a, k = 13, 2, 3
        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        psi2 = jax.random.normal(k1, (2, 2**n), dtype=jnp.float32)
        lam2 = jax.random.normal(k2, (2, 2**n), dtype=jnp.float32)
        m = jax.random.normal(k3, (2, 2**k, 2**k), dtype=jnp.float32)

        # Pin the f32-exact MXU mode: this test compares the fused kernel
        # against the HIGHEST-precision einsum fallback bit-tightly (the
        # split3 mode has its own tolerance test in test_pallas.py).
        prev_mode = pallas_kernels.PRECISION_MODE
        pallas_kernels.set_precision_mode("highest")
        try:
            pp, lp, gw = pallas_kernels.adjoint_step_ri(
                psi2, lam2, m, a, k, n, interpret=True
            )
        finally:
            pallas_kernels.PRECISION_MODE = prev_mode

        srt = list(range(a, a + k))
        wh = adjoint._conj_pair_mat(m)
        pp_ref = kernels.apply_matrix_pair_ri(psi2, wh, srt, n)
        gw_ref = adjoint._window_cotangent(lam2, pp_ref, srt, n)
        lp_ref = kernels.apply_matrix_pair_ri(lam2, wh, srt, n)

        assert np.allclose(pp, pp_ref, atol=1e-4)
        assert np.allclose(lp, lp_ref, atol=1e-4)
        assert np.allclose(gw, gw_ref, atol=1e-3)


class TestFallbacks:
    @pytest.mark.unittest
    def test_noise_routes_to_density_autodiff(self):
        """Channels force the density path; gradients still work."""
        n = 2

        def f(theta):
            with recording() as tape:
                op.RY(theta, wires=0)
                op.BitFlip(0.1, wires=0)
                op.CX(wires=[0, 1])
            obs = [op.PauliZ(wires=1, record=False)]
            return simulation.simulate_and_measure(tape, n, "expval", obs, True)[0]

        g = float(jax.grad(f)(0.3))
        eps = 1e-3
        fd = (float(f(0.3 + eps)) - float(f(0.3 - eps))) / (2 * eps)
        assert np.isclose(g, fd, atol=1e-3)

    @pytest.mark.unittest
    def test_normalize_plan_rejects_channels(self):
        from qml_essentials_tpu.ops.tape import recording as _rec

        with _rec():
            ch = op.BitFlip(0.1, wires=0)
        assert adjoint.normalize_plan([("op", ch, [0])], 2) is None


class TestCyclicRunAdjoint:
    @pytest.mark.unittest
    def test_wrap_gate_grad_matches_autodiff(self):
        """Ring-wrap supports ({n-1, 0}) take the rotate-both-arrays branch
        in the adjoint backward at n >= 14; gradient must match plain
        autodiff with the adjoint disabled."""
        n = 14
        theta = jnp.float32(0.63)

        def f(theta):
            with recording() as tape:
                for q in range(n):
                    op.RY(0.3 + 0.01 * q, wires=q)
                op.CRX(theta, wires=[n - 1, 0])  # ring wrap
            obs = [op.PauliZ(wires=0, record=False)]
            return simulation.simulate_and_measure(tape, n, "expval", obs, False)[0]

        v1, g1 = jax.value_and_grad(f)(theta)

        prev = adjoint.ENABLED
        adjoint.set_adjoint(False)
        try:
            v2, g2 = jax.value_and_grad(f)(theta)
        finally:
            adjoint.set_adjoint(prev)

        assert np.isclose(float(v1), float(v2), atol=1e-6)
        assert np.isclose(float(g1), float(g2), atol=1e-5), (float(g1), float(g2))


class TestRotFusedPlan:
    """rotmat/matrot plan steps: fallback execution + peephole fusion."""

    @pytest.mark.unittest
    def test_fused_steps_match_unfused_plan(self):
        """A plan with rotmat/matrot steps equals the unfused (rot, mat)
        sequence — value and gradients (state and window cotangents) — via
        the CPU fallback branches of the adjoint executor."""
        n = 10
        rng = np.random.default_rng(5)

        def unitary(k, seed):
            rng = np.random.default_rng(seed)
            m = rng.normal(size=(2**k, 2**k)) + 1j * rng.normal(size=(2**k, 2**k))
            q, _ = np.linalg.qr(m)
            return jnp.asarray(
                np.stack([q.real, q.imag]).astype(np.float32)
            )

        w1 = unitary(3, 11)
        w2 = unitary(3, 12)
        psi0 = rng.normal(size=(2, 2**n)).astype(np.float32)
        psi0 = jnp.asarray(psi0 / np.linalg.norm(psi0))

        # rot 3 then W1 on [0,3); W2 on [0,3) then rot 7 — net layout id.
        fused_static = (("rotmat", 3, (0, 1, 2)), ("matrot", 7, (0, 1, 2)))
        unfused_static = (
            ("rot", 3),
            ("mat", (0, 1, 2)),
            ("mat", (0, 1, 2)),
            ("rot", 7),
        )

        def f_fused(p, a, b):
            out = adjoint.execute_plan_ri(p, (a, b), fused_static, n)
            return jnp.sum(out[0] ** 2 * jnp.arange(2**n)) + jnp.sum(out[1])

        def f_unfused(p, a, b):
            out = adjoint.execute_plan_ri(p, (a, b), unfused_static, n)
            return jnp.sum(out[0] ** 2 * jnp.arange(2**n)) + jnp.sum(out[1])

        v1, g1 = jax.value_and_grad(f_fused, argnums=(0, 1, 2))(psi0, w1, w2)
        v2, g2 = jax.value_and_grad(f_unfused, argnums=(0, 1, 2))(psi0, w1, w2)
        assert np.isclose(float(v1), float(v2), atol=1e-5)
        for x, y in zip(g1, g2):
            assert float(jnp.abs(x - y).max()) < 1e-4

    @pytest.mark.unittest
    def test_peephole_fuses_both_patterns(self):
        """(rot 8, mat [0..8)) -> rotmat; (mat [0..8), rot 16) -> matrot."""
        n = 24
        W = jnp.eye(256, dtype=jnp.complex64)
        W5 = jnp.eye(512, dtype=jnp.complex64)
        steps = [
            ("rot", 8, []),
            ("mat", W, list(range(8))),
            ("mat", W5, list(range(7, 16))),
            ("mat", W, list(range(8))),
            ("rot", 16, []),
            ("mat", W5, list(range(8, 17))),
        ]
        fused = simulation.fuse_layout_rotations(steps, n)
        kinds = [s[0] for s in fused]
        assert kinds == ["rotmat", "mat", "matrot", "mat"]
        assert fused[0][1][0] == 8 and fused[0][2] == list(range(8))
        assert fused[2][1][0] == 16 and fused[2][2] == list(range(8))

    @pytest.mark.unittest
    def test_peephole_skips_ineligible(self):
        """Axis mismatches and sub-lane windows must not fuse."""
        n = 24
        W = jnp.eye(256, dtype=jnp.complex64)
        W64 = jnp.eye(64, dtype=jnp.complex64)
        steps = [
            ("rot", 8, []),
            ("mat", W, list(range(1, 9))),  # not on the rotated-in wires
            ("rot", 10, []),
            ("mat", W64, list(range(6))),  # K = 64 < lane tile
            ("mat", W, list(range(8))),
            ("rot", 8, []),  # k=8 != n-r=16: no matrot
        ]
        fused = simulation.fuse_layout_rotations(steps, n)
        assert [s[0] for s in fused] == [s[0] for s in steps]

    @pytest.mark.unittest
    def test_normalize_plan_carries_fused_steps(self):
        n = 24
        W = jnp.eye(256, dtype=jnp.complex64)
        plan = [
            ("rotmat", (8, W), list(range(8))),
            ("matrot", (16, W), list(range(8))),
        ]
        static, payloads = adjoint.normalize_plan(plan, n)
        assert static == (
            ("rotmat", 8, tuple(range(8))),
            ("matrot", 16, tuple(range(8))),
        )
        assert len(payloads) == 2 and payloads[0].shape == (2, 256, 256)


class TestBackwardModePolicy:
    @pytest.mark.unittest
    def test_mode_validation(self):
        with pytest.raises(ValueError):
            simulation.set_backward_mode("nope")
        simulation.set_backward_mode("auto")

    @pytest.mark.unittest
    def test_auto_prefers_autodiff_when_residuals_fit(self, monkeypatch):
        """Small registers route through plain autodiff (residuals are
        cheap), regardless of the adjoint being enabled."""
        monkeypatch.setattr(simulation, "BACKWARD_MODE", "auto")
        plan = [("mat", None, [0])] * 16
        assert simulation._adjoint_pays_off(plan, 6) is False

    @pytest.mark.unittest
    def test_auto_switches_to_adjoint_when_residuals_overflow(self, monkeypatch):
        from qml_essentials_tpu.core import memory

        monkeypatch.setattr(simulation, "BACKWARD_MODE", "auto")
        monkeypatch.setattr(memory, "available_memory_bytes", lambda: 1 << 30)
        plan = [("mat", None, [0])] * 16
        # 16 steps x 8 bytes x 2**24 = 2.1 GB > 0.35 x 1 GiB
        assert simulation._adjoint_pays_off(plan, 24) is True

    @pytest.mark.unittest
    def test_forced_modes(self, monkeypatch):
        monkeypatch.setattr(simulation, "BACKWARD_MODE", "adjoint")
        assert simulation._adjoint_pays_off([], 2) is True
        monkeypatch.setattr(simulation, "BACKWARD_MODE", "autodiff")
        assert simulation._adjoint_pays_off([("mat", None, [0])] * 99, 30) is False

    @pytest.mark.unittest
    def test_batch_extent_scales_residuals(self):
        """vmapped plan payloads multiply the residual estimate."""
        import jax

        seen = []

        def probe(theta):
            with recording() as tape:
                op.RY(theta, wires=0)
            plan = simulation.plan_contractions(tape, n_qubits=2)
            seen.append(simulation._batch_extent(plan))
            return theta

        jax.vmap(probe)(jnp.zeros(5))
        assert seen and seen[0] == 5

    @pytest.mark.unittest
    def test_autodiff_grads_match_adjoint(self):
        """The two strategies agree on the same circuit."""
        n = 4
        theta = jnp.linspace(0.2, 1.1, n)
        simulation.set_backward_mode("adjoint")
        try:
            v1, g1 = jax.value_and_grad(_circuit_expval)(theta, n)
            simulation.set_backward_mode("autodiff")
            v0, g0 = jax.value_and_grad(_circuit_expval)(theta, n)
        finally:
            simulation.set_backward_mode("auto")
        assert np.allclose(v0, v1, atol=1e-6)
        assert np.allclose(g0, g1, atol=1e-5)


class TestAutodiffFusedPath:
    """The plain-autodiff executor must use the fused rotmat/matrot
    kernels (single pass, fused custom VJP) whenever they are usable —
    value and gradient must match the unfused two-pass execution."""

    @pytest.mark.unittest
    def test_rotmat_branch_grads_match_reference(self, monkeypatch):
        n = 15
        monkeypatch.setattr(pallas_kernels, "ENABLED", True)
        monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_N", n)
        monkeypatch.setattr(pallas_kernels, "INTERPRET", True)
        monkeypatch.setattr(simulation, "BACKWARD_MODE", "autodiff")
        monkeypatch.setattr(simulation, "USE_CHAINS", False)
        assert pallas_kernels.rotmat_usable(8, n)
        assert pallas_kernels.matrot_usable(7, n)

        # Inject a scheduled plan with one rotmat and one matrot step whose
        # window matrices carry the traced parameter (net rotation
        # 8 + 7 = 15 = identity layout).
        theta_box = {}

        def fake_schedule(plan, nq):
            th = theta_box["theta"]
            g1 = op.RY(th, wires=0, record=False)
            w1 = simulation._compose_window(
                [op.H(wires=q, record=False) for q in range(8)]
                + [g1], 0, 8
            )[0]
            g2 = op.RZ(2.0 * th, wires=0, record=False)
            w2 = simulation._compose_window(
                [g2, op.H(wires=1, record=False)], 0, 8
            )[0]
            return [
                ("rotmat", (8, w1), list(range(8))),
                ("matrot", (7, w2), list(range(8))),
            ]

        monkeypatch.setattr(simulation, "schedule_layout", fake_schedule)

        def forward(theta):
            theta_box["theta"] = theta
            with recording() as tape:
                op.RY(0.1, wires=0)  # content irrelevant; plan is injected
            psi2 = simulation.simulate_pure_ri(tape, n)
            probs = psi2[0] ** 2 + psi2[1] ** 2
            half = probs.reshape(2, -1).sum(axis=1)
            return half[0] - half[1]

        theta0 = jnp.float32(0.37)
        val_p, grad_p = jax.value_and_grad(forward)(theta0)

        # Reference: same injected plan executed through the unfused
        # two-pass branch (fused kernels reported unusable).
        monkeypatch.setattr(pallas_kernels, "rotmat_usable", lambda r, nq: False)
        monkeypatch.setattr(pallas_kernels, "matrot_usable", lambda r, nq: False)
        val_r, grad_r = jax.value_and_grad(forward)(theta0)

        assert abs(float(val_p) - float(val_r)) < 5e-5
        assert abs(float(grad_p) - float(grad_r)) < 5e-4
