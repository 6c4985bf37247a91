"""Tests for the contraction kernels and simulation/measurement engine (L1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qml_essentials_tpu.ops.operations as op
from qml_essentials_tpu.ops import kernels, simulation
from qml_essentials_tpu.ops.tape import recording


def _dense_apply(psi, mat, wires, n):
    """Axis-move dense oracle: O(2**n * 4**k) — usable at n=14 where the
    full ``lift_matrix`` oracle (a 2**n x 2**n matmul) takes minutes."""
    t = np.asarray(psi).reshape((2,) * n)
    k = len(wires)
    t = np.moveaxis(t, list(wires), range(k))
    t = np.asarray(mat) @ t.reshape(2**k, -1)
    t = np.moveaxis(t.reshape((2,) * n), range(k), list(wires))
    return t.reshape(-1)


def _random_state(n, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    psi = jax.random.normal(k1, (2**n,)) + 1j * jax.random.normal(k2, (2**n,))
    return psi / jnp.linalg.norm(psi)


class TestKernels:
    @pytest.mark.unittest
    @pytest.mark.parametrize("n,wires", [
        (3, [0]), (3, [2]), (3, [0, 1]), (3, [2, 0]), (4, [1, 3]), (4, [3, 1, 0]),
    ])
    def test_apply_matrix_vs_dense(self, n, wires):
        k = len(wires)
        key = jax.random.PRNGKey(42)
        A = jax.random.normal(key, (2**k, 2**k)) + 1j * jax.random.normal(
            jax.random.PRNGKey(43), (2**k, 2**k)
        )
        psi = _random_state(n)
        out = kernels.apply_matrix(psi.reshape((2,) * n), A, wires).reshape(-1)
        dense = kernels.lift_matrix(A, wires, list(range(n)))
        assert np.allclose(np.asarray(out), np.asarray(dense @ psi), atol=1e-5)

    @pytest.mark.unittest
    @pytest.mark.parametrize("n,wires", [(3, [1]), (4, [0, 2]), (4, [3, 1])])
    def test_apply_diagonal_vs_dense(self, n, wires):
        k = len(wires)
        phases = jnp.exp(1j * jnp.arange(2**k).astype(jnp.float32))
        psi = _random_state(n, 7)
        out = kernels.apply_diagonal(psi.reshape((2,) * n), phases, wires).reshape(-1)
        dense = kernels.lift_matrix(jnp.diag(phases), wires, list(range(n)))
        assert np.allclose(np.asarray(out), np.asarray(dense @ psi), atol=1e-5)

    @pytest.mark.unittest
    def test_kraus_kernel_vs_loop(self):
        n = 3
        wires = [1, 2]
        ch_ops = op.DepolarizingChannel(0.3, wires=0).kraus_matrices()
        K2 = [jnp.kron(a, b) for a in ch_ops for b in ch_ops]  # 2-qubit Kraus set
        psi = _random_state(n, 3)
        rho = jnp.outer(psi, jnp.conj(psi))
        rho_t = rho.reshape((2,) * (2 * n))
        out = kernels.apply_kraus_to_density(rho_t, K2, wires, n).reshape(2**n, 2**n)

        expected = jnp.zeros_like(rho)
        for K in K2:
            KL = kernels.lift_matrix(K, wires, list(range(n)))
            expected = expected + KL @ rho @ jnp.conj(KL).T
        assert np.allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def bell_tape():
    with recording() as tape:
        op.H(wires=0)
        op.CX(wires=[0, 1])
    return tape


def ghz_tape(n):
    with recording() as tape:
        op.H(wires=0)
        for q in range(n - 1):
            op.CX(wires=[q, q + 1])
    return tape


class TestSimulate:
    @pytest.mark.unittest
    def test_bell_state(self):
        state = np.asarray(simulation.simulate_pure(bell_tape(), 2))
        isq = 1 / np.sqrt(2)
        assert np.allclose(state, [isq, 0, 0, isq], atol=1e-6)

    @pytest.mark.unittest
    @pytest.mark.parametrize("n", [2, 3, 5, 8])
    def test_ghz_state(self, n):
        state = np.asarray(simulation.simulate_pure(ghz_tape(n), n))
        expected = np.zeros(2**n, complex)
        expected[0] = expected[-1] = 1 / np.sqrt(2)
        assert np.allclose(state, expected, atol=1e-6)

    @pytest.mark.unittest
    @pytest.mark.parametrize("fuse", [0, 2, 4, 6, 8])
    def test_fusion_equivalence(self, fuse):
        """The fused plan must reproduce per-gate simulation exactly."""
        n = 5
        key = jax.random.PRNGKey(0)
        angles = jax.random.uniform(key, (3 * n,)) * 2 * np.pi
        with recording() as tape:
            for q in range(n):
                op.H(wires=q)
            for q in range(n):
                op.RX(angles[q], wires=q)
            for q in range(n - 1):
                op.CRX(angles[n + q], wires=[q, q + 1])
            for q in range(n):
                op.RZ(angles[2 * n + q], wires=q)
            op.CCX(wires=[0, 2, 4])

        baseline = simulation.set_fusion, simulation.FUSE_MAX_WIDTH
        try:
            simulation.set_fusion(1)
            ref = np.asarray(simulation.simulate_pure(tape, n))
            simulation.set_fusion(fuse)
            out = np.asarray(simulation.simulate_pure(tape, n))
        finally:
            simulation.set_fusion(5)
        assert np.allclose(out, ref, atol=1e-5)

    @pytest.mark.unittest
    def test_density_matches_outer_product(self):
        tape = ghz_tape(3)
        rho = np.asarray(
            simulation.simulate_and_measure(tape, 3, "density", [], use_density=True)
        )
        psi = np.asarray(simulation.simulate_pure(tape, 3))
        assert np.allclose(rho, np.outer(psi, psi.conj()), atol=1e-6)

    @pytest.mark.unittest
    def test_noisy_density_via_kraus(self):
        with recording() as tape:
            op.H(wires=0)
            op.BitFlip(0.5, wires=0)
        rho = np.asarray(simulation.simulate_mixed(tape, 1))
        # |+><+| is invariant under bit flip
        assert np.allclose(rho, 0.5 * np.ones((2, 2)), atol=1e-6)

        with recording() as tape:
            op.BitFlip(0.25, wires=0)
        rho = np.asarray(simulation.simulate_mixed(tape, 1))
        assert np.allclose(rho, np.diag([0.75, 0.25]), atol=1e-6)

    @pytest.mark.unittest
    def test_uses_density_detection(self):
        with recording() as tape:
            op.H(wires=0)
            op.PhaseFlip(0.1, wires=0)
        assert simulation.uses_density(tape, "expval")
        assert simulation.uses_density(bell_tape(), "density")
        assert not simulation.uses_density(bell_tape(), "expval")

    @pytest.mark.unittest
    def test_infer_n_qubits(self):
        assert simulation.infer_n_qubits(bell_tape(), []) == 2
        assert (
            simulation.infer_n_qubits(bell_tape(), [op.PauliZ(wires=5, record=False)])
            == 6
        )
        assert simulation.infer_n_qubits([], []) == 1


class TestMeasure:
    @pytest.mark.unittest
    def test_expval_z_analytic(self):
        theta = 0.9
        with recording() as tape:
            op.RX(theta, wires=0)
        obs = [op.PauliZ(wires=0, record=False)]
        out = simulation.simulate_and_measure(tape, 1, "expval", obs, False)
        assert np.isclose(float(out[0]), np.cos(theta), atol=1e-6)

    @pytest.mark.unittest
    def test_expval_multi_qubit_diag_fastpath_vs_general(self):
        n = 4
        with recording() as tape:
            for q in range(n):
                op.RY(0.3 * (q + 1), wires=q)
            for q in range(n - 1):
                op.CX(wires=[q, q + 1])
        state = simulation.simulate_pure(tape, n)

        from qml_essentials_tpu.core.jaqsi import build_parity_observable

        parity = build_parity_observable([0, 2, 3])
        fast = simulation.measure_state(state, n, "expval", [parity])
        # general path: force it by stripping the pauli label
        general_obs = op.Hermitian(parity.matrix, wires=parity.wires, record=False)
        general = simulation.measure_state(state, n, "expval", [general_obs])
        assert np.allclose(np.asarray(fast), np.asarray(general), atol=1e-5)

    @pytest.mark.unittest
    def test_expval_non_diagonal_observable(self):
        with recording() as tape:
            op.H(wires=0)
        obs = [op.PauliX(wires=0, record=False)]
        out = simulation.simulate_and_measure(tape, 1, "expval", obs, False)
        assert np.isclose(float(out[0]), 1.0, atol=1e-6)

    @pytest.mark.unittest
    def test_probs_and_state_paths(self):
        tape = bell_tape()
        probs = np.asarray(
            simulation.simulate_and_measure(tape, 2, "probs", [], False)
        )
        assert np.allclose(probs, [0.5, 0, 0, 0.5], atol=1e-6)

        rho_probs = np.asarray(
            simulation.measure_density(
                simulation.simulate_and_measure(tape, 2, "density", [], True),
                2,
                "probs",
                [],
            )
        )
        assert np.allclose(rho_probs, probs, atol=1e-6)

    @pytest.mark.unittest
    def test_density_expval(self):
        with recording() as tape:
            op.RX(0.7, wires=0)
            op.DepolarizingChannel(0.1, wires=0)
        obs = [op.PauliZ(wires=0, record=False)]
        out = simulation.simulate_and_measure(tape, 1, "expval", obs, True)
        # depolarizing shrinks <Z> by (1 - 4p/3)
        assert np.isclose(float(out[0]), np.cos(0.7) * (1 - 4 * 0.1 / 3), atol=1e-5)

    @pytest.mark.unittest
    def test_measure_errors(self):
        state = simulation.simulate_pure(bell_tape(), 2)
        with pytest.raises(ValueError):
            simulation.measure_state(state, 2, "nonsense", [])
        rho = jnp.outer(state, state.conj())
        with pytest.raises(ValueError):
            simulation.measure_density(rho, 2, "state", [])


class TestShots:
    @pytest.mark.unittest
    def test_shot_probs_statistics(self):
        tape = bell_tape()
        key = jax.random.PRNGKey(1234)
        out = np.asarray(
            simulation.simulate_and_measure(
                tape, 2, "probs", [], False, shots=20000, key=key
            )
        )
        assert np.allclose(out, [0.5, 0, 0, 0.5], atol=0.02)
        assert np.isclose(out.sum(), 1.0, atol=1e-6)

    @pytest.mark.unittest
    def test_shot_expval_statistics(self):
        theta = 1.1
        with recording() as tape:
            op.RX(theta, wires=0)
        obs = [op.PauliZ(wires=0, record=False)]
        out = simulation.simulate_and_measure(
            tape, 1, "expval", obs, False, shots=40000, key=jax.random.PRNGKey(7)
        )
        assert np.isclose(float(out[0]), np.cos(theta), atol=0.02)

    @pytest.mark.unittest
    def test_shot_errors(self):
        with pytest.raises(ValueError):
            simulation.sample_shots(
                jnp.array([1.0, 0.0]), 1, "state", [], 10, jax.random.PRNGKey(0)
            )


class TestGradients:
    @pytest.mark.unittest
    def test_grad_through_simulation(self):
        def expval(theta):
            with recording() as tape:
                op.RX(theta, wires=0)
            obs = [op.PauliZ(wires=0, record=False)]
            return simulation.simulate_and_measure(tape, 1, "expval", obs, False)[0]

        g = jax.grad(expval)(0.4)
        assert np.isclose(float(g), -np.sin(0.4), atol=1e-5)

    @pytest.mark.unittest
    def test_parameter_shift_equals_autodiff(self):
        n = 3

        def expval(theta):
            with recording() as tape:
                for q in range(n):
                    op.RY(theta * (q + 1), wires=q)
                for q in range(n - 1):
                    op.CX(wires=[q, q + 1])
            obs = [op.PauliZ(wires=n - 1, record=False)]
            return simulation.simulate_and_measure(tape, n, "expval", obs, False)[0]

        theta = 0.37
        auto = float(jax.grad(expval)(theta))
        # parameter-shift on the aggregate angle (finite difference check)
        eps = 1e-3
        fd = (float(expval(theta + eps)) - float(expval(theta - eps))) / (2 * eps)
        assert np.isclose(auto, fd, atol=1e-3)


class TestKernelRegressions:
    @pytest.mark.unittest
    @pytest.mark.parametrize("n,wires", [
        (3, [2]), (3, [1, 2]), (3, [2, 0]), (3, [2, 1]), (4, [3, 2]),
        (4, [1, 3, 2]), (5, [4]), (5, [4, 0]),
    ])
    def test_apply_matrix_flat_vs_dense(self, n, wires):
        """Regression: trailing-qubit gates and permuted wire orders."""
        k = len(wires)
        key = jax.random.PRNGKey(5)
        A = jax.random.normal(key, (2**k, 2**k)) + 1j * jax.random.normal(
            jax.random.PRNGKey(6), (2**k, 2**k)
        )
        psi = _random_state(n, 11)
        out = kernels.apply_matrix_flat(psi, A, wires, n)
        dense = kernels.lift_matrix(A, wires, list(range(n)))
        assert np.allclose(np.asarray(out), np.asarray(dense @ psi), atol=1e-5)

    @pytest.mark.unittest
    def test_lift_matrix_non_involutive_permutation(self):
        """Regression: RY on the last wire of 3 (perm [1,2,0] is not its own
        inverse and exposed a convention mix-up)."""
        g = op.RY(0.7, wires=2, record=False)
        lifted = np.asarray(kernels.lift_matrix(g.matrix, [2], [0, 1, 2]))
        expected = np.kron(np.eye(4), np.asarray(g.matrix))
        assert np.allclose(lifted, expected, atol=1e-6)

    @pytest.mark.unittest
    def test_gate_by_gate_matches_dense_circuit(self):
        n = 5
        key = jax.random.PRNGKey(0)
        angles = np.asarray(jax.random.uniform(key, (2 * n,)) * np.pi)
        with recording() as tape:
            for q in range(n):
                op.RY(angles[q], wires=q)
            for q in range(n - 1):
                op.CX(wires=[q, q + 1])
            for q in range(n):
                op.RX(angles[n + q], wires=q)
        U = np.eye(2**n, dtype=complex)
        for g in tape:
            U = np.asarray(kernels.lift_matrix(g.matrix, g.wires, list(range(n)))) @ U
        psi = kernels.zero_state(n)
        for g in tape:
            psi = g.apply_to_state(psi, n)
        assert np.allclose(np.asarray(psi), U[:, 0], atol=1e-5)

    @pytest.mark.unittest
    def test_marginal_probs_on(self):
        n = 4
        probs = np.abs(np.asarray(_random_state(n, 2))) ** 2
        marg = np.asarray(kernels.marginal_probs_on(jnp.asarray(probs), [1, 3], n))
        t = probs.reshape((2,) * n)
        expected = t.sum(axis=(0, 2)).reshape(-1)
        assert np.allclose(marg, expected, atol=1e-6)

    @pytest.mark.unittest
    def test_reduce_diagonal_expectation(self):
        n = 3
        probs = np.abs(np.asarray(_random_state(n, 9))) ** 2
        # <Z0 * Z2>
        weights = [(1.0, -1.0), None, (1.0, -1.0)]
        val = float(kernels.reduce_diagonal_expectation(jnp.asarray(probs), weights))
        signs = np.array([(-1) ** (((i >> 2) & 1) + (i & 1)) for i in range(8)])
        assert np.isclose(val, float(probs @ signs), atol=1e-6)

    @pytest.mark.unittest
    def test_ring_wrap_cyclic_rotation_path(self):
        """Ring-wrap supports (e.g. {n-1, 0}) route through a cyclic qubit
        rotation at n >= 14; result must match the dense lift exactly."""
        n = 14
        psi = _random_state(n, 3)
        for wires in ([n - 1, 0], [0, n - 1], [n - 2, n - 1, 0]):
            k = len(wires)
            key = jax.random.PRNGKey(k)
            m = jax.random.normal(key, (2**k, 2**k, 2))
            q, _ = np.linalg.qr(np.asarray(m[..., 0]) + 1j * np.asarray(m[..., 1]))
            mat = jnp.asarray(q)
            assert kernels._cyclic_run(sorted(wires), n) is not None
            ref = _dense_apply(psi, mat, wires, n)
            got = np.asarray(kernels.apply_matrix_flat(psi, mat, wires, n))
            got_ri = np.asarray(
                kernels.from_ri(
                    kernels.apply_matrix_flat_ri(kernels.to_ri(psi), mat, wires, n)
                )
            )
            assert np.allclose(got, ref, atol=1e-5)
            assert np.allclose(got_ri, ref, atol=1e-5)

    @pytest.mark.unittest
    def test_half_marginal_expval_path(self):
        """Many single-qubit observables on n >= 8 use shared half-register
        marginals; values must match per-observable full folds."""
        n = 9
        psi = _random_state(n, 5)
        probs = jnp.abs(psi) ** 2
        obs = [op.PauliZ(wires=q) for q in range(n)]
        diags = [np.array([1.0, -1.0])] * n
        vals = np.asarray(simulation._expval_from_probs(probs, n, obs, diags))
        for q in range(n):
            weights = [None] * n
            weights[q] = (1.0, -1.0)
            ref = float(kernels.reduce_diagonal_expectation(probs, weights))
            assert np.isclose(vals[q], ref, atol=1e-6), q

    @pytest.mark.unittest
    def test_top_of_register_recenter_path(self):
        """Contiguous supports near the top qubits (minor dim < 128) are
        recentered via cyclic rotation; results must match the dense lift."""
        n = 14
        psi = _random_state(n, 11)
        cases = [[n - 1], [n - 2, n - 1], [n - 4, n - 3, n - 2, n - 1]]
        for wires in cases:
            k = len(wires)
            a = wires[0]
            assert kernels._recenter_rotation(a, k, n) is not None
            key = jax.random.PRNGKey(a)
            mr = jax.random.normal(key, (2**k, 2**k, 2))
            q, _ = np.linalg.qr(np.asarray(mr[..., 0]) + 1j * np.asarray(mr[..., 1]))
            mat = jnp.asarray(q)
            ref = _dense_apply(psi, mat, wires, n)
            got = np.asarray(
                kernels.from_ri(
                    kernels.apply_matrix_flat_ri(kernels.to_ri(psi), mat, wires, n)
                )
            )
            assert np.allclose(got, ref, atol=1e-5), wires

    @pytest.mark.unittest
    def test_matmul_precision_knob(self):
        """Precision setting accepts all documented names and round-trips."""
        import jax as _jax

        for name in ("default", "high", "highest", "float32", "bfloat16"):
            kernels.set_matmul_precision(name)
        kernels.set_matmul_precision("highest")
        assert kernels._PRECISION == _jax.lax.Precision.HIGHEST
        with pytest.raises(KeyError):
            kernels.set_matmul_precision("fp8")

    @pytest.mark.unittest
    def test_schedule_layout_equivalence(self):
        """The DP layout schedule (large-state regime) must reproduce the
        raw plan's state exactly, with all rotations in the friendly band."""
        n = 14
        key = jax.random.PRNGKey(4)
        angles = np.asarray(jax.random.uniform(key, (3 * n,)) * np.pi)
        with recording() as tape:
            for q in range(n):
                op.RY(angles[q], wires=q)
            for q in range(n):
                op.CRX(angles[n + q], wires=[q, (q + 1) % n])
            for q in range(n):
                op.RZ(angles[2 * n + q], wires=q)
        plan = simulation.plan_contractions(tape, n_qubits=n)
        sched = simulation.schedule_layout(plan, n)
        rots = [p for k_, p, w in sched if k_ == "rot"]
        assert rots, "ring circuit at n=14 must schedule rotations"
        assert all(7 <= r <= n - 7 for r in rots)

        def run(steps):
            psi2 = kernels.zero_state_ri(n)
            for kind, payload, wires in steps:
                if kind == "mat":
                    psi2 = kernels.apply_matrix_flat_ri(psi2, payload, wires, n)
                elif kind == "rot":
                    psi2 = kernels._rotate_qubits_ri(psi2, payload, n)
                elif kind == "diag":
                    psi2 = kernels.apply_diagonal_flat_ri(psi2, payload, wires, n)
                else:
                    psi2 = payload.apply_to_state_ri(psi2, n)
            return np.asarray(kernels.from_ri(psi2))

        assert np.allclose(run(sched), run(plan), atol=1e-5)

    @pytest.mark.unittest
    def test_randomized_dispatch_matrix(self):
        """Randomized sweep over every kernel dispatch path: contiguous,
        recentered, cyclic ring-wrap, scattered, unrolled k<=2 — all must
        match the dense lift."""
        n = 14
        rng = np.random.default_rng(42)
        psi = _random_state(n, 21)
        cases = []
        cases += [[q] for q in (0, 6, n - 1)]                      # k=1 all regions
        cases += [[q, q + 1] for q in (0, 6, n - 2)]               # k=2 contiguous
        cases += [[n - 1, 0], [n - 2, n - 1, 0, 1]]                # ring wrap
        cases += [[1, 5], [0, 4, 9], [2, 7, n - 1]]                # scattered
        cases += [list(range(s, s + 5)) for s in (0, 5, n - 5)]    # k=5 windows
        cases += [[3, 1], [n - 1, 2]]                              # unsorted
        for wires in cases:
            k = len(wires)
            m = rng.normal(size=(2**k, 2**k)) + 1j * rng.normal(size=(2**k, 2**k))
            q_, _ = np.linalg.qr(m)
            mat = jnp.asarray(q_.astype(np.complex64))
            ref = _dense_apply(psi, mat, wires, n)
            got = np.asarray(
                kernels.from_ri(
                    kernels.apply_matrix_flat_ri(kernels.to_ri(psi), mat, wires, n)
                )
            )
            assert np.allclose(got, ref, atol=2e-5), wires


class TestRefuseWindows:
    """Post-layout window re-fusion (simulation.refuse_windows)."""

    @staticmethod
    def _mat(k, seed):
        rng = np.random.default_rng(seed)
        m = rng.normal(size=(2**k, 2**k)) + 1j * rng.normal(size=(2**k, 2**k))
        q, _ = np.linalg.qr(m)
        return jnp.asarray(q.astype(np.complex64))

    def _run(self, steps, n):
        psi2 = kernels.zero_state_ri(n)
        psi2 = kernels.apply_matrix_flat_ri(
            psi2, self._mat(1, 99), [0], n
        )  # leave |0...0> so windows act non-trivially
        for kind, payload, wires in steps:
            if kind == "mat":
                psi2 = kernels.apply_matrix_flat_ri(psi2, payload, wires, n)
            elif kind == "rot":
                psi2 = kernels._rotate_qubits_ri(psi2, payload, n)
            else:
                psi2 = kernels.apply_diagonal_flat_ri(psi2, payload, wires, n)
        return np.asarray(kernels.from_ri(psi2))

    @pytest.mark.unittest
    def test_adjacent_merge_and_equivalence(self):
        """[0..7] then [7,8] merges into one K=512 window on [0..8]."""
        n = 17
        steps = [
            ("mat", self._mat(8, 1), list(range(0, 8))),
            ("mat", self._mat(2, 2), [7, 8]),
        ]
        fused = simulation.refuse_windows(steps, n)
        assert len(fused) == 1 and fused[0][2] == list(range(0, 9))
        assert np.allclose(self._run(fused, n), self._run(steps, n), atol=2e-5)

    @pytest.mark.unittest
    def test_hop_over_disjoint_step(self):
        """A mat may hop backwards over a support-disjoint step to merge."""
        n = 17
        steps = [
            ("mat", self._mat(8, 3), list(range(0, 8))),
            ("mat", self._mat(1, 4), [12]),
            ("mat", self._mat(2, 5), [7, 8]),
        ]
        fused = simulation.refuse_windows(steps, n)
        assert len(fused) == 2
        assert fused[0][2] == list(range(0, 9))
        assert np.allclose(self._run(fused, n), self._run(steps, n), atol=2e-5)

    @pytest.mark.unittest
    def test_rotation_is_barrier(self):
        n = 17
        steps = [
            ("mat", self._mat(8, 6), list(range(0, 8))),
            ("rot", 8, []),
            ("mat", self._mat(2, 7), [7, 8]),
        ]
        assert len(simulation.refuse_windows(steps, n)) == 3

    @pytest.mark.unittest
    def test_chain_merge_is_order_valid(self):
        """Disjoint-adjacent mats chain-merge into one window; the composed
        matrix preserves application order exactly."""
        n = 17
        steps = [
            ("mat", self._mat(8, 8), list(range(0, 8))),
            ("mat", self._mat(1, 9), [8]),
            ("mat", self._mat(2, 10), [7, 8]),
        ]
        fused = simulation.refuse_windows(steps, n)
        assert len(fused) == 1 and fused[0][2] == list(range(0, 9))
        assert np.allclose(self._run(fused, n), self._run(steps, n), atol=2e-5)

    @pytest.mark.unittest
    def test_support_conflict_blocks_hop(self):
        """A non-mat step sharing support stops the backward hop."""
        n = 17
        dvals = jnp.exp(1j * jnp.asarray([0.3, 1.1]))
        steps = [
            ("mat", self._mat(8, 13), list(range(0, 8))),
            ("diag", dvals, [8]),
            ("mat", self._mat(2, 14), [7, 8]),
        ]
        fused = simulation.refuse_windows(steps, n)
        assert len(fused) == 3
        assert np.allclose(self._run(fused, n), self._run(steps, n), atol=2e-5)

    @pytest.mark.unittest
    def test_geometry_gate_blocks_small_minor(self):
        """No merge when the union window's minor block drops below a lane."""
        n = 14  # lo=0, span=9 -> B = 2**5 < 128
        steps = [
            ("mat", self._mat(8, 11), list(range(0, 8))),
            ("mat", self._mat(2, 12), [7, 8]),
        ]
        assert len(simulation.refuse_windows(steps, n)) == 2

    @pytest.mark.unittest
    def test_24q_plan_step_count_drops(self):
        """The 24q Circuit_19 motif re-fuses: fewer mats than the raw
        schedule, same rotation count."""
        from qml_essentials_tpu.models.model import Model

        m = Model(n_qubits=24, n_layers=2, circuit_type="Circuit_19",
                  data_reupload=True, random_seed=7)
        with recording() as tape:
            m._variational(
                m.params[0] if m.params.ndim == 3 else m.params,
                jnp.array([0.3]),
            )
        plan = simulation.plan_contractions(tape, n_qubits=24)
        sched = simulation.schedule_layout(plan, 24)
        mats = [s for s in sched if s[0] == "mat"]
        assert len(mats) <= 18, [s[2] for s in mats]
        # every merged window stays kernel-eligible
        for _, _, wires in mats:
            lo, span = min(wires), len(wires)
            assert wires == list(range(lo, lo + span))
            assert 2**span <= 2**simulation.REFUSE_MAX_WIDTH


class TestDiagonalRealGuard:
    @pytest.mark.unittest
    def test_instance_matrix_overrides_class_diagonal(self):
        """A diagonal-classed observable with a non-diagonal *instance*
        matrix must NOT take the class fast path (regression: the fast path
        used to read ``obs.__class__._matrix`` unconditionally)."""
        n = 2
        with recording() as tape:
            op.H(wires=0)
        # PauliZ instance overridden to measure X: <+|X|+> = 1, <+|Z|+> = 0.
        x_as_z = op.PauliZ(
            wires=0, matrix=jnp.array([[0, 1], [1, 0]], dtype=jnp.complex64),
            record=False,
        )
        out = simulation.simulate_and_measure(
            tape, n, "expval", [x_as_z], use_density=False
        )
        assert np.allclose(np.asarray(out), [1.0], atol=1e-6)

    @pytest.mark.unittest
    def test_plain_class_diagonal_still_fast(self):
        """An unmodified PauliZ still resolves a concrete diagonal."""
        d = simulation._diagonal_real(op.PauliZ(wires=0, record=False))
        assert d is not None and np.allclose(d, [1.0, -1.0])


def _noisy_tape(n, seed=0):
    """A representative noisy tape: rotations, entanglers, channels."""
    rng = np.random.default_rng(seed)
    with recording() as tape:
        for w in range(n):
            op.H(wires=w)
            op.RX(float(rng.uniform(0, np.pi)), wires=w)
        for w in range(n - 1):
            op.CX(wires=[w, w + 1])
            op.BitFlip(0.05, wires=w)
        op.RZ(0.3, wires=0)
        op.DepolarizingChannel(0.02, wires=n - 1)
        op.AmplitudeDamping(0.1, wires=1)
    return tape


class TestInterleavedDensity:
    """The interleaved doubled-register density engine vs the ket-bra path."""

    @pytest.mark.unittest
    @pytest.mark.parametrize("n", [2, 3, 5])
    def test_density_matches_ketbra_path(self, n):
        tape = _noisy_tape(n)
        dtape = simulation._lower_interleaved_tape(tape, n)
        assert dtape is not None
        rho_il = simulation._simulate_interleaved_ri(dtape, 2 * n)
        rho_kb = simulation._deinterleave_ri(rho_il, n)
        ref = simulation.simulate_mixed_ri(tape, n)
        assert np.allclose(np.asarray(rho_kb), np.asarray(ref), atol=1e-6)

    @pytest.mark.unittest
    def test_pair_diag_matches_matrix_diagonal(self):
        n = 4
        tape = _noisy_tape(n, seed=3)
        dtape = simulation._lower_interleaved_tape(tape, n)
        rho_il = simulation._simulate_interleaved_ri(dtape, 2 * n)
        probs = np.asarray(simulation._pair_diag(rho_il[0], n))
        rho = np.asarray(
            kernels.from_ri(simulation.simulate_mixed_ri(tape, n))
        ).reshape(2**n, 2**n)
        assert np.allclose(probs, np.real(np.diagonal(rho)), atol=1e-6)
        assert np.isclose(probs.sum(), 1.0, atol=1e-5)

    @pytest.mark.unittest
    def test_simulate_and_measure_routes_interleaved(self):
        """expval/probs/density through simulate_and_measure on a noisy tape
        agree with the explicit ket-bra reference."""
        n = 3
        obs = [op.PauliZ(wires=w, record=False) for w in range(n)]
        rho_ref = np.asarray(
            kernels.from_ri(simulation.simulate_mixed_ri(_noisy_tape(n), n))
        ).reshape(2**n, 2**n)
        for typ, expect in (
            ("expval", np.real(np.einsum("oij,ji->o", np.stack([
                np.asarray(ob.lifted_matrix(n)) for ob in obs
            ]), rho_ref))),
            ("probs", np.real(np.diagonal(rho_ref))),
            ("density", rho_ref),
        ):
            got = np.asarray(
                simulation.simulate_and_measure(
                    _noisy_tape(n), n, typ, obs, use_density=True
                )
            )
            assert np.allclose(got, expect, atol=1e-6), typ

    @pytest.mark.unittest
    def test_general_hermitian_obs_deinterleaves(self):
        n = 3
        rng = np.random.default_rng(5)
        a = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
        herm = op.Hermitian(jnp.asarray((a + a.conj().T) / 2), wires=[0, 2],
                            record=False)
        rho_ref = np.asarray(
            kernels.from_ri(simulation.simulate_mixed_ri(_noisy_tape(n), n))
        ).reshape(2**n, 2**n)
        expect = np.real(
            np.trace(np.asarray(herm.lifted_matrix(n)) @ rho_ref)
        )
        got = np.asarray(
            simulation.simulate_and_measure(
                _noisy_tape(n), n, "expval", [herm], use_density=True
            )
        )
        assert np.allclose(got, [expect], atol=1e-6)

    @pytest.mark.unittest
    def test_gradient_through_interleaved_engine(self):
        """d<Z>/dtheta through the noisy density path matches finite diff."""
        n = 2

        def f(theta):
            with recording() as tape:
                op.RX(theta, wires=0)
                op.BitFlip(0.1, wires=0)
                op.CX(wires=[0, 1])
            out = simulation.simulate_and_measure(
                tape, n, "expval",
                [op.PauliZ(wires=0, record=False)], use_density=True,
            )
            return out[0]

        theta = jnp.float32(0.7)
        g = float(jax.grad(f)(theta))
        eps = 1e-3
        fd = (float(f(theta + eps)) - float(f(theta - eps))) / (2 * eps)
        assert np.isclose(g, fd, atol=1e-3)

    @pytest.mark.unittest
    def test_wide_diagonal_falls_back(self):
        """A diagonal wider than the doubling cap forces the ket-bra path
        (lowering returns None) and the measured result is still exact."""
        n = simulation._DOUBLE_DIAG_MAX_WIRES + 1
        d = jnp.exp(1j * jnp.linspace(0.0, 1.0, 2**n))
        with recording() as tape:
            for w in range(n):
                op.H(wires=w)
            op.DiagonalQubitUnitary(d, wires=list(range(n)))
            op.BitFlip(0.05, wires=0)
        assert simulation._lower_interleaved_tape(tape, n) is None
        out = np.asarray(
            simulation.simulate_and_measure(
                tape, n, "probs", [], use_density=True
            )
        )
        assert np.isclose(out.sum(), 1.0, atol=1e-5)

    @pytest.mark.unittest
    def test_shots_from_interleaved_probs(self):
        n = 3
        exact = np.asarray(
            simulation.simulate_and_measure(
                _noisy_tape(n), n, "probs", [], use_density=True
            )
        )
        est = np.asarray(
            simulation.simulate_and_measure(
                _noisy_tape(n), n, "probs", [], use_density=True,
                shots=200_000, key=jax.random.PRNGKey(0),
            )
        )
        assert np.isclose(est.sum(), 1.0, atol=1e-6)
        assert np.abs(est - exact).max() < 0.01
