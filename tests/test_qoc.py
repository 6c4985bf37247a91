"""Tests for the QOC pulse-synthesis stack (small budgets; end-to-end)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qml_essentials_tpu.pulse.qoc import (
    QOC,
    Cost,
    CostFnRegistry,
    _sample_rotation_angles,
    evolution_time_cost_fn,
    profile_pulse_pipeline,
    pulse_width_cost_fn,
    spectral_density_cost_fn,
)


@pytest.fixture(autouse=True)
def x64_off_after():
    # qoc enables x64 at import; keep the rest of the suite in f32.
    yield
    jax.config.update("jax_enable_x64", False)


def make_qoc(tmp_path, **overrides):
    defaults = dict(
        envelope="gaussian",
        cost_fns=[("unitary", (0.5, 0.5))],
        t_target=0.5,
        n_steps=10,
        n_samples=3,
        learning_rate=1e-3,
        log_interval=5,
        file_dir=str(tmp_path),
        n_restarts=1,
        scan_steps=0,
        random_seed=7,
    )
    defaults.update(overrides)
    jax.config.update("jax_enable_x64", True)
    return QOC(**defaults)


class TestCostPrimitives:
    @pytest.mark.unittest
    def test_sample_rotation_angles(self):
        ws = np.asarray(_sample_rotation_angles(9))
        assert len(ws) == 9
        assert np.all((0 <= ws) & (ws < 2 * np.pi))
        assert len(np.asarray(_sample_rotation_angles(1))) == 1

    @pytest.mark.unittest
    def test_cost_composition(self):
        c1 = Cost(lambda p: (p[0], p[0] * 2), weight=(0.5, 0.25))
        assert np.isclose(float(c1(jnp.array([2.0]))), 2.0)
        c2 = Cost(lambda p: p[0], weight=2.0)
        combined = c2 + c1
        assert np.isclose(float(combined(jnp.array([2.0]))), 6.0)
        with pytest.raises(TypeError):
            c2 + 5

    @pytest.mark.unittest
    def test_registry(self):
        assert set(CostFnRegistry.available()) >= {
            "fidelity", "unitary", "pulse_width", "evolution_time",
            "spectral_density",
        }
        with pytest.raises(ValueError):
            CostFnRegistry.get("bogus")
        name, w = CostFnRegistry.parse_cost_arg("unitary:0.7,0.3")
        assert name == "unitary" and w == (0.7, 0.3)
        name, w = CostFnRegistry.parse_cost_arg("pulse_width")
        assert w == 1.0
        with pytest.raises(ValueError):
            CostFnRegistry.parse_cost_arg("unitary:0.5")

    @pytest.mark.unittest
    def test_aux_cost_fns(self):
        jax.config.update("jax_enable_x64", True)
        pp = jnp.array([1.0, 0.5, 2.0])
        assert np.isclose(float(pulse_width_cost_fn(pp, "gaussian")), 0.5)
        assert np.isclose(float(evolution_time_cost_fn(pp, 1.0)), 1.0)
        sd_narrow = float(spectral_density_cost_fn(
            jnp.array([1.0, 0.8, 4.0]), "gaussian"))
        sd_wide = float(spectral_density_cost_fn(
            jnp.array([1.0, 0.05, 4.0]), "gaussian"))
        assert sd_wide > sd_narrow  # narrower pulse -> wider spectrum


class TestQOCEndToEnd:
    @pytest.mark.unittest
    def test_weights_must_sum_to_one(self, tmp_path):
        with pytest.raises(AssertionError):
            make_qoc(tmp_path, cost_fns=[("unitary", (0.5, 0.4))])

    @pytest.mark.unittest
    def test_log_space_roundtrip(self, tmp_path):
        qoc = make_qoc(tmp_path)
        p = jnp.array([2.0, 0.5, 1.5])
        back = qoc._from_log_space(qoc._to_log_space(p))
        assert np.allclose(np.asarray(back), np.asarray(p), atol=1e-6)

    @pytest.mark.unittest
    def test_scan_grid_shapes(self, tmp_path):
        qoc = make_qoc(tmp_path, scan_grid_size=3)
        grid, axes = qoc._build_scan_grid(2, init_pulse_params=jnp.array([1.0, 2.0]))
        assert grid.shape == (9, 2)
        assert len(axes) == 2

    @pytest.mark.unittest
    def test_optimize_rx_improves(self, tmp_path):
        qoc = make_qoc(tmp_path, n_steps=15, learning_rate=5e-3)
        opt = qoc.optimize(wires=1)
        # Start slightly off the calibrated optimum.
        from qml_essentials_tpu.pulse.pulses import PulseInformation

        init = PulseInformation.gate_by_name("RX").params * 1.15
        best_params, history = opt(qoc.create_RX)(init_pulse_params=init)
        assert len(history) == 16
        assert float(min(history[1:])) <= float(history[0]) + 1e-9
        # Results persisted
        assert os.path.isfile(os.path.join(str(tmp_path),
                                           "qoc_results_gaussian.csv"))

    @pytest.mark.unittest
    def test_multi_restart_path(self, tmp_path):
        qoc = make_qoc(tmp_path, n_restarts=3, n_steps=5,
                       restart_noise_scale=0.02)
        opt = qoc.optimize(wires=1)
        best_params, history = opt(qoc.create_RZ)()
        assert np.all(np.isfinite(np.asarray(best_params)))

    @pytest.mark.unittest
    def test_stage0_grid_scan(self, tmp_path):
        qoc = make_qoc(tmp_path, scan_steps=2, scan_grid_size=2, n_steps=3)
        from qml_essentials_tpu.pulse.pulses import PulseInformation

        opt = qoc.optimize(wires=1)
        best_params, history = opt(qoc.create_RX)()
        assert np.all(np.isfinite(np.asarray(best_params)))

    @pytest.mark.unittest
    def test_early_stopping(self, tmp_path):
        qoc = make_qoc(tmp_path, n_steps=30, early_stop_patience=2,
                       early_stop_min_delta=10.0)  # impossible improvement
        opt = qoc.optimize(wires=1)
        best_params, history = opt(qoc.create_RX)()
        assert np.all(np.isfinite(np.asarray(best_params)))

    @pytest.mark.unittest
    def test_save_results_merge(self, tmp_path):
        qoc = make_qoc(tmp_path)
        qoc.save_results("RX", 0.9, jnp.array([1.0, 2.0, 3.0]))
        qoc.save_results("RY", 0.8, jnp.array([4.0, 5.0, 6.0]))
        qoc.save_results("RX", 0.95, jnp.array([1.1, 2.1, 3.1]))
        path = os.path.join(str(tmp_path), "qoc_results_gaussian.csv")
        rows = [line.split(",") for line in open(path).read().splitlines()]
        gates = [r[0] for r in rows]
        assert gates.count("RX") == 1 and "RY" in gates
        rx_row = rows[gates.index("RX")]
        assert float(rx_row[1]) == 0.95


class TestJointMode:
    @pytest.mark.unittest
    def test_joint_layout_ties_rx_ry(self, tmp_path):
        qoc = make_qoc(tmp_path)
        theta, slices, log_idx = qoc._build_joint_layout(("RX", "RY", "RZ", "CZ"))
        assert slices["RX"] == slices["RY"]  # tied
        assert slices["RZ"] != slices["RX"]
        # theta holds RX(3) + RZ(1) + CZ(1) = 5 entries for gaussian
        assert theta.shape == (5,)

    @pytest.mark.unittest
    def test_assemble_for_gate(self, tmp_path):
        qoc = make_qoc(tmp_path)
        from qml_essentials_tpu.pulse.pulses import PulseInformation

        theta, slices, _ = qoc._build_joint_layout(("RX", "RY", "RZ", "CZ"))
        h_params = QOC._assemble_for_gate(theta, PulseInformation.H, slices)
        # H = RZ(1) + RY(3) pulled from the joint vector
        assert h_params.shape == (4,)
        assert np.allclose(np.asarray(h_params[1:]), np.asarray(theta[slices["RY"]]))

    @pytest.mark.smoketest
    def test_optimize_joint_runs(self, tmp_path):
        qoc = make_qoc(tmp_path, n_steps=3, n_samples=2, scan_steps=0)
        theta, slices, history = qoc.optimize_joint(
            target_gates=["RX", "RZ"], leaf_names=["RX", "RY", "RZ", "CZ"]
        )
        assert np.all(np.isfinite(np.asarray(theta)))
        assert len(history) == 4


class TestProfiling:
    @pytest.mark.smoketest
    def test_profile_pulse_pipeline(self):
        jax.config.update("jax_enable_x64", True)
        result = profile_pulse_pipeline("RX", n_samples=1, rwa=True)
        assert result["mean_fwd"] > 0
        assert np.isfinite(result["loss"])
