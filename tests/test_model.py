"""End-to-end tests of the Model API (L5)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qml_essentials_tpu.models.ansaetze import Ansaetze, Encoding
from qml_essentials_tpu.models.model import Model


class TestConstruction:
    @pytest.mark.unittest
    def test_param_shapes(self):
        m = Model(n_qubits=4, n_layers=2, circuit_type="Circuit_19")
        # Circuit_19: RX + RZ + ring CRX -> 3*n params/layer, L+1 layers (DRU)
        assert m.params.shape == (1, 3, 12)
        m2 = Model(
            n_qubits=3, n_layers=2, circuit_type="Circuit_19", data_reupload=False
        )
        assert m2.params.shape == (1, 2, 9)
        assert not m2.has_dru

    @pytest.mark.unittest
    def test_representative_ansaetze_construct_and_run(self):
        """Fast tier: structural variety only — the golden oracle tier
        (tests/test_golden.py) already runs EVERY ansatz against the f64
        dense oracle, so the full Model-level sweep is slow-marked."""
        for name in ["Circuit_19", "Circuit_15", "Hardware_Efficient",
                     "Strongly_Entangling", "No_Entangling"]:
            m = Model(n_qubits=4, n_layers=1, circuit_type=name)
            out = m(inputs=jnp.array([0.4]))
            assert np.all(np.isfinite(np.asarray(out))), name

    @pytest.mark.slow
    def test_all_ansaetze_construct_and_run(self):
        for ansatz in Ansaetze.get_available():
            m = Model(n_qubits=4, n_layers=1, circuit_type=ansatz.__name__)
            out = m(inputs=jnp.array([0.4]))
            assert np.all(np.isfinite(np.asarray(out))), ansatz.__name__

    @pytest.mark.unittest
    def test_initialization_strategies(self):
        for strategy in ["random", "zeros", "pi", "zero-controlled", "pi-controlled"]:
            m = Model(
                n_qubits=3,
                n_layers=1,
                circuit_type="Circuit_19",
                initialization=strategy,
            )
            p = np.asarray(m.params)
            if strategy == "zeros":
                assert np.allclose(p, 0)
            elif strategy == "pi":
                assert np.allclose(p, np.pi)
            elif strategy == "zero-controlled":
                assert np.allclose(p[:, :, -3:], 0)
            elif strategy == "pi-controlled":
                assert np.allclose(p[:, :, -3:], np.pi)

    @pytest.mark.unittest
    def test_output_qubit_validation(self):
        m = Model(n_qubits=3, n_layers=1, output_qubit=-1)
        assert m.output_qubit == [0, 1, 2]
        m.output_qubit = 1
        assert m.output_qubit == [1]
        with pytest.raises(AssertionError):
            Model(n_qubits=2, n_layers=1, output_qubit=5)

    @pytest.mark.unittest
    def test_repr_is_drawable(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_1")
        assert "RX" in repr(m)


class TestForward:
    @pytest.mark.unittest
    def test_expval_range_and_shape(self):
        m = Model(n_qubits=3, n_layers=2, circuit_type="Circuit_19")
        out = np.asarray(m(inputs=jnp.array([0.5])))
        assert out.shape == (3,)
        assert np.all(np.abs(out) <= 1.0 + 1e-6)

    @pytest.mark.unittest
    def test_no_ansatz_identity(self):
        # No ansatz + zero input -> |0...0>, <Z> = +1 on every qubit
        m = Model(n_qubits=2, n_layers=1, circuit_type="No_Ansatz",
                  data_reupload=False)
        out = np.asarray(m(inputs=None))
        assert np.allclose(out, 1.0, atol=1e-6)

    @pytest.mark.unittest
    def test_single_qubit_rx_analytic(self):
        # One qubit, No_Ansatz, RX encoding: <Z> = cos(x)
        m = Model(
            n_qubits=1, n_layers=1, circuit_type="No_Ansatz", data_reupload=False
        )
        for x in [0.3, 1.2, 2.7]:
            out = float(m(inputs=jnp.array([x])))
            assert np.isclose(out, np.cos(x), atol=1e-6)

    @pytest.mark.unittest
    def test_input_batching(self):
        m = Model(n_qubits=1, n_layers=1, circuit_type="No_Ansatz",
                  data_reupload=False)
        xs = jnp.linspace(0.1, 3.0, 7)
        out = np.asarray(m(inputs=xs.reshape(-1, 1)))
        assert out.shape == (7,)
        assert np.allclose(out, np.cos(np.asarray(xs)), atol=1e-5)
        assert m.batch_shape == (7, 1, 1)

    @pytest.mark.unittest
    def test_param_batching(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        m.initialize_params(jax.random.PRNGKey(0), repeat=5)
        assert m.params.shape[0] == 5
        out = np.asarray(m(inputs=jnp.array([0.1])))
        assert out.shape == (5, 2)

    @pytest.mark.unittest
    def test_joint_input_param_batching(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        m.initialize_params(jax.random.PRNGKey(1), repeat=3)
        xs = jnp.linspace(0, 1, 4).reshape(-1, 1)
        out = np.asarray(m(inputs=xs))
        assert out.shape == (4, 3, 2)

    @pytest.mark.unittest
    def test_execution_types(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        state = np.asarray(m(inputs=jnp.array([0.2]), execution_type="state"))
        assert state.shape == (4,)
        assert np.isclose(np.sum(np.abs(state) ** 2), 1.0, atol=1e-6)

        m.shots = 1000  # probs warns without shots
        probs = np.asarray(m(inputs=jnp.array([0.2]), execution_type="probs"))
        m.shots = None
        # full-system probs are returned per-qubit-indexed: (2,)*n
        assert probs.shape == (2, 2)
        assert np.isclose(probs.sum(), 1.0, atol=1e-6)

        rho = np.asarray(m(inputs=jnp.array([0.2]), execution_type="density"))
        assert rho.shape == (4, 4)
        assert np.isclose(np.trace(rho).real, 1.0, atol=1e-6)

    @pytest.mark.unittest
    def test_density_consistency_with_state(self):
        m = Model(n_qubits=3, n_layers=1, circuit_type="Circuit_19")
        x = jnp.array([0.8])
        state = np.asarray(m(inputs=x, execution_type="state"))
        rho = np.asarray(m(inputs=x, execution_type="density"))
        assert np.allclose(rho, np.outer(state, state.conj()), atol=1e-6)

    @pytest.mark.unittest
    def test_partial_measurement(self):
        m = Model(n_qubits=3, n_layers=1, circuit_type="Circuit_19", output_qubit=0)
        rho = np.asarray(m(inputs=jnp.array([0.3]), execution_type="density"))
        assert rho.shape == (2, 2)
        assert np.isclose(np.trace(rho).real, 1.0, atol=1e-6)

        m.shots = 500
        probs = np.asarray(m(inputs=jnp.array([0.3]), execution_type="probs"))
        assert probs.shape == (2,)
        assert np.isclose(probs.sum(), 1.0, atol=1e-6)

    @pytest.mark.unittest
    def test_parity_measurement(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="No_Ansatz",
                  data_reupload=False, output_qubit=[[0, 1]])
        # zero inputs -> |00>, <ZZ> = 1
        out = float(m(inputs=None))
        assert np.isclose(out, 1.0, atol=1e-6)

    @pytest.mark.unittest
    def test_force_mean(self):
        m = Model(n_qubits=3, n_layers=1, circuit_type="Circuit_19")
        out = m(inputs=jnp.array([0.5]), force_mean=True)
        assert np.asarray(out).shape == ()

    @pytest.mark.unittest
    def test_data_reupload_mask(self):
        mask = np.zeros((2, 2), dtype=bool)
        mask[0, 0] = True
        m = Model(n_qubits=2, n_layers=2, circuit_type="Circuit_1",
                  data_reupload=mask.tolist())
        out = m(inputs=jnp.array([0.7]))
        assert np.all(np.isfinite(np.asarray(out)))
        assert m.data_reupload.shape == (2, 2, 1)

    @pytest.mark.unittest
    def test_multi_feature_encoding(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19",
                  encoding=["RX", "RY"])
        assert m.n_input_feat == 2
        out = np.asarray(m(inputs=jnp.array([[0.1, 0.4]])))
        assert out.shape == (2,)
        with pytest.raises(ValueError):
            m(inputs=jnp.array([[0.1, 0.2, 0.3]]))


class TestShots:
    @pytest.mark.unittest
    def test_shot_expval_statistics(self):
        m = Model(n_qubits=1, n_layers=1, circuit_type="No_Ansatz",
                  data_reupload=False, shots=30000)
        out = float(m(inputs=jnp.array([1.0])))
        assert np.isclose(out, np.cos(1.0), atol=0.03)

    @pytest.mark.unittest
    def test_shots_setter(self):
        m = Model(n_qubits=1, n_layers=1, shots=-5)
        assert m.shots is None
        m.shots = 100
        assert m.shots == 100


class TestNoise:
    @pytest.mark.unittest
    def test_noise_params_defaults(self):
        m = Model(n_qubits=2, n_layers=1)
        m.noise_params = {"BitFlip": 0.1}
        assert m.noise_params["PhaseFlip"] == 0.0
        m.noise_params = {"BitFlip": 0.0}
        assert m.noise_params is None

    @pytest.mark.unittest
    def test_unknown_noise_warns(self):
        m = Model(n_qubits=2, n_layers=1)
        with pytest.warns(UserWarning):
            m.noise_params = {"Bogus": 0.2}

    @pytest.mark.unittest
    def test_depolarizing_shrinks_expval(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        x = jnp.array([0.4])
        clean = np.asarray(m(inputs=x))
        noisy = np.asarray(m(inputs=x, noise_params={"Depolarizing": 0.2}))
        assert np.all(np.abs(noisy) <= np.abs(clean) + 1e-6)
        m.noise_params = None

    @pytest.mark.unittest
    def test_full_noise_stack_runs(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        out = m(
            inputs=jnp.array([0.4]),
            noise_params={
                "BitFlip": 0.02,
                "PhaseFlip": 0.02,
                "Depolarizing": 0.02,
                "MultiQubitDepolarizing": 0.02,
                "AmplitudeDamping": 0.02,
                "PhaseDamping": 0.02,
                "StatePreparation": 0.02,
                "Measurement": 0.02,
                "ThermalRelaxation": {"t1": 2000, "t2": 1000, "t_factor": 1},
            },
        )
        assert np.all(np.isfinite(np.asarray(out)))
        m.noise_params = None

    @pytest.mark.unittest
    def test_gate_error_is_stochastic_but_bounded(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        x = jnp.array([0.4])
        clean = np.asarray(m(inputs=x))
        noisy = np.asarray(m(inputs=x, noise_params={"GateError": 0.01}))
        assert np.allclose(noisy, clean, atol=0.2)
        m.noise_params = None

    @pytest.mark.unittest
    def test_thermal_relaxation_invalid_warns(self):
        m = Model(n_qubits=2, n_layers=1)
        with pytest.warns(UserWarning):
            m.noise_params = {"ThermalRelaxation": {"t1": 1.0, "t2": 3.0,
                                                    "t_factor": 1}}
        assert m.noise_params["ThermalRelaxation"] == 0.0


class TestTraining:
    @pytest.mark.unittest
    def test_training_step_decreases_loss(self):
        m = Model(n_qubits=3, n_layers=2, circuit_type="Circuit_19",
                  random_seed=42)
        xs = jnp.linspace(-1, 1, 8).reshape(-1, 1)
        ys = jnp.sin(xs[:, 0] * jnp.pi)

        def loss_fn(params):
            pred = m(params=params, inputs=xs, force_mean=True)
            return jnp.mean((pred - ys) ** 2)

        params = m.params
        opt = optax.adam(0.1)
        opt_state = opt.init(params)
        losses = []
        for _ in range(12):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    @pytest.mark.unittest
    def test_grad_wrt_inputs(self):
        m = Model(n_qubits=1, n_layers=1, circuit_type="No_Ansatz",
                  data_reupload=False)

        def f(x):
            return m(inputs=x.reshape(1, 1))

        g = float(jax.grad(lambda x: f(x))(jnp.array(0.6)))
        assert np.isclose(g, -np.sin(0.6), atol=1e-5)

    @pytest.mark.unittest
    def test_trainable_frequencies_grad(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_1",
                  trainable_frequencies=True)

        def loss(enc_params):
            return jnp.sum(m(inputs=jnp.array([0.5]), enc_params=enc_params))

        g = np.asarray(jax.grad(loss)(m.enc_params))
        assert g.shape == m.enc_params.shape
        assert np.any(np.abs(g) > 1e-8)


class TestEncodingStrategies:
    @pytest.mark.unittest
    def test_degree_and_frequencies(self):
        m = Model(n_qubits=3, n_layers=2, circuit_type="Circuit_19")
        # hamming encoding: omegas = n_layers*n_qubits = 6 -> 13 freqs
        assert m.degree == (13,)
        assert list(m.frequencies[0]) == list(range(-6, 7))

    @pytest.mark.unittest
    def test_binary_ternary_spectrum(self):
        enc_b = Encoding("binary", "RX")
        assert enc_b.get_n_freqs(2) == 7
        assert list(enc_b.get_spectrum(2)) == list(range(-3, 4))
        enc_t = Encoding("ternary", "RX")
        assert enc_t.get_n_freqs(2) == 9
        assert list(enc_t.get_spectrum(2)) == list(range(-4, 5))

    @pytest.mark.unittest
    def test_golomb_encoding_runs(self):
        enc = Encoding("golomb", None)
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19", encoding=enc)
        out = np.asarray(m(inputs=jnp.array([0.3])))
        assert np.all(np.isfinite(out))
        assert m.degree[0] > 1

    @pytest.mark.unittest
    @pytest.mark.parametrize(
        "strategy", ["hamming", "binary", "ternary", "golomb"]
    )
    def test_encoding_spectrum_golden(self, strategy):
        """Measured FFT spectrum realizes exactly the predicted frequency set.

        The spectrum constructions of doi:10.22331/q-2023-12-20-1210
        (hamming/binary/ternary) and arXiv:2209.05523 (golomb) predict the
        integer support of the model's Fourier series; the FFT of the actual
        expectation must (a) produce one coefficient per predicted frequency
        and (b) put non-trivial weight on the extreme predicted frequency —
        i.e. the construction achieves its advertised degree, not merely an
        upper bound.
        """
        from qml_essentials_tpu.analysis.coefficients import Coefficients

        enc = Encoding(strategy, "RX") if strategy != "golomb" else Encoding(
            "golomb", None
        )
        m = Model(
            n_qubits=2,
            n_layers=1,
            circuit_type="Circuit_19",
            encoding=enc,
            output_qubit=-1,
            random_seed=13,
        )
        coeffs, freqs = Coefficients.get_spectrum(m, shift=True, trim=True)
        want = np.asarray(m.frequencies[0])
        np.testing.assert_array_equal(np.asarray(freqs).reshape(-1), want)
        assert coeffs.shape[0] == m.degree[0]
        mags = np.abs(np.asarray(coeffs)).reshape(-1)
        # Conjugate symmetry of a real model's spectrum.
        np.testing.assert_allclose(mags, mags[::-1], atol=1e-5)
        if strategy == "golomb":
            # Golomb predicts an upper-bound support; the construction's
            # point is weight BEYOND the per-qubit (hamming) degree.
            n_enc = 2  # encoding count at 2 qubits / 1 layer
            beyond = mags[np.abs(want) > n_enc]
            assert np.max(beyond) > 1e-4, (strategy, mags)
        else:
            # The top predicted frequency carries real weight (the
            # construction achieves its advertised degree exactly).
            assert mags[-1] > 1e-4, (strategy, mags)

    @pytest.mark.unittest
    def test_invalid_strategy(self):
        with pytest.raises(ValueError):
            Encoding("bogus", "RX")


class TestStatePrep:
    @pytest.mark.unittest
    def test_hadamard_state_prep(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="No_Ansatz",
                  data_reupload=False, state_preparation="H")
        state = np.asarray(m(inputs=None, execution_type="state"))
        assert np.allclose(np.abs(state) ** 2, 0.25, atol=1e-6)

    @pytest.mark.unittest
    def test_circuit_depth(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_1",
                  data_reupload=False)
        # RX layer + barrier + RZ layer + barrier (reference counts barriers)
        assert m._get_circuit_depth() == 4
        # cached on second call
        assert m._get_circuit_depth() == 4
