"""Tests for the analysis stack: math, pauli transpiler, entanglement,
expressibility, coefficients (FFT + FourierTree cross-validation), FCC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qml_essentials_tpu.ops.operations as op
from qml_essentials_tpu.analysis.coefficients import (
    Coefficients,
    Datasets,
    FCC,
    FourierTree,
)
from qml_essentials_tpu.analysis.entanglement import Entanglement
from qml_essentials_tpu.analysis.expressibility import Expressibility
from qml_essentials_tpu.analysis.math import (
    fidelity,
    fubini_study_metric,
    phase_difference,
    quantum_fisher_information,
    trace_distance,
)
from qml_essentials_tpu.analysis.pauli import PauliCircuit
from qml_essentials_tpu.models.model import Model
from qml_essentials_tpu.ops import kernels, simulation
from qml_essentials_tpu.ops.tape import recording


class TestMath:
    @pytest.mark.unittest
    def test_fidelity_pure(self):
        psi = jnp.array([1.0, 0.0], dtype=complex)
        phi = jnp.array([1.0, 1.0], dtype=complex) / np.sqrt(2)
        assert np.isclose(float(fidelity(psi, psi)), 1.0, atol=1e-6)
        assert np.isclose(float(fidelity(psi, phi)), 0.5, atol=1e-6)

    @pytest.mark.unittest
    def test_fidelity_mixed_matches_pure(self):
        psi = jnp.array([0.6, 0.8], dtype=complex)
        phi = jnp.array([1.0, 0.0], dtype=complex)
        rho = jnp.outer(psi, psi.conj())
        sig = jnp.outer(phi, phi.conj())
        assert np.isclose(
            float(fidelity(rho, sig)), float(fidelity(psi, phi)), atol=1e-5
        )

    @pytest.mark.unittest
    def test_fidelity_kind_mismatch(self):
        with pytest.raises(ValueError):
            fidelity(jnp.zeros(2), jnp.eye(2))

    @pytest.mark.unittest
    def test_trace_distance(self):
        rho = jnp.diag(jnp.array([1.0, 0.0])) + 0j
        sig = jnp.diag(jnp.array([0.0, 1.0])) + 0j
        assert np.isclose(float(trace_distance(rho, sig)), 1.0, atol=1e-6)
        assert np.isclose(float(trace_distance(rho, rho)), 0.0, atol=1e-6)

    @pytest.mark.unittest
    def test_phase_difference(self):
        psi = jnp.array([1.0, 0.0], dtype=complex)
        phi = jnp.exp(1j * 0.7) * psi
        assert np.isclose(float(phase_difference(psi, phi)), 0.7, atol=1e-6)

    @pytest.mark.unittest
    def test_qfi_single_rotation(self):
        # |psi(t)> = RX(t)|0>: generator X/2 has variance 1/4 -> QFI = 1.
        def state_fn(theta):
            with recording() as tape:
                op.RX(theta[0], wires=0)
            return simulation.simulate_pure(tape, 1)

        F = np.asarray(quantum_fisher_information(state_fn, jnp.array([0.4])))
        assert np.isclose(F[0, 0], 1.0, atol=1e-5)
        g = np.asarray(fubini_study_metric(state_fn, jnp.array([0.4])))
        assert np.isclose(4 * g[0, 0], F[0, 0], atol=1e-6)

    @pytest.mark.unittest
    def test_qfi_mixed_matches_pure(self):
        def state_fn(theta):
            with recording() as tape:
                op.RY(theta[0], wires=0)
            return simulation.simulate_pure(tape, 1)

        def rho_fn(theta):
            psi = state_fn(theta)
            return jnp.outer(psi, psi.conj())

        Fp = np.asarray(quantum_fisher_information(state_fn, jnp.array([0.9])))
        Fm = np.asarray(quantum_fisher_information(rho_fn, jnp.array([0.9])))
        assert np.allclose(Fp, Fm, atol=1e-4)


class TestPauliCircuit:
    def _canonical_expval(self, tape, obs, n):
        rotations, evolved_obs = PauliCircuit.from_parameterised_circuit(
            list(tape), observables=obs, n_qubits=n
        )
        with recording() as canonical:
            for r in rotations:
                canonical.append(r)
        return simulation.simulate_and_measure(
            canonical, n, "expval", evolved_obs, False
        )

    @pytest.mark.unittest
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_canonical_form_preserves_expectation(self, seed):
        n = 3
        key = jax.random.PRNGKey(seed)
        angles = np.asarray(jax.random.uniform(key, (8,)) * 2 * np.pi)

        with recording() as tape:
            op.H(wires=0)
            op.RX(angles[0], wires=0)
            op.CX(wires=[0, 1])
            op.RY(angles[1], wires=1)
            op.CZ(wires=[1, 2])
            op.RZ(angles[2], wires=2)
            op.CRX(angles[3], wires=[0, 2])
            op.Rot(angles[4], angles[5], angles[6], wires=1)
            op.SWAP(wires=[0, 1])
            op.RX(angles[7], wires=0)

        obs = [op.PauliZ(wires=q, record=False) for q in range(n)]
        expected = simulation.simulate_and_measure(list(tape), n, "expval", obs, False)
        got = self._canonical_expval(tape, obs, n)
        assert np.allclose(np.asarray(got), np.asarray(expected), atol=1e-5)

    @pytest.mark.unittest
    def test_canonical_form_is_rotations_only(self):
        with recording() as tape:
            op.H(wires=0)
            op.RX(0.3, wires=0)
            op.CX(wires=[0, 1])
        rotations, _ = PauliCircuit.from_parameterised_circuit(
            list(tape), observables=[op.PauliZ(wires=0, record=False)], n_qubits=2
        )
        assert all(PauliCircuit._is_pauli_rotation(r) for r in rotations)

    @pytest.mark.unittest
    def test_undecomposable_raises(self):
        with recording() as tape:
            op.CCX(wires=[0, 1, 2])
            op.RX(0.1, wires=0)
        with pytest.raises(NotImplementedError):
            PauliCircuit.from_parameterised_circuit(list(tape), n_qubits=3)


class TestEntanglement:
    @pytest.mark.unittest
    def test_meyer_wallach_ghz_is_one(self):
        m = Model(n_qubits=3, n_layers=1, circuit_type="GHZ", data_reupload=False)
        ent = float(Entanglement.meyer_wallach(m, n_samples=-1))
        assert np.isclose(ent, 1.0, atol=1e-5)

    @pytest.mark.unittest
    def test_meyer_wallach_product_is_zero(self):
        m = Model(n_qubits=3, n_layers=1, circuit_type="No_Entangling",
                  data_reupload=False)
        ent = float(Entanglement.meyer_wallach(m, n_samples=5,
                                               random_key=jax.random.PRNGKey(0)))
        assert np.isclose(ent, 0.0, atol=1e-5)

    @pytest.mark.unittest
    def test_bell_measurement_matches_meyer_wallach(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19",
                  data_reupload=False, random_seed=77)
        mw = float(Entanglement.meyer_wallach(m, n_samples=-1))
        bell = float(Entanglement.bell_measurements(m, n_samples=-1))
        assert np.isclose(mw, bell, atol=1e-4)

    @pytest.mark.unittest
    def test_concentratable_entanglement_bell(self):
        # CE of a 2-qubit GHZ (Bell) state is 1/4.
        m = Model(n_qubits=2, n_layers=1, circuit_type="GHZ", data_reupload=False)
        ce = Entanglement.concentratable_entanglement(m, n_samples=-1)
        assert np.isclose(ce, 0.25, atol=1e-5)

    @pytest.mark.unittest
    def test_concentratable_product_is_zero(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="No_Entangling",
                  data_reupload=False)
        ce = Entanglement.concentratable_entanglement(
            m, n_samples=3, random_key=jax.random.PRNGKey(2)
        )
        assert np.isclose(ce, 0.0, atol=1e-5)

    @pytest.mark.unittest
    def test_concentratable_estimation_close_to_swap_test(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="GHZ", data_reupload=False)
        est = Entanglement.concentratable_entanglement_estimation(m, n_samples=-1)
        assert np.isclose(est, 0.25, atol=1e-4)

    @pytest.mark.unittest
    def test_entanglement_of_formation_pure_matches_mw(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="GHZ", data_reupload=False)
        eof = float(Entanglement.entanglement_of_formation(m, n_samples=-1))
        assert np.isclose(eof, 1.0, atol=1e-5)

    @pytest.mark.smoketest
    def test_relative_entropy_runs(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19",
                  data_reupload=False)
        val = float(
            Entanglement.relative_entropy(
                m, n_samples=2, n_sigmas=2, random_key=jax.random.PRNGKey(1)
            )
        )
        assert np.isfinite(val)


class TestExpressibility:
    @pytest.mark.unittest
    def test_haar_integral_normalised(self):
        x, y = Expressibility.haar_integral(2, 20, cache=False)
        assert np.isclose(np.sum(np.asarray(y)), 1.0, atol=1e-6)

    @pytest.mark.unittest
    def test_fidelity_histogram_normalised(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_9",
                  data_reupload=False)
        _, z = Expressibility.state_fidelities(
            n_samples=100, n_bins=20, model=m, random_key=jax.random.PRNGKey(0)
        )
        assert np.isclose(np.sum(np.asarray(z)), 1.0, atol=1e-6)

    @pytest.mark.unittest
    def test_idle_circuit_has_high_kl(self):
        # A barely-expressive circuit (single RX/RZ layer) is much farther
        # from Haar than a deep entangling circuit.
        m_idle = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_1",
                       data_reupload=False)
        kl_idle = Expressibility.kl_divergence_to_haar(
            m_idle, n_samples=100, n_bins=20, random_key=jax.random.PRNGKey(0)
        )
        m_expr = Model(n_qubits=2, n_layers=3, circuit_type="Circuit_9",
                       data_reupload=False)
        kl_expr = Expressibility.kl_divergence_to_haar(
            m_expr, n_samples=100, n_bins=20, random_key=jax.random.PRNGKey(0)
        )
        assert kl_idle[0] > kl_expr[0]


class TestCoefficients:
    @pytest.mark.unittest
    def test_single_qubit_spectrum_analytic(self):
        # <Z> of RX-encoded input on one qubit is cos(x): coefficients 1/2 at ±1.
        m = Model(n_qubits=1, n_layers=1, circuit_type="No_Ansatz",
                  data_reupload=False)
        coeffs, freqs = Coefficients.get_spectrum(m, shift=True)
        coeffs = np.asarray(coeffs)
        freqs = np.asarray(freqs)
        idx_p1 = int(np.where(freqs == 1)[0][0])
        idx_0 = int(np.where(freqs == 0)[0][0])
        assert np.isclose(coeffs[idx_p1].real, 0.5, atol=1e-6)
        assert np.isclose(coeffs[idx_0].real, 0.0, atol=1e-6)

    @pytest.mark.unittest
    def test_fourier_series_reconstruction(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19", random_seed=5)
        coeffs, freqs = Coefficients.get_spectrum(m, shift=True)
        xs = np.linspace(0.0, 2 * np.pi, 7)
        recon = np.asarray(
            Coefficients.evaluate_Fourier_series(coeffs, freqs, xs)
        )
        direct = np.asarray(m(inputs=xs.reshape(-1, 1), force_mean=True))
        assert np.allclose(recon, direct, atol=1e-5)

    @pytest.mark.unittest
    def test_psd(self):
        coeffs = jnp.array([1.0 + 0j, 0.5j, 0.0])
        psd = np.asarray(Coefficients.get_psd(coeffs))
        assert np.allclose(psd, 2 / 9 * np.array([1.0, 0.25, 0.0]), atol=1e-7)


class TestFourierTree:
    @pytest.mark.unittest
    @pytest.mark.parametrize("circuit", ["Circuit_19", "Circuit_1", "Circuit_15"])
    def test_tree_expval_matches_circuit(self, circuit):
        m = Model(n_qubits=2, n_layers=1, circuit_type=circuit, random_seed=31)
        tree = FourierTree(m)
        for x in [0.3, 1.1]:
            direct = np.asarray(m(inputs=jnp.array([x]))).mean()
            via_tree = float(tree(inputs=jnp.array([x]), force_mean=True))
            assert np.isclose(via_tree, direct, atol=1e-5), circuit

    @pytest.mark.unittest
    def test_tree_spectrum_matches_fft(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19", random_seed=8)
        tree = FourierTree(m)
        tree_coeffs, tree_freqs = tree.get_spectrum(force_mean=True)
        fft_coeffs, fft_freqs = Coefficients.get_spectrum(m, shift=True)

        tree_c = np.asarray(tree_coeffs[0])
        tree_f = np.asarray(tree_freqs[0])
        fft_c = np.asarray(fft_coeffs)
        fft_f = np.asarray(fft_freqs)

        for f, c in zip(tree_f, tree_c):
            match = np.where(fft_f == f)[0]
            assert match.size == 1, f"frequency {f} missing in FFT spectrum"
            assert np.isclose(c, fft_c[match[0]], atol=1e-5), f

    @pytest.mark.unittest
    def test_exact_support_tree_vs_dp(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19", random_seed=3)
        tree = FourierTree(m)
        tree_support = tree.get_exact_support(method="tree")
        dp_support = tree.get_exact_support(method="dp")
        for ts, ds in zip(tree_support, dp_support):
            # dp is a (tight) superset of the fully exact tree support
            assert set(np.asarray(ts).ravel()) <= set(np.asarray(ds).ravel())

    @pytest.mark.unittest
    def test_model_exact_spectrum(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        spec = m.exact_spectrum()
        assert len(spec) == 1
        # Always a subset of the encoding-derived estimate
        assert set(spec[0]) <= set(np.asarray(m.frequencies[0]))


class TestFCC:
    @pytest.mark.unittest
    def test_fcc_in_unit_interval(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        fcc = float(
            FCC.get_fcc(m, n_samples=10, random_key=jax.random.PRNGKey(0))
        )
        assert 0.0 <= fcc <= 1.0

    @pytest.mark.unittest
    def test_fingerprint_shapes_and_methods(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        for method in ["pearson", "complex_pearson", "spearman", "covariance"]:
            fp, freqs = FCC.get_fourier_fingerprint(
                m, n_samples=8, random_key=jax.random.PRNGKey(1), method=method
            )
            assert fp.ndim == 2, method

    @pytest.mark.unittest
    def test_fast_path_matches_slow_path(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        fcc_fast = float(
            FCC.get_fcc(m, n_samples=10, random_key=jax.random.PRNGKey(4),
                        trim_redundant=True)
        )
        m2 = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        fp, _ = FCC.get_fourier_fingerprint(
            m2, n_samples=10, random_key=jax.random.PRNGKey(4),
            trim_redundant=True, weight=False,
        )
        fcc_slow = float(FCC.calculate_fcc(fp))
        assert np.isclose(fcc_fast, fcc_slow, atol=1e-5)


class TestDatasets:
    @pytest.mark.unittest
    def test_generate_fourier_series(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        domain, values, coeffs = Datasets.generate_fourier_series(
            jax.random.PRNGKey(0), m
        )
        assert values.shape == tuple(m.degree)
        assert np.all(np.isfinite(np.asarray(values)))
        # Real series: conjugate-symmetric coefficients
        flat = np.asarray(coeffs).reshape(-1)
        assert np.allclose(flat, np.conj(flat[::-1]), atol=1e-6)
