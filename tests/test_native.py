"""Tests for the native (C++) leaf enumerator vs the Python implementation."""

import time

import jax
import numpy as np
import pytest

from qml_essentials_tpu import native
from qml_essentials_tpu.analysis.coefficients import FourierTree
from qml_essentials_tpu.models.model import Model


requires_native = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain on this host"
)


def _python_leaves(tree):
    """Run the pure-Python recursion for every root."""
    out = []
    for obs_word in tree.observable_words:
        leaves = []
        zeros = np.zeros(tree.n_params, dtype=np.int64)
        tree._collect_leaves(
            obs_word, tree.n_params - 1, zeros.copy(), zeros.copy(), leaves
        )
        if leaves:
            S = np.stack([leaf[0] for leaf in leaves])
            C = np.stack([leaf[1] for leaf in leaves])
            terms = np.array([leaf[2] for leaf in leaves], dtype=np.complex128)
        else:
            S = np.zeros((0, tree.n_params), dtype=np.int64)
            C = np.zeros((0, tree.n_params), dtype=np.int64)
            terms = np.zeros(0, dtype=np.complex128)
        out.append((S, C, terms))
    return out


def _canonical_leafset(S, C, terms):
    """Order-independent multiset of (s_row, c_row, term) leaves."""
    rows = [
        (tuple(S[i]), tuple(C[i]), complex(np.round(terms[i], 12)))
        for i in range(S.shape[0])
    ]
    return sorted(rows, key=str)


@requires_native
@pytest.mark.unittest
@pytest.mark.parametrize("circuit", ["Circuit_19", "Circuit_1", "Circuit_15"])
def test_native_matches_python(circuit):
    m = Model(n_qubits=3, n_layers=1, circuit_type=circuit, random_seed=5)
    tree = FourierTree(m)
    py = _python_leaves(tree)
    for obs_word, (S_py, C_py, t_py) in zip(tree.observable_words, py):
        got = native.enumerate_leaves(tree.pauli_words, obs_word, tree.n_qubits)
        assert got is not None
        S, C, terms = got
        assert S.shape == S_py.shape
        assert _canonical_leafset(S, C, terms) == _canonical_leafset(
            S_py, C_py, t_py
        )


@requires_native
@pytest.mark.unittest
def test_tree_spectrum_unchanged_by_native_path():
    """End-to-end: FourierTree (native path) still matches the FFT spectrum."""
    from qml_essentials_tpu.analysis.coefficients import Coefficients

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
        assert match.size == 1
        assert np.isclose(c, fft_c[match[0]], atol=1e-5)


@requires_native
@pytest.mark.benchmark
def test_native_is_faster_on_deep_circuit():
    m = Model(n_qubits=3, n_layers=1, circuit_type="Circuit_19", random_seed=2)
    tree = FourierTree(m)

    t0 = time.perf_counter()
    py = _python_leaves(tree)
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    for obs_word in tree.observable_words:
        native.enumerate_leaves(tree.pauli_words, obs_word, tree.n_qubits)
    t_native = time.perf_counter() - t0

    print(f"python {t_py * 1e3:.1f}ms vs native {t_native * 1e3:.1f}ms")
    assert t_native < t_py
