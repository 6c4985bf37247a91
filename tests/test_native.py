"""Tests for the native (C++) leaf enumerator vs the Python implementation.

The enumerator plugs into ``FourierTree._expand_root`` (used when loadable);
these tests force the pure-Python walk by stubbing the native entry point
and compare the resulting leaf tables against the native ones.
"""

import time

import numpy as np
import pytest

from qml_essentials_tpu import native
from qml_essentials_tpu.analysis.coefficients import FourierTree
from qml_essentials_tpu.models.model import Model


requires_native = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain on this host"
)


def _tables(tree, use_native: bool):
    """Leaf tables per observable, with the native enumerator on or off."""
    saved = native.enumerate_leaves
    if not use_native:
        native.enumerate_leaves = lambda *a, **k: None
    try:
        tree._tables = None  # drop the cache so the chosen path recomputes
        return tree._leaf_tables()
    finally:
        native.enumerate_leaves = saved
        tree._tables = None


def _canonical_leafset(table):
    """Order-independent multiset of (sin_mask, cos_mask, amp) leaves."""
    S = np.asarray(table.sin_mask, dtype=bool)
    C = np.asarray(table.cos_mask, dtype=bool)
    amp = np.asarray(table.amp)
    rows = [
        (tuple(S[i]), tuple(C[i]), complex(np.round(amp[i], 12)))
        for i in range(S.shape[0])
    ]
    return sorted(rows, key=str)


@requires_native
@pytest.mark.unittest
@pytest.mark.parametrize("circuit", ["Circuit_19", "Circuit_1", "Circuit_15"])
def test_native_matches_python(circuit):
    m = Model(n_qubits=3, n_layers=1, circuit_type=circuit, random_seed=5)
    tree = FourierTree(m)
    py_tables = _tables(tree, use_native=False)
    nat_tables = _tables(tree, use_native=True)
    assert len(py_tables) == len(nat_tables)
    for t_py, t_nat in zip(py_tables, nat_tables):
        assert _canonical_leafset(t_py) == _canonical_leafset(t_nat)


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
    _tables(tree, use_native=False)
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    _tables(tree, use_native=True)
    t_native = time.perf_counter() - t0

    print(f"python {t_py * 1e3:.1f}ms vs native {t_native * 1e3:.1f}ms")
    assert t_native < t_py
