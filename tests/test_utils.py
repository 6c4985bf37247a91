"""Tests for utils: safe_random_split, profiling, checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qml_essentials_tpu.models.model import Model
from qml_essentials_tpu.utils import safe_random_split
from qml_essentials_tpu.utils.checkpointing import (
    latest_step,
    restore_checkpoint,
    restore_model,
    save_checkpoint,
    save_model,
)
from qml_essentials_tpu.utils.profiling import device_memory_stats, timed


class TestSafeRandomSplit:
    @pytest.mark.unittest
    def test_none_tolerant(self):
        assert safe_random_split(None) == (None, None)
        k1, k2 = safe_random_split(jax.random.PRNGKey(0))
        assert k1 is not None and k2 is not None

    @pytest.mark.unittest
    def test_pauli_circuit_reexport(self):
        from qml_essentials_tpu.utils import PauliCircuit

        assert hasattr(PauliCircuit, "from_parameterised_circuit")


class TestProfiling:
    @pytest.mark.unittest
    def test_timed(self):
        f = jax.jit(lambda x: x * 2)
        stats = timed(f, jnp.ones(8), iters=3)
        assert stats["compile_s"] > 0
        assert stats["mean_s"] > 0
        assert np.allclose(np.asarray(stats["result"]), 2.0)

    @pytest.mark.smoketest
    def test_memory_stats(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict)


class TestCheckpointing:
    @pytest.mark.unittest
    def test_pytree_roundtrip(self, tmp_path):
        tree = {"a": np.arange(6.0).reshape(2, 3), "b": {"c": np.float32(1.5)}}
        target = save_checkpoint(str(tmp_path / "ckpt"), tree)
        back = restore_checkpoint(target)
        assert np.allclose(back["a"], tree["a"])
        assert np.isclose(float(back["b"]["c"]), 1.5)

    @pytest.mark.unittest
    def test_versioned_steps(self, tmp_path):
        base = str(tmp_path / "run")
        save_checkpoint(base, {"x": np.ones(2)}, step=1)
        save_checkpoint(base, {"x": np.ones(2) * 2}, step=5)
        assert latest_step(base) == 5
        back = restore_checkpoint(base, step=5)
        assert np.allclose(back["x"], 2.0)

    @pytest.mark.unittest
    def test_model_roundtrip(self, tmp_path):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19", random_seed=1)
        original = np.asarray(m.params).copy()
        target = save_model(str(tmp_path / "model"), m)

        m.params = jnp.zeros_like(m.params)
        restore_model(target, m)
        assert np.allclose(np.asarray(m.params), original)
