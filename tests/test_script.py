"""Tests for the Script executor (L2): batching, caching, grads, chunking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qml_essentials_tpu.ops.operations as op
from qml_essentials_tpu.core import memory
from qml_essentials_tpu.core.executor import Script


def rx_chain(theta):
    op.RX(theta, wires=0)
    op.CX(wires=[0, 1])


class TestSingle:
    @pytest.mark.unittest
    def test_execute_expval(self):
        s = Script(rx_chain, n_qubits=2)
        out = s.execute(
            type="expval", obs=[op.PauliZ(wires=0, record=False)], args=(0.5,)
        )
        assert np.isclose(float(out[0]), np.cos(0.5), atol=1e-6)

    @pytest.mark.unittest
    def test_execute_state_probs_density(self):
        s = Script(rx_chain, n_qubits=2)
        state = np.asarray(s.execute(type="state", args=(jnp.pi,)))
        assert np.allclose(np.abs(state) ** 2, [0, 0, 0, 1], atol=1e-6)
        probs = np.asarray(s.execute(type="probs", args=(jnp.pi,)))
        assert np.allclose(probs, [0, 0, 0, 1], atol=1e-6)
        rho = np.asarray(s.execute(type="density", args=(jnp.pi,)))
        assert rho.shape == (4, 4)
        assert np.isclose(np.trace(rho).real, 1.0, atol=1e-6)

    @pytest.mark.unittest
    def test_n_qubit_inference(self):
        s = Script(rx_chain)  # no n_qubits declared
        out = s.execute(
            type="expval", obs=[op.PauliZ(wires=1, record=False)], args=(0.3,)
        )
        assert np.isclose(float(out[0]), np.cos(0.3), atol=1e-6)


class TestBatched:
    @pytest.mark.unittest
    def test_vmap_batching(self):
        s = Script(rx_chain, n_qubits=2)
        thetas = jnp.linspace(0, jnp.pi, 8)
        out = s.execute(
            type="expval",
            obs=[op.PauliZ(wires=0, record=False)],
            args=(thetas,),
            in_axes=(0,),
        )
        assert out.shape == (8, 1)
        assert np.allclose(np.asarray(out)[:, 0], np.cos(thetas), atol=1e-5)

    @pytest.mark.unittest
    def test_cache_reuse(self):
        s = Script(rx_chain, n_qubits=2)
        thetas = jnp.linspace(0, 1, 4)
        _ = s.execute(type="expval", obs=[op.PauliZ(wires=0, record=False)],
                      args=(thetas,), in_axes=(0,))
        n_entries = len(s._jit_cache)
        _ = s.execute(type="expval", obs=[op.PauliZ(wires=0, record=False)],
                      args=(thetas + 1.0,), in_axes=(0,))
        assert len(s._jit_cache) == n_entries  # same signature -> no new plan

    @pytest.mark.unittest
    def test_mixed_static_args(self):
        def circ(theta, label):
            op.RX(theta, wires=0)
            assert isinstance(label, str)

        s = Script(circ, n_qubits=1)
        thetas = jnp.array([0.1, 0.2])
        out = s.execute(
            type="expval",
            obs=[op.PauliZ(wires=0, record=False)],
            args=(thetas, "hello"),
            in_axes=(0, None),
        )
        assert np.allclose(np.asarray(out)[:, 0], np.cos(np.asarray(thetas)), atol=1e-5)

    @pytest.mark.unittest
    def test_in_axes_mismatch_raises(self):
        s = Script(rx_chain, n_qubits=2)
        with pytest.raises(ValueError):
            s.execute(type="probs", args=(jnp.zeros(3),), in_axes=(0, 0))

    @pytest.mark.unittest
    def test_batched_shots(self):
        s = Script(rx_chain, n_qubits=2)
        thetas = jnp.array([0.0, jnp.pi])
        out = s.execute(
            type="probs",
            args=(thetas,),
            in_axes=(0,),
            shots=4000,
            key=jax.random.PRNGKey(0),
        )
        out = np.asarray(out)
        assert out.shape == (2, 4)
        assert np.allclose(out[0], [1, 0, 0, 0], atol=0.03)
        assert np.allclose(out[1], [0, 0, 0, 1], atol=0.03)


class TestTransforms:
    @pytest.mark.unittest
    def test_grad_through_execute(self):
        s = Script(rx_chain, n_qubits=2)

        def loss(theta):
            return s.execute(
                type="expval", obs=[op.PauliZ(wires=0, record=False)], args=(theta,)
            )[0]

        g = float(jax.grad(loss)(0.7))
        assert np.isclose(g, -np.sin(0.7), atol=1e-5)

    @pytest.mark.unittest
    def test_batched_gradient(self):
        s = Script(rx_chain, n_qubits=2)

        def loss(thetas):
            out = s.execute(
                type="expval",
                obs=[op.PauliZ(wires=0, record=False)],
                args=(thetas,),
                in_axes=(0,),
            )
            return jnp.sum(out)

        thetas = jnp.array([0.2, 0.9])
        g = np.asarray(jax.grad(loss)(thetas))
        assert np.allclose(g, -np.sin(np.asarray(thetas)), atol=1e-5)

    @pytest.mark.unittest
    def test_jacrev_through_batched_execute(self):
        s = Script(rx_chain, n_qubits=2)
        thetas = jnp.array([0.2, 0.5, 1.3])

        def f(t):
            return s.execute(
                type="expval",
                obs=[op.PauliZ(wires=0, record=False)],
                args=(t,),
                in_axes=(0,),
            )[:, 0]

        J = np.asarray(jax.jacrev(f)(thetas))
        assert np.allclose(np.diag(J), -np.sin(np.asarray(thetas)), atol=1e-5)
        assert np.allclose(J - np.diag(np.diag(J)), 0.0, atol=1e-6)


class TestChunking:
    @pytest.mark.unittest
    def test_chunked_equals_full(self):
        s = Script(rx_chain, n_qubits=2)
        thetas = jnp.linspace(0, 2, 10)
        obs = [op.PauliZ(wires=0, record=False)]
        full = np.asarray(
            s.execute(type="expval", obs=obs, args=(thetas,), in_axes=(0,))
        )

        # Force chunking through the memory module
        plan_key = [k for k in s._jit_cache if isinstance(k, tuple) and k[0] == "expval"][0]
        plan = s._jit_cache[plan_key]
        chunked = memory.execute_chunked(
            plan.batched_fn, (thetas,), (0,), 10, 3
        )
        assert np.allclose(np.asarray(chunked), full, atol=1e-6)

    @pytest.mark.unittest
    def test_compute_chunk_size_bounds(self):
        # Full batch fits -> no chunking
        assert memory.compute_chunk_size(4, 16, "expval", False, 1) == 16
        # Pathological huge request chunks down to >= 1
        c = memory.compute_chunk_size(20, 10_000_000, "density", True, 0)
        assert 1 <= c < 10_000_000

    @pytest.mark.unittest
    def test_estimate_monotonic(self):
        small = memory.estimate_peak_bytes(8, 1, "state", False, 0, 10)
        large = memory.estimate_peak_bytes(12, 64, "state", False, 0, 10)
        assert large > small
        dens = memory.estimate_peak_bytes(8, 1, "density", True, 0, 10)
        assert dens > small


class TestDraw:
    @pytest.mark.smoketest
    def test_draw_text(self):
        s = Script(rx_chain, n_qubits=2)
        txt = s.draw(figure="text", args=(0.5,))
        assert "RX" in txt and "q0" in txt and "q1" in txt

    @pytest.mark.smoketest
    def test_draw_tikz(self):
        s = Script(rx_chain, n_qubits=2)
        fig = s.draw(figure="tikz", args=(0.5,))
        assert "quantikz" in str(fig)
        assert "targ" in str(fig)

    @pytest.mark.smoketest
    def test_draw_mpl(self):
        import matplotlib

        matplotlib.use("Agg")
        s = Script(rx_chain, n_qubits=2)
        fig, ax = s.draw(figure="mpl", args=(0.5,))
        assert fig is not None

    @pytest.mark.unittest
    def test_draw_invalid(self):
        s = Script(rx_chain, n_qubits=2)
        with pytest.raises(ValueError):
            s.draw(figure="bogus")


class TestObsPlanCache:
    """Plans are keyed by observable content (round-5 fix).

    The reference's batched plan cache omits the observable list
    (qml_essentials/script.py:530): a plan compiled for [Z0, H] silently
    answers a later [Z0] request with stale (2-observable) results.  Here
    the cache key carries a value signature of every observable.
    """

    @staticmethod
    def _circ(theta):
        op.RY(theta, wires=0)
        op.CX(wires=[0, 1])

    @pytest.mark.unittest
    def test_changing_obs_list_changes_batched_result(self):
        s = Script(self._circ, n_qubits=2)
        thetas = jnp.linspace(0.0, 1.0, 4)
        two = s.execute(
            type="expval",
            obs=[op.PauliZ(wires=0, record=False), op.PauliZ(wires=1, record=False)],
            args=(thetas,), in_axes=(0,),
        )
        one = s.execute(
            type="expval",
            obs=[op.PauliZ(wires=0, record=False)],
            args=(thetas,), in_axes=(0,),
        )
        assert np.asarray(two).shape == (4, 2)
        assert np.asarray(one).shape == (4, 1)

    @pytest.mark.unittest
    def test_changing_obs_matrix_changes_result(self):
        # Same class/wires/shapes, different matrix values: content hash
        # must distinguish the plans.
        s = Script(self._circ, n_qubits=2)
        thetas = jnp.linspace(0.2, 1.0, 4)
        h1 = op.Hermitian(jnp.asarray(np.diag([1.0, 0.0]).astype(complex)),
                          wires=[0], record=False)
        h2 = op.Hermitian(jnp.asarray(np.diag([0.0, 1.0]).astype(complex)),
                          wires=[0], record=False)
        p0 = np.asarray(s.execute(type="expval", obs=[h1], args=(thetas,),
                                  in_axes=(0,)))
        p1 = np.asarray(s.execute(type="expval", obs=[h2], args=(thetas,),
                                  in_axes=(0,)))
        assert np.allclose(p0 + p1, 1.0, atol=1e-6)
        assert not np.allclose(p0, p1, atol=1e-3)

    @pytest.mark.unittest
    def test_single_path_obs_cache(self):
        s = Script(self._circ, n_qubits=2)
        theta = jnp.asarray(0.7)
        a = np.asarray(s.execute(
            type="expval",
            obs=[op.PauliZ(wires=0, record=False), op.PauliZ(wires=1, record=False)],
            args=(theta,),
        ))
        b = np.asarray(s.execute(
            type="expval", obs=[op.PauliZ(wires=1, record=False)], args=(theta,),
        ))
        assert a.shape == (2,) and b.shape == (1,)
        assert np.isclose(a[1], b[0], atol=1e-6)
