"""Interpret-mode tests for the Pallas TPU window kernels.

On CPU sessions the kernels are disabled in the hot path
(``pallas_kernels.ENABLED`` is only set on TPU backends); these tests
exercise the kernels directly with ``interpret=True``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qml_essentials_tpu.ops import kernels, pallas_kernels


@pytest.fixture(autouse=True)
def _split3_gram():
    """Pin the backward gram to full precision for these parity tests.

    The production default (raw-bf16 gram contractions) trades ~1e-4
    relative matrix-cotangent error at wide reductions for a 9->3 MXU pass
    cut; the kernel-mechanics tests here assert f32-level parity, so they
    run with the split3 gram.  ``test_bf16_gram_error_bounds`` checks the
    default mode's error explicitly.
    """
    prev = pallas_kernels.GRAM_MODE
    pallas_kernels.set_gram_mode("split3")
    yield
    pallas_kernels.set_gram_mode(prev)


def _unitary(k, seed):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(2**k, 2**k)) + 1j * rng.normal(size=(2**k, 2**k))
    q, _ = np.linalg.qr(m)
    return q


def _state(n, seed):
    rng = np.random.default_rng(seed)
    s = rng.normal(size=(2, 2**n)).astype(np.float32)
    return jnp.asarray(s / np.linalg.norm(s))


class TestWindowApply:
    @pytest.mark.unittest
    @pytest.mark.parametrize("n,a,k", [(12, 2, 3), (14, 3, 5), (14, 0, 6)])
    def test_forward_matches_einsum(self, n, a, k):
        q = _unitary(k, a)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        psi2 = _state(n, 1)
        wires = list(range(a, a + k))
        ref = kernels.apply_matrix_flat_ri(
            psi2, jnp.asarray(q.astype(np.complex64)), wires, n
        )
        out = pallas_kernels.window_apply_ri(psi2, w2, a, k, n, True)
        assert float(jnp.abs(out - ref).max()) < 1e-5

    @pytest.mark.unittest
    def test_custom_vjp_matches_autodiff(self):
        n, a, k = 13, 3, 4
        q = _unitary(k, 7)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        psi2 = _state(n, 2)
        wires = list(range(a, a + k))

        def f_pk(p, w):
            return jnp.sum(pallas_kernels.window_apply_ri(p, w, a, k, n, True) ** 2)

        def f_ref(p, w):
            mat = (w[0] + 1j * w[1]).astype(jnp.complex64)
            return jnp.sum(kernels.apply_matrix_flat_ri(p, mat, wires, n) ** 2)

        g1 = jax.grad(f_pk, argnums=(0, 1))(psi2, w2)
        g2 = jax.grad(f_ref, argnums=(0, 1))(psi2, w2)
        for x, y in zip(g1, g2):
            rel = float(jnp.abs(x - y).max() / (jnp.abs(y).max() + 1e-9))
            assert rel < 1e-4

    @pytest.mark.unittest
    def test_vmap_and_jit(self):
        n, a, k = 12, 2, 3
        q = _unitary(k, 3)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        batch = jnp.stack([_state(n, s) for s in range(3)])
        out = jax.jit(
            jax.vmap(lambda p: pallas_kernels.window_apply_ri(p, w2, a, k, n, True))
        )(batch)
        assert out.shape == batch.shape
        # norms preserved (unitary)
        norms = jnp.sum(out**2, axis=(1, 2))
        assert np.allclose(np.asarray(norms), np.sum(np.asarray(batch) ** 2, axis=(1, 2)), atol=1e-5)

    @pytest.mark.unittest
    def test_usable_gating(self):
        assert not pallas_kernels.usable(0, 6, 12)  # below MIN_N
        old = pallas_kernels.ENABLED
        pallas_kernels.ENABLED = True
        try:
            assert pallas_kernels.usable(7, 6, 24)
            assert not pallas_kernels.usable(17, 6, 24)  # B < 128
            assert not pallas_kernels.usable(7, 2, 24)  # K < 8
        finally:
            pallas_kernels.ENABLED = old

    @pytest.mark.unittest
    def test_identity_padded_small_gate_path(self):
        """k<=2 gates at large n pad to a 3-qubit window; verify the padded
        matrix equals U (x) I semantically via the interpret kernel."""
        n, a, k = 13, 2, 2
        q = _unitary(k, 9)
        w2_padded = jnp.asarray(
            np.stack(
                [np.kron(q.real, np.eye(2)), np.kron(q.imag, np.eye(2))]
            ).astype(np.float32)
        )
        psi2 = _state(n, 4)
        wires = list(range(a, a + k))
        ref = kernels.apply_matrix_flat_ri(
            psi2, jnp.asarray(q.astype(np.complex64)), wires, n
        )
        out = pallas_kernels.window_apply_ri(psi2, w2_padded, a, 3, n, True)
        assert float(jnp.abs(out - ref).max()) < 1e-5

    @pytest.mark.unittest
    def test_precision_modes(self):
        """split3 (bf16 hi/lo x3) must track the f32-exact mode to ~1e-5
        relative; unknown modes are rejected."""
        n, a, k = 14, 1, 4
        q = _unitary(k, 3)
        w2 = jnp.asarray(
            np.stack([q.real, q.imag]).astype(np.float32)
        )
        psi2 = _state(n, 7)

        prev = pallas_kernels.PRECISION_MODE
        try:
            pallas_kernels.set_precision_mode("highest")
            exact = pallas_kernels.window_apply_ri(psi2, w2, a, k, n, True)
            pallas_kernels.set_precision_mode("split3")
            fast = pallas_kernels.window_apply_ri(psi2, w2, a, k, n, True)
        finally:
            pallas_kernels.PRECISION_MODE = prev

        scale = float(jnp.abs(exact).max())
        rel = float(jnp.abs(fast - exact).max()) / scale
        assert rel < 5e-5, rel

        with pytest.raises(ValueError):
            pallas_kernels.set_precision_mode("bogus")


class TestTopWindow:
    """Exact-top windows ([n-k, n), B = 1): the X @ W^T kernel family."""

    @pytest.mark.unittest
    @pytest.mark.parametrize("n,k", [(12, 3), (13, 4), (14, 7)])
    def test_forward_matches_einsum(self, n, k):
        q = _unitary(k, 11)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        psi2 = _state(n, 5)
        wires = list(range(n - k, n))
        ref = kernels.apply_matrix_flat_ri(
            psi2, jnp.asarray(q.astype(np.complex64)), wires, n
        )
        out = pallas_kernels.window_apply_top_ri(psi2, w2, k, n, True)
        assert float(jnp.abs(out - ref).max()) < 1e-5

    @pytest.mark.unittest
    def test_custom_vjp_matches_autodiff(self):
        n, k = 13, 4
        q = _unitary(k, 13)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        psi2 = _state(n, 6)
        wires = list(range(n - k, n))

        def f_pk(p, w):
            return jnp.sum(
                pallas_kernels.window_apply_top_ri(p, w, k, n, True) ** 2
            )

        def f_ref(p, w):
            mat = (w[0] + 1j * w[1]).astype(jnp.complex64)
            return jnp.sum(kernels.apply_matrix_flat_ri(p, mat, wires, n) ** 2)

        g1 = jax.grad(f_pk, argnums=(0, 1))(psi2, w2)
        g2 = jax.grad(f_ref, argnums=(0, 1))(psi2, w2)
        for x, y in zip(g1, g2):
            assert float(jnp.abs(x - y).max()) < 2e-4

    @pytest.mark.unittest
    def test_adjoint_step_reconstructs_and_matches(self):
        """adjoint_step_top_ri must (a) invert the forward, (b) produce the
        same cotangents as the generic window_apply adjoint."""
        n, k = 12, 3
        q = _unitary(k, 17)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        x2 = _state(n, 8)
        lam2 = _state(n, 9)

        y2 = pallas_kernels.window_apply_top_ri(x2, w2, k, n, True)
        x_rec, lam_prev, gw = pallas_kernels.adjoint_step_top_ri(
            y2, lam2, w2, k, n, True
        )
        assert float(jnp.abs(x_rec - x2).max()) < 1e-5  # unitarity undo

        # Reference cotangents from the generic left-multiply machinery.
        from qml_essentials_tpu.ops import adjoint as adj

        wires = list(range(n - k, n))
        wh = adj._conj_pair_mat(w2)
        x_ref = kernels.apply_matrix_pair_ri(y2, wh, wires, n)
        gw_ref = adj._window_cotangent(lam2, x_ref, wires, n)
        lam_ref = kernels.apply_matrix_pair_ri(lam2, wh, wires, n)
        assert float(jnp.abs(lam_prev - lam_ref).max()) < 1e-5
        assert float(jnp.abs(gw - gw_ref).max()) < 1e-4

    @pytest.mark.unittest
    def test_usable_top_gating(self):
        old = pallas_kernels.ENABLED
        pallas_kernels.ENABLED = True
        try:
            assert pallas_kernels.usable_top(17, 7, 24)
            assert pallas_kernels.usable_top(16, 8, 24)
            assert not pallas_kernels.usable_top(15, 8, 24)  # not at top
            assert not pallas_kernels.usable_top(18, 6, 24)  # K < 128
        finally:
            pallas_kernels.ENABLED = old


class TestRotatePair:
    @pytest.mark.unittest
    def test_pair_matches_two_singles(self):
        """rotate_pair_ri == two independent rotate_ri calls (interpret)."""
        n, r = 15, 8
        p2 = _state(n, 31)
        l2 = _state(n, 32)
        pp, lp = pallas_kernels.rotate_pair_ri(p2, l2, r, n, True)
        pr = pallas_kernels.rotate_ri(p2, r, n, True)
        lr = pallas_kernels.rotate_ri(l2, r, n, True)
        assert float(jnp.abs(pp - pr).max()) == 0.0
        assert float(jnp.abs(lp - lr).max()) == 0.0

    @pytest.mark.unittest
    def test_pair_roundtrip(self):
        n, r = 15, 7
        p2 = _state(n, 33)
        l2 = _state(n, 34)
        pp, lp = pallas_kernels.rotate_pair_ri(p2, l2, r, n, True)
        pb, lb = pallas_kernels.rotate_pair_ri(pp, lp, (n - r) % n, n, True)
        assert float(jnp.abs(pb - p2).max()) == 0.0
        assert float(jnp.abs(lb - l2).max()) == 0.0


class TestRotFusedWindows:
    """rotmat / matrot: rotation-fused window kernels (interpret mode)."""

    def _ref_rotmat(self, psi2, q, r, n):
        out = kernels._rotate_qubits_ri(psi2, r, n)
        return kernels.apply_matrix_flat_ri(
            out, jnp.asarray(q.astype(np.complex64)), list(range(r)), n
        )

    def _ref_matrot(self, psi2, q, r, n):
        out = kernels.apply_matrix_flat_ri(
            psi2, jnp.asarray(q.astype(np.complex64)), list(range(n - r)), n
        )
        return kernels._rotate_qubits_ri(out, r, n)

    @pytest.mark.unittest
    @pytest.mark.parametrize("n,r", [(12, 8), (13, 8), (14, 9)])
    def test_rotmat_forward(self, n, r):
        q = _unitary(r, 21)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        psi2 = _state(n, 22)
        ref = self._ref_rotmat(psi2, q, r, n)
        out = pallas_kernels.rotmat_apply_ri(psi2, w2, r, n, True)
        assert float(jnp.abs(out - ref).max()) < 1e-5

    @pytest.mark.unittest
    @pytest.mark.parametrize("n,r", [(12, 4), (13, 5), (14, 5)])
    def test_matrot_forward(self, n, r):
        k = n - r
        q = _unitary(k, 23)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        psi2 = _state(n, 24)
        ref = self._ref_matrot(psi2, q, r, n)
        out = pallas_kernels.matrot_apply_ri(psi2, w2, r, n, True)
        assert float(jnp.abs(out - ref).max()) < 1e-5

    @pytest.mark.unittest
    def test_rotmat_custom_vjp(self):
        n, r = 12, 8
        q = _unitary(r, 25)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        psi2 = _state(n, 26)

        def f_pk(p, w):
            return jnp.sum(pallas_kernels.rotmat_apply_ri(p, w, r, n, True) ** 2)

        def f_ref(p, w):
            mat = (w[0] + 1j * w[1]).astype(jnp.complex64)
            out = kernels._rotate_qubits_ri(p, r, n)
            out = kernels.apply_matrix_flat_ri(out, mat, list(range(r)), n)
            return jnp.sum(out**2)

        g1 = jax.grad(f_pk, argnums=(0, 1))(psi2, w2)
        g2 = jax.grad(f_ref, argnums=(0, 1))(psi2, w2)
        for x, y in zip(g1, g2):
            rel = float(jnp.abs(x - y).max() / (jnp.abs(y).max() + 1e-9))
            assert rel < 1e-4

    @pytest.mark.unittest
    def test_matrot_custom_vjp(self):
        n, r = 12, 4
        k = n - r
        q = _unitary(k, 27)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        psi2 = _state(n, 28)

        def f_pk(p, w):
            return jnp.sum(pallas_kernels.matrot_apply_ri(p, w, r, n, True) ** 2)

        def f_ref(p, w):
            mat = (w[0] + 1j * w[1]).astype(jnp.complex64)
            out = kernels.apply_matrix_flat_ri(p, mat, list(range(k)), n)
            out = kernels._rotate_qubits_ri(out, r, n)
            return jnp.sum(out**2)

        g1 = jax.grad(f_pk, argnums=(0, 1))(psi2, w2)
        g2 = jax.grad(f_ref, argnums=(0, 1))(psi2, w2)
        for x, y in zip(g1, g2):
            rel = float(jnp.abs(x - y).max() / (jnp.abs(y).max() + 1e-9))
            assert rel < 1e-4

    @pytest.mark.unittest
    def test_adjoint_rotmat_reconstructs_and_matches(self):
        """adjoint_rotmat_ri must invert the fused forward and produce the
        same cotangents as the unfused (rotate-pair + adjoint-step) walk."""
        n, r = 12, 8
        q = _unitary(r, 29)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        x2 = _state(n, 30)
        lam2 = _state(n, 41)

        y2 = pallas_kernels.rotmat_apply_ri(x2, w2, r, n, True)
        x_rec, lam_prev, gw = pallas_kernels.adjoint_rotmat_ri(
            y2, lam2, w2, r, n, True
        )
        assert float(jnp.abs(x_rec - x2).max()) < 1e-5

        from qml_essentials_tpu.ops import adjoint as adj

        wires = list(range(r))
        wh = adj._conj_pair_mat(w2)
        x_mid = kernels.apply_matrix_pair_ri(y2, wh, wires, n)
        gw_ref = adj._window_cotangent(lam2, x_mid, wires, n)
        lam_ref = kernels._rotate_qubits_ri(
            kernels.apply_matrix_pair_ri(lam2, wh, wires, n), (n - r) % n, n
        )
        assert float(jnp.abs(lam_prev - lam_ref).max()) < 1e-5
        assert float(jnp.abs(gw - gw_ref).max()) < 1e-4

    @pytest.mark.unittest
    def test_adjoint_matrot_reconstructs_and_matches(self):
        n, r = 12, 4
        k = n - r
        q = _unitary(k, 31)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        x2 = _state(n, 32)
        lam2 = _state(n, 43)

        y2 = pallas_kernels.matrot_apply_ri(x2, w2, r, n, True)
        x_rec, lam_prev, gw = pallas_kernels.adjoint_matrot_ri(
            y2, lam2, w2, r, n, True
        )
        assert float(jnp.abs(x_rec - x2).max()) < 1e-5

        from qml_essentials_tpu.ops import adjoint as adj

        wires = list(range(k))
        rinv = (n - r) % n
        y_mid = kernels._rotate_qubits_ri(y2, rinv, n)
        l_mid = kernels._rotate_qubits_ri(lam2, rinv, n)
        wh = adj._conj_pair_mat(w2)
        x_ref = kernels.apply_matrix_pair_ri(y_mid, wh, wires, n)
        gw_ref = adj._window_cotangent(l_mid, x_ref, wires, n)
        lam_ref = kernels.apply_matrix_pair_ri(l_mid, wh, wires, n)
        assert float(jnp.abs(x_rec - x2).max()) < 1e-5
        assert float(jnp.abs(lam_prev - lam_ref).max()) < 1e-5
        assert float(jnp.abs(gw - gw_ref).max()) < 1e-4

    @pytest.mark.unittest
    def test_rot_fusable_gating(self):
        assert pallas_kernels.rot_fusable(8, 8, 24)  # rotmat K=256
        assert pallas_kernels.rot_fusable(16, 8, 24)  # matrot K=256
        assert pallas_kernels.rot_fusable(9, 9, 24)  # K=512
        assert not pallas_kernels.rot_fusable(8, 7, 24)  # axis mismatch
        assert not pallas_kernels.rot_fusable(6, 6, 24)  # K=64 < lane tile
        assert not pallas_kernels.rot_fusable(8, 8, 12)  # complement < 7


class TestWideWindow:
    """K=1024 (10-qubit) windows: narrower lane tiles, same algebra."""

    @pytest.mark.unittest
    def test_forward_and_adjoint_k10(self):
        n, a, k = 13, 1, 10
        q = _unitary(k, 35)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        psi2 = _state(n, 36)
        wires = list(range(a, a + k))
        ref = kernels.apply_matrix_flat_ri(
            psi2, jnp.asarray(q.astype(np.complex64)), wires, n
        )
        out = pallas_kernels.window_apply_ri(psi2, w2, a, k, n, True)
        assert float(jnp.abs(out - ref).max()) < 2e-5

        lam2 = _state(n, 37)
        x_rec, lam_prev, gw = pallas_kernels.adjoint_step_ri(
            ref, lam2, w2, a, k, n, True
        )
        assert float(jnp.abs(x_rec - psi2).max()) < 2e-5

        from qml_essentials_tpu.ops import adjoint as adj

        wh = adj._conj_pair_mat(w2)
        lam_ref = kernels.apply_matrix_pair_ri(lam2, wh, wires, n)
        gw_ref = adj._window_cotangent(lam2, psi2, wires, n)
        assert float(jnp.abs(lam_prev - lam_ref).max()) < 2e-5
        assert float(jnp.abs(gw - gw_ref).max()) < 2e-4

    @pytest.mark.unittest
    def test_usable_k10(self):
        old = pallas_kernels.ENABLED
        pallas_kernels.ENABLED = True
        try:
            assert pallas_kernels.usable(7, 10, 24)
            assert not pallas_kernels.usable(7, 11, 24)  # K = 2048
        finally:
            pallas_kernels.ENABLED = old


class TestRotwinKernel:
    """rotwin: generalized (rotation r, window [0, k)) fusion, k > r."""

    @staticmethod
    def _unitary(k, seed):
        rng = np.random.default_rng(seed)
        m = rng.normal(size=(2**k, 2**k)) + 1j * rng.normal(size=(2**k, 2**k))
        q, _ = np.linalg.qr(m)
        return q.astype(np.complex64)

    @staticmethod
    def _state(n, seed=0):
        rng = np.random.default_rng(seed)
        s = rng.normal(size=(2, 2**n)).astype(np.float32)
        return jnp.asarray(s / np.linalg.norm(s))

    def _ref(self, psi2, q, r, k, n):
        out = kernels._rotate_qubits_ri(psi2, r, n)
        return kernels.apply_matrix_flat_ri(
            out, jnp.asarray(q), list(range(k)), n
        )

    @pytest.mark.unittest
    @pytest.mark.parametrize("n,r,k", [(16, 7, 8), (16, 7, 9), (17, 8, 9), (18, 8, 10)])
    def test_rotwin_forward(self, n, r, k):
        q = self._unitary(k, 11)
        psi2 = self._state(n)
        w2 = jnp.asarray(np.stack([q.real, q.imag]))
        got = pallas_kernels.rotwin_apply_ri(psi2, w2, r, k, n, True)
        ref = self._ref(psi2, q, r, k, n)
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 2e-5

    @pytest.mark.unittest
    def test_rotwin_custom_vjp(self):
        n, r, k = 16, 7, 9
        q = self._unitary(k, 5)
        psi2 = self._state(n, 3)
        w2 = jnp.asarray(np.stack([q.real, q.imag]))
        weights = jnp.asarray(
            np.random.default_rng(9).normal(size=(2, 2**n)).astype(np.float32)
        )

        def f_fused(p, w):
            out = pallas_kernels.rotwin_apply_ri(p, w, r, k, n, True)
            return jnp.sum(out * weights)

        def f_ref(p, w):
            out = kernels._rotate_qubits_ri(p, r, n)
            out = kernels.apply_matrix_pair_ri(out, w, list(range(k)), n)
            return jnp.sum(out * weights)

        v1, g1 = jax.value_and_grad(f_fused, argnums=(0, 1))(psi2, w2)
        v2, g2 = jax.value_and_grad(f_ref, argnums=(0, 1))(psi2, w2)
        assert np.isclose(float(v1), float(v2), atol=1e-4)
        for a, b in zip(g1, g2):
            assert float(jnp.abs(a - b).max()) < 5e-4, (a.shape)

    @pytest.mark.unittest
    def test_rotwin_usable_gating(self):
        pallas_kernels.ENABLED = True
        try:
            assert pallas_kernels.rot_prefix_fusable(8, 9, 24)
            assert pallas_kernels.rot_prefix_fusable(8, 10, 24)
            assert not pallas_kernels.rot_prefix_fusable(8, 11, 24)  # e > 2
            assert not pallas_kernels.rot_prefix_fusable(6, 8, 24)  # r < 7
            assert not pallas_kernels.rot_prefix_fusable(8, 10, 16)  # X < 128
        finally:
            pallas_kernels.ENABLED = False


class TestGramMode:
    @pytest.mark.unittest
    def test_bf16_gram_error_bounds(self):
        """The production bf16 gram only perturbs the *matrix* cotangent,
        within bf16-truncation bounds; the state cotangent is untouched."""
        n, a, k = 13, 3, 4
        q = _unitary(k, 7)
        w2 = jnp.asarray(np.stack([q.real, q.imag]).astype(np.float32))
        psi2 = _state(n, 2)

        def f_pk(p, w):
            return jnp.sum(
                pallas_kernels.window_apply_ri(p, w, a, k, n, True) ** 2
            )

        pallas_kernels.set_gram_mode("split3")
        g_ref = jax.grad(f_pk, argnums=(0, 1))(psi2, w2)
        pallas_kernels.set_gram_mode("bf16")
        try:
            g_lo = jax.grad(f_pk, argnums=(0, 1))(psi2, w2)
        finally:
            pallas_kernels.set_gram_mode("split3")

        # State cotangent: identical path (split3), must match tightly.
        rel_state = float(
            jnp.abs(g_lo[0] - g_ref[0]).max()
            / (jnp.abs(g_ref[0]).max() + 1e-9)
        )
        assert rel_state < 1e-5
        # Matrix cotangent: bf16 input truncation over a 64-column
        # reduction here.  At production sizes (2**16 columns, 24 qubits)
        # the measured error is 1.7e-4 rel-to-peak.
        rel_mat = float(
            jnp.abs(g_lo[1] - g_ref[1]).max()
            / (jnp.abs(g_ref[1]).max() + 1e-9)
        )
        assert rel_mat < 5e-3
