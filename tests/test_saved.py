"""Saved-residual plan executor (ops/saved.py): equivalence + bf16 cotangent.

The plan-level saved executor replaces the per-kernel custom-VJP loop in the
large-state regime so the backward can carry the inter-step cotangent in
bfloat16 (docs/performance.md).  These tests pin, on a scheduled plan that
exercises the fused rotmat/mat backward launchers in interpret mode:

- f32-lambda saved execution == the per-kernel VJP loop (bit-equal math),
- the bf16-lambda gradient error stays at the scale the bf16 gram default
  already accepts (reference: the loop vs an einsum-f32 oracle),
- the cotangent dtype discipline (bf16 between steps, f32 at the JAX
  custom-VJP boundary),
- vmap composition through the plan-level custom VJP.

The reference's backward is plain autodiff through its einsum chain
(qml_essentials/simulation.py:91-104; no mixed-precision counterpart).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qml_essentials_tpu.ops import pallas_kernels, saved, simulation
from qml_essentials_tpu.ops import operations as op
from qml_essentials_tpu.ops.tape import recording

N = 16


def _forward(theta):
    with recording() as tape:
        for q in range(N):
            op.H(wires=q)
        for i in range(N):
            op.RY(theta[i % theta.shape[0]], wires=i)
        for q in range(N - 1):
            op.CX(wires=[q, q + 1])
        op.CX(wires=[N - 1, 0])
        for i in range(N):
            op.RZ(theta[(i + 1) % theta.shape[0]], wires=i)
    psi2 = simulation.simulate_pure_ri(tape, N)
    probs = psi2[0] ** 2 + psi2[1] ** 2
    half = probs.reshape(2, -1).sum(axis=1)
    return half[0] - half[1]


@pytest.fixture(scope="module")
def results():
    """Value/grad of the same circuit under every backward configuration,
    computed once (interpret-mode Pallas compiles are the cost here)."""
    theta0 = jnp.linspace(0.2, 1.3, 4).astype(jnp.float32)
    prev = (
        pallas_kernels.ENABLED,
        pallas_kernels.PALLAS_MIN_N,
        pallas_kernels.INTERPRET,
        simulation.BACKWARD_MODE,
        saved.ENABLED,
        saved.LAMBDA_MODE,
    )
    pallas_kernels.ENABLED = True
    pallas_kernels.PALLAS_MIN_N = N
    pallas_kernels.INTERPRET = True
    simulation.BACKWARD_MODE = "autodiff"

    out = {}
    hits = []
    orig_step_bwd = saved._step_bwd

    def spy(step, w2, lam, x, n, out_dt):
        hits.append((step[0], str(lam.dtype), np.dtype(out_dt).name))
        return orig_step_bwd(step, w2, lam, x, n, out_dt)

    try:
        # f32 einsum oracle (no pallas, no saved executor)
        pallas_kernels.ENABLED = False
        saved.ENABLED = False
        out["oracle"] = jax.value_and_grad(_forward)(theta0)
        pallas_kernels.ENABLED = True

        # per-kernel VJP loop (pre-round-3 default path)
        out["loop"] = jax.value_and_grad(_forward)(theta0)

        saved.ENABLED = True
        saved.LAMBDA_MODE = "f32"
        out["saved_f32"] = jax.value_and_grad(_forward)(theta0)

        saved.LAMBDA_MODE = "bf16"
        saved._step_bwd = spy
        out["saved_bf16"] = jax.value_and_grad(_forward)(theta0)
        out["hits"] = list(hits)
    finally:
        saved._step_bwd = orig_step_bwd
        (
            pallas_kernels.ENABLED,
            pallas_kernels.PALLAS_MIN_N,
            pallas_kernels.INTERPRET,
            simulation.BACKWARD_MODE,
            saved.ENABLED,
            saved.LAMBDA_MODE,
        ) = prev
    return out


@pytest.mark.unittest
def test_f32_lambda_matches_per_kernel_loop(results):
    """With f32 lambda the plan-level executor runs the same kernels in the
    same order as the per-kernel VJP loop: identical values and gradients."""
    v_loop, g_loop = results["loop"]
    v_sav, g_sav = results["saved_f32"]
    assert float(jnp.abs(v_sav - v_loop)) < 1e-7
    assert float(jnp.abs(g_sav - g_loop).max()) < 1e-6


@pytest.mark.unittest
def test_bf16_lambda_error_within_gram_budget(results):
    """bf16 cotangent storage must not exceed the error scale the bf16 gram
    default already accepts (both measured against the einsum-f32 oracle)."""
    _, g_oracle = results["oracle"]
    _, g_loop = results["loop"]
    _, g_bf16 = results["saved_bf16"]
    budget = float(jnp.abs(g_loop - g_oracle).max())
    err = float(jnp.abs(g_bf16 - g_oracle).max())
    assert err < max(4.0 * budget, 1e-5)


@pytest.mark.unittest
def test_bf16_lambda_dtype_discipline(results):
    """The cotangent enters f32 (rounding the seed cotangent was probed and
    rejected — see saved._bwd), travels bf16 between steps, and the earliest
    payload step restores the f32 custom-VJP boundary dtype."""
    hits = results["hits"]
    assert len(hits) >= 3
    # first backward step receives the f32 measurement cotangent
    assert hits[0][1] == "float32" and hits[0][2] == "bfloat16"
    # mid-plan steps carry bf16
    assert all(h[1] == "bfloat16" for h in hits[1:-1])
    # earliest payload step writes the f32 boundary cotangent
    assert hits[-1][2] == "float32"


@pytest.mark.unittest
def test_forward_value_unchanged(results):
    """The saved executor's primal is the same forward computation."""
    v_oracle, _ = results["oracle"]
    v_sav, _ = results["saved_bf16"]
    assert float(jnp.abs(v_sav - v_oracle)) < 5e-5


@pytest.mark.unittest
def test_lambda_mode_validation():
    with pytest.raises(ValueError):
        saved.set_lambda_mode("f16")
    saved.set_lambda_mode("f32")
    assert saved.LAMBDA_MODE == "f32"
    saved.set_lambda_mode("bf16")
    assert saved.LAMBDA_MODE == "bf16"


@pytest.mark.unittest
def test_usable_rejects_chain_plans():
    assert not saved.usable((("chain", None, None),), 30)


@pytest.mark.unittest
def test_adjoint_bf16_lambda_matches_f32(monkeypatch):
    """The adjoint executor honours the same lambda-mode knob: bf16 λ
    between fused steps must stay within the bf16 gram error budget."""
    monkeypatch.setattr(pallas_kernels, "ENABLED", True)
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_N", N)
    monkeypatch.setattr(pallas_kernels, "INTERPRET", True)
    monkeypatch.setattr(simulation, "BACKWARD_MODE", "adjoint")

    theta0 = jnp.linspace(0.2, 1.3, 4).astype(jnp.float32)
    monkeypatch.setattr(saved, "LAMBDA_MODE", "f32")
    v_f, g_f = jax.value_and_grad(_forward)(theta0)
    monkeypatch.setattr(saved, "LAMBDA_MODE", "bf16")
    v_b, g_b = jax.value_and_grad(_forward)(theta0)
    assert float(jnp.abs(v_b - v_f)) < 1e-7  # primal identical
    scale = max(float(jnp.abs(g_f).max()), 1e-6)
    assert float(jnp.abs(g_b - g_f).max()) < max(0.2 * scale, 1e-5)


@pytest.mark.slow
@pytest.mark.unittest
def test_vmap_through_saved_executor(monkeypatch):
    """Batched grads through the plan-level custom VJP match the loop."""
    monkeypatch.setattr(pallas_kernels, "ENABLED", True)
    monkeypatch.setattr(pallas_kernels, "PALLAS_MIN_N", N)
    monkeypatch.setattr(pallas_kernels, "INTERPRET", True)
    monkeypatch.setattr(simulation, "BACKWARD_MODE", "autodiff")

    thetas = jnp.stack(
        [
            jnp.linspace(0.2, 1.3, 4),
            jnp.linspace(-0.5, 0.8, 4),
        ]
    ).astype(jnp.float32)

    def loss(ths):
        return jax.vmap(_forward)(ths).sum()

    monkeypatch.setattr(saved, "ENABLED", True)
    monkeypatch.setattr(saved, "LAMBDA_MODE", "f32")
    g_sav = jax.grad(loss)(thetas)
    monkeypatch.setattr(saved, "ENABLED", False)
    g_loop = jax.grad(loss)(thetas)
    assert float(jnp.abs(g_sav - g_loop).max()) < 1e-6
