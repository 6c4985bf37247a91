"""Saved-residual plan executor with bfloat16 cotangent storage.

In the large-state regime the residual-autodiff backward is the default
gradient strategy (see :mod:`qml_essentials_tpu.ops.adjoint` and
docs/performance.md): each step keeps its input state as a residual — the
forward's own output buffer, no extra writes — and the backward moves three
state passes per step (read cotangent λ, read residual x, write λ').

The inter-step cotangent only ever feeds *parameter* gradients: the gram
contraction ``gw = λ x†`` already runs in raw bf16 by default
(``pallas_kernels.GRAM_MODE``), and the pullback ``λ' = W† λ`` is one
further unitary rotation away from any output.  Storing λ itself in
bfloat16 between steps therefore halves two of the backward's three DMA
streams (per-step traffic ~402 MB → ~268 MB at 24 qubits — the same as a
forward pass) and halves the pullback's MXU passes (the bf16 operand
carries no low split).  Measured on the 24q bench step shapes: 1.885 →
1.037 ms per backward step.

Accuracy: λ rounding (rel ~2⁻⁹ per step) accumulates as a random walk
across the plan; measured end-to-end against an f64 oracle on random
unitary windows (tools/exp_r7_err.py), a 15-step chain reaches ~0.7 %
relative λ drift and the worst per-step gram error is ~2.4× the existing
bf16-gram default.  Gradients feeding optimizers are insensitive at that
scale; :func:`set_lambda_mode` ("f32") restores full-precision storage for
oracle-grade comparisons.

Per-kernel ``jax.custom_vjp`` boundaries pin cotangent dtypes to the primal
f32, so the dtype change needs a *plan-level* custom VJP: the forward runs
the same fused kernels as the per-step loop while recording each step's
input state; the backward walks the plan in reverse, carrying λ in bf16
through the dtype-aware backward launchers (``out_dtype`` parameter) and
returning the f32 boundary cotangents JAX requires.

The reference differentiates by plain autodiff through its einsum chain
(qml_essentials/simulation.py:91-104); neither the residual strategy nor
the mixed-precision cotangent has a reference counterpart.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from qml_essentials_tpu.ops import kernels, pallas_kernels

# Escape hatch: route large-state gradients through the per-kernel VJP loop
# instead of the plan-level executor.
ENABLED: bool = True

# Storage dtype of the inter-step cotangent λ in the large-state backward:
#   "bf16" — bfloat16 λ between steps (default; see module docstring)
#   "f32"  — full-precision λ (matches the per-kernel VJP loop bit-for-bit
#            up to kernel scheduling)
# This knob governs BOTH backward executors — the saved-residual plan here
# AND the adjoint-state backward (ops/adjoint.py reads it for its own λ
# storage), so forcing BACKWARD_MODE="adjoint" still honors it.  For
# oracle-grade gradients set it to "f32" regardless of which executor runs.
LAMBDA_MODE: str = "bf16"


def set_lambda_mode(mode: str) -> None:
    """Select the backward cotangent storage dtype ("bf16" | "f32").

    Applies to every large-state backward executor: the saved-residual
    plan in this module and the adjoint-state path in
    :mod:`qml_essentials_tpu.ops.adjoint` (it reads ``LAMBDA_MODE`` for
    its inter-step λ as well).  Use "f32" for oracle-grade gradient
    comparisons.
    """
    global LAMBDA_MODE
    if mode not in ("bf16", "f32"):
        raise ValueError(f"Unknown lambda mode {mode!r}")
    LAMBDA_MODE = mode


def set_saved_executor(enabled: bool) -> None:
    """Enable/disable the plan-level saved-residual executor."""
    global ENABLED
    ENABLED = bool(enabled)


def usable(static: tuple, n: int) -> bool:
    """True when the plan-level saved executor should take a normalised
    plan: large-state Pallas regime, no chain steps (chains carry their own
    adjoint path)."""
    if not (pallas_kernels.ENABLED and n >= pallas_kernels.PALLAS_MIN_N):
        return False
    return all(s[0] != "chain" for s in static)


def _one_step(psi2: jnp.ndarray, w2: jnp.ndarray, step: tuple, n: int):
    """Forward-apply one payload-bearing normalised plan step.

    Mirrors :func:`qml_essentials_tpu.ops.adjoint._forward`'s dispatch so the
    fallback VJP (below) differentiates exactly the primal computation.
    """
    kind = step[0]
    if kind == "rotmat":
        r = step[1]
        kw = len(step[2])
        if kw == r and pallas_kernels.rotmat_usable(r, n):
            return pallas_kernels.rotmat_apply_ri(psi2, w2, r, n)
        if pallas_kernels.rotwin_usable(r, kw, n):
            return pallas_kernels.rotwin_apply_ri(psi2, w2, r, kw, n)
        psi2 = kernels._rotate_qubits_ri(psi2, r, n)
        return kernels.apply_matrix_pair_ri(psi2, w2, list(step[2]), n)
    if kind == "matrot":
        r = step[1]
        if pallas_kernels.matrot_usable(r, n):
            return pallas_kernels.matrot_apply_ri(psi2, w2, r, n)
        psi2 = kernels.apply_matrix_pair_ri(psi2, w2, list(step[2]), n)
        return kernels._rotate_qubits_ri(psi2, r, n)
    if kind == "mat":
        return kernels.apply_matrix_pair_ri(psi2, w2, list(step[1]), n)
    return kernels.apply_diagonal_pair_ri(psi2, w2, list(step[1]), n)


def _forward_saving(
    psi2: jnp.ndarray, payloads: tuple, static: tuple, n: int
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Run the plan, recording each payload step's input state.

    The saves are the forward's own intermediates (no extra computation or
    writes); under a primal-only trace they are dead values XLA drops.
    """
    saves: List[jnp.ndarray] = []
    i = 0
    for step in static:
        if step[0] == "rot":
            psi2 = kernels._rotate_qubits_ri(psi2, step[1], n)
            continue
        saves.append(psi2)
        psi2 = _one_step(psi2, payloads[i], step, n)
        i += 1
    return psi2, saves


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def execute_plan_saved_ri(
    psi2: jnp.ndarray, payloads: tuple, static: tuple, n: int
) -> jnp.ndarray:
    """Run a normalised plan with the saved-residual, bf16-λ backward."""
    return _forward_saving(psi2, payloads, static, n)[0]


def _fwd(psi2, payloads, static, n):
    out, saves = _forward_saving(psi2, payloads, static, n)
    return out, (tuple(saves), payloads)


def _step_bwd(step, w2, lam, x, n, out_dt):
    """One backward step: returns (λ', gw) for ``y = step(x, w)`` given the
    output cotangent ``lam`` and the saved input ``x``.

    Dispatches the fused dtype-aware Pallas backward launchers where the
    forward used the matching fused kernel; anything else differentiates the
    step's own forward with ``jax.vjp`` (exact, f32 — later steps accept the
    f32 λ transparently)."""
    kind = step[0]
    if kind == "rotmat":
        r = step[1]
        kw = len(step[2])
        if kw == r and pallas_kernels.rotmat_usable(r, n):
            return pallas_kernels._rotmat_apply_bwd(
                w2, lam, x, r, n, out_dtype=out_dt
            )
        if pallas_kernels.rotwin_usable(r, kw, n):
            return pallas_kernels._rotwin_apply_bwd(
                w2, lam, x, r, kw, n, out_dtype=out_dt
            )
    elif kind == "matrot":
        r = step[1]
        if pallas_kernels.matrot_usable(r, n):
            return pallas_kernels._matrot_apply_bwd(
                w2, lam, x, r, n, out_dtype=out_dt
            )
    elif kind == "mat":
        srt = [int(w) for w in step[1]]
        k = len(srt)
        if srt == list(range(srt[0], srt[0] + k)):
            a = srt[0]
            if pallas_kernels.usable_top(a, k, n):
                return pallas_kernels._apply_top_bwd(
                    w2, lam, x, k, n, out_dtype=out_dt
                )
            if k >= 3 and pallas_kernels.usable(a, k, n):
                return pallas_kernels._apply_bwd(
                    w2, lam, x, a, k, n, out_dtype=out_dt
                )

    _, vjp = jax.vjp(lambda xx, ww: _one_step(xx, ww, step, n), x, w2)
    glam, gw = vjp(lam.astype(x.dtype))
    return glam, gw


def _bwd(static, n, res, g):
    saves, payloads = res
    use16 = (
        LAMBDA_MODE == "bf16"
        and pallas_kernels.ENABLED
        and n >= pallas_kernels.PALLAS_MIN_N
    )

    steps = []
    i = 0
    for step in static:
        if step[0] == "rot":
            steps.append((step, None))
        else:
            steps.append((step, i))
            i += 1

    # The boundary cotangent stays f32.  Casting it bf16 at entry was
    # probed (it fuses into the expval pullback: half the boundary write
    # and the last window's read, 39.9 → 38.6 ms on the 24q bench) but
    # rejected: rounding the *seed* cotangent feeds every step's gram and
    # measured ~4e-3 absolute gradient error on near-cancelling gradients —
    # 8x the accepted bf16-λ budget (see docs/performance.md).
    lam = g
    grads: List[Optional[jnp.ndarray]] = [None] * len(payloads)
    for step, slot in reversed(steps):
        if slot is None:
            rinv = (n - step[1]) % n
            if pallas_kernels.ENABLED and pallas_kernels.rotate_usable(rinv, n):
                lam = pallas_kernels._rotate(lam, rinv, n)
            else:
                lam = kernels._rotate_qubits_ri(lam, rinv, n)
            continue
        # The earliest payload step writes the f32 boundary cotangent JAX
        # requires (any rot steps before it preserve dtype).
        out_dt = jnp.bfloat16 if (use16 and slot > 0) else jnp.float32
        lam, gw = _step_bwd(step, payloads[slot], lam, saves[slot], n, out_dt)
        grads[slot] = gw

    return lam.astype(g.dtype), tuple(grads)


execute_plan_saved_ri.defvjp(_fwd, _bwd)
