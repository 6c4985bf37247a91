"""Adjoint-state differentiation of the pure-state contraction plan.

Reverse-mode autodiff through a depth-``D`` statevector simulation saves
every intermediate state as a residual: O(D·2**n) HBM for the backward
sweep, which dominates cost in the large-state regime.  Quantum circuits
are unitary, so residuals are unnecessary — the backward sweep can
*reconstruct* each input state by applying the inverted step to the output
state:

    ψ_{j-1} = U_j† ψ_j            (undo — unitarity)
    gw_j    = λ_j ψ_{j-1}†        (window-matrix cotangent)
    λ_{j-1} = U_j† λ_j            (cotangent pullback)

Residual footprint: the *final* state only.  Backward traffic: 2 state
reads + 2 state writes per step (the fused Pallas kernel
:func:`~qml_essentials_tpu.ops.pallas_kernels.adjoint_step_ri` does all
three lines in one pass) versus autodiff's residual write + 3 reads.

The plan-level function :func:`execute_plan_ri` is a ``jax.custom_vjp``
over a *normalised* plan: a static step list (hashable metadata) plus a
tuple of real-split payload arrays — window matrices as ``(2, K, K)``
(Re, Im) pairs and diagonals as ``(2, 2**k)`` pairs.  Keeping payloads
real sidesteps complex-cotangent conventions; upstream autodiff through
``jnp.stack([real(m), imag(m)])`` recovers parameter gradients through
the window composition.

This is the build's replacement for the reference's plain autodiff through
its einsum chain (the reference has no adjoint path; its multi-device /
performance seam is the comment at qml_essentials/script.py:443-453).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qml_essentials_tpu.ops import kernels, pallas_kernels
from qml_essentials_tpu.ops.operations import (
    DiagonalQubitUnitary,
    KrausChannel,
    Operation,
)

# Session flag: route pure-state simulation through the adjoint-state
# custom VJP.  The pure-state path only ever applies unitaries (channels
# force the density path), which is exactly the adjoint's soundness
# condition; disable for debugging or double differentiation (the adjoint
# backward is itself not differentiated).
ENABLED: bool = True


def set_adjoint(enabled: bool) -> None:
    """Enable/disable adjoint-state differentiation of pure-state plans."""
    global ENABLED
    ENABLED = bool(enabled)


def _pair(x: jnp.ndarray) -> jnp.ndarray:
    """Stack an array into its (Re, Im) pair (real inputs get zero Im)."""
    if jnp.iscomplexobj(x):
        return jnp.stack([jnp.real(x), jnp.imag(x)])
    return jnp.stack([x, jnp.zeros_like(x)])


def normalize_plan(
    plan: List[Tuple[str, object, List[int]]], n: int
) -> Optional[Tuple[tuple, tuple]]:
    """Normalise a contraction plan for the adjoint executor.

    Accepts both raw :func:`~qml_essentials_tpu.ops.simulation.plan_contractions`
    output (kinds ``mat``/``op``) and scheduled plans (kinds
    ``mat``/``diag``/``rot``).  Returns ``(static, payloads)`` where
    ``static`` is a hashable tuple of steps — ``("mat", wires)``,
    ``("diag", wires)``, ``("rot", r)`` with wires sorted (payloads
    pre-permuted to sorted order) — and ``payloads`` the matching tuple of
    real-split arrays.  Returns ``None`` if the plan contains anything the
    unitary adjoint cannot invert (noise channels).
    """
    from qml_essentials_tpu.ops import chains as _chains

    static: list = []
    payloads: list = []
    for kind, payload, wires in plan:
        if kind == "rot":
            static.append(("rot", int(payload)))
            continue
        if kind == "chain":
            geom, descs, pays = payload
            if pallas_kernels.chain_usable(geom, descs, n):
                static.append(("chain", geom, descs))
                payloads.extend(_pair(p) for p in pays)
            else:
                # Expand into the plain step vocabulary (CPU / small-state
                # backends reuse the existing per-window machinery).
                for (k2, w2), p in zip(
                    _chains.expand_chain_step(geom, descs, n), pays
                ):
                    static.append((k2, tuple(w2)))
                    payloads.append(_pair(p))
            continue
        if kind in ("rotmat", "matrot"):
            r, mat = payload
            static.append((kind, int(r), tuple(int(w) for w in wires)))
            payloads.append(_pair(mat))
            continue
        if kind == "diag":
            d, w = payload, list(wires)
        elif kind == "mat":
            d, w = None, list(wires)
            mat = payload
        else:  # "op"
            op = payload
            if isinstance(op, KrausChannel):
                return None
            cls = op.__class__
            if cls.apply_to_state_ri is not Operation.apply_to_state_ri:
                if isinstance(op, DiagonalQubitUnitary):
                    d, w = op.diag, list(op.wires)
                else:
                    continue  # no-op override (Id, Barrier)
            else:
                d, w = None, list(op.wires)
                mat = op.matrix

        k = len(w)
        srt = sorted(int(x) for x in w)
        if d is not None:
            if w != srt:
                dt = d.reshape((2,) * k)
                order = [w.index(x) for x in srt]
                d = jnp.transpose(dt, order).reshape(-1)
            static.append(("diag", tuple(srt)))
            payloads.append(_pair(d))
        else:
            if w != srt:
                rank = {x: i for i, x in enumerate(srt)}
                mat = kernels.permute_gate_qubits(mat, [rank[x] for x in w], k)
            static.append(("mat", tuple(srt)))
            payloads.append(_pair(mat))
    return tuple(static), tuple(payloads)


def _window_cotangent(
    lam2: jnp.ndarray, x2: jnp.ndarray, srt: Sequence[int], n: int
) -> jnp.ndarray:
    """Matrix cotangent ``gw = λ conj(x)^T`` restricted to the window.

    ``lam2`` is the step-output cotangent, ``x2`` the (reconstructed)
    step-input state; both real-split ``(2, 2**n)``.  Returns the
    ``(2, K, K)`` (Re, Im) pair matching the forward's real-split algebra.
    """
    srt = [int(w) for w in srt]
    k = len(srt)
    if srt == list(range(srt[0], srt[0] + k)):
        A = 2 ** srt[0]
        dim = lam2.shape[-1]
        B = dim // (A * 2**k)
        lv = lam2.reshape(2, A, 2**k, B)
        xv = x2.reshape(2, A, 2**k, B)
    else:
        pulls, _ = kernels._gather_plan(tuple(srt))
        for p in pulls:
            lam2 = kernels._move_axis_front_ri(lam2, p)
            x2 = kernels._move_axis_front_ri(x2, p)
        lv = lam2.reshape(2, 1, 2**k, -1)
        xv = x2.reshape(2, 1, 2**k, -1)
    lr, li = lv[0], lv[1]
    xr, xi = xv[0], xv[1]
    prec = kernels._PRECISION
    s1 = jnp.einsum("aib,ajb->ij", lr, xr, precision=prec)
    s2 = jnp.einsum("aib,ajb->ij", li, xi, precision=prec)
    s3 = jnp.einsum("aib,ajb->ij", lr + li, xr - xi, precision=prec)
    return jnp.stack([s1 + s2, s3 - s1 + s2])


def _diag_cotangent(
    lam2: jnp.ndarray, x2: jnp.ndarray, srt: Sequence[int], n: int
) -> jnp.ndarray:
    """Diagonal cotangent: ``gd[j] = sum_{a,b} λ[a,j,b] conj(x)[a,j,b]``."""
    srt = [int(w) for w in srt]
    k = len(srt)
    if srt == list(range(srt[0], srt[0] + k)):
        A = 2 ** srt[0]
        dim = lam2.shape[-1]
        B = dim // (A * 2**k)
        lv = lam2.reshape(2, A, 2**k, B)
        xv = x2.reshape(2, A, 2**k, B)
    else:
        pulls, _ = kernels._gather_plan(tuple(srt))
        for p in pulls:
            lam2 = kernels._move_axis_front_ri(lam2, p)
            x2 = kernels._move_axis_front_ri(x2, p)
        lv = lam2.reshape(2, 1, 2**k, -1)
        xv = x2.reshape(2, 1, 2**k, -1)
    lr, li = lv[0], lv[1]
    xr, xi = xv[0], xv[1]
    gr = jnp.sum(lr * xr + li * xi, axis=(0, 2))
    gi = jnp.sum(li * xr - lr * xi, axis=(0, 2))
    return jnp.stack([gr, gi])


def _conj_pair_mat(w2: jnp.ndarray) -> jnp.ndarray:
    """Real-split conjugate transpose: (Re, Im) -> (Re^T, -Im^T)."""
    return jnp.stack([jnp.swapaxes(w2[0], -2, -1), -jnp.swapaxes(w2[1], -2, -1)])


def _adjoint_step_contiguous(
    psi2: jnp.ndarray,
    lam2: jnp.ndarray,
    w2: jnp.ndarray,
    srt: Sequence[int],
    n: int,
    lam_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One adjoint-state backward step on a contiguous support.

    Routes to the fused Pallas kernels (top-of-register / mid-register)
    when available; otherwise undoes with the conjugate window and reduces
    the cotangent with plain einsums (always f32 — ``lam_dtype`` only
    steers the fused kernels' λ output, see ops/saved.py for the bf16
    cotangent rationale).
    """
    a, k = srt[0], len(srt)
    if pallas_kernels.ENABLED and pallas_kernels.usable_top(a, k, n):
        return pallas_kernels.adjoint_step_top_ri(
            psi2, lam2, w2, k, n, lam_dtype=lam_dtype
        )
    if pallas_kernels.ENABLED and pallas_kernels.usable(a, k, n):
        return pallas_kernels.adjoint_step_ri(
            psi2, lam2, w2, a, k, n, lam_dtype=lam_dtype
        )
    lam2 = lam2.astype(psi2.dtype)
    wh = _conj_pair_mat(w2)
    psi2 = kernels.apply_matrix_pair_ri(psi2, wh, list(srt), n)
    gw = _window_cotangent(lam2, psi2, srt, n)
    lam2 = kernels.apply_matrix_pair_ri(lam2, wh, list(srt), n)
    return psi2, lam2, gw


def _forward(psi2: jnp.ndarray, payloads: tuple, static: tuple, n: int) -> jnp.ndarray:
    i = 0
    for step in static:
        kind = step[0]
        if kind == "chain":
            geom, descs = step[1], step[2]
            pays = payloads[i : i + len(descs)]
            psi2 = pallas_kernels.chain_apply_ri(psi2, pays, geom, descs, n)
            i += len(descs)
        elif kind == "rot":
            psi2 = kernels._rotate_qubits_ri(psi2, step[1], n)
        elif kind == "rotmat":
            r = step[1]
            kw = len(step[2])
            if kw == r and pallas_kernels.rotmat_usable(r, n):
                psi2 = pallas_kernels.rotmat_apply_ri(psi2, payloads[i], r, n)
            elif pallas_kernels.rotwin_usable(r, kw, n):
                psi2 = pallas_kernels.rotwin_apply_ri(psi2, payloads[i], r, kw, n)
            else:
                psi2 = kernels._rotate_qubits_ri(psi2, r, n)
                psi2 = kernels.apply_matrix_pair_ri(
                    psi2, payloads[i], list(step[2]), n
                )
            i += 1
        elif kind == "matrot":
            r = step[1]
            if pallas_kernels.matrot_usable(r, n):
                psi2 = pallas_kernels.matrot_apply_ri(psi2, payloads[i], r, n)
            else:
                psi2 = kernels.apply_matrix_pair_ri(
                    psi2, payloads[i], list(step[2]), n
                )
                psi2 = kernels._rotate_qubits_ri(psi2, r, n)
            i += 1
        elif kind == "mat":
            psi2 = kernels.apply_matrix_pair_ri(psi2, payloads[i], list(step[1]), n)
            i += 1
        else:
            psi2 = kernels.apply_diagonal_pair_ri(psi2, payloads[i], list(step[1]), n)
            i += 1
    return psi2


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def execute_plan_ri(
    psi2: jnp.ndarray, payloads: tuple, static: tuple, n: int
) -> jnp.ndarray:
    """Run a normalised plan on a real-split state with adjoint-state VJP."""
    return _forward(psi2, payloads, static, n)


def _fwd(psi2, payloads, static, n):
    out = _forward(psi2, payloads, static, n)
    return out, (out, payloads)


def _bwd(static, n, res, g):
    psi2, payloads = res
    lam2 = g
    grads: List[Optional[jnp.ndarray]] = [None] * len(payloads)

    # bf16 cotangent storage between fused steps (same rationale and knob
    # as the saved-residual executor, ops/saved.py): the adjoint step's
    # four DMA streams become 2 f32 (ψ undo) + 2 bf16 (λ) — 25% less
    # traffic.  Fallback (einsum) branches stay f32.
    from qml_essentials_tpu.ops import saved as _saved

    use16 = (
        _saved.LAMBDA_MODE == "bf16"
        and pallas_kernels.ENABLED
        and n >= pallas_kernels.PALLAS_MIN_N
    )

    # Payload slot per step (backward walk needs the mapping); chain steps
    # own one consecutive slot per descriptor.
    slots = []
    i = 0
    for step in static:
        if step[0] == "rot":
            slots.append(None)
        elif step[0] == "chain":
            slots.append((i, len(step[2])))
            i += len(step[2])
        else:
            slots.append(i)
            i += 1

    def _lam_dt(slot):
        """Fused-kernel λ output dtype: bf16 mid-plan, f32 at the earliest
        payload step (the custom-VJP boundary cotangent)."""
        if not use16 or slot == 0:
            return jnp.float32
        return jnp.bfloat16

    for step, slot in zip(reversed(static), reversed(slots)):
        kind = step[0]
        if kind == "chain":
            geom, descs = step[1], step[2]
            start, cnt = slot
            pays = payloads[start : start + cnt]
            psi2, lam2, gws = pallas_kernels.adjoint_chain_ri(
                psi2, lam2.astype(psi2.dtype), pays, geom, descs, n
            )
            for j, gw in enumerate(gws):
                grads[start + j] = gw
            continue
        if kind == "rot":
            rinv = (n - step[1]) % n
            if pallas_kernels.ENABLED and pallas_kernels.rotate_usable(rinv, n):
                # One launch transposing BOTH arrays: the backward repeats
                # every layout change on the state and the cotangent.
                psi2, lam2 = pallas_kernels.rotate_pair_ri(psi2, lam2, rinv, n)
            else:
                psi2 = kernels._rotate_qubits_ri(psi2, rinv, n)
                lam2 = kernels._rotate_qubits_ri(lam2, rinv, n)
            continue
        if kind == "rotmat":
            r = step[1]
            w2 = payloads[slot]
            srt = list(step[2])
            if len(srt) == r and pallas_kernels.rotmat_usable(r, n):
                psi2, lam2, gw = pallas_kernels.adjoint_rotmat_ri(
                    psi2, lam2, w2, r, n, lam_dtype=_lam_dt(slot)
                )
            else:
                lam2 = lam2.astype(psi2.dtype)
                wh = _conj_pair_mat(w2)
                psi2 = kernels.apply_matrix_pair_ri(psi2, wh, srt, n)
                gw = _window_cotangent(lam2, psi2, srt, n)
                lam2 = kernels.apply_matrix_pair_ri(lam2, wh, srt, n)
                rinv = (n - r) % n
                psi2 = kernels._rotate_qubits_ri(psi2, rinv, n)
                lam2 = kernels._rotate_qubits_ri(lam2, rinv, n)
            grads[slot] = gw
            continue
        if kind == "matrot":
            r = step[1]
            w2 = payloads[slot]
            srt = list(step[2])
            if pallas_kernels.matrot_usable(r, n):
                psi2, lam2, gw = pallas_kernels.adjoint_matrot_ri(
                    psi2, lam2, w2, r, n, lam_dtype=_lam_dt(slot)
                )
            else:
                rinv = (n - r) % n
                psi2 = kernels._rotate_qubits_ri(psi2, rinv, n)
                lam2 = kernels._rotate_qubits_ri(lam2, rinv, n)
                psi2, lam2, gw = _adjoint_step_contiguous(
                    psi2, lam2, w2, srt, n, lam_dtype=_lam_dt(slot)
                )
            grads[slot] = gw
            continue
        w2 = payloads[slot]
        srt = list(step[1])
        k = len(srt)
        if kind == "mat":
            contiguous = srt == list(range(srt[0], srt[0] + k))
            if not contiguous:
                r = kernels._cyclic_run(srt, n)
                if r is not None:
                    # Ring-wrap support: one layout-friendly rotation of
                    # BOTH arrays beats the scattered gather path (whose
                    # per-axis moves cost tens of state passes at 24q).
                    if pallas_kernels.ENABLED and pallas_kernels.rotate_usable(r, n):
                        psi2, lam2 = pallas_kernels.rotate_pair_ri(psi2, lam2, r, n)
                    else:
                        psi2 = kernels._rotate_qubits_ri(psi2, r, n)
                        lam2 = kernels._rotate_qubits_ri(lam2, r, n)
                    mapped = [(w + r) % n for w in srt]
                    msrt = sorted(mapped)
                    rank = {w: i for i, w in enumerate(msrt)}
                    perm = [rank[m] for m in mapped]
                    w2r = jnp.stack(
                        [
                            kernels.permute_gate_qubits(w2[0], perm, k),
                            kernels.permute_gate_qubits(w2[1], perm, k),
                        ]
                    )
                    psi2, lam2, gw_r = _adjoint_step_contiguous(
                        psi2, lam2, w2r, msrt, n, lam_dtype=_lam_dt(slot)
                    )
                    inv = list(np.argsort(perm))
                    grads[slot] = jnp.stack(
                        [
                            kernels.permute_gate_qubits(gw_r[0], inv, k),
                            kernels.permute_gate_qubits(gw_r[1], inv, k),
                        ]
                    )
                    rb = (n - r) % n
                    if pallas_kernels.ENABLED and pallas_kernels.rotate_usable(rb, n):
                        psi2, lam2 = pallas_kernels.rotate_pair_ri(psi2, lam2, rb, n)
                    else:
                        psi2 = kernels._rotate_qubits_ri(psi2, rb, n)
                        lam2 = kernels._rotate_qubits_ri(lam2, rb, n)
                    continue
                lam2 = lam2.astype(psi2.dtype)
                wh = _conj_pair_mat(w2)
                psi2 = kernels.apply_matrix_pair_ri(psi2, wh, srt, n)
                gw = _window_cotangent(lam2, psi2, srt, n)
                lam2 = kernels.apply_matrix_pair_ri(lam2, wh, srt, n)
                grads[slot] = gw
                continue
            psi2, lam2, gw = _adjoint_step_contiguous(
                psi2, lam2, w2, srt, n, lam_dtype=_lam_dt(slot)
            )
            grads[slot] = gw
        else:  # diag
            lam2 = lam2.astype(psi2.dtype)
            dh = jnp.stack([w2[0], -w2[1]])
            psi2 = kernels.apply_diagonal_pair_ri(psi2, dh, srt, n)
            grads[slot] = _diag_cotangent(lam2, psi2, srt, n)
            lam2 = kernels.apply_diagonal_pair_ri(lam2, dh, srt, n)

    return lam2.astype(g.dtype), tuple(grads)


execute_plan_ri.defvjp(_fwd, _bwd)
