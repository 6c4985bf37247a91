"""Tensor-contraction kernels for statevector / density-matrix simulation.

TPU-first design notes
----------------------

TPU memory layouts tile the two minor dimensions to (8, 128); a quantum
state materialised as a rank-``n`` ``(2,)*n`` tensor (the reference's
representation, qml_essentials/operations.py:421-512) pads catastrophically
and makes every gate a rank-``n`` transpose.  These kernels therefore keep
the state **flat** ``(2**n,)`` and express every gate application through
rank-3 views:

    ``psi.reshape(2**a, 2**k, 2**b)``  with the gate support on the middle
    axis — a single ``dot_general`` the MXU consumes directly, with large
    outer dimensions that map cleanly onto (8, 128) tiles.

* Gates on a **contiguous** qubit range are one reshape + one contraction —
  no transpose of the state at all.  The fusion planner
  (:mod:`qml_essentials_tpu.ops.simulation`) lifts gate groups into
  contiguous windows precisely to hit this path.
* Gates on scattered wires first pull their wires together using rank-3
  axis moves (``(2**p, 2, rest)`` transposes — one state pass each), then
  apply contiguously, then move back.
* Diagonal gates broadcast-multiply against the same rank-3 view.
* Z-basis expectation values use a halving reduction (fold one qubit per
  step: geometric total traffic ≈ 2 state reads) instead of dense lifted
  observables.

Everything is pure JAX: jit/vmap/grad/shard_map-compatible, complex-safe
inside jit even on backends that cannot materialise complex buffers
eagerly (see :mod:`qml_essentials_tpu.runtime`).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qml_essentials_tpu.ops import pallas_kernels
from qml_essentials_tpu.ops.dtypes import cdtype


# ---------------------------------------------------------------------------
# Gate-side helpers (small matrices — cheap at trace time)
# ---------------------------------------------------------------------------


def permute_gate_qubits(mat: jnp.ndarray, perm: Sequence[int], k: int) -> jnp.ndarray:
    """Reorder the qubits of a ``(2**k, 2**k)`` gate so qubit i -> perm[i]."""
    perm = list(perm)
    if perm == list(range(k)):
        return mat
    t = mat.reshape((2,) * (2 * k))
    inv = list(np.argsort(perm))
    t = jnp.transpose(t, inv + [p + k for p in inv])
    return t.reshape(2**k, 2**k)


def lift_matrix(
    mat: jnp.ndarray, op_wires: Sequence[int], all_wires: Sequence[int]
) -> jnp.ndarray:
    """Embed a ``k``-qubit matrix into the space spanned by *all_wires*.

    Kronecker-extends with a real identity on the missing wires (avoiding
    eager complex constants), then permutes qubits to the *all_wires* order.
    Reference parity: qml_essentials/operations.py:1967-2033.
    """
    op_wires = list(op_wires)
    all_wires = list(all_wires)
    n = len(all_wires)
    if op_wires == all_wires:
        return mat
    missing = [w for w in all_wires if w not in op_wires]
    full = mat
    if missing:
        full = jnp.kron(mat, np.eye(2 ** len(missing), dtype=np.float32))
    current = op_wires + missing
    if current == all_wires:
        return full
    # Gate qubit i currently holds wire current[i]; send it to that wire's
    # slot in all_wires (destination-major convention of permute_gate_qubits).
    dest = [all_wires.index(c) for c in current]
    return permute_gate_qubits(full, dest, n)


def permute_qubits_matrix(mat: jnp.ndarray, perm: List[int], n_qubits: int) -> jnp.ndarray:
    """Reorder qubits of a ``(2**n, 2**n)`` matrix so qubit *i* moves to ``perm[i]``."""
    t = mat.reshape((2,) * (2 * n_qubits))
    t = jnp.transpose(t, list(perm) + [p + n_qubits for p in perm])
    return t.reshape(2**n_qubits, 2**n_qubits)


# ---------------------------------------------------------------------------
# Axis plumbing (flat-state rank-3 moves)
# ---------------------------------------------------------------------------


def _move_axis_front(flat: jnp.ndarray, p: int, n: int) -> jnp.ndarray:
    """Move conceptual qubit axis *p* to the front of a flat state (one pass)."""
    if p == 0:
        return flat
    A = 2**p
    B = flat.size // (2 * A)
    t = flat.reshape(A, 2, B)
    return jnp.transpose(t, (1, 0, 2)).reshape(-1)


def _move_front_to(flat: jnp.ndarray, p: int, n: int) -> jnp.ndarray:
    """Inverse of :func:`_move_axis_front`: front axis back to position *p*."""
    if p == 0:
        return flat
    A = 2**p
    B = flat.size // (2 * A)
    t = flat.reshape(2, A, B)
    return jnp.transpose(t, (1, 0, 2)).reshape(-1)


@lru_cache(maxsize=4096)
def _gather_plan(wires: Tuple[int, ...]) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Sequence of single-axis pulls placing *wires* (sorted) at the front.

    Returns ``(pulls, restores)``: positions to pull front-ward in order, and
    the reverse sequence to undo.  Positions account for the shifts caused
    by earlier pulls.
    """
    order = list(range(max(wires) + 1 + 64))  # generous virtual axis list
    pulls = []
    for w in reversed(sorted(wires)):
        p = order.index(w)
        pulls.append(p)
        order.remove(w)
        order.insert(0, w)
    return tuple(pulls), tuple(reversed(pulls))


def apply_matrix_flat(
    psi: jnp.ndarray, mat: jnp.ndarray, wires: Sequence[int], n: int
) -> jnp.ndarray:
    """Contract a ``(2**k, 2**k)`` gate against *wires* of a flat state.

    Contiguous (sorted) wires hit the transpose-free rank-3 path; scattered
    wires are pulled to the front with rank-3 moves first.
    """
    wires = [int(w) for w in wires]
    k = len(wires)
    srt = sorted(wires)

    # Normalise gate qubit order to ascending wire order (gate-side permute
    # of a tiny matrix, not the state).
    if wires != srt:
        rank = {w: i for i, w in enumerate(srt)}
        mat = permute_gate_qubits(mat, [rank[w] for w in wires], k)

    if srt == list(range(srt[0], srt[0] + k)):
        a = srt[0]
        A = 2**a
        B = psi.size // (A * 2**k)
        t = psi.reshape(A, 2**k, B)
        out = jnp.einsum("ij,ajb->aib", mat, t, precision=_PRECISION)
        return out.reshape(psi.shape)

    # Ring-wrap supports: one layout-friendly cyclic rotation makes the
    # support contiguous (see ``_cyclic_run``).
    r = _cyclic_run(srt, n)
    if r is not None:
        rot = _rotate_qubits(psi, r, n)
        new_wires = [(w + r) % n for w in srt]
        rot = apply_matrix_flat(rot, mat, new_wires, n)
        return _rotate_qubits(rot, n - r, n)

    # Scattered support: pull wires to the front (reverse-sorted pulls keep
    # relative order), apply at [0..k), push back.
    pulls, restores = _gather_plan(tuple(srt))
    for p in pulls:
        psi = _move_axis_front(psi, p, n)
    A = 1
    B = psi.size // (2**k)
    t = psi.reshape(2**k, B)
    psi = jnp.einsum("ij,jb->ib", mat, t, precision=_PRECISION).reshape(-1)
    for p in restores:
        psi = _move_front_to(psi, p, n)
    return psi


def apply_diagonal_flat(
    psi: jnp.ndarray, diag: jnp.ndarray, wires: Sequence[int], n: int
) -> jnp.ndarray:
    """Diagonal gate as a broadcast multiply on the rank-3 view (one pass)."""
    wires = [int(w) for w in wires]
    k = len(wires)
    srt = sorted(wires)
    if wires != srt:
        d = diag.reshape((2,) * k)
        order = [wires.index(w) for w in srt]
        diag = jnp.transpose(d, order).reshape(-1)

    if srt == list(range(srt[0], srt[0] + k)):
        a = srt[0]
        A = 2**a
        B = psi.size // (A * 2**k)
        t = psi.reshape(A, 2**k, B)
        return (t * diag[None, :, None]).reshape(psi.shape)

    pulls, restores = _gather_plan(tuple(srt))
    for p in pulls:
        psi = _move_axis_front(psi, p, n)
    t = psi.reshape(2**k, -1)
    psi = (t * diag[:, None]).reshape(-1)
    for p in restores:
        psi = _move_front_to(psi, p, n)
    return psi


# ---------------------------------------------------------------------------
# Real-split kernels (the simulation hot path)
#
# XLA's complex-dtype contraction expands poorly on TPU (~20x slower than
# explicit real pairs in microbenchmarks), so the simulation loops keep the
# state as a stacked real array ``psi2`` of shape ``(2, 2**n)`` —
# ``psi2[0] = Re(psi)``, ``psi2[1] = Im(psi)`` — and every kernel computes
# the four real contractions of the complex product directly.  Complex
# values only appear on tiny gate matrices and at API boundaries.
# ---------------------------------------------------------------------------


# TPU MXUs multiply in bfloat16 by default, which loses ~3 decimal digits
# per gate and compounds to O(1e-2) expectation-value error over a deep
# circuit.  Every hot contraction therefore requests full-float32 multiply
# passes explicitly (DEFAULT on CPU is already exact f32, so this only
# affects accelerators).  ``set_matmul_precision`` trades accuracy back for
# speed ("default" = bf16, ~30% faster, ~5e-2 error at 20 qubits).
_PRECISION = jax.lax.Precision.HIGHEST

_PRECISION_NAMES = {
    "default": jax.lax.Precision.DEFAULT,
    "bfloat16": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "tensorfloat32": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
    "float32": jax.lax.Precision.HIGHEST,
}


def set_matmul_precision(name: str) -> None:
    """Set the MXU multiply precision for all gate contractions.

    ``"highest"`` (default): 6-pass bf16 emulation of f32 — exact to ~1e-6.
    ``"high"``: 3-pass bf16 (~tf32) — ~1e-3 at 20 qubits, ~20% faster.
    ``"default"``: raw bf16 — fastest, ~5e-2 at 20 qubits.
    """
    global _PRECISION
    _PRECISION = _PRECISION_NAMES[name.lower()]


def to_ri(psi: jnp.ndarray) -> jnp.ndarray:
    """Complex vector -> stacked (2, ...) real pair."""
    return jnp.stack([jnp.real(psi), jnp.imag(psi)])


def from_ri(psi2: jnp.ndarray) -> jnp.ndarray:
    """Stacked (2, ...) real pair -> complex vector."""
    return psi2[0] + 1j * psi2[1]


def _mat_ri(mat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if jnp.iscomplexobj(mat):
        return jnp.real(mat), jnp.imag(mat)
    return mat, jnp.zeros_like(mat)


def _karatsuba_einsum(psi2, mr, mi, A, K, B, dim):
    """Contiguous window contraction on the rank-3 view.

    Karatsuba complex multiply: 3 contractions instead of 4 (the MXU
    passes dominate under float32-precision emulation).
    """
    t = psi2.reshape(2, A, K, B)
    tr, ti = t[0], t[1]
    t1 = jnp.einsum("ij,ajb->aib", mr, tr, precision=_PRECISION)
    t2 = jnp.einsum("ij,ajb->aib", mi, ti, precision=_PRECISION)
    t3 = jnp.einsum("ij,ajb->aib", mr + mi, tr + ti, precision=_PRECISION)
    return jnp.stack([t1 - t2, t3 - t1 - t2]).reshape(2, dim)


def apply_matrix_flat_ri(
    psi2: jnp.ndarray, mat: jnp.ndarray, wires: Sequence[int], n: int
) -> jnp.ndarray:
    """Real-split gate application: 4 real contractions per step.

    Same contiguous / scattered-path structure as :func:`apply_matrix_flat`.
    """
    mr, mi = _mat_ri(mat)
    return apply_matrix_pair_ri(psi2, jnp.stack([mr, mi]), wires, n)


def apply_matrix_pair_ri(
    psi2: jnp.ndarray, w2: jnp.ndarray, wires: Sequence[int], n: int
) -> jnp.ndarray:
    """Gate application with the gate given as a stacked ``(2, K, K)``
    (Re, Im) pair — the native currency of the adjoint-state path, which
    keeps every payload real so cotangents avoid complex-autodiff
    conventions entirely."""
    wires = [int(w) for w in wires]
    k = len(wires)
    srt = sorted(wires)
    if wires != srt:
        rank = {w: i for i, w in enumerate(srt)}
        perm = [rank[w] for w in wires]
        w2 = jnp.stack(
            [permute_gate_qubits(w2[0], perm, k), permute_gate_qubits(w2[1], perm, k)]
        )
    mr, mi = w2[0], w2[1]

    if srt == list(range(srt[0], srt[0] + k)):
        a = srt[0]
        A = 2**a
        dim = psi2.shape[-1]
        B = dim // (A * 2**k)

        # Exact-top supports ([n-k, n), B == 1): the window axis IS the lane
        # dimension, so the contraction is a plain X @ W^T over perfectly
        # tiled (TA, K) blocks — one pass, no recentering.  Windows smaller
        # than a lane tile pad with an identity on the qubits above.
        if (
            B == 1
            and pallas_kernels.ENABLED
            and n >= pallas_kernels.PALLAS_MIN_N
            and 2**k <= 256
        ):
            kk = k
            if 2**kk < 128:
                pad = 7 - kk
                eye = np.eye(2**pad, dtype=np.float32)
                mr = jnp.kron(eye, mr)
                mi = jnp.kron(eye, mi)
                kk = 7
            if pallas_kernels.usable_top(n - kk, kk, n):
                return pallas_kernels.window_apply_top_ri(
                    psi2, jnp.stack([mr, mi]), kk, n
                )

        # Supports near the top of the register collapse the minor (lane)
        # dimension — a (A, 2**k, B<128) contraction pads catastrophically
        # on (8, 128) tiles.  Recenter via one cheap cyclic rotation (pure
        # bandwidth, ~2 state passes) so the lane dim stays >= 128.
        r = _recenter_rotation(a, k, n) if B < 128 else None
        if r is not None:
            rot = _rotate_qubits_ri(psi2, r, n)
            new_wires = [(w + r) % n for w in srt]
            rot = apply_matrix_pair_ri(rot, w2, new_wires, n)
            return _rotate_qubits_ri(rot, n - r, n)

        # States too large for VMEM residency: one-pass fused Pallas kernel
        # (XLA materialises the complex-product intermediates through HBM).
        # Gated by a session-level flag, NOT lax.platform_dependent — the
        # cond that platform selection lowers to saves residuals for both
        # branches under differentiation, doubling backward HBM traffic.
        if pallas_kernels.ENABLED and n >= pallas_kernels.PALLAS_MIN_N:
            # Tiny gates pad to a 3-qubit window (K=8, one full sublane
            # tile) with an identity on the extra qubits.
            if k < 3 and B >= 128 * 2 ** (3 - k):
                pad = 3 - k
                eye = np.eye(2**pad, dtype=np.float32)
                mr = jnp.kron(mr, eye)
                mi = jnp.kron(mi, eye)
                k = 3
                B = dim // (A * 8)
            if pallas_kernels.usable(a, k, n):
                return pallas_kernels.window_apply_ri(
                    psi2, jnp.stack([mr, mi]), a, k, n
                )

        if k <= 2:
            # Tiny contraction dims (K=2/4) lower to badly-tiled dots;
            # unroll into scalar multiply-adds on (A, B) slices instead —
            # XLA fuses the whole update into one bandwidth-bound pass.
            K = 2**k
            t = psi2.reshape(2, A, K, B)
            tr = [t[0, :, j, :] for j in range(K)]
            ti = [t[1, :, j, :] for j in range(K)]
            outs_r, outs_i = [], []
            for i in range(K):
                o_r = sum(mr[i, j] * tr[j] for j in range(K)) - sum(
                    mi[i, j] * ti[j] for j in range(K)
                )
                o_i = sum(mr[i, j] * ti[j] for j in range(K)) + sum(
                    mi[i, j] * tr[j] for j in range(K)
                )
                outs_r.append(o_r)
                outs_i.append(o_i)
            out = jnp.stack(
                [jnp.stack(outs_r, axis=1), jnp.stack(outs_i, axis=1)]
            )
            return out.reshape(2, dim)

        return _karatsuba_einsum(psi2, mr, mi, A, 2**k, B, dim)

    # Ring-wrap supports (one run on the qubit circle, e.g. {n-1, 0}):
    # one layout-friendly cyclic rotation makes the support contiguous.
    r = _cyclic_run(srt, n)
    if r is not None:
        rot = _rotate_qubits_ri(psi2, r, n)
        new_wires = [(w + r) % n for w in srt]
        rot = apply_matrix_pair_ri(rot, w2, new_wires, n)
        return _rotate_qubits_ri(rot, n - r, n)

    # Scattered support: pull wires front per component (rank-4 moves with
    # the component axis leading), apply at [0..k), push back.
    pulls, restores = _gather_plan(tuple(srt))
    for p in pulls:
        psi2 = _move_axis_front_ri(psi2, p)
    dim = psi2.shape[-1]
    t = psi2.reshape(2, 2**k, -1)
    tr, ti = t[0], t[1]
    t1 = jnp.einsum("ij,jb->ib", mr, tr, precision=_PRECISION)
    t2 = jnp.einsum("ij,jb->ib", mi, ti, precision=_PRECISION)
    t3 = jnp.einsum("ij,jb->ib", mr + mi, tr + ti, precision=_PRECISION)
    psi2 = jnp.stack([t1 - t2, t3 - t1 - t2]).reshape(2, dim)
    for p in restores:
        psi2 = _move_front_to_ri(psi2, p)
    return psi2


def _recenter_rotation(a: int, k: int, n: int) -> Optional[int]:
    """Rotation moving contiguous support ``[a, a+k)`` to a start ``a'`` with
    ``B' = 2**(n-a'-k) >= 128``, or ``None`` if no profitable rotation exists.

    Candidate starts are scanned for the one whose rotation keeps both
    transpose blocks large (``7 <= r <= n-7`` ideal); the support must stay
    linear after rotation (``a' + k <= n``).
    """
    if n < 14:
        return None
    best = None
    best_score = -1
    for a_new in range(0, n - k - 6):  # B' = 2**(n-a_new-k) >= 2**7
        if a_new == a:
            continue
        r = (a_new - a) % n
        # The run must map linearly: either no position wraps, or all do.
        if not (a + r + k <= n or a + r >= n):
            continue
        # Prefer rotations with both blocks >= 2**7, then larger A'.
        in_band = 7 <= r <= n - 7
        score = (2 if in_band else 0) + min(a_new, 7) / 8.0
        if score > best_score:
            best_score = score
            best = r
    return best


def _cyclic_run(srt: List[int], n: int) -> Optional[int]:
    """If *srt* is one contiguous run on the qubit circle, return a rotation
    ``r`` (7 <= r <= n-7) that makes it linearly contiguous; else ``None``.

    Ring-wrap entanglers (e.g. wires ``{n-1, 0}``) hit this path: a cyclic
    qubit rotation is a single 2D transpose with both dimensions >= 128 —
    TPU-layout friendly — unlike per-axis moves whose minor dims collapse.
    """
    k = len(srt)
    if n < 14 or k >= n:
        return None
    in_support = [False] * n
    for w in srt:
        in_support[w] = True
    # Count runs on the circle.
    runs = 0
    for i in range(n):
        if in_support[i] and not in_support[(i - 1) % n]:
            runs += 1
    if runs != 1:
        return None
    # Find the run start (first supported position preceded by a gap).
    start = next(
        i for i in range(n) if in_support[i] and not in_support[(i - 1) % n]
    )
    # Pick r in the layout-friendly band [7, n-7] (both transpose blocks
    # >= 2**7) such that the rotated run does not wrap.
    for r in range(7, n - 6):
        if (start + r) % n + k <= n:
            return r
    return None


def _rotate_qubits(psi: jnp.ndarray, r: int, n: int) -> jnp.ndarray:
    """Cyclic qubit rotation on a flat state: old qubit q -> (q + r) mod n."""
    if r % n == 0:
        return psi
    r = r % n
    t = psi.reshape(psi.size // (2**r), 2**r)
    return jnp.transpose(t, (1, 0)).reshape(psi.shape)


def _rotate_qubits_ri(psi2: jnp.ndarray, r: int, n: int) -> jnp.ndarray:
    """Cyclic qubit rotation: old qubit q -> position (q + r) mod n.

    One 2D block transpose per component; with ``7 <= r <= n-7`` both
    blocks are >= 128 so the layout stays tile-aligned.  Large states on
    TPU route through a tiled Pallas transpose (XLA's transpose runs ~3x
    off roofline past VMEM residency).
    """
    if r % n == 0:
        return psi2
    r = r % n
    if pallas_kernels.rotate_usable(r, n):
        return pallas_kernels.rotate_ri(psi2, r, n)
    dim = psi2.shape[-1]
    t = psi2.reshape(2, dim // (2**r), 2**r)
    return jnp.transpose(t, (0, 2, 1)).reshape(2, dim)


def _move_axis_front_ri(psi2: jnp.ndarray, p: int) -> jnp.ndarray:
    """Move conceptual qubit axis *p* to the front, per component."""
    if p == 0:
        return psi2
    A = 2**p
    dim = psi2.shape[-1]
    B = dim // (2 * A)
    t = psi2.reshape(2, A, 2, B)
    return jnp.transpose(t, (0, 2, 1, 3)).reshape(2, dim)


def _move_front_to_ri(psi2: jnp.ndarray, p: int) -> jnp.ndarray:
    """Inverse of :func:`_move_axis_front_ri`."""
    if p == 0:
        return psi2
    A = 2**p
    dim = psi2.shape[-1]
    B = dim // (2 * A)
    t = psi2.reshape(2, 2, A, B)
    return jnp.transpose(t, (0, 2, 1, 3)).reshape(2, dim)


def apply_diagonal_flat_ri(
    psi2: jnp.ndarray, diag: jnp.ndarray, wires: Sequence[int], n: int
) -> jnp.ndarray:
    """Real-split diagonal gate: a broadcast complex multiply in real parts."""
    dr, di = _mat_ri(diag)
    return apply_diagonal_pair_ri(psi2, jnp.stack([dr, di]), wires, n)


def apply_diagonal_pair_ri(
    psi2: jnp.ndarray, d2: jnp.ndarray, wires: Sequence[int], n: int
) -> jnp.ndarray:
    """Diagonal gate with the diagonal given as a stacked ``(2, 2**k)``
    (Re, Im) pair (adjoint-path currency; see :func:`apply_matrix_pair_ri`)."""
    wires = [int(w) for w in wires]
    k = len(wires)
    srt = sorted(wires)
    if wires != srt:
        d = d2.reshape((2,) + (2,) * k)
        order = [0] + [1 + wires.index(w) for w in srt]
        d2 = jnp.transpose(d, order).reshape(2, -1)
    dr, di = d2[0], d2[1]

    if srt == list(range(srt[0], srt[0] + k)):
        a = srt[0]
        A = 2**a
        dim = psi2.shape[-1]
        B = dim // (A * 2**k)
        t = psi2.reshape(2, A, 2**k, B)
        tr, ti = t[0], t[1]
        drb = dr[None, :, None]
        dib = di[None, :, None]
        out_r = tr * drb - ti * dib
        out_i = tr * dib + ti * drb
        return jnp.stack([out_r, out_i]).reshape(2, dim)

    pulls, restores = _gather_plan(tuple(srt))
    for p in pulls:
        psi2 = _move_axis_front_ri(psi2, p)
    dim = psi2.shape[-1]
    t = psi2.reshape(2, 2**k, -1)
    tr, ti = t[0], t[1]
    out_r = tr * dr[:, None] - ti * di[:, None]
    out_i = tr * di[:, None] + ti * dr[:, None]
    psi2 = jnp.stack([out_r, out_i]).reshape(2, dim)
    for p in restores:
        psi2 = _move_front_to_ri(psi2, p)
    return psi2


def apply_unitary_to_density_flat_ri(
    rho2: jnp.ndarray, mat: jnp.ndarray, wires: Sequence[int], n_qubits: int
) -> jnp.ndarray:
    """Real-split ``rho -> U rho U†`` over the flat 2n-qubit density state."""
    wires = list(wires)
    rho2 = apply_matrix_flat_ri(rho2, mat, wires, 2 * n_qubits)
    bra = [w + n_qubits for w in wires]
    return apply_matrix_flat_ri(rho2, jnp.conj(mat), bra, 2 * n_qubits)


def apply_kraus_to_density_flat_ri(
    rho2: jnp.ndarray,
    kraus: Sequence[jnp.ndarray],
    wires: Sequence[int],
    n_qubits: int,
) -> jnp.ndarray:
    """Real-split ``rho -> sum_k K_k rho K_k†`` (per-operator loop)."""
    out = None
    for K in kraus:
        branch = apply_unitary_to_density_flat_ri(rho2, jnp.asarray(K), wires, n_qubits)
        out = branch if out is None else out + branch
    return out


def zero_state_ri(n_qubits: int) -> jnp.ndarray:
    """|0...0> as a stacked (2, 2**n) real pair."""
    from qml_essentials_tpu.ops.dtypes import rdtype

    dim = 2**n_qubits
    psi2 = jnp.zeros((2, dim), dtype=rdtype())
    return psi2.at[0, 0].set(1.0)


def zero_density_ri(n_qubits: int) -> jnp.ndarray:
    """|0><0| as a stacked (2, 4**n) real pair."""
    return zero_state_ri(2 * n_qubits)


# ---------------------------------------------------------------------------
# Legacy rank-n entry points (sharded simulator, Operation API)
# ---------------------------------------------------------------------------


def apply_matrix(tensor: jnp.ndarray, mat: jnp.ndarray, axes: Sequence[int]) -> jnp.ndarray:
    """Rank-n tensor entry point; delegates to the flat rank-3 kernel."""
    r = tensor.ndim
    flat = tensor.reshape(-1)
    return apply_matrix_flat(flat, mat, list(axes), r).reshape(tensor.shape)


def apply_diagonal(tensor: jnp.ndarray, diag: jnp.ndarray, axes: Sequence[int]) -> jnp.ndarray:
    """Rank-n diagonal entry point; delegates to the flat kernel."""
    r = tensor.ndim
    flat = tensor.reshape(-1)
    return apply_diagonal_flat(flat, diag, list(axes), r).reshape(tensor.shape)


# ---------------------------------------------------------------------------
# Density-matrix kernels (rho flat over 2n conceptual qubits)
# ---------------------------------------------------------------------------


def apply_unitary_to_density_flat(
    rho_flat: jnp.ndarray, mat: jnp.ndarray, wires: Sequence[int], n_qubits: int
) -> jnp.ndarray:
    """``rho -> U rho U†`` with rho flat over ``2n`` conceptual qubits."""
    wires = list(wires)
    rho_flat = apply_matrix_flat(rho_flat, mat, wires, 2 * n_qubits)
    bra = [w + n_qubits for w in wires]
    return apply_matrix_flat(rho_flat, jnp.conj(mat), bra, 2 * n_qubits)


def apply_unitary_to_density(
    rho_t: jnp.ndarray, mat: jnp.ndarray, wires: Sequence[int], n_qubits: int
) -> jnp.ndarray:
    """Rank-2n tensor entry point for ``rho -> U rho U†``."""
    flat = rho_t.reshape(-1)
    return apply_unitary_to_density_flat(flat, mat, wires, n_qubits).reshape(
        rho_t.shape
    )


def apply_kraus_to_density_flat(
    rho_flat: jnp.ndarray,
    kraus: Sequence[jnp.ndarray],
    wires: Sequence[int],
    n_qubits: int,
) -> jnp.ndarray:
    """``rho -> sum_k K_k rho K_k†`` on a flat density state.

    The Kraus stack is applied as one batched contraction per half so XLA
    sees two large MXU ops instead of ``2m`` small ones.
    """
    wires = [int(w) for w in wires]
    k = len(wires)
    dim = 2**k
    K = jnp.stack([jnp.asarray(K_i) for K_i in kraus]).astype(rho_flat.dtype)
    m = K.shape[0]
    N = 2 * n_qubits
    srt = sorted(wires)
    if wires != srt:
        rank = {w: i for i, w in enumerate(srt)}
        perm = [rank[w] for w in wires]
        K = jnp.stack([permute_gate_qubits(K[i], perm, k) for i in range(m)])

    ket = srt
    bra = [w + n_qubits for w in srt]

    # Pull ket wires to the front, batch-apply all Kraus ops -> leading m axis.
    psi = rho_flat
    pulls, restores = _gather_plan(tuple(ket))
    for p in pulls:
        psi = _move_axis_front(psi, p, N)
    t = psi.reshape(dim, -1)
    branched = jnp.einsum("mij,jb->mib", K, t, precision=_PRECISION)  # (m, dim, B)

    # Restore ket axis order per branch (vectorised over m via reshape trick:
    # the moves act on the trailing flat state, broadcast over m).
    branched = branched.reshape(m, -1)

    def _restore_all(x):
        for p in restores:
            x = _move_front_to(x, p, N)
        return x

    branched = jnp.stack([_restore_all(branched[i]) for i in range(m)])

    # Bra half: pull bra wires front per branch, contract conj(K) and sum m.
    pulls_b, restores_b = _gather_plan(tuple(bra))

    def _pull_all(x):
        for p in pulls_b:
            x = _move_axis_front(x, p, N)
        return x

    pulled = jnp.stack([_pull_all(branched[i]) for i in range(m)])
    tb = pulled.reshape(m, dim, -1)
    out = jnp.einsum("mij,mjb->ib", jnp.conj(K), tb, precision=_PRECISION).reshape(-1)
    for p in restores_b:
        out = _move_front_to(out, p, N)
    return out


def apply_kraus_to_density(
    rho_t: jnp.ndarray,
    kraus: Sequence[jnp.ndarray],
    wires: Sequence[int],
    n_qubits: int,
) -> jnp.ndarray:
    """Rank-2n tensor entry point for the batched Kraus application."""
    flat = rho_t.reshape(-1)
    return apply_kraus_to_density_flat(flat, kraus, wires, n_qubits).reshape(
        rho_t.shape
    )


# ---------------------------------------------------------------------------
# State constructors & measurement reductions
# ---------------------------------------------------------------------------


def zero_state(n_qubits: int) -> jnp.ndarray:
    """|0...0> as a flat complex vector (built from a real one-hot)."""
    dim = 2**n_qubits
    base = jnp.zeros(dim, dtype=jnp.float64 if cdtype() == jnp.complex128 else jnp.float32)
    return base.at[0].set(1.0).astype(cdtype())


def zero_state_tensor(n_qubits: int) -> jnp.ndarray:
    """|0...0> as a rank-n tensor (legacy shape for the sharded simulator)."""
    return zero_state(n_qubits).reshape((2,) * n_qubits)


def zero_density(n_qubits: int) -> jnp.ndarray:
    """|0><0| as a flat vector over ``2n`` conceptual qubits."""
    return zero_state(2 * n_qubits)


def zero_density_tensor(n_qubits: int) -> jnp.ndarray:
    """|0><0| as a rank-2n tensor."""
    return zero_density(n_qubits).reshape((2,) * (2 * n_qubits))


def reduce_diagonal_expectation(
    probs: jnp.ndarray, qubit_weights: Sequence[Optional[Tuple[float, float]]]
) -> jnp.ndarray:
    """⟨⊗_q D_q⟩ for per-qubit diagonal factors from a probability vector.

    ``qubit_weights[q]`` is ``(d0, d1)`` for qubits in the observable's
    support and ``None`` (trace out) elsewhere.  Implemented as a halving
    fold — one weighted pairwise reduction per qubit, total traffic
    ``~2 * 2**n`` regardless of n, no dense observable.
    """
    v = probs.reshape(-1)
    for q in reversed(range(len(qubit_weights))):
        v = v.reshape(-1, 2)
        w = qubit_weights[q]
        if w is None:
            v = v[:, 0] + v[:, 1]
        else:
            v = w[0] * v[:, 0] + w[1] * v[:, 1]
    return v.reshape(())


def marginal_probs_on(probs: jnp.ndarray, keep: Sequence[int], n: int) -> jnp.ndarray:
    """Marginal distribution over the *keep* qubits (sorted order).

    Traces out qubits one at a time from the highest index down — each step
    is a rank-3 pairwise reduction, so total traffic stays geometric.
    """
    v = probs.reshape(-1)
    for q in sorted(set(range(n)) - set(int(k) for k in keep), reverse=True):
        A = 2**q
        B = v.size // (2 * A)
        v = v.reshape(A, 2, B).sum(axis=1).reshape(-1)
    return v


def marginal_qubit_probs(probs_t: jnp.ndarray, qubit: int) -> jnp.ndarray:
    """Marginal ``(p0, p1)`` of one qubit from a probability tensor/vector."""
    flat = probs_t.reshape(-1)
    n = int(round(float(np.log2(flat.size))))
    A = 2**qubit
    B = flat.size // (2 * A)
    t = flat.reshape(A, 2, B)
    return jnp.sum(t, axis=(0, 2))
