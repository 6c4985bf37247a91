"""Simulation and measurement kernels (L1).

Stateless free functions: take a recorded tape (list of
:class:`~qml_essentials_tpu.ops.operations.Operation`) plus measurement
parameters and return JAX arrays.

TPU-first design
----------------

*Gate fusion.*  The dominant cost of statevector simulation is HBM traffic:
every gate reads and writes the full ``2**n`` state.  :func:`plan_contractions`
greedily composes consecutive gates whose combined support fits within
``FUSE_MAX_WIDTH`` qubits into a single ``(2**w, 2**w)`` matrix, so one fused
contraction replaces a run of per-gate passes.  Composition happens on tiny
``<= 2**w``-dimensional matrices inside the jit trace (differentiable,
vmap-safe); at small qubit counts an entire circuit typically collapses into
a single matmul.  The reference applies one einsum per gate
(qml_essentials/simulation.py:91-104); fusion is this rebuild's replacement
for that hot loop.

*Diagonal observables.*  Expectation values of Z-type observables (PauliZ,
Z⊗...⊗Z parities) reduce to marginals of the probability tensor — no dense
``2**n × 2**n`` observable is ever materialised, unlike the reference's
``lifted_matrix`` path (qml_essentials/simulation.py:263-269).

Reference parity: qml_essentials/simulation.py (full module).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qml_essentials_tpu.ops import adjoint, chains, kernels, pallas_kernels, saved
from qml_essentials_tpu.ops.dtypes import cdtype
from qml_essentials_tpu.ops.operations import (
    Barrier,
    DiagonalQubitUnitary,
    Id,
    KrausChannel,
    Operation,
)

# Maximum combined support (in qubits) of a fused gate block.  5 packs the
# same ring-ansatz layer structure into the same number of steps as 6 (the
# planner overlaps windows by one qubit either way) while halving the MXU
# work per step (32x32 vs 64x64 matrices) — measured ~7% faster end-to-end
# under float32-precision contraction.  Set to 0/1 to disable fusion.
FUSE_MAX_WIDTH: int = 5

# Fusion width floor in the Pallas large-state regime (window K = 2**w).
# Wider windows cut HBM passes but cost MXU quadratically per pass;
# tools/bench_widths.py sweeps (this, REFUSE_MAX_WIDTH) on hardware.
PALLAS_FUSE_WIDTH: int = 8

# Fusion only pays when the state is much larger than the fused window:
# composing a window costs ~2**(2w) FLOPs per gate while a direct
# application costs ~2**n, so windows are only fused when
# ``n_qubits >= window_width + FUSE_MIN_EXCESS``.
FUSE_MIN_EXCESS: int = 3


def set_fusion(max_width: int, min_excess: Optional[int] = None) -> None:
    """Set the gate-fusion window width (0/1 disables) and n-vs-w threshold."""
    global FUSE_MAX_WIDTH, FUSE_MIN_EXCESS
    FUSE_MAX_WIDTH = int(max_width)
    if min_excess is not None:
        FUSE_MIN_EXCESS = int(min_excess)


def infer_n_qubits(ops: List[Operation], obs: List[Operation]) -> int:
    """Smallest qubit count covering all wires of *ops* and *obs* (min 1)."""
    all_wires: set = set()
    for op in list(ops) + list(obs):
        all_wires.update(op.wires)
    return max(all_wires) + 1 if all_wires else 1


def uses_density(tape: List[Operation], type: str) -> bool:
    """Density-matrix simulation is needed for noise channels or type='density'."""
    return type == "density" or any(isinstance(op, KrausChannel) for op in tape)


# ---------------------------------------------------------------------------
# Fusion planner
# ---------------------------------------------------------------------------


def _compose_window(group: List[Operation], lo: int, hi: int) -> Tuple[jnp.ndarray, List[int]]:
    """Compose a run of gates into one matrix on the contiguous range [lo, hi).

    Built by applying each gate to the columns of the growing unitary
    through the flat rank-3 kernel (the column index acts as ``w`` extra
    conceptual qubits) — one contraction per gate instead of
    kron/transpose chains, which matters under vmap where the composition
    replays per batch element.
    """
    support = list(range(lo, hi))
    w = hi - lo
    U = jnp.eye(2**w, dtype=cdtype()).reshape(-1)  # flat over 2w qubits
    for op in group:
        local = [wi - lo for wi in op.wires]
        U = kernels.apply_matrix_flat(U, op.matrix, local, 2 * w)
    return U.reshape(2**w, 2**w), support


def plan_contractions(
    tape: List[Operation],
    max_width: Optional[int] = None,
    n_qubits: Optional[int] = None,
) -> List[Tuple[str, object, List[int]]]:
    """Greedy fusion of the tape into contiguous-window contraction steps.

    Gates are merged while their combined wire *span* fits in a contiguous
    window of at most ``max_width`` qubits; each flushed window becomes one
    ``(2**w, 2**w)`` matrix on the range ``[lo, hi)`` — the transpose-free
    rank-3 kernel path.  Wide-span gates (e.g. ring-wrap entanglers) are
    emitted alone and handled by the kernel's axis-move path.

    Returns steps of the form:

    - ``("op", operation, wires)``  — apply via the operation's own method
      (diagonal broadcast, barrier no-op, channels, wide-span gates);
    - ``("mat", matrix, wires)``    — a fused unitary window (contiguous).
    """
    width = FUSE_MAX_WIDTH if max_width is None else max_width
    if n_qubits is not None and max_width is None:
        # Fusion pays only when the state dwarfs the window (see
        # FUSE_MIN_EXCESS); otherwise composition work exceeds the saved
        # passes and per-gate application is faster.
        width = min(width, max(n_qubits - FUSE_MIN_EXCESS, 1))
        # Past VMEM residency every step costs a full HBM read+write (the
        # Pallas DMA stream is the measured bottleneck at ~215 GB/s), so
        # minimising the *number* of passes beats minimising MXU work per
        # pass.  Width 8 = K=256 windows: with the split3 MXU mode the
        # contraction still hides under the DMA stream, and Circuit-19-like
        # layers collapse to ~3 windows per 24-qubit layer.
        if n_qubits >= pallas_kernels.PALLAS_MIN_N:
            width = max(width, PALLAS_FUSE_WIDTH)

    steps: List[Tuple[str, object, List[int]]] = []
    # Open windows: list of [group, lo, hi, support_set].  Windows have
    # pairwise-disjoint *supports*, so their emission order is free
    # (disjoint-support operators commute) and ops stay ordered within
    # each window — the reordering this enables packs whole circuit
    # layers (rotations + entanglers + encodings) into shared windows.
    windows: List[list] = []

    def emit(group: List[Operation], lo: int, hi: int) -> None:
        if len(group) == 1:
            op = group[0]
            srt = sorted(op.wires)
            if srt == list(range(srt[0], srt[-1] + 1)) or isinstance(
                op, DiagonalQubitUnitary
            ):
                # Already contiguous (or diagonal — one broadcast pass).
                steps.append(("op", op, list(op.wires)))
                return
        mat, wires = _compose_window(group, lo, hi)
        steps.append(("mat", mat, wires))

    def flush(idxs: Optional[List[int]] = None) -> None:
        nonlocal windows
        if idxs is None:
            idxs = list(range(len(windows)))
        for i in sorted(idxs, reverse=True):
            group, lo, hi, _ = windows.pop(i)
            emit(group, lo, hi)

    for op in tape:
        if isinstance(op, Barrier):
            continue
        if isinstance(op, Id) and op._matrix is Id._matrix:
            continue  # plain identity: drop entirely
        if isinstance(op, KrausChannel):
            flush()
            steps.append(("op", op, list(op.wires)))
            continue

        op_support = set(op.wires)
        op_lo, op_hi = min(op.wires), max(op.wires) + 1

        if width <= 1 or op_hi - op_lo > width:
            # Unfusable (or fusion disabled): flush anything the op
            # touches so ordering is preserved, then emit standalone.
            touching = [
                i for i, w in enumerate(windows) if w[3] & op_support
            ]
            flush(touching)
            steps.append(("op", op, list(op.wires)))
            continue

        touching = [i for i, w in enumerate(windows) if w[3] & op_support]

        if len(touching) > 1:
            # The op couples several windows: merge them if the combined
            # span still fits, else flush them (order within each window
            # is preserved; cross-window order is free by disjointness).
            merged_lo = min(op_lo, *(windows[i][1] for i in touching))
            merged_hi = max(op_hi, *(windows[i][2] for i in touching))
            if merged_hi - merged_lo <= width:
                merged_group: List[Operation] = []
                merged_support: set = set()
                for i in touching:
                    merged_group.extend(windows[i][0])
                    merged_support |= windows[i][3]
                for i in sorted(touching, reverse=True):
                    windows.pop(i)
                merged_group.append(op)
                merged_support |= op_support
                windows.append([merged_group, merged_lo, merged_hi, merged_support])
            else:
                flush(touching)
                windows.append([[op], op_lo, op_hi, set(op_support)])
            continue

        if len(touching) == 1:
            i = touching[0]
            group, lo, hi, support = windows[i]
            new_lo, new_hi = min(lo, op_lo), max(hi, op_hi)
            if new_hi - new_lo <= width:
                group.append(op)
                windows[i] = [group, new_lo, new_hi, support | op_support]
            else:
                flush([i])
                windows.append([[op], op_lo, op_hi, set(op_support)])
            continue

        # Disjoint from every open window: join one whose merged span
        # still fits (commuting reorder), else open a new window.
        placed = False
        for i, (group, lo, hi, support) in enumerate(windows):
            new_lo, new_hi = min(lo, op_lo), max(hi, op_hi)
            if new_hi - new_lo <= width:
                group.append(op)
                windows[i] = [group, new_lo, new_hi, support | op_support]
                placed = True
                break
        if not placed:
            windows.append([[op], op_lo, op_hi, set(op_support)])

    flush()
    return steps


# ---------------------------------------------------------------------------
# Layout scheduling (qubit-rotation sharing, large-state regime only)
# ---------------------------------------------------------------------------


def _step_rot_cost(wires: List[int], offset: int, n: int) -> int:
    """Extra bandwidth passes this support costs under cyclic layout
    *offset* (qubit q stored at position ``(q + offset) % n``), in units of
    one full state read+write, summed over forward AND adjoint backward
    (the backward repeats every hidden relayout on both the state and the
    cotangent, so in-kernel fixups cost ~3x their forward price)."""
    srt = sorted((w + offset) % n for w in wires)
    k = len(srt)
    if srt == list(range(srt[0], srt[0] + k)):
        if srt[0] + k == n and 2**k <= 256:
            # Exact-top window: direct X @ W^T kernel.  Isolated it matches
            # the mid-register kernel, but measured in-program it runs
            # ~1 pass-equivalent slower per fwd+bwd step — price it so the
            # DP only places windows at the top when that saves a rotation.
            return 2
        if srt[0] + k > n - 7 and kernels._recenter_rotation(srt[0], k, n) is not None:
            return 6  # in-kernel recenter: 2 fwd + 4 bwd rotation passes
        return 0
    if kernels._cyclic_run(srt, n) is not None:
        return 7  # in-kernel wrap fixup: 2 fwd + ~5 bwd passes
    # Scattered: per-axis moves — several tiny-minor-dim transposes, and the
    # adjoint backward repeats them on BOTH the state and the cotangent
    # (tens of pass-equivalents at 24q).  Prohibitive: any offset sequence
    # that keeps supports contiguous wins.
    return 30


# One explicit rotation step costs 1 forward pass + 2 backward passes
# (state + cotangent) — the DP's transition price, in the same units as
# :func:`_step_rot_cost`.
_ROT_STEP_COST = 3


def schedule_layout(
    steps: List[Tuple[str, object, List[int]]], n: int
) -> List[Tuple[str, object, List[int]]]:
    """Insert shared cyclic-rotation steps into a pure-state plan.

    In the large-state (Pallas) regime every step is a real HBM pass and
    the kernel's per-step recentering costs two rotation passes each; one
    shared rotation amortises across all the top-of-register steps of a
    ring-ansatz layer.  The offset sequence is chosen exactly by dynamic
    programming over all ``n`` cyclic offsets with per-step costs from
    :func:`_step_rot_cost` and unit cost per explicit rotation.  (Below
    VMEM residency this *loses*: XLA folds the per-step inverse transposes
    into adjacent ops there, so callers only schedule when the Pallas path
    is active.)

    Returns steps with kinds ``"rot"`` (payload = rotation amount),
    ``"mat"``, ``"diag"`` — wires already remapped to the active layout.
    Density plans must not be scheduled (wire remapping there is ket/bra
    paired).
    """
    if n < 14:
        return steps

    # Normalise to kinds mat/diag, dropping no-ops; bail out on anything
    # non-unitary (channels never reach the pure-state path).
    norm: List[Tuple[str, object, List[int]]] = []
    for kind, payload, wires in steps:
        if kind in ("mat", "diag"):
            # "diag" appears pre-normalised in doubled density plans
            # (payload = diagonal vector).
            norm.append((kind, payload, wires))
            continue
        op = payload
        if isinstance(op, KrausChannel):
            return steps
        if isinstance(op, DiagonalQubitUnitary):
            norm.append(("diag", op.diag, list(op.wires)))
        elif op.__class__.apply_to_state_ri is not Operation.apply_to_state_ri:
            continue  # custom application == no-op (Id/Barrier)
        else:
            norm.append(("mat", op.matrix, list(op.wires)))

    S = len(norm)
    if S == 0:
        return []
    INF = 10**9
    cost = [
        [
            _step_rot_cost(w, off, n) if (k_ == "mat" and w) else 0
            for off in range(n)
        ]
        for (k_, _, w) in norm
    ]

    # Rotation deltas restricted to the layout-friendly band 7 <= r <= n-7
    # (both transpose blocks >= one lane tile).
    def _delta_ok(frm: int, to: int) -> bool:
        r = (to - frm) % n
        return 7 <= r <= n - 7

    # Fusable-rotation pricing: a rotation whose delta matches the adjacent
    # window's geometry is absorbed into that window's pass by the
    # fuse_layout_rotations peephole (rotmat/matrot kernels) — nearly free.
    # Precompute each step's contiguous-span form for O(1) transition costs.
    span: List[Optional[Tuple[int, int]]] = []  # (lo, k) or None
    for k_, _, w in norm:
        ws = sorted(w)
        if k_ == "mat" and ws and ws == list(range(ws[0], ws[0] + len(ws))):
            span.append((ws[0], len(ws)))
        else:
            span.append(None)
    _FUSED_ROT_COST = 1

    def _trans_cost(prev_off: int, off: int, i: int) -> int:
        """Price of rotating prev_off -> off between steps i-1 and i."""
        r = (off - prev_off) % n
        if pallas_kernels.ENABLED:
            # rotmat/rotwin: the following window sits on the prefix [0, k)
            # with k >= r.
            if i < S and span[i] is not None:
                lo, k = span[i]
                if (
                    k >= r
                    and (lo + off) % n == 0
                    and pallas_kernels.rot_prefix_fusable(r, k, n)
                ):
                    return _FUSED_ROT_COST
            # matrot: the preceding window sat exactly on [0, n - r).
            if i > 0 and span[i - 1] is not None:
                lo, k = span[i - 1]
                if (
                    k == n - r
                    and (lo + prev_off) % n == 0
                    and pallas_kernels.rot_fusable(r, k, n)
                ):
                    return _FUSED_ROT_COST
        return _ROT_STEP_COST

    # dp[off] = minimal extra passes for steps[0..i] ending at layout *off*;
    # one explicit rotation costs _ROT_STEP_COST (or _FUSED_ROT_COST when
    # the peephole will absorb it).
    dp = [
        (0 if off == 0 else (_trans_cost(0, off, 0) if _delta_ok(0, off) else INF))
        + cost[0][off]
        for off in range(n)
    ]
    parent: List[List[int]] = [[0] * n]
    for i in range(1, S):
        ndp = [INF] * n
        par = [0] * n
        for off in range(n):
            best_c, best_p = dp[off], off  # staying wins ties
            for p in range(n):
                if p == off or not _delta_ok(p, off):
                    continue
                c = dp[p] + _trans_cost(p, off, i)
                if c < best_c:
                    best_c, best_p = c, p
            ndp[off] = best_c + cost[i][off]
            par[off] = best_p
        dp = ndp
        parent.append(par)

    end = min(
        range(n),
        key=lambda o: (
            dp[o]
            + (0 if o == 0 else (_trans_cost(o, 0, S) if _delta_ok(o, 0) else INF)),
            o != 0,
            o,
        ),
    )
    offsets = [0] * S
    offsets[S - 1] = end
    for i in range(S - 1, 0, -1):
        offsets[i - 1] = parent[i][offsets[i]]

    out: List[Tuple[str, object, List[int]]] = []
    offset = 0
    for i, (kind, payload, wires) in enumerate(norm):
        if offsets[i] != offset:
            out.append(("rot", (offsets[i] - offset) % n, []))
            offset = offsets[i]
        out.append((kind, payload, [(w + offset) % n for w in wires]))
    if offset != 0:
        out.append(("rot", (n - offset) % n, []))
    out = refuse_windows(out, n)
    if FUSE_LAYOUT_ROT:
        out = fuse_layout_rotations(out, n)
    return out


# Widest window the re-fusion pass may build.  Width-10 (K = 1024) merged
# windows measured fastest end to end on the 24q bench (51.9 ms/eval vs
# 57.3 at width 9 — tools/bench_widths.py): each merge saves a whole HBM
# pass and the wider contraction still hides under the DMA stream.  The
# geometric gate below keeps the minor block >= one lane tile so the
# merged window stays kernel-eligible.
REFUSE_MAX_WIDTH: int = 10


def _refusable_span(lo: int, span: int, n: int) -> bool:
    if span > REFUSE_MAX_WIDTH or 2**span > 1024:
        return False
    if lo + span == n:
        return 2**span <= 256  # top-window kernel cap
    return 2 ** (n - lo - span) >= 128


# Fuse (rotation, window) pairs whose window axis coincides with a transpose
# axis into single-pass steps (see pallas_kernels rotmat/matrot).  Toggleable
# for A/B measurement.
FUSE_LAYOUT_ROT: bool = True

# Prefer chain plans (one Pallas pass per whole-region gate group) over the
# rotation-scheduled window plan in the large-state regime.  Off by default:
# measured end-to-end at 24q the chain passes serialize multi-window MXU
# compute after the block DMA (87.4 ms/eval vs 71.7 for the rotation-fused
# window plan); kept as an opt-in experiment pending a pipelined chain
# kernel that hides the extra compute (tools/exp_r4_micro.py mdma_chain).
USE_CHAINS: bool = False


def fuse_layout_rotations(
    steps: List[Tuple[str, object, List[int]]], n: int
) -> List[Tuple[str, object, List[int]]]:
    """Peephole fusion of layout rotations into adjacent window steps.

    Two patterns fuse into one HBM pass (the forward saves one pass, the
    adjoint backward saves two — both arrays relayout in-kernel):

    - ``("rot", r)`` followed by ``("mat", W, [0..r))`` — the window sits
      exactly on the rotated-in wires, so the fused kernel reads the
      pre-rotation state and writes the rotated+windowed state
      (step kind ``"rotmat"``, payload ``(r, W)``);
    - ``("mat", W, [0..n-r))`` followed by ``("rot", r)`` — the window is
      exactly the rotation's minor axis (step kind ``"matrot"``).

    Eligibility is shape-only (:func:`pallas_kernels.rot_fusable`);
    callers only schedule layouts in the Pallas regime.
    """
    out: List[Tuple[str, object, List[int]]] = []
    i = 0
    while i < len(steps):
        kind, payload, wires = steps[i]
        if kind == "rot" and i + 1 < len(steps):
            r = int(payload)
            k2, p2, w2 = steps[i + 1]
            if (
                k2 == "mat"
                and list(w2) == list(range(0, len(w2)))
                and len(w2) >= r
                and pallas_kernels.rot_prefix_fusable(r, len(w2), n)
            ):
                out.append(("rotmat", (r, p2), list(w2)))
                i += 2
                continue
        if kind == "mat" and i + 1 < len(steps):
            k2, p2, _ = steps[i + 1]
            if k2 == "rot":
                r = int(p2)
                if (
                    list(wires) == list(range(0, n - r))
                    and pallas_kernels.rot_fusable(r, n - r, n)
                ):
                    out.append(("matrot", (r, payload), list(wires)))
                    i += 2
                    continue
        out.append(steps[i])
        i += 1
    return out


def refuse_windows(
    steps: List[Tuple[str, object, List[int]]], n: int
) -> List[Tuple[str, object, List[int]]]:
    """Post-layout window re-fusion.

    The fusion planner works in circuit wire labels, where ring-wrap
    entanglers span the whole register and are emitted standalone; only
    after :func:`schedule_layout` remaps wires under the chosen cyclic
    offsets do they become contiguous neighbours of the layer windows
    (e.g. ``CRX(23, 0)`` -> ``[7, 8]`` beside ``[8..15]``).  Merging such
    neighbours into one K <= 512 window removes a whole HBM pass per merge
    in the forward AND two in the adjoint backward.

    A step may hop backwards over steps with disjoint supports (disjoint
    unitaries commute); rotations are barriers.  Merges only happen when
    the union window stays kernel-eligible (:func:`_refusable_span`).
    """
    out: List[Tuple[str, object, List[int]]] = []
    for step in steps:
        kind, payload, wires = step
        if kind != "mat" or not wires:
            out.append(step)
            continue
        sup = set(wires)
        lo2, hi2 = min(wires), max(wires) + 1
        merged = False
        for j in range(len(out) - 1, -1, -1):
            kj, pj, wj = out[j]
            if kj == "rot":
                break
            if kj == "mat" and wj:
                lo = min(min(wj), lo2)
                hi = max(max(wj) + 1, hi2)
                if _refusable_span(lo, hi - lo, n):
                    span = hi - lo
                    U = jnp.eye(2**span, dtype=cdtype()).reshape(-1)
                    U = kernels.apply_matrix_flat(
                        U, pj, [w - lo for w in wj], 2 * span
                    )
                    U = kernels.apply_matrix_flat(
                        U, payload, [w - lo for w in wires], 2 * span
                    )
                    out[j] = (
                        "mat",
                        U.reshape(2**span, 2**span),
                        list(range(lo, hi)),
                    )
                    merged = True
                    break
            if set(wj) & sup:
                break
        if not merged:
            out.append(step)
    return out


# ---------------------------------------------------------------------------
# Simulation loops
# ---------------------------------------------------------------------------

# Backward-pass strategy: "auto" keeps per-step residuals (plain autodiff
# through the fused kernels' custom VJPs — 3 state-passes per backward step)
# while they fit in device memory and switches to the residual-free
# adjoint-state backward (4 passes per step, O(1) state memory) beyond
# that.  "adjoint" / "autodiff" force one side (tools/bench_ab.py measures
# both).
BACKWARD_MODE: str = "auto"

# Fraction of currently-available device memory the residual stack may
# occupy before "auto" switches to the adjoint backward.
_RESIDUAL_MEM_FRACTION: float = 0.35


def set_backward_mode(mode: str) -> None:
    """Select the gradient strategy: ``"auto"`` (default), ``"adjoint"``,
    or ``"autodiff"``."""
    global BACKWARD_MODE
    if mode not in ("auto", "adjoint", "autodiff"):
        raise ValueError(f"unknown backward mode: {mode!r}")
    BACKWARD_MODE = mode


def _batch_extent(plan: list) -> int:
    """Product of vmap batch extents among traced plan payloads (1 when
    the simulation is unbatched).  Under ``jit(vmap(f))`` the batch axis
    is invisible in tracer avals; only ``BatchTracer.val`` carries it."""
    try:
        from jax._src.interpreters import batching
    except ImportError:  # pragma: no cover - future JAX relayout
        return 1

    ext = 1
    for _, payload, _ in plan:
        leaves = []
        for leaf in jax.tree_util.tree_leaves(payload):
            if isinstance(leaf, Operation):
                for attr in ("_matrix", "_diag"):
                    v = getattr(leaf, attr, None)
                    if v is not None:
                        leaves.append(v)
            else:
                leaves.append(leaf)
        for leaf in leaves:
            e, t = 1, leaf
            while isinstance(t, batching.BatchTracer):
                if t.batch_dim is not batching.not_mapped:
                    try:
                        e *= int(t.val.shape[t.batch_dim])
                    except Exception:  # pragma: no cover - abstract extent
                        pass
                t = t.val
            ext = max(ext, e)
    return ext


def _adjoint_pays_off(plan: list, n_qubits: int) -> bool:
    """True when the adjoint-state backward should handle gradients."""
    if BACKWARD_MODE == "adjoint":
        return True
    if BACKWARD_MODE == "autodiff":
        return False
    # Residual stack of the per-kernel-VJP path: one (2, 2**n) f32 pair
    # per fused step, per batch element when the plan is vmapped.
    residual_bytes = len(plan) * 8 * (2**n_qubits) * _batch_extent(plan)
    try:
        from qml_essentials_tpu.core import memory as _memory

        avail = _memory.available_memory_bytes()
    except Exception:  # pragma: no cover - backend without memory stats
        avail = 4 * 1024**3
    return residual_bytes > _RESIDUAL_MEM_FRACTION * avail


def _zero_state_prefix(
    plan: list, n: int
) -> Tuple[list, Optional[jnp.ndarray]]:
    """Peel leading ``mat`` windows with pairwise-disjoint contiguous
    supports: applied to the zero state each contributes only its first
    column, so the pre-loop state is an outer product assembled from
    ``2**k``-sized vectors — the first full-state HBM pass happens once
    (two write-only planes) instead of once per window.  A window may hop
    over earlier non-peelable steps when their supports are disjoint
    (disjoint unitaries commute).  Returns ``(peeled_indices, psi2)`` or
    ``([], None)`` when the plan has no such prefix.

    The reference starts every simulation with a full-width einsum on the
    dense zero state (qml_essentials/simulation.py:65-104); this light-cone
    start has no reference counterpart.
    """
    factors = {}
    used: set = set()
    blocked: set = set()
    peeled: list = []
    for idx, (kind, payload, wires) in enumerate(plan):
        support = set(int(w) for w in wires)
        if kind == "mat":
            ws = sorted(support)
            lo, hi = ws[0], ws[-1] + 1
            if (
                ws == list(range(lo, hi))
                and not (support & used)
                and not (support & blocked)
            ):
                # Commutes in front of every skipped step (disjoint
                # supports) and still sees the zero state on its wires.
                factors[lo] = (hi, payload)
                used |= support
                peeled.append(idx)
                continue
        blocked |= support
        if len(blocked) >= n:
            break
    if len(peeled) < 2:
        return [], None

    cols = []
    w = 0
    e0 = None
    while w < n:
        if w in factors:
            hi, mat = factors[w]
            cols.append(mat[:, 0])
            w = hi
        else:
            if e0 is None:
                e0 = jnp.zeros(2, dtype=cdtype()).at[0].set(1.0)
            cols.append(e0)
            w += 1

    # Group the kron into (head, tail) so every complex intermediate stays
    # far below state size; the full-size product is written directly in
    # real-split form (a broadcast-multiply fusion: read ~KB, write 2**n).
    cap = 2 ** (n // 2)
    head = cols[0]
    i = 1
    while i < len(cols) and head.shape[0] * cols[i].shape[0] <= cap:
        head = jnp.kron(head, cols[i])
        i += 1
    if i == len(cols):
        vec = head
        psi2 = jnp.stack([jnp.real(vec), jnp.imag(vec)])
        return peeled, psi2
    tail = cols[i]
    for c in cols[i + 1 :]:
        tail = jnp.kron(tail, c)
    hr, hi_ = jnp.real(head), jnp.imag(head)
    tr, ti = jnp.real(tail), jnp.imag(tail)
    pr = jnp.outer(hr, tr) - jnp.outer(hi_, ti)
    pi = jnp.outer(hr, ti) + jnp.outer(hi_, tr)
    psi2 = jnp.stack([pr.reshape(-1), pi.reshape(-1)])
    return peeled, psi2


def _drop_indices(plan: list, indices: list) -> list:
    drop = set(indices)
    return [s for i, s in enumerate(plan) if i not in drop]


def simulate_pure_ri(tape: List[Operation], n_qubits: int) -> jnp.ndarray:
    """Real-split statevector simulation; returns the ``(2, 2**n)`` pair.

    The state stays flat with explicit Re/Im components for the whole loop
    (XLA's complex-dtype contractions are far slower on TPU than the four
    real contractions written out); each step is a single rank-3-view
    contraction or a broadcast multiply.  Supports near the top of the
    register recenter via cyclic rotations *inside* the kernel; a plan-level
    pass that shared rotations across steps was measured slower on TPU —
    XLA already folds the per-step inverse transposes into adjacent ops.
    """
    psi2 = None
    plan = plan_contractions(tape, n_qubits=n_qubits)
    if (
        pallas_kernels.ENABLED
        and n_qubits >= pallas_kernels.PALLAS_MIN_N
    ):
        # Large-state regime: every step is a real HBM pass.  Prefer the
        # chain plan (one pass per whole-region gate group, ops/chains.py);
        # fall back to shared layout rotations when the tape has structure
        # chains cannot express.
        cplan = chains.plan_chains(tape, n_qubits) if USE_CHAINS else None
        if cplan is not None and 0 < len(cplan) < len(plan):
            plan = cplan
        else:
            # Light-cone start: the leading disjoint windows act on |0...0>
            # as an outer product of their first columns — no full passes.
            peeled, psi2 = _zero_state_prefix(plan, n_qubits)
            plan = schedule_layout(_drop_indices(plan, peeled), n_qubits)
    if psi2 is None:
        psi2 = kernels.zero_state_ri(n_qubits)
    if adjoint.ENABLED and _adjoint_pays_off(plan, n_qubits):
        # Adjoint-state differentiation: backward reconstructs states by
        # inverting the unitary steps — no per-step residuals.  Only taken
        # when the residual stack of the per-kernel-VJP backward would not
        # fit in device memory: the residual backward moves 3 state-passes
        # per step vs the adjoint's 4 (measured 57.3 vs 71.8 ms/eval on the
        # 24q bench), so plain autodiff through the fused kernels is the
        # default whenever residuals fit (see docs/performance.md).
        norm = adjoint.normalize_plan(plan, n_qubits)
        if norm is not None:
            static, payloads = norm
            try:
                return adjoint.execute_plan_ri(psi2, payloads, static, n_qubits)
            except TypeError as e:
                # jax.jacfwd (forward-mode, e.g. QFI) cannot jvp through a
                # custom_vjp; fall through to the plain autodiff loop.
                if "forward-mode autodiff" not in str(e):
                    raise
    elif saved.ENABLED:
        # Large-state residual autodiff: the plan-level saved executor runs
        # the same fused kernels as the loop below but carries the backward
        # cotangent in bfloat16 between steps (ops/saved.py) — two of the
        # backward's three DMA streams at half width.
        norm = adjoint.normalize_plan(plan, n_qubits)
        if norm is not None and saved.usable(norm[0], n_qubits):
            static, payloads = norm
            try:
                return saved.execute_plan_saved_ri(
                    psi2, payloads, static, n_qubits
                )
            except TypeError as e:
                if "forward-mode autodiff" not in str(e):
                    raise
    for kind, payload, wires in plan:
        if kind == "chain":
            # Plain-autodiff fallback (forward-mode, adjoint disabled):
            # expand into per-window applications.
            geom, descs, pays = payload
            for (k2, w2), p in zip(
                chains.expand_chain_step(geom, descs, n_qubits), pays
            ):
                if k2 == "mat":
                    psi2 = kernels.apply_matrix_flat_ri(
                        psi2, p, list(w2), n_qubits
                    )
                else:
                    psi2 = kernels.apply_diagonal_flat_ri(
                        psi2, p, list(w2), n_qubits
                    )
        else:
            psi2 = _apply_step_ri(psi2, kind, payload, wires, n_qubits)
    return psi2


def _apply_step_ri(
    psi2: jnp.ndarray, kind: str, payload, wires: List[int], n_qubits: int
) -> jnp.ndarray:
    """Execute one scheduled plan step on a flat real-split state.

    Shared by the pure-state loop and the doubled-register density loop
    (there ``n_qubits`` is the doubled register width).
    """
    if kind == "mat":
        return kernels.apply_matrix_flat_ri(psi2, payload, wires, n_qubits)
    if kind == "rot":
        return kernels._rotate_qubits_ri(psi2, payload, n_qubits)
    if kind == "rotmat":
        # Fused (rotation, window) single-pass kernel when available — its
        # custom VJP keeps the backward fused too; otherwise two plain passes.
        r, mat = payload
        kw = len(wires)
        if (
            kw == r
            and pallas_kernels.ENABLED
            and pallas_kernels.rotmat_usable(r, n_qubits)
        ):
            w2 = jnp.stack([jnp.real(mat), jnp.imag(mat)])
            return pallas_kernels.rotmat_apply_ri(psi2, w2, r, n_qubits)
        if pallas_kernels.rotwin_usable(r, kw, n_qubits):
            w2 = jnp.stack([jnp.real(mat), jnp.imag(mat)])
            return pallas_kernels.rotwin_apply_ri(psi2, w2, r, kw, n_qubits)
        psi2 = kernels._rotate_qubits_ri(psi2, r, n_qubits)
        return kernels.apply_matrix_flat_ri(psi2, mat, wires, n_qubits)
    if kind == "matrot":
        r, mat = payload
        if pallas_kernels.ENABLED and pallas_kernels.matrot_usable(r, n_qubits):
            w2 = jnp.stack([jnp.real(mat), jnp.imag(mat)])
            return pallas_kernels.matrot_apply_ri(psi2, w2, r, n_qubits)
        psi2 = kernels.apply_matrix_flat_ri(psi2, mat, wires, n_qubits)
        return kernels._rotate_qubits_ri(psi2, r, n_qubits)
    if kind == "diag":
        return kernels.apply_diagonal_flat_ri(psi2, payload, wires, n_qubits)
    return payload.apply_to_state_ri(psi2, n_qubits)


def simulate_pure(tape: List[Operation], n_qubits: int) -> jnp.ndarray:
    """Statevector simulation from |0...0>; returns the complex ``(2**n,)``."""
    return kernels.from_ri(simulate_pure_ri(tape, n_qubits))


# Widest channel (in data qubits) lowered to a one-pass superoperator on the
# doubled register; 4**3 = 64-dim matrices still apply in one contraction.
_SUPEROP_MAX_WIRES: int = 3


def _channel_superop(op: Operation) -> Optional[Tuple[jnp.ndarray, List[int]]]:
    """Vectorised one-pass form of a Kraus channel on the doubled register.

    ``vec(sum_k K rho K†) = (sum_k K ⊗ conj(K)) vec(rho)`` with our
    ket-then-bra wire layout, so an m-wire channel becomes a single
    ``4**m``-dim matrix on wires ``[*W, *(W + n)]`` — one HBM pass instead
    of two passes per Kraus operator.  Returns ``(matrix, ket_wires)`` or
    None when the channel is too wide for the dense superoperator.
    """
    if len(op.wires) > _SUPEROP_MAX_WIRES:
        return None
    kraus = op.kraus_matrices()
    s = jnp.asarray(kraus[0])
    s = jnp.kron(s, jnp.conj(s))
    for K in kraus[1:]:
        K = jnp.asarray(K)
        s = s + jnp.kron(K, jnp.conj(K))
    return s, list(op.wires)


def _double_plan(
    plan: List[Tuple[str, object, List[int]]], n: int, large: bool
) -> List[Tuple[str, object, List[int]]]:
    """Map an n-qubit contraction plan onto the 2n-qubit doubled register
    in ket-then-bra wire order (ket wires 0..n-1, bra wires n..2n-1).

    Unitary windows become a ket application plus a conjugate bra twin;
    diagonal gates likewise (both stay one broadcast pass each).  Kraus
    channels lower to one-pass superoperators on their ket+bra wires
    (``_channel_superop``) on small states; in the large-state regime those
    wires are ~n apart and the scattered-support kernel path tiles
    catastrophically, so channels defer to their own density application
    there (the interleaved engine below is the large-state noise path).
    """
    out: List[Tuple[str, object, List[int]]] = []
    for kind, payload, wires in plan:
        if kind == "mat":
            out.append(("mat", payload, list(wires)))
            out.append(("mat", jnp.conj(payload), [w + n for w in wires]))
            continue
        op = payload
        if isinstance(op, KrausChannel):
            lowered = None if large else _channel_superop(op)
            if lowered is None:
                out.append(("dens_op", op, list(wires)))
            else:
                s, kw = lowered
                out.append(("mat", s, kw + [w + n for w in kw]))
        elif isinstance(op, DiagonalQubitUnitary):
            d = op.diag
            out.append(("diag", d, list(op.wires)))
            out.append(("diag", jnp.conj(d), [w + n for w in op.wires]))
        elif op.__class__.apply_to_state_ri is not Operation.apply_to_state_ri:
            # Custom application semantics (Id/Barrier no-ops etc.): defer
            # to the operation's own density method.
            out.append(("dens_op", op, list(wires)))
        else:
            m = op.matrix
            out.append(("mat", m, list(wires)))
            out.append(("mat", jnp.conj(m), [w + n for w in wires]))
    return out


def _schedule_density_segments(
    plan: List[Tuple[str, object, List[int]]], n2: int
) -> List[Tuple[str, object, List[int]]]:
    """Layout-schedule the unitary stretches of a doubled density plan.

    ``dens_op`` steps (wide channels handled by their own density method)
    address physical wires and act as barriers; each stretch between them
    is scheduled independently (``schedule_layout`` restores offset 0 at
    stretch end, so the barriers always see the canonical layout).
    """
    out: List[Tuple[str, object, List[int]]] = []
    seg: List[Tuple[str, object, List[int]]] = []

    def drain() -> None:
        nonlocal seg
        if seg:
            out.extend(schedule_layout(seg, n2))
            seg = []

    for step in plan:
        if step[0] == "dens_op":
            drain()
            out.append(step)
        else:
            seg.append(step)
    drain()
    return out


def simulate_mixed_ri(tape: List[Operation], n_qubits: int) -> jnp.ndarray:
    """Real-split density simulation; returns the ``(2, 4**n)`` pair.

    The density matrix is simulated as a pure state of the 2n-qubit doubled
    register (:func:`_double_plan`): the same window-fusion planner, layout
    scheduler and Pallas kernels as the statevector path apply, and noise
    channels run as one-pass superoperators.  The reference applies one
    two-sided einsum per gate plus a Python loop of per-Kraus einsums
    (qml_essentials/simulation.py:107-128); neither the doubled-register
    fusion nor the superoperator lowering has a reference counterpart.
    """
    n2 = 2 * n_qubits
    large = pallas_kernels.ENABLED and n2 >= pallas_kernels.PALLAS_MIN_N
    if large:
        # Fusion economics follow the doubled state size, but windows can
        # only span one side of the register (ket wires 0..n-1).
        base = plan_contractions(
            tape, max_width=min(n_qubits, PALLAS_FUSE_WIDTH)
        )
    else:
        base = plan_contractions(tape, n_qubits=n_qubits)
    plan = _double_plan(base, n_qubits, large)
    if large:
        plan = _schedule_density_segments(plan, n2)

    rho2 = kernels.zero_density_ri(n_qubits)
    for kind, payload, wires in plan:
        if kind == "dens_op":
            rho2 = payload.apply_to_density_ri(rho2, n_qubits)
        else:
            rho2 = _apply_step_ri(rho2, kind, payload, wires, n2)
    return rho2


def simulate_mixed(tape: List[Operation], n_qubits: int) -> jnp.ndarray:
    """Density-matrix simulation from |0><0| (needed for Kraus channels)."""
    dim = 2**n_qubits
    return kernels.from_ri(simulate_mixed_ri(tape, n_qubits)).reshape(dim, dim)


# ---------------------------------------------------------------------------
# Interleaved-layout density engine
#
# The density matrix of an n-qubit noisy circuit is simulated as a pure
# state of 2n qubits in *interleaved* wire order: data qubit w owns the
# adjacent doubled wires (2w = ket bit, 2w+1 = bra bit).  In this layout
# every lowered operator is contiguous —
#   * a unitary U on data wires [lo, hi) becomes U ⊗ conj(U) on doubled
#     wires [2lo, 2hi),
#   * a Kraus channel on data wire w becomes its 4x4 superoperator
#     sum_k K ⊗ conj(K) on [2w, 2w+2) (ONE pass instead of two passes per
#     Kraus operator),
# so the whole noisy circuit flows through the same window-fusion planner,
# layout scheduler, Pallas kernels and saved-residual backward as the
# statevector path.  (The adjoint-state backward is NOT valid here:
# superoperators are not unitary and cannot be inverted by daggering.)
# Neither the interleaved layout nor the superoperator lowering has a
# reference counterpart (ref applies per-gate two-sided einsums plus a
# Python loop of per-Kraus einsums, qml_essentials/simulation.py:107-128).
# ---------------------------------------------------------------------------

# Widest data-gate support doubled into a dense U ⊗ conj(U) window
# (m = 5 -> a 1024-dim operator, the REFUSE_MAX_WIDTH kernel ceiling).
_DOUBLE_MAX_WIRES: int = 5
# Widest diagonal gate doubled into an interleaved diagonal (4**m entries).
_DOUBLE_DIAG_MAX_WIRES: int = 8


def _interleaved_wires(wires: Sequence[int]) -> List[int]:
    """Doubled wire list (ket then bra, matching the operator's qubit
    order) for a data-wire support under the interleaved layout."""
    return [2 * w for w in wires] + [2 * w + 1 for w in wires]


def _interleave_diag(d: jnp.ndarray, m: int) -> jnp.ndarray:
    """``d ⊗ conj(d)`` with bits shuffled to (k0, b0, k1, b1, ...)."""
    dd = jnp.outer(d, jnp.conj(d)).reshape((2,) * (2 * m))
    order = [ax for i in range(m) for ax in (i, m + i)]
    return jnp.transpose(dd, order).reshape(-1)


def _lower_interleaved_tape(
    tape: List[Operation], n_qubits: int
) -> Optional[List[Operation]]:
    """Lower an n-qubit tape to a 2n-qubit pure-state tape in interleaved
    layout, or ``None`` when some operation has no contiguous doubled form
    (very wide gates/diagonals/channels) — callers then fall back to the
    ket-then-bra path."""
    out: List[Operation] = []
    for op in tape:
        if isinstance(op, Barrier) or (
            isinstance(op, Id) and op._matrix is Id._matrix
        ):
            continue
        m = len(op.wires)
        if isinstance(op, KrausChannel):
            lowered = _channel_superop(op)
            if lowered is None:
                return None
            s, kw = lowered
            out.append(
                Operation(
                    wires=_interleaved_wires(kw), matrix=s,
                    record=False, name=f"S[{op.name}]",
                )
            )
            continue
        if isinstance(op, DiagonalQubitUnitary):
            ws = sorted(op.wires)
            if m > _DOUBLE_DIAG_MAX_WIRES or ws != list(
                range(ws[0], ws[0] + m)
            ):
                return None
            # Diagonal entries follow sorted wire order by construction.
            out.append(
                DiagonalQubitUnitary(
                    _interleave_diag(op.diag, m),
                    wires=list(range(2 * ws[0], 2 * (ws[0] + m))),
                    record=False,
                )
            )
            continue
        if op.__class__.apply_to_state_ri is not Operation.apply_to_state_ri:
            return None  # custom application semantics we cannot double
        if m > _DOUBLE_MAX_WIRES:
            return None
        u = op.matrix
        out.append(
            Operation(
                wires=_interleaved_wires(op.wires),
                matrix=jnp.kron(u, jnp.conj(u)),
                record=False, name=f"D[{op.name}]",
            )
        )
    return out


def _simulate_interleaved_ri(dtape: List[Operation], n2: int) -> jnp.ndarray:
    """Pure-state simulation of a lowered doubled tape.

    Mirrors :func:`simulate_pure_ri` (window fusion, zero-state prefix
    peel, layout scheduling, saved-residual backward) minus the two
    unitarity-dependent strategies: the chain planner and the adjoint-state
    backward (superoperator steps are not invertible by daggering).
    """
    psi2 = None
    plan = plan_contractions(dtape, n_qubits=n2)
    if pallas_kernels.ENABLED and n2 >= pallas_kernels.PALLAS_MIN_N:
        peeled, psi2 = _zero_state_prefix(plan, n2)
        plan = schedule_layout(_drop_indices(plan, peeled), n2)
    if psi2 is None:
        psi2 = kernels.zero_state_ri(n2)
    if saved.ENABLED:
        norm = adjoint.normalize_plan(plan, n2)
        if norm is not None and saved.usable(norm[0], n2):
            static, payloads = norm
            try:
                return saved.execute_plan_saved_ri(psi2, payloads, static, n2)
            except TypeError as e:
                if "forward-mode autodiff" not in str(e):
                    raise
    for kind, payload, wires in plan:
        psi2 = _apply_step_ri(psi2, kind, payload, wires, n2)
    return psi2


@lru_cache(maxsize=8)
def _pair_sel_matrix(k: int) -> np.ndarray:
    """(4**k, 2**k) 0/1 selection: column d picks the interleaved-diagonal
    row whose every (ket, bra) bit pair equals the bits of d."""
    cols = np.arange(2**k, dtype=np.int64)
    idx = np.zeros(2**k, dtype=np.int64)
    for i in range(k):
        bit = (cols >> (k - 1 - i)) & 1
        idx |= (bit * 3) << (2 * (k - 1 - i))
    sel = np.zeros((4**k, 2**k), dtype=np.float32)
    sel[idx, cols] = 1.0
    return sel


# Trailing pairs handled by one dense 0/1 matmul in _pair_diag: the slice
# approach degrades once the contiguous runs get shorter than a lane tile,
# while a (4**k, 2**k) selection matmul reads the remainder in one MXU pass.
_PAIR_DIAG_TAIL: int = 6


def _pair_diag(x: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
    """Diagonal of an interleaved flat density plane: keep the entries
    where every (ket, bra) bit pair reads 00 or 11.

    Leading pairs collapse by slicing the second-most-significant axis —
    each kept element is a contiguous run of a quarter of the remaining
    tail, so the copies ride full DMA lanes; the last ``_PAIR_DIAG_TAIL``
    pairs collapse in one 0/1 selection matmul on the MXU.  (The previous
    trailing-end strided slice produced unit-width lanes: ~75 ms of pure
    readout at n=13 on a v5e, vs ~one cheap pass for this layout.)
    """
    k = min(n_qubits, _PAIR_DIAG_TAIL)
    d_lead = 1
    for _ in range(n_qubits - k):
        # x: (d_lead, 4, tail) -> keep pair values 00/11 of the leading
        # remaining pair; each kept block is `tail` contiguous elements.
        x = x.reshape(d_lead, 4, -1)[:, ::3, :]
        d_lead *= 2
    if k == 0:
        return x.reshape(-1)
    sel = jnp.asarray(_pair_sel_matrix(k))
    return (x.reshape(d_lead, 4**k) @ sel).reshape(-1)


@lru_cache(maxsize=8)
def _deinterleave_index(n_qubits: int) -> np.ndarray:
    """Gather indices mapping interleaved -> ket-then-bra flat order.

    ``target[j] = src[idx[j]]`` where j has bit layout (k0..k_{n-1},
    b0..b_{n-1}) and the source interleaves (k0, b0, k1, b1, ...).
    """
    dim = 2**n_qubits
    dtype = np.int32 if 4**n_qubits < 2**31 else np.int64
    j = np.arange(4**n_qubits, dtype=dtype)
    ket, bra = j // dim, j % dim
    idx = np.zeros_like(j)
    for i in range(n_qubits):
        idx |= ((ket >> i) & 1).astype(dtype) << (2 * i + 1)
        idx |= ((bra >> i) & 1).astype(dtype) << (2 * i)
    return idx


def _deinterleave_ri(rho2il: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
    """Interleaved flat density pair -> ket-then-bra flat pair (one gather)."""
    return jnp.take(rho2il, jnp.asarray(_deinterleave_index(n_qubits)), axis=1)


def _measure_interleaved_ri(
    rho2il: jnp.ndarray, n_qubits: int, type: str, obs: List[Operation]
) -> jnp.ndarray:
    """Measurement from an interleaved density pair.

    ``probs`` and diagonal-observable expvals come straight off the pair
    diagonal (no relayout); anything needing the full matrix deinterleaves
    once via a precomputed gather.
    """
    if type in ("probs", "expval"):
        probs = _pair_diag(rho2il[0], n_qubits)
        if type == "probs":
            return probs
        diags = [_diagonal_real(ob) for ob in obs]
        if obs and all(d is not None for d in diags):
            return _expval_from_probs(probs, n_qubits, obs, diags)
    return measure_density_ri(
        _deinterleave_ri(rho2il, n_qubits), n_qubits, type, obs
    )


def _outer_ri(psi2: jnp.ndarray) -> jnp.ndarray:
    """Real-split outer product: ``rho = |psi><psi|`` as a flat (2, 4**n) pair."""
    r, i = psi2[0], psi2[1]
    rho_r = jnp.outer(r, r) + jnp.outer(i, i)
    rho_i = jnp.outer(i, r) - jnp.outer(r, i)
    return jnp.stack([rho_r.reshape(-1), rho_i.reshape(-1)])


def simulate_and_measure(
    tape: List[Operation],
    n_qubits: int,
    type: str,
    obs: List[Operation],
    use_density: bool,
    shots: Optional[int] = None,
    key: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Single-dispatch simulation + measurement.

    Keeps the reference's pure-circuit density optimisation: a noiseless tape
    asked for ``"density"`` is simulated as a statevector and outer-producted
    once, O(depth·2^n + 4^n) instead of O(depth·4^n)
    (qml_essentials/simulation.py:176-190).
    """
    dim = 2**n_qubits
    if use_density:
        has_noise = any(isinstance(o, KrausChannel) for o in tape)
        if has_noise:
            # Preferred: the interleaved doubled-register engine (fused
            # windows + one-pass superoperator channels).
            dtape = _lower_interleaved_tape(tape, n_qubits)
            if dtape is not None:
                rho2il = _simulate_interleaved_ri(dtape, 2 * n_qubits)
                if shots is not None and type in ("probs", "expval"):
                    exact_probs = _pair_diag(rho2il[0], n_qubits)
                    return sample_shots(
                        exact_probs, n_qubits, type, obs, shots, key
                    )
                return _measure_interleaved_ri(rho2il, n_qubits, type, obs)
            rho2 = simulate_mixed_ri(tape, n_qubits)
        else:
            rho2 = _outer_ri(simulate_pure_ri(tape, n_qubits))

        if shots is not None and type in ("probs", "expval"):
            exact_probs = jnp.diagonal(rho2[0].reshape(dim, dim))
            return sample_shots(exact_probs, n_qubits, type, obs, shots, key)
        return measure_density_ri(rho2, n_qubits, type, obs)

    psi2 = simulate_pure_ri(tape, n_qubits)

    if shots is not None and type in ("probs", "expval"):
        exact_probs = psi2[0] ** 2 + psi2[1] ** 2
        return sample_shots(exact_probs, n_qubits, type, obs, shots, key)
    return measure_state_ri(psi2, n_qubits, type, obs)


# ---------------------------------------------------------------------------
# Measurement
# ---------------------------------------------------------------------------


def _diagonal_real(obs: Operation) -> Optional[np.ndarray]:
    """Concrete real diagonal of an observable if it is Z-type, else None.

    Recognises (a) class-level diagonal matrices (PauliZ, Id), and
    (b) operations tagged with an I/Z-only ``_pauli_label`` (parity
    observables) — those never need their dense matrix.
    """
    label = getattr(obs, "_pauli_label", None)
    if label is not None and set(label) <= {"I", "Z"}:
        diag = np.ones(1)
        for ch in label:
            diag = np.kron(diag, np.array([1.0, 1.0]) if ch == "I" else np.array([1.0, -1.0]))
        return diag
    # Use the *instance* matrix: an instance may override its class matrix
    # (e.g. a Hermitian built from data), and silently taking the class
    # diagonal would measure the wrong observable.
    m = obs._matrix
    if m is None or isinstance(m, jax.core.Tracer):
        return None
    m_np = np.asarray(m)
    if m_np.shape[0] != 2 ** len(obs.wires):
        return None
    if np.allclose(m_np, np.diag(np.diag(m_np))) and np.allclose(
        np.imag(np.diag(m_np)), 0.0
    ):
        return np.real(np.diag(m_np))
    return None


def _expval_from_probs(
    probs: jnp.ndarray, n_qubits: int, obs: List[Operation], diags: List[np.ndarray]
) -> jnp.ndarray:
    """Expectation values of diagonal observables from the probability vector.

    Per-qubit-factorisable observables (single-qubit diagonals, Z-parity
    words) use the halving fold (one weighted pairwise reduction per qubit,
    ~2 state reads total); other diagonal observables marginalise onto
    their support first.  No dense observable is ever materialised — the
    reference lifts a ``2**n x 2**n`` matrix here
    (qml_essentials/simulation.py:263-269).
    """
    # Shared half-register marginals: with many observables whose support
    # sits entirely in the top or bottom half of the register (the standard
    # all-single-qubit-Z measurement), two O(2**n) reduction passes replace
    # one full halving fold *per observable* — the folds then run on the
    # tiny 2**(n/2) marginals.
    h = (n_qubits + 1) // 2
    low = n_qubits - h
    row_marg = col_marg = None
    use_halves = n_qubits >= 8 and len(obs) >= 2

    results = []
    for ob, d in zip(obs, diags):
        wires = list(ob.wires)
        label = getattr(ob, "_pauli_label", None)

        weights: List = [None] * n_qubits
        factorised = False
        if len(wires) == 1:
            weights[wires[0]] = (float(d[0]), float(d[1]))
            factorised = True
        elif label is not None and set(label) <= {"I", "Z"}:
            for ch, w in zip(label, wires):
                weights[w] = (1.0, -1.0) if ch == "Z" else (1.0, 1.0)
            factorised = True

        if factorised:
            if use_halves and wires and max(wires) < h:
                if row_marg is None:
                    row_marg = probs.reshape(2**h, 2**low).sum(axis=1)
                results.append(
                    kernels.reduce_diagonal_expectation(row_marg, weights[:h])
                )
            elif use_halves and wires and min(wires) >= h:
                if col_marg is None:
                    col_marg = probs.reshape(2**h, 2**low).sum(axis=0)
                results.append(
                    kernels.reduce_diagonal_expectation(col_marg, weights[h:])
                )
            else:
                results.append(
                    kernels.reduce_diagonal_expectation(probs, weights)
                )
            continue

        # Non-product diagonal: marginalise to the support, dot with the
        # (tiny, concrete) diagonal reordered to sorted wires.
        srt = sorted(wires)
        marg = kernels.marginal_probs_on(probs, srt, n_qubits)
        k = len(wires)
        d_t = np.asarray(d).reshape((2,) * k)
        order = [wires.index(w) for w in srt]
        d_sorted = np.transpose(d_t, order).reshape(-1)
        results.append(marg @ jnp.asarray(d_sorted, dtype=marg.dtype))
    return jnp.stack(results)


def _stack_obs(obs: List[Operation], n_qubits: int) -> jnp.ndarray:
    """Stack lifted observable matrices into ``(n_obs, dim, dim)``."""
    return jnp.stack([ob.lifted_matrix(n_qubits) for ob in obs], axis=0)


def measure_state(
    state: jnp.ndarray,
    n_qubits: int,
    type: str,
    obs: List[Operation],
) -> jnp.ndarray:
    """Measure a pure statevector: ``state`` / ``probs`` / ``expval``."""
    if type == "state":
        return state
    if type == "probs":
        return jnp.abs(state) ** 2

    if type == "expval":
        diags = [_diagonal_real(ob) for ob in obs]
        if obs and all(d is not None for d in diags):
            return _expval_from_probs(jnp.abs(state) ** 2, n_qubits, obs, diags)
        # General path: one batched matvec over the stacked observables.
        obs_mats = _stack_obs(obs, n_qubits)
        O_states = jnp.einsum("oij,j->oi", obs_mats, state)
        return jnp.real(jnp.einsum("i,oi->o", jnp.conj(state), O_states))

    raise ValueError(f"Unknown measurement type: {type!r}")


def measure_density(
    rho: jnp.ndarray,
    n_qubits: int,
    type: str,
    obs: List[Operation],
) -> jnp.ndarray:
    """Measure a density matrix: ``density`` / ``probs`` / ``expval``."""
    if type == "density":
        return rho
    if type == "probs":
        return jnp.real(jnp.diagonal(rho))

    if type == "expval":
        diags = [_diagonal_real(ob) for ob in obs]
        if obs and all(d is not None for d in diags):
            return _expval_from_probs(
                jnp.real(jnp.diagonal(rho)), n_qubits, obs, diags
            )
        obs_mats = _stack_obs(obs, n_qubits)
        return jnp.real(jnp.einsum("oij,ji->o", obs_mats, rho))

    raise ValueError(
        "Measurement type 'state' is not defined for mixed (noisy) circuits. "
        "Use 'density' instead."
    )


def measure_state_ri(
    psi2: jnp.ndarray,
    n_qubits: int,
    type: str,
    obs: List[Operation],
) -> jnp.ndarray:
    """Measure a real-split pure state; complex only at the boundary."""
    if type == "state":
        return kernels.from_ri(psi2)
    probs = psi2[0] ** 2 + psi2[1] ** 2
    if type == "probs":
        return probs
    if type == "expval":
        diags = [_diagonal_real(ob) for ob in obs]
        if obs and all(d is not None for d in diags):
            return _expval_from_probs(probs, n_qubits, obs, diags)
        # Non-diagonal observables: recombine once and use the dense path.
        return measure_state(kernels.from_ri(psi2), n_qubits, type, obs)
    raise ValueError(f"Unknown measurement type: {type!r}")


def measure_density_ri(
    rho2: jnp.ndarray,
    n_qubits: int,
    type: str,
    obs: List[Operation],
) -> jnp.ndarray:
    """Measure a real-split density state; complex only at the boundary."""
    dim = 2**n_qubits
    if type == "density":
        return kernels.from_ri(rho2).reshape(dim, dim)
    probs = jnp.diagonal(rho2[0].reshape(dim, dim))
    if type == "probs":
        return probs
    if type == "expval":
        diags = [_diagonal_real(ob) for ob in obs]
        if obs and all(d is not None for d in diags):
            return _expval_from_probs(probs, n_qubits, obs, diags)
        return measure_density(
            kernels.from_ri(rho2).reshape(dim, dim), n_qubits, type, obs
        )
    raise ValueError(
        "Measurement type 'state' is not defined for mixed (noisy) circuits. "
        "Use 'density' instead."
    )


def sample_shots(
    probs: jnp.ndarray,
    n_qubits: int,
    type: str,
    obs: List[Operation],
    shots: int,
    key: jnp.ndarray,
) -> jnp.ndarray:
    """Finite-shot estimate from an exact probability vector.

    Sampling uses Gumbel-max (``jax.random.categorical``) — a fully
    vectorised, TPU-friendly draw — followed by a scatter-add histogram.
    """
    dim = 2**n_qubits
    logits = jnp.log(jnp.clip(probs, 1e-30, None))
    samples = jax.random.categorical(key, logits, shape=(shots,))
    counts = jnp.zeros(dim, dtype=jnp.int32).at[samples].add(1)
    estimated = counts / shots

    if type == "probs":
        return estimated

    if type == "expval":
        diags = [_diagonal_real(ob) for ob in obs]
        if obs and all(d is not None for d in diags):
            return _expval_from_probs(estimated, n_qubits, obs, diags)
        results = []
        for ob in obs:
            O_diag = jnp.diagonal(ob.lifted_matrix(n_qubits))
            results.append(jnp.real(jnp.dot(O_diag, estimated)))
        return jnp.stack(results)

    raise ValueError(
        f"Shot simulation is only supported for 'probs' and 'expval', got {type!r}."
    )
