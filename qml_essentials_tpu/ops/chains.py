"""Chain planner: whole-region single-pass execution groups.

The round-2/3 execution model applies one fused window per HBM pass; at 24
qubits a Circuit_19 layer costs ~5 passes.  On this chip every Pallas pass
is pinned at ~220-320 GB/s while the MXU work of a K<=512 window hides
(mostly) under the stream — so the remaining lever is *pass count*.

This module groups a tape's gates into **chain steps**: each step is one
Pallas pass over a block that keeps a wide contiguous *bit span* of the
flat state resident in VMEM and applies a whole sequence of windows /
diagonals to it:

- geometry ``"L"``: block = state bits ``[0, CHAIN_SL)`` (the 17 low bits =
  the 17 *highest* wires — the flat state is big-endian, wire 0 = MSB),
  laid out as (grid, rows = bits [8, SL), lanes = bits [0, 8)).  Windows on
  bits [0, 8)/[0, 9) are minor-axis matmuls; windows inside [8, SL) are
  row-slice matmuls.
- geometry ``"H"``: block = state bits ``[n-8, n)`` (the 8 lowest wires) as
  rows, with lane-chunks of the remaining bits.  Windows are row-slice
  matmuls.  Diagonals on *any* bits apply in either geometry (row/lane
  iota bits in-block, grid bits via program_id).

Ring-wrap entanglers (e.g. ``CRX(n-1, 0)`` — one wire in each region) are
transpiled into (1q conjugators) · (two-bit diagonal) · (1q conjugators)†:
the conjugators absorb into the neighbouring windows of their own region
and the diagonal is a free elementwise pattern inside either pass.  A
24-qubit Circuit_19 layer becomes exactly TWO passes (one L, one H).

The planner is conservative: anything it cannot express (noise channels,
wide diagonals, gates straddling regions without a known conjugator
decomposition) makes :func:`plan_chains` return ``None`` and the caller
falls back to the rotation-scheduled window plan.

Reference parity: this replaces the per-gate einsum loop of
qml_essentials/simulation.py:91-104 (the reference's only execution
strategy) for large states; the reference has no analogous pass-fusion
machinery.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from qml_essentials_tpu.ops import kernels
from qml_essentials_tpu.ops.dtypes import cdtype
from qml_essentials_tpu.ops.operations import (
    Barrier,
    DiagonalQubitUnitary,
    Id,
    KrausChannel,
    Operation,
)

# Bit span of the "L" geometry block (rows+lanes resident in VMEM).
CHAIN_SL: int = 17

# Bit width of the "H" geometry block (the low-wire rows).
CHAIN_HB: int = 8

# Maximum diagonal arity the in-kernel pattern builder supports.
_MAX_DIAG_BITS: int = 2

# Conjugators K with K Z K^dag = P for each Pauli letter.
_H = np.array([[1, 1], [1, -1]], dtype=np.complex64) / np.sqrt(2.0)
_S = np.array([[1, 0], [0, 1j]], dtype=np.complex64)
_CONJ = {
    "I": None,
    "Z": None,
    "X": _H,
    "Y": _S @ _H,
}

# Gate classes that are exactly diagonal in the computational basis.
_DIAGONAL_CLASSES = {"CZ", "CRZ", "ControlledPhaseShift", "RZZ"}


def _bit(w: int, n: int) -> int:
    """Flat-state bit position of wire *w* (big-endian: wire 0 = MSB)."""
    return n - 1 - w


def _conjugator_letters(op: Operation) -> Optional[List[str]]:
    """Per-wire Pauli letters whose conjugators diagonalise *op*, or None.

    Covers the entangler zoo: controlled rotations / controlled Paulis
    (conjugator on the target only) and two-qubit Pauli rotations
    (conjugator per target letter).  Reference gate semantics:
    qml_essentials/operations.py:1315-1487.
    """
    name = op.__class__.__name__
    if name in _DIAGONAL_CLASSES:
        return ["I"] * len(op.wires)
    word = getattr(op, "pauli_word", None)
    n_controls = getattr(op, "n_controls", 0)
    if word is not None and n_controls == 1 and len(word) == 1:
        # CRX / CRY / CRZ / ControlledPauliRot(1 control, 1 target)
        return ["I", word]
    if word is not None and n_controls == 0 and len(word) == len(op.wires):
        # RXX / RYY / RZZ / RZX / generic 2q PauliRot
        return list(word)
    if name in ("CX", "CY"):
        return ["I", name[1]]
    return None


def _decompose_seam(op: Operation) -> Optional[list]:
    """Split a two-qubit gate into (conjugators, diagonal, conjugators^dag).

    Returns ``[(kind, payload, wires), ...]`` pseudo-items in application
    order, or ``None`` when the gate has no known conjugator form.  The
    diagonal is computed from the gate's (traced) matrix, so parametrised
    gates keep their autodiff path.
    """
    if len(op.wires) != 2:
        return None
    letters = _conjugator_letters(op)
    if letters is None:
        return None
    ks = [_CONJ[c] for c in letters]
    kmats = [np.eye(2, dtype=np.complex64) if k is None else k for k in ks]
    kron = np.kron(kmats[0], kmats[1])
    d4 = jnp.diagonal(kron.conj().T @ op.matrix @ kron)

    items: list = []
    for w, k in zip(op.wires, ks):
        if k is not None:
            items.append(("mat", jnp.asarray(k.conj().T), [w]))
    items.append(("diag", d4, list(op.wires)))
    for w, k in zip(op.wires, ks):
        if k is not None:
            items.append(("mat", jnp.asarray(k), [w]))
    return items


# ---------------------------------------------------------------------------
# Group assignment (greedy with disjoint-support commutation)
# ---------------------------------------------------------------------------


class _Group:
    __slots__ = ("region", "items", "support")

    def __init__(self, region: str) -> None:
        self.region = region
        self.items: list = []
        self.support: set = set()

    def add(self, item) -> None:
        self.items.append(item)
        self.support |= set(item[2])


def _regions_of(kind: str, wires: Sequence[int], n: int) -> List[str]:
    """Geometries whose resident span covers this item's wires."""
    regions = []
    if all(w >= n - CHAIN_SL for w in wires):
        regions.append("L")
    if all(w < CHAIN_HB for w in wires):
        regions.append("H")
    if kind == "diag":
        # Diagonals apply in either geometry (patterns reach every bit).
        return ["L", "H"]
    return regions


def _assign_groups(items: list, n: int) -> Optional[List[_Group]]:
    """Greedy placement into region groups, commuting over disjoint ones.

    An item may join any group of a matching region as long as its support
    is disjoint from every *later* group's support (disjoint unitaries
    commute, so hopping over them preserves semantics).
    """
    groups: List[_Group] = []
    for item in items:
        kind, _, wires = item
        regions = _regions_of(kind, wires, n)
        if not regions:
            return None
        support = set(wires)
        placed = False
        # A cross-region (ring-wrap) diagonal splits whatever window group
        # it lands in; route it to an H group (H windows are cheap K<=256
        # row matmuls) — opening a fresh one if ordering forbids joining.
        wrap_diag = kind == "diag" and any(
            w < CHAIN_HB for w in wires
        ) and any(w >= CHAIN_HB for w in wires)
        accept = ["H"] if wrap_diag else regions
        blocked = set()
        for i in range(len(groups) - 1, -1, -1):
            if groups[i].region in accept and not (support & blocked):
                groups[i].add(item)
                placed = True
                break
            blocked |= groups[i].support
            if support & blocked:
                break  # no earlier group can accept it either
        if not placed:
            g = _Group("H" if wrap_diag else regions[0])
            g.add(item)
            groups.append(g)
    return groups


# ---------------------------------------------------------------------------
# Per-group fusion into chain descriptors
# ---------------------------------------------------------------------------


def _span_valid(lo: int, hi: int, region: str, n: int) -> bool:
    """Window-geometry validity of a *bit* span [lo, hi)."""
    if region == "H":
        return n - CHAIN_HB <= lo and hi <= n and hi - lo <= 8
    # L geometry: minor windows [0, 8); row windows inside [7, SL).
    # A K=512 minor window would double the pass's (serial) MXU time —
    # boundary gates go to row windows instead.
    if lo < 7:
        return lo == 0 and hi <= 8  # snapped minor window
    return hi <= CHAIN_SL and hi - lo <= 8


def _snap(lo: int, hi: int, region: str) -> Tuple[int, int]:
    if region == "L" and lo < 7:
        return 0, max(hi, 8)
    return lo, hi


def _compose_bits(group: List[Operation], lo: int, hi: int, n: int) -> jnp.ndarray:
    """Compose gates into one matrix on the bit span [lo, hi).

    Bits [lo, hi) are wires [n-hi, n-lo); the composed index convention
    (first wire = MSB) matches bit hi-1 as the window-axis MSB — exactly
    the in-kernel contraction layout.
    """
    from qml_essentials_tpu.ops import simulation

    mat, _ = simulation._compose_window(group, n - hi, n - lo)
    return mat


def _lift_window(mat: jnp.ndarray, lo: int, hi: int, region: str, n: int):
    """Lift a window to kernel-friendly shape; returns (mat, lo, hi).

    Minor windows lift to exactly [0, 8) (or keep [0, 9)); row windows
    lift to width >= 7 (MXU-tileable K >= 128) by identity-extension.
    """
    width = hi - lo
    if region == "L" and lo == 0:
        target = 8 if hi <= 8 else 9
        if hi < target:
            pad = np.eye(2 ** (target - hi), dtype=np.float32)
            mat = jnp.kron(pad, mat)  # new bits are HIGH bits (left factor)
            hi = target
        return mat, lo, hi
    if width < 7:
        base = 7 if region == "L" else n - CHAIN_HB
        top = CHAIN_SL if region == "L" else n
        new_lo = max(base, hi - 7)
        if new_lo < lo:
            mat = jnp.kron(mat, np.eye(2 ** (lo - new_lo), dtype=np.float32))
            lo = new_lo
        if hi - lo < 7:
            new_hi = min(top, lo + 7)
            if new_hi > hi:
                mat = jnp.kron(np.eye(2 ** (new_hi - hi), dtype=np.float32), mat)
                hi = new_hi
    return mat, lo, hi


def _fuse_group(g: _Group, n: int) -> Optional[Tuple[tuple, list]]:
    """Fuse one group's items into ordered chain descriptors + payloads.

    Same greedy-window structure as ``simulation.plan_contractions`` but in
    bit coordinates with geometry-valid spans.  Returns ``(descs, payloads)``
    or ``None`` when an item cannot be expressed.
    """
    region = g.region
    descs: list = []
    payloads: list = []
    windows: List[list] = []  # [ops, lo, hi, support_bits]

    def emit_window(ops: List[Operation], lo: int, hi: int) -> None:
        mat = _compose_bits(ops, lo, hi, n)
        mat, lo2, hi2 = _lift_window(mat, lo, hi, region, n)
        descs.append(("win", lo2, hi2))
        payloads.append(mat)

    def flush(idxs: Optional[List[int]] = None) -> None:
        nonlocal windows
        if idxs is None:
            idxs = list(range(len(windows)))
        for i in sorted(idxs, reverse=True):
            ops, lo, hi, _ = windows.pop(i)
            emit_window(ops, lo, hi)

    for kind, payload, wires in g.items:
        bits = sorted(_bit(w, n) for w in wires)
        if kind == "diag":
            if len(bits) > _MAX_DIAG_BITS:
                return None
            touching = [
                i for i, w in enumerate(windows) if w[3] & set(bits)
            ]
            flush(touching)
            # Payload index: first wire = MSB.  Reorder to wires-ascending
            # (= bits descending) if recorded otherwise.
            k = len(wires)
            srt_w = sorted(wires)
            d = payload
            if list(wires) != srt_w:
                dt = d.reshape((2,) * k)
                order = [list(wires).index(w) for w in srt_w]
                d = jnp.transpose(dt, order).reshape(-1)
            descs.append(("diag", tuple(sorted(bits, reverse=True))))
            payloads.append(d)
            continue

        # Window item: a gate given as ("mat", matrix, wires).  Wrap it as
        # an Operation-like for _compose_window (which reads .wires and
        # .matrix) — use a tiny shim.
        op = payload
        lo, hi = _snap(bits[0], bits[-1] + 1, region)
        if not _span_valid(lo, hi, region, n):
            return None
        support = set(bits)

        touching = [i for i, w in enumerate(windows) if w[3] & support]
        if len(touching) > 1:
            mlo = min(lo, *(windows[i][1] for i in touching))
            mhi = max(hi, *(windows[i][2] for i in touching))
            mlo, mhi = _snap(mlo, mhi, region)
            if _span_valid(mlo, mhi, region, n):
                ops: List[Operation] = []
                sup: set = set()
                for i in touching:
                    ops.extend(windows[i][0])
                    sup |= windows[i][3]
                for i in sorted(touching, reverse=True):
                    windows.pop(i)
                ops.append(op)
                windows.append([ops, mlo, mhi, sup | support])
            else:
                flush(touching)
                windows.append([[op], lo, hi, support])
            continue
        if len(touching) == 1:
            i = touching[0]
            ops, wlo, whi, sup = windows[i]
            nlo, nhi = _snap(min(wlo, lo), max(whi, hi), region)
            if _span_valid(nlo, nhi, region, n):
                ops.append(op)
                windows[i] = [ops, nlo, nhi, sup | support]
            else:
                flush([i])
                windows.append([[op], lo, hi, support])
            continue
        placed = False
        for i, (ops, wlo, whi, sup) in enumerate(windows):
            nlo, nhi = _snap(min(wlo, lo), max(whi, hi), region)
            if _span_valid(nlo, nhi, region, n):
                ops.append(op)
                windows[i] = [ops, nlo, nhi, sup | support]
                placed = True
                break
        if not placed:
            windows.append([[op], lo, hi, support])

    flush()
    return tuple(descs), payloads


class _GateShim:
    """Minimal Operation-like wrapper for _compose_window consumption."""

    __slots__ = ("matrix", "wires")

    def __init__(self, matrix: jnp.ndarray, wires: List[int]) -> None:
        self.matrix = matrix
        self.wires = wires


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def plan_chains(
    tape: List[Operation], n: int
) -> Optional[List[Tuple[str, object, List[int]]]]:
    """Build a chain plan from a tape, or None when it cannot express it.

    Returns plan steps ``("chain", (geom, descs, payloads), wires)`` where
    *descs* is a hashable tuple of ``("win", lo, hi)`` / ``("diag", bits)``
    descriptors in application order and *payloads* the matching complex
    arrays.
    """
    if n < CHAIN_SL + 1 or CHAIN_SL <= 8:
        return None

    items: list = []
    for op in tape:
        if isinstance(op, Barrier):
            continue
        if isinstance(op, Id) and op._matrix is Id._matrix:
            continue
        if isinstance(op, KrausChannel):
            return None
        if (
            op.__class__.apply_to_state_ri is not Operation.apply_to_state_ri
            and not isinstance(op, DiagonalQubitUnitary)
        ):
            continue  # custom no-op application (Id subclasses, Barrier)
        if isinstance(op, DiagonalQubitUnitary):
            items.append(("diag", op.diag, list(op.wires)))
            continue
        wires = list(op.wires)
        regions = _regions_of("mat", wires, n)
        if regions:
            items.append(("mat", _GateShim(op.matrix, wires), wires))
            continue
        seam = _decompose_seam(op)
        if seam is None:
            return None
        for kind, payload, ws in seam:
            if kind == "mat":
                items.append(("mat", _GateShim(payload, ws), ws))
            else:
                items.append((kind, payload, ws))

    if not items:
        return []

    groups = _assign_groups(items, n)
    if groups is None:
        return None

    steps: List[Tuple[str, object, List[int]]] = []
    for g in groups:
        fused = _fuse_group(g, n)
        if fused is None:
            return None
        descs, payloads = fused
        if not descs:
            continue
        wires_union = sorted(g.support)
        geom = ("L", CHAIN_SL) if g.region == "L" else ("H", CHAIN_HB)
        steps.append(("chain", (geom, descs, tuple(payloads)), wires_union))
    return steps


# ---------------------------------------------------------------------------
# Reference expansion (non-Pallas backends, tests, density path)
# ---------------------------------------------------------------------------


def expand_chain_step(
    geom: str, descs: tuple, n: int
) -> List[Tuple[str, tuple]]:
    """Expand a chain step into plain (kind, wires) steps for the
    adjoint executor's normalised vocabulary.

    ``("win", lo, hi)`` becomes ``("mat", wires)`` on wires [n-hi, n-lo);
    ``("diag", bits)`` becomes ``("diag", wires)`` with wires ascending.
    Payload order is unchanged — descriptors and payloads stay 1:1.
    """
    out: List[Tuple[str, tuple]] = []
    for d in descs:
        if d[0] == "win":
            lo, hi = d[1], d[2]
            out.append(("mat", tuple(range(n - hi, n - lo))))
        else:
            bits = d[1]
            out.append(("diag", tuple(n - 1 - b for b in bits)))
    return out
