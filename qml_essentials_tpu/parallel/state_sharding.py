"""Distributed statevector simulation: shard the ``(2,)**n`` state over ICI.

The scaling axis of a statevector simulator is the ``2**n`` state itself
(SURVEY.md §5 "long-context" analog).  This module shards the state's
*leading qubit axes* across a mesh axis (``"state"``) inside
``jax.shard_map``:

* Each of ``D = 2**g`` devices holds the ``2**(n-g)`` amplitudes whose
  leading ``g`` qubit bits equal its device index.
* Gates on **local** qubits apply with the ordinary matmul kernel — zero
  communication.
* Gates touching **global** (sharded) qubits trigger a qubit-axis relabel:
  *all* of the gate's global bits are exchanged with gate-free local qubits
  in **one** grouped ``jax.lax.all_to_all`` (a distributed transpose over
  ICI), after which the gate is local.
* The logical→physical layout evolution is **planned on the host** from the
  op wire lists alone (:func:`_plan_layout`) — every shard follows the same
  static plan, victims are chosen Belady-style (the local qubit whose next
  gate lies farthest in the future, minimising layout ping-pong), and the
  final qubit order is known without any trace side-channel.
* Measurements reduce with ``psum`` over the mesh axis.

This is the from-scratch equivalent of a distributed statevector backend —
the reference has none (its multi-device story is a comment at
qml_essentials/script.py:443-453).
"""

from __future__ import annotations

import logging
import math
from functools import lru_cache, partial, reduce
from operator import or_
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qml_essentials_tpu.ops import kernels
from qml_essentials_tpu.ops.dtypes import cdtype
from qml_essentials_tpu.ops.operations import Barrier, KrausChannel, Operation

logger = logging.getLogger(__name__)

# Incremented every time a shard-map body is traced; tests assert that
# repeated executions of the same signature reuse the compiled program.
TRACE_COUNT: int = 0

# Route sharded gradients through the residual-free adjoint-state backward
# (reconstruct states by inverting gates/exchanges) instead of stacking
# per-step autodiff residuals over the local shard.
ADJOINT: bool = True

# Plans that cannot use the adjoint backward (superoperator tapes from the
# sharded density engine, forward-mode fallbacks) differentiate via
# residual autodiff.  At or above this many steps the plan executes in
# ~sqrt(T) jax.checkpoint segments, bounding the residual stack at
# ~2*sqrt(T) local shards instead of T — rematerialisation trades one
# extra forward sweep of FLOPs for the memory that sharding exists to
# protect (the shard barely fits; T shards of residuals never will).
CHECKPOINT_MIN_STEPS: int = 16


class ShardingUnavailable(NotImplementedError):
    """A tape/request the sharded statevector backend cannot run.

    Raised on the *host* at plan-build time (never mid-trace), so callers —
    notably :meth:`Script._try_sharded_state` — can cleanly fall back to the
    single-device path.  Kraus channels are not a statevector request —
    noisy tapes route through the sharded interleaved doubled-register
    density engine instead (:mod:`~qml_essentials_tpu.parallel.
    density_sharding`), which raises this same exception for tapes with no
    contiguous doubled form.
    """


class _OpStep(NamedTuple):
    """Static per-op execution step produced by :func:`_plan_layout`.

    ``exchange`` is a tuple of ``(global_pos, victim_pos)`` pairs performed
    as one grouped all_to_all before the gate; ``local_axes`` are the
    positions (minus g) of the gate's wires *after* that exchange.
    """

    exchange: Tuple[Tuple[int, int], ...]
    local_axes: Tuple[int, ...]


class _LayoutPlan(NamedTuple):
    steps: Tuple[_OpStep, ...]
    final_order: Tuple[int, ...]  # final_order[p] = logical qubit at pos p


def _plan_layout(wire_lists: Sequence[Sequence[int]], n: int, g: int) -> _LayoutPlan:
    """Host-side static layout planner.

    Walks the op sequence once; whenever an op touches global positions,
    schedules one grouped exchange bringing every global gate qubit local.
    Victim selection is Belady's rule: evict the local qubit whose next use
    lies farthest in the future (ties broken toward higher positions),
    which provably minimises exchanges for a known gate sequence.
    """
    order = list(range(n))
    steps: List[_OpStep] = []

    # next_use[t][q]: first index >= t at which logical qubit q appears.
    INF = float("inf")
    T = len(wire_lists)
    nxt = [INF] * n
    next_use: List[List[float]] = [None] * T
    for t in range(T - 1, -1, -1):
        next_use[t] = list(nxt)
        for w in wire_lists[t]:
            nxt[w] = t

    for t, wires in enumerate(wire_lists):
        pos = {q: p for p, q in enumerate(order)}
        global_ws = [w for w in wires if pos[w] < g]
        pairs: List[Tuple[int, int]] = []
        if global_ws:
            protected = set(wires)
            cands = [p for p in range(g, n) if order[p] not in protected]
            if len(cands) < len(global_ws):
                # Raised at host plan time: the executor catches this and
                # falls back to the single-device path (e.g. a 2-qubit gate
                # with only one local qubit left on a very wide mesh).
                raise ShardingUnavailable(
                    "Gate support too wide for the sharded layout: "
                    f"{len(global_ws)} global bits but only {len(cands)} "
                    "free local positions."
                )
            # next_use[t] holds each qubit's first use in (t, T).
            future = next_use[t]
            cands.sort(key=lambda p: (future[order[p]], p), reverse=True)
            for w, victim in zip(global_ws, cands):
                gpos = pos[w]
                pairs.append((gpos, victim))
                order[gpos], order[victim] = order[victim], order[gpos]
                pos[order[gpos]] = gpos
                pos[order[victim]] = victim
        steps.append(
            _OpStep(
                exchange=tuple(pairs),
                local_axes=tuple(pos[w] - g for w in wires),
            )
        )
    return _LayoutPlan(steps=tuple(steps), final_order=tuple(order))


def _exchange_bits(
    local: jnp.ndarray,
    pairs: Sequence[Tuple[int, int]],
    axis_name: str,
    g: int,
) -> jnp.ndarray:
    """Exchange m device-index bits with m local tensor axes at once.

    Devices sharing all non-swapped bits form groups of ``2**m``; one
    grouped ``all_to_all`` splitting on the combined victim axes performs
    the m-bit distributed transpose — m qubit swaps between the sharded
    and local halves of the state for the price of one collective.
    """
    m = len(pairs)
    gpos = [p for p, _ in pairs]
    laxes = [v - g for _, v in pairs]
    masks = [1 << (g - 1 - p) for p in gpos]
    combined = reduce(or_, masks)
    D = 2**g

    groups = []
    for base in range(D):
        if base & combined:
            continue
        members = []
        for idx in range(2**m):
            d = base
            for j in range(m):
                if (idx >> (m - 1 - j)) & 1:
                    d |= masks[j]
            members.append(d)
        groups.append(members)

    r = local.ndim
    perm = laxes + [a for a in range(r) if a not in laxes]
    inv = np.argsort(perm)
    x = jnp.transpose(local, perm).reshape(2**m, -1)
    x = jax.lax.all_to_all(
        x,
        axis_name,
        split_axis=0,
        concat_axis=0,
        tiled=True,
        axis_index_groups=groups,
    )
    return jnp.transpose(x.reshape((2,) * r), inv)


def _exchange_bits_ppermute(
    local: jnp.ndarray,
    pairs: Sequence[Tuple[int, int]],
    axis_name: str,
    g: int,
) -> jnp.ndarray:
    """The m-bit exchange as ``2**m - 1`` XOR-offset ``ppermute`` rounds.

    Semantically identical to :func:`_exchange_bits`, but built only from
    primitives with vmap batching rules (``ppermute`` + dynamic slicing) —
    grouped ``all_to_all`` has none, so batched shard bodies (vmap inside
    ``shard_map``) route here.  Per offset ``o`` every device sends the
    victim-slice ``my_pattern ^ o`` to the device whose masked bits differ
    by ``o`` (a global XOR permutation, so one ``ppermute`` per offset);
    the receiver deposits it at slot ``my_pattern ^ o``.  Same total data
    volume as the single collective, ``2**m - 1`` rounds of latency.
    """
    m = len(pairs)
    M = 2**m
    gpos = [p for p, _ in pairs]
    laxes = [v - g for _, v in pairs]
    masks = [1 << (g - 1 - p) for p in gpos]

    def spread(t: int) -> int:
        dev = 0
        for j in range(m):
            if (t >> (m - 1 - j)) & 1:
                dev |= masks[j]
        return dev

    r = local.ndim
    perm = laxes + [a for a in range(r) if a not in laxes]
    inv = np.argsort(perm)
    x = jnp.transpose(local, perm).reshape(M, -1)

    d = jax.lax.axis_index(axis_name)
    my_pat = jnp.zeros((), jnp.int32)
    for p in gpos:
        my_pat = my_pat * 2 + ((d >> (g - 1 - p)) & 1)

    out = x  # offset 0: slot my_pat keeps its own slice
    D = 2**g
    for o in range(1, M):
        send = jax.lax.dynamic_index_in_dim(x, my_pat ^ o, axis=0, keepdims=True)
        perm_o = [(s, s ^ spread(o)) for s in range(D)]
        recv = jax.lax.ppermute(send, axis_name, perm=perm_o)
        out = jax.lax.dynamic_update_index_in_dim(out, recv, my_pat ^ o, axis=0)
    return jnp.transpose(out.reshape((2,) * r), inv)


# Exchange implementation for *batched* (vmapped) shard bodies:
#   "a2a"      — a custom_vmap batching rule for the grouped all_to_all:
#                one collective moves the whole batch (the leading batch
#                axis rides along untouched), matching the unbatched
#                path's latency.  Default.
#   "ppermute" — 2**m - 1 XOR-offset ppermute rounds (the conservative
#                construction from primitives that natively batch).
BATCHED_EXCHANGE: str = "a2a"


def _exchange_bits_batched(
    local: jnp.ndarray,
    pairs: Sequence[Tuple[int, int]],
    axis_name: str,
    g: int,
) -> jnp.ndarray:
    """:func:`_exchange_bits` with a leading batch axis riding along.

    The grouped ``all_to_all`` splits/concats on the slot axis (axis 1);
    the batch axis is just payload, so the batched exchange is still ONE
    collective.
    """
    m = len(pairs)
    gpos = [p for p, _ in pairs]
    laxes = [v - g for _, v in pairs]
    masks = [1 << (g - 1 - p) for p in gpos]
    combined = reduce(or_, masks)
    D = 2**g

    groups = []
    for base in range(D):
        if base & combined:
            continue
        members = []
        for idx in range(2**m):
            d = base
            for j in range(m):
                if (idx >> (m - 1 - j)) & 1:
                    d |= masks[j]
            members.append(d)
        groups.append(members)

    r = local.ndim - 1
    B = local.shape[0]
    perm = laxes + [a for a in range(r) if a not in laxes]
    inv = np.argsort(perm)
    x = jnp.transpose(local, [0] + [a + 1 for a in perm]).reshape(B, 2**m, -1)
    x = jax.lax.all_to_all(
        x,
        axis_name,
        split_axis=1,
        concat_axis=1,
        tiled=True,
        axis_index_groups=groups,
    )
    x = x.reshape((B,) + (2,) * r)
    return jnp.transpose(x, [0] + [int(i) + 1 for i in inv])


@lru_cache(maxsize=None)
def _vmappable_exchange(
    pairs: Tuple[Tuple[int, int], ...], axis_name: str, g: int
) -> Callable:
    """Grouped-all_to_all exchange with a custom vmap batching rule.

    ``jax.lax.all_to_all`` has no batching rule, so a vmapped shard body
    cannot use it directly; this wrapper supplies one — the batched rule
    runs the same single collective with the batch as payload
    (:func:`_exchange_bits_batched`) instead of degrading to ``2**m - 1``
    ppermute rounds.
    """
    from jax import custom_batching

    @custom_batching.custom_vmap
    def ex(local):
        return _exchange_bits(local, pairs, axis_name, g)

    @ex.def_vmap
    def _rule(axis_size, in_batched, local):  # noqa: ANN001
        del axis_size, in_batched
        return _exchange_bits_batched(local, pairs, axis_name, g), True

    return ex


def _exchange(
    local: jnp.ndarray,
    pairs: Sequence[Tuple[int, int]],
    axis_name: str,
    g: int,
    via_ppermute: bool,
) -> jnp.ndarray:
    """Dispatch the exchange implementation (static at trace time).

    ``via_ppermute=True`` marks calls that may run under ``jax.vmap``
    (batched shard bodies); those route through the vmap-capable
    implementation selected by :data:`BATCHED_EXCHANGE`.
    """
    if via_ppermute:
        if BATCHED_EXCHANGE == "a2a":
            return _vmappable_exchange(tuple(pairs), axis_name, g)(local)
        return _exchange_bits_ppermute(local, pairs, axis_name, g)
    return _exchange_bits(local, pairs, axis_name, g)


def _mat_cotangent(
    lam: jnp.ndarray, psi: jnp.ndarray, axes: Sequence[int]
) -> jnp.ndarray:
    """Per-shard gate-matrix cotangent ``gw = λ ψ^T`` restricted to *axes*.

    Unconjugated on purpose: JAX's transpose of complex ``dot_general`` does
    not conjugate, so a custom VJP must produce the same (non-Hermitian)
    cotangent convention for upstream autodiff through the gate-matrix
    construction to compose.  The enclosing ``shard_map`` transpose sums
    replicated-input cotangents across shards, so this returns the *local*
    partial contraction.
    """
    axes = list(axes)
    k = len(axes)
    rest = [a for a in range(lam.ndim) if a not in axes]
    lam_f = jnp.transpose(lam, axes + rest).reshape(2**k, -1)
    psi_f = jnp.transpose(psi, axes + rest).reshape(2**k, -1)
    return lam_f @ psi_f.T


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _exec_local_plan(
    local: jnp.ndarray,
    mats: Tuple[jnp.ndarray, ...],
    steps: Tuple[_OpStep, ...],
    axis: str,
    g: int,
    via_ppermute: bool = False,
) -> jnp.ndarray:
    """Run the static layout plan on the local shard (adjoint-state VJP).

    The backward sweep *reconstructs* each pre-step state by applying the
    conjugate gate and re-running the (involutive) bit exchange, so no
    per-step residual states are kept — peak memory stays at ~2 local
    shards regardless of circuit depth (the design reason for sharding is
    states too large for one device, exactly where residual stacks stop
    fitting).
    """
    for mat, step in zip(mats, steps):
        if step.exchange:
            local = _exchange(local, step.exchange, axis, g, via_ppermute)
        local = kernels.apply_matrix(local, mat, list(step.local_axes))
    return local


def _exec_local_fwd(local, mats, steps, axis, g, via_ppermute=False):
    out = _exec_local_plan(local, mats, steps, axis, g, via_ppermute)
    return out, (out, mats)


def _exec_local_bwd(steps, axis, g, via_ppermute, res, ct):
    psi, mats = res
    lam = ct
    grads: List[jnp.ndarray] = []
    for mat, step in zip(reversed(mats), reversed(steps)):
        axes = list(step.local_axes)
        # Inverse (conjugate transpose, by unitarity) reconstructs the
        # pre-step state; the cotangent pulls back through the PLAIN
        # transpose — matching JAX's non-conjugating dot transpose rule.
        psi = kernels.apply_matrix(psi, jnp.conj(mat).T, axes)
        grads.append(_mat_cotangent(lam, psi, axes))
        lam = kernels.apply_matrix(lam, mat.T, axes)
        if step.exchange:
            # An exchange is an involutive permutation collective: applying
            # the same exchange again is both its inverse and its cotangent
            # transpose.
            psi = _exchange(psi, step.exchange, axis, g, via_ppermute)
            lam = _exchange(lam, step.exchange, axis, g, via_ppermute)
    return lam, tuple(reversed(grads))


_exec_local_plan.defvjp(_exec_local_fwd, _exec_local_bwd)


def _fused_ops(ops: Sequence[Operation], n: int, g: int) -> List[Operation]:
    """Fuse adjacent gates into window Operations before layout planning.

    The single-device planner's window fusion
    (:func:`~qml_essentials_tpu.ops.simulation.plan_contractions`) applies
    unchanged to the sharded path: a fused window is one local contraction
    per shard instead of one per gate, and the Belady layout planner sees
    fewer, wider steps — cutting both local passes and exchange collectives
    (a 12q Circuit_19 layer drops from ~66 steps/18 exchanges to ~15/8).
    Windows are capped at the local width so they can always be made local.
    """
    from qml_essentials_tpu.ops import simulation as _sim

    width = min(_sim.FUSE_MAX_WIDTH, max(n - g, 1))
    fused: List[Operation] = []
    for kind, payload, wires in _sim.plan_contractions(
        list(ops), max_width=width
    ):
        if kind == "mat":
            fused.append(
                Operation(
                    wires=list(wires), matrix=payload,
                    record=False, name="Window",
                )
            )
        else:
            fused.append(payload)
    return fused


class _ObsSpec(NamedTuple):
    """Static per-observable measurement plan under the sharded layout.

    ``zword`` observables contract the probability shard (plus
    device-constant signs for global Z factors); ``general`` Hermitian
    observables get one involutive exchange bringing their wires local
    (``exchange``), then a local ``⟨ψ|O|ψ⟩`` contraction on ``local_axes``
    followed by a psum — the sharded equivalent of the reference's lifted
    dense contraction (qml_essentials/simulation.py:263-317).
    """

    kind: str  # "zword" | "general"
    word: Tuple[int, ...]
    exchange: Tuple[Tuple[int, int], ...]
    local_axes: Tuple[int, ...]
    op: Optional[Operation]


def reduce_zword(word: Sequence[int]) -> Tuple[int, ...]:
    """Reduce repeated wires in a Z-word mod 2 (``Z·Z = I``).

    A word like ``(0, 0)`` means ``<Z_0 Z_0> = <I> = 1``; even-multiplicity
    wires drop out entirely, odd-multiplicity wires keep one factor.  The
    unsharded density path applies the same algebra via its dense diagonal,
    so reducing here keeps both paths in agreement.
    """
    from collections import Counter

    return tuple(sorted(w for w, c in Counter(word).items() if c % 2 == 1))


def zword_of(obs: Operation) -> Optional[Tuple[int, ...]]:
    """Wires carrying Z if *obs* is an I/Z-diagonal Pauli word, else None.

    Recognises plain ``PauliZ`` (with its class matrix) and any operation
    tagged with an I/Z ``_pauli_label`` (e.g. parity observables).
    """
    label = getattr(obs, "_pauli_label", None)
    if label is not None and set(label) <= {"I", "Z"}:
        return tuple(w for ch, w in zip(label, obs.wires) if ch == "Z")
    if (
        obs.__class__.__name__ == "PauliZ"
        and len(obs.wires) == 1
        and obs._matrix is obs.__class__._matrix
    ):
        return (obs.wires[0],)
    return None


class ShardedStateSim:
    """Statevector simulator with the state sharded over a mesh axis.

    Example:
        >>> mesh = make_mesh((4,), ("state",))
        >>> sim = ShardedStateSim(n_qubits=20, mesh=mesh)
        >>> expvals = sim.expval_z(tape_fn, wires=[0, 19])

    The circuit is given as ``tape_fn(*args) -> List[Operation]`` — e.g.
    ``lambda p: Script(f)._record(p)``.  It is traced twice: once on the
    host to extract the (static) wire sequence for the layout plan, and
    once inside ``shard_map`` for the actual gate matrices.
    """

    def __init__(self, n_qubits: int, mesh: Mesh, axis: str = "state") -> None:
        self.n = n_qubits
        self.mesh = mesh
        self.axis = axis
        D = mesh.shape[axis]
        g = int(math.log2(D))
        if 2**g != D:
            raise ValueError(f"state axis size must be a power of two, got {D}")
        if g > n_qubits:
            raise ValueError("more state shards than qubits")
        self.g = g
        # The adjoint-state backward reconstructs pre-step states by
        # daggering each matrix — valid only for unitary tapes.  The sharded
        # density engine feeds superoperator tapes and clears this flag to
        # route gradients through plain residual autodiff instead.
        self.adjointable = True

    # ---------------------------------------------------------------- core
    def _host_plan(self, tape_fn: Callable, *args) -> _LayoutPlan:
        """Trace the tape on the host and build the static layout plan."""
        ops = [
            op
            for op in tape_fn(*args)
            if not isinstance(op, Barrier)
        ]
        for op in ops:
            if isinstance(op, KrausChannel):
                raise ShardingUnavailable(
                    "This simulator is statevector-only; noise channels "
                    "route through the sharded density engine "
                    "(parallel.ShardedDensitySim)."
                )
        ops = _fused_ops(ops, self.n, self.g)
        return _plan_layout([list(op.wires) for op in ops], self.n, self.g)

    def _measurement_exchange(
        self, order: Sequence[int], wires: Sequence[int]
    ) -> Tuple[Tuple[Tuple[int, int], ...], Tuple[int, ...]]:
        """One grouped exchange bringing *wires* local after the circuit.

        Same victim logic as :func:`_plan_layout` but for a single
        measurement step (no future uses: victims are the highest free
        local positions).  Returns the exchange pairs and the post-exchange
        qubit order.
        """
        order = list(order)
        pos = {q: p for p, q in enumerate(order)}
        global_ws = [w for w in wires if pos[w] < self.g]
        pairs: List[Tuple[int, int]] = []
        if global_ws:
            protected = set(wires)
            cands = [
                p for p in range(self.g, self.n) if order[p] not in protected
            ]
            if len(cands) < len(global_ws):
                raise ShardingUnavailable(
                    "Observable support too wide for the sharded layout: "
                    f"{len(global_ws)} global bits but only {len(cands)} "
                    "free local positions."
                )
            cands.sort(reverse=True)
            for w, victim in zip(global_ws, cands):
                gpos = pos[w]
                pairs.append((gpos, victim))
                order[gpos], order[victim] = order[victim], order[gpos]
                pos[order[gpos]] = gpos
                pos[order[victim]] = victim
        return tuple(pairs), tuple(order)

    def _plan_obs(
        self, observables: Sequence, order: Sequence[int]
    ) -> Tuple[_ObsSpec, ...]:
        """Build static measurement specs for a mixed observable list.

        Accepts ints (single-qubit Z), tuples of wires (Z-parity words) and
        arbitrary :class:`Operation` observables.  I/Z Pauli words take the
        cheap probability-fold path; everything else gets a planned
        exchange + local contraction.
        """
        specs: List[_ObsSpec] = []
        for ob in observables:
            if isinstance(ob, int):
                specs.append(_ObsSpec("zword", (ob,), (), (), None))
                continue
            if isinstance(ob, tuple):
                specs.append(_ObsSpec("zword", reduce_zword(ob), (), (), None))
                continue
            w = zword_of(ob)
            if w is not None:
                specs.append(_ObsSpec("zword", reduce_zword(w), (), (), None))
                continue
            pairs, new_order = self._measurement_exchange(order, list(ob.wires))
            pos = {q: p for p, q in enumerate(new_order)}
            axes = tuple(pos[w] - self.g for w in ob.wires)
            specs.append(_ObsSpec("general", (), pairs, axes, ob))
        return tuple(specs)

    def _local_general_val(
        self, local: jnp.ndarray, spec: _ObsSpec, via_ppermute: bool
    ) -> jnp.ndarray:
        """Per-shard partial of ``⟨ψ|O|ψ⟩`` for a general Hermitian obs.

        The planned exchange makes every observable wire local; the local
        contraction is then ``Re Σ conj(ψ_loc) · (O ψ_loc)`` and the psum
        over the mesh axis (done by the caller) completes the trace.
        """
        psi = local
        if spec.exchange:
            psi = _exchange(psi, spec.exchange, self.axis, self.g, via_ppermute)
        mat = jnp.asarray(spec.op.matrix, dtype=cdtype())
        o_psi = kernels.apply_matrix(psi, mat, list(spec.local_axes))
        return jnp.real(jnp.sum(jnp.conj(psi) * o_psi))

    def _local_obs_vals(
        self,
        local: jnp.ndarray,
        specs: Sequence[_ObsSpec],
        order: Sequence[int],
        via_ppermute: bool,
    ) -> jnp.ndarray:
        """Stack per-shard partial expectation values for all specs."""
        probs = None
        vals = []
        for spec in specs:
            if spec.kind == "zword":
                if probs is None:
                    probs = jnp.abs(local) ** 2
                vals.append(self._local_zword_val(probs, spec.word, order))
            else:
                vals.append(self._local_general_val(local, spec, via_ppermute))
        return jnp.stack(vals)

    def _local_shot_expval(
        self,
        est: jnp.ndarray,
        spec: _ObsSpec,
        order: Sequence[int],
        via_ppermute: bool = False,
    ) -> jnp.ndarray:
        """Per-shard partial expval from an estimated-probability shard.

        Mirrors the reference's shot semantics — the observable enters only
        through its computational-basis diagonal
        (qml_essentials/simulation.py:358-368) — so a general observable
        contributes ``diag(O) · p̂`` on its (exchanged-local) support.
        """
        if spec.kind == "zword":
            return self._local_zword_val(est, spec.word, order)
        t = est
        if spec.exchange:
            t = _exchange(t, spec.exchange, self.axis, self.g, via_ppermute)
        axes = list(spec.local_axes)
        srt = sorted(axes)
        marg = jnp.sum(
            t, axis=tuple(a for a in range(t.ndim) if a not in axes)
        )
        k = len(axes)
        diag = np.real(np.diagonal(np.asarray(spec.op.matrix))).reshape((2,) * k)
        # marg's axes arrive in ascending axis order; permute the wire-order
        # diagonal to match.
        perm = [axes.index(a) for a in srt]
        d_sorted = np.transpose(diag, perm).reshape(-1)
        return marg.reshape(-1) @ jnp.asarray(d_sorted, marg.dtype)

    def _simulate_local(
        self,
        ops: List[Operation],
        plan: _LayoutPlan,
        via_ppermute: bool = False,
    ):
        """Run the tape on the local shard following the static plan.

        ``via_ppermute`` selects the vmap-safe exchange implementation —
        required when this runs under ``jax.vmap`` (batched shard bodies),
        where the grouped ``all_to_all`` has no batching rule.
        """
        n, g = self.n, self.g

        d = jax.lax.axis_index(self.axis)
        dim_local = 2 ** (n - g)
        amp0 = jnp.where(d == 0, 1.0, 0.0).astype(cdtype())
        local = jnp.zeros(dim_local, dtype=cdtype()).at[0].set(1.0) * amp0
        local = local.reshape((2,) * (n - g))

        live_ops = _fused_ops(
            [op for op in ops if not isinstance(op, Barrier)], n, g
        )
        assert len(live_ops) == len(plan.steps), (
            "layout plan does not match the traced tape"
        )
        if ADJOINT and self.adjointable:
            mats = tuple(
                jnp.asarray(op.matrix, dtype=cdtype()) for op in live_ops
            )
            try:
                return _exec_local_plan(
                    local, mats, plan.steps, self.axis, self.g, via_ppermute
                )
            except TypeError as e:
                # forward-mode (jacfwd) cannot jvp a custom_vjp; fall back
                # to the residual-stacking autodiff loop below.
                if "forward-mode autodiff" not in str(e):
                    raise

        def apply_range(x, seg_mats, seg_steps):
            for mat, step in zip(seg_mats, seg_steps):
                if step.exchange:
                    x = _exchange(x, step.exchange, self.axis, g, via_ppermute)
                x = kernels.apply_matrix(x, mat, list(step.local_axes))
            return x

        T = len(live_ops)
        all_mats = tuple(
            jnp.asarray(op.matrix, dtype=cdtype()) for op in live_ops
        )
        if T < CHECKPOINT_MIN_STEPS:
            return apply_range(local, all_mats, plan.steps)
        # sqrt(T) checkpoint segments: backward recomputes within each
        # segment, so peak residual memory is ~(n_segs + seg_len) shards.
        seg = max(int(math.isqrt(T)), 1)
        for start in range(0, T, seg):
            seg_steps = plan.steps[start:start + seg]

            def seg_fn(x, *seg_mats, _steps=seg_steps):
                return apply_range(x, seg_mats, _steps)

            local = jax.checkpoint(seg_fn)(
                local, *all_mats[start:start + seg]
            )
        return local

    def _global_sign(self, order: Sequence[int], logical: int) -> jnp.ndarray:
        """±1 sign of a Z on a *global* qubit, constant per device."""
        p = list(order).index(logical)
        d = jax.lax.axis_index(self.axis)
        bit = (d >> (self.g - 1 - p)) & 1
        return (1.0 - 2.0 * bit).astype(jnp.float32)

    def _local_zword_val(
        self, probs: jnp.ndarray, word: Sequence[int], order: Sequence[int]
    ) -> jnp.ndarray:
        """Per-shard partial of ``<Z_{w1} Z_{w2} ...>`` (psum to complete).

        Z factors on *global* (sharded) qubits contribute a device-constant
        sign; local factors contract the probability shard against the
        ``(1, -1)`` product diagonal of the word's local marginal.
        """
        g = self.g
        sign = None
        local_axes = []
        for w in word:
            p = list(order).index(w)
            if p < g:
                s = self._global_sign(order, w)
                sign = s if sign is None else sign * s
            else:
                local_axes.append(p - g)
        if local_axes:
            local_axes = sorted(local_axes)
            marg = jnp.sum(
                probs,
                axis=tuple(i for i in range(probs.ndim) if i not in local_axes),
            )
            diag = np.ones(1)
            for _ in local_axes:
                diag = np.kron(diag, np.array([1.0, -1.0]))
            val = marg.reshape(-1) @ jnp.asarray(diag, marg.dtype)
        else:
            val = jnp.sum(probs)
        return val if sign is None else sign * val

    # ------------------------------------------------------------- readouts
    def expval_z(self, tape_fn: Callable, wires: Sequence[int], *args) -> jnp.ndarray:
        """⟨Z_w⟩ for each entry of *wires*; one psum-reduced scalar each.

        Each entry may be an int (single-qubit Z) or a tuple of wires (a
        Z⊗...⊗Z parity word).  Differentiable: ``jax.grad`` through the
        returned values backpropagates through the collectives and the
        local kernels (residual-free adjoint backward when enabled).
        """
        words = tuple((w,) if isinstance(w, int) else tuple(w) for w in wires)
        return self.build_expval_program(tape_fn, words, args)(*args)

    def expval(
        self, tape_fn: Callable, observables: Sequence, *args
    ) -> jnp.ndarray:
        """⟨O⟩ for each observable (ints, wire tuples, or Operations)."""
        return self.build_expval_program(tape_fn, tuple(observables), args)(*args)

    def build_expval_program(
        self,
        tape_fn: Callable,
        observables: Tuple,
        example_args: tuple,
        in_axes: Optional[Tuple] = None,
        data_axis: Optional[str] = None,
    ) -> Callable:
        """Build a jitted shard-map program for expectation values.

        *observables* entries may be ints (single-qubit Z), wire tuples
        (Z-parity words) or arbitrary Hermitian :class:`Operation`\\ s —
        general observables measure via one planned exchange plus a local
        contraction (see :class:`_ObsSpec`).  With ``in_axes`` the program
        vmaps the local simulation over the batch inside the shard body
        (optionally splitting the batch over *data_axis* of the mesh) —
        batch and state parallelism compose through one mesh.  The returned
        callable is cacheable by the caller (same signature => reusable
        compiled program).
        """
        scalar_args = (
            example_args
            if in_axes is None
            else tuple(
                jax.lax.index_in_dim(a, 0, axis=ax, keepdims=False)
                if ax is not None
                else a
                for a, ax in zip(example_args, in_axes)
            )
        )
        plan = self._host_plan(tape_fn, *scalar_args)
        order = plan.final_order
        specs = self._plan_obs(observables, order)

        def one(via_ppermute, *single_args):
            ops = tape_fn(*single_args)
            local = self._simulate_local(ops, plan, via_ppermute=via_ppermute)
            return self._local_obs_vals(local, specs, order, via_ppermute)

        if in_axes is None:

            def shard_body(*inner_args):
                global TRACE_COUNT
                TRACE_COUNT += 1
                partials = one(False, *inner_args)
                return jax.lax.psum(partials, self.axis).real.astype(jnp.float32)

            in_specs = tuple(P() for _ in example_args)
            out_specs = P()
        else:

            def shard_body(*inner_args):
                global TRACE_COUNT
                TRACE_COUNT += 1
                # vmap-safe exchanges: grouped all_to_all has no batching
                # rule, so the batched body routes through ppermute rounds.
                partials = jax.vmap(
                    lambda *a: one(True, *a), in_axes=in_axes
                )(*inner_args)
                return jax.lax.psum(partials, self.axis).real.astype(jnp.float32)

            def spec_for(a, ax):
                if ax is None or data_axis is None:
                    return P()
                spec = [None] * a.ndim
                spec[ax] = data_axis
                return P(*spec)

            in_specs = tuple(
                spec_for(a, ax) for a, ax in zip(example_args, in_axes)
            )
            out_specs = P(data_axis, None) if data_axis else P()

        fn = jax.shard_map(
            shard_body,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(fn)

    def _scalar_slice(
        self, example_args: tuple, in_axes: Optional[Tuple]
    ) -> tuple:
        """First batch element of *example_args* under the vmap convention."""
        if in_axes is None:
            return example_args
        return tuple(
            jax.lax.index_in_dim(a, 0, axis=ax, keepdims=False)
            if ax is not None
            else a
            for a, ax in zip(example_args, in_axes)
        )

    def _batched_in_specs(
        self,
        example_args: tuple,
        in_axes: Optional[Tuple],
        data_axis: Optional[str],
    ) -> Tuple:
        """PartitionSpecs placing batch axes on *data_axis* (replicated else)."""
        if in_axes is None:
            return tuple(P() for _ in example_args)

        def spec_for(a, ax):
            if ax is None or data_axis is None:
                return P()
            spec = [None] * a.ndim
            spec[ax] = data_axis
            return P(*spec)

        return tuple(spec_for(a, ax) for a, ax in zip(example_args, in_axes))

    def _unpermute(
        self, stacked: jnp.ndarray, order: Sequence[int], batched: bool
    ) -> jnp.ndarray:
        """Device-major gathered amplitudes → logical-order flat vector(s)."""
        n = self.n
        inv = tuple(int(i) for i in np.argsort(order))
        if not batched:
            return jnp.transpose(stacked.reshape((2,) * n), inv).reshape(-1)
        B = stacked.shape[0]
        x = stacked.reshape((B,) + (2,) * n)
        return jnp.transpose(x, (0,) + tuple(i + 1 for i in inv)).reshape(B, -1)

    def build_shot_program(
        self,
        tape_fn: Callable,
        type: str,
        observables: Tuple,
        shots: int,
        example_args: tuple,
        in_axes: Optional[Tuple] = None,
        data_axis: Optional[str] = None,
    ) -> Callable:
        """Finite-shot sampling without ever gathering the 2**n state.

        Two-stage categorical draw (matching the reference's
        Gumbel-max/histogram semantics, qml_essentials/simulation.py:320-377,
        statistically — not bitwise — since the key stream is per-shard):

        1. every device draws the same ``shots`` *shard* indices from the
           psum'd per-shard probability masses (shared key → identical
           draws, no broadcast needed);
        2. each device draws ``shots`` candidates from its *local*
           conditional distribution with a device-folded key and
           scatter-adds only the draws assigned to it.

        The resulting histogram lives sharded in physical order.  For
        ``type="probs"`` it is gathered/unpermuted to the logical
        ``2**n`` vector (same cost as exact :meth:`probs`); for
        ``type="expval"`` each observable contracts its diagonal against
        the estimated shard and psums — nothing global ever materialises.

        With ``in_axes`` the body vmaps over the batch (one independent key
        per element — pass a ``jax.random.split`` key batch), exchanges run
        via the vmap-safe ppermute rounds, and with *data_axis* the batch
        additionally splits over the mesh's data axis.

        Returns a callable ``fn(key, *args)`` (``fn(keys, *args)`` batched).
        """
        if type not in ("probs", "expval"):
            raise ValueError(
                "Shot simulation is only supported for 'probs' and "
                f"'expval', got {type!r}."
            )
        scalar_args = self._scalar_slice(example_args, in_axes)
        plan = self._host_plan(tape_fn, *scalar_args)
        order = plan.final_order
        specs = (
            self._plan_obs(observables, order) if type == "expval" else ()
        )
        n, g = self.n, self.g
        batched = in_axes is not None

        def one(via_ppermute, key, *single_args):
            ops = tape_fn(*single_args)
            local = self._simulate_local(ops, plan, via_ppermute=via_ppermute)
            p_loc = (jnp.abs(local) ** 2).reshape(-1)
            masses = jax.lax.all_gather(jnp.sum(p_loc), self.axis)  # (D,)
            shard_choice = jax.random.categorical(
                key, jnp.log(jnp.clip(masses, 1e-30, None)), shape=(shots,)
            )
            d = jax.lax.axis_index(self.axis)
            local_samples = jax.random.categorical(
                jax.random.fold_in(key, d),
                jnp.log(jnp.clip(p_loc, 1e-30, None)),
                shape=(shots,),
            )
            mine = (shard_choice == d).astype(jnp.int32)
            counts = (
                jnp.zeros(p_loc.size, dtype=jnp.int32)
                .at[local_samples]
                .add(mine)
            )
            est = counts.astype(jnp.float32) / shots
            if type == "probs":
                return est
            est_t = est.reshape((2,) * (n - g))
            return jnp.stack(
                [self._local_shot_expval(est_t, s, order, via_ppermute) for s in specs]
            )

        if not batched:

            def shard_body(key, *inner_args):
                global TRACE_COUNT
                TRACE_COUNT += 1
                out = one(False, key, *inner_args)
                if type == "probs":
                    return out.reshape(1, -1)
                return jax.lax.psum(out, self.axis).astype(jnp.float32)

            in_specs = (P(),) + tuple(P() for _ in example_args)
            out_specs = P(self.axis, None) if type == "probs" else P()
        else:

            def shard_body(keys, *inner_args):
                global TRACE_COUNT
                TRACE_COUNT += 1
                out = jax.vmap(
                    lambda k, *a: one(True, k, *a), in_axes=(0,) + tuple(in_axes)
                )(keys, *inner_args)
                if type == "probs":
                    return out  # (B_local, 2^(n-g))
                return jax.lax.psum(out, self.axis).astype(jnp.float32)

            key_spec = P(data_axis) if data_axis else P()
            in_specs = (key_spec,) + self._batched_in_specs(
                example_args, in_axes, data_axis
            )
            out_specs = (
                P(data_axis, self.axis)
                if type == "probs"
                else P(data_axis, None)
            )

        jitted = jax.jit(
            jax.shard_map(
                shard_body,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            )
        )
        if type == "expval":
            return jitted

        def run(key, *args):
            stacked = jitted(key, *args)
            return self._unpermute(stacked, order, batched)

        return run

    def sample(
        self,
        tape_fn: Callable,
        type: str,
        observables: Sequence,
        shots: int,
        key: jnp.ndarray,
        *args,
    ) -> jnp.ndarray:
        """One-shot helper around :meth:`build_shot_program`."""
        return self.build_shot_program(
            tape_fn, type, tuple(observables), shots, args
        )(key, *args)

    def build_state_program(
        self,
        tape_fn: Callable,
        example_args: tuple,
        in_axes: Optional[Tuple] = None,
        data_axis: Optional[str] = None,
    ) -> Callable:
        """Jitted program returning the full logical-order statevector.

        The result is a global ``(2**n,)`` array (``(B, 2**n)`` batched)
        sharded on its trailing axis; the final unpermute transpose compiles
        to XLA collectives.  The physical→logical permutation comes from the
        static layout plan (no trace side-channels).  With ``in_axes`` the
        batch vmaps inside the shard body (ppermute exchanges) and with
        *data_axis* additionally splits over the mesh's data axis.
        """
        scalar_args = self._scalar_slice(example_args, in_axes)
        plan = self._host_plan(tape_fn, *scalar_args)
        batched = in_axes is not None

        if not batched:

            def shard_body(*inner_args):
                global TRACE_COUNT
                TRACE_COUNT += 1
                local = self._simulate_local(tape_fn(*inner_args), plan)
                return local.reshape(1, -1)

            in_specs = tuple(P() for _ in example_args)
            out_specs = P(self.axis, None)
        else:

            def shard_body(*inner_args):
                global TRACE_COUNT
                TRACE_COUNT += 1

                def one(*a):
                    return self._simulate_local(
                        tape_fn(*a), plan, via_ppermute=True
                    ).reshape(-1)

                return jax.vmap(one, in_axes=in_axes)(*inner_args)

            in_specs = self._batched_in_specs(example_args, in_axes, data_axis)
            out_specs = P(data_axis, self.axis)

        fn = jax.jit(
            jax.shard_map(
                shard_body,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            )
        )

        def run(*args):
            return self._unpermute(fn(*args), plan.final_order, batched)

        return run

    def build_probs_program(
        self,
        tape_fn: Callable,
        example_args: tuple,
        in_axes: Optional[Tuple] = None,
        data_axis: Optional[str] = None,
    ) -> Callable:
        """Jitted program for the full probability vector (logical order)."""
        state_fn = self.build_state_program(
            tape_fn, example_args, in_axes=in_axes, data_axis=data_axis
        )

        def run(*args):
            return jnp.abs(state_fn(*args)) ** 2

        return run

    def state(self, tape_fn: Callable, *args) -> jnp.ndarray:
        """Full statevector in logical qubit order (one-shot helper)."""
        return self.build_state_program(tape_fn, args)(*args)

    def probs(self, tape_fn: Callable, *args) -> jnp.ndarray:
        """Full probability vector in logical qubit order."""
        psi = self.state(tape_fn, *args)
        return jnp.abs(psi) ** 2


def sharded_expval_z(
    tape_fn: Callable,
    n_qubits: int,
    wires: Sequence[int],
    mesh: Optional[Mesh] = None,
    axis: str = "state",
    *args,
) -> jnp.ndarray:
    """One-shot helper: ⟨Z⟩ on *wires* with the state sharded over *mesh*."""
    from qml_essentials_tpu import parallel as _parallel

    mesh = mesh if mesh is not None else _parallel.get_mesh()
    if mesh is None:
        raise ValueError("No mesh configured; call parallel.set_mesh first.")
    return ShardedStateSim(n_qubits, mesh, axis).expval_z(tape_fn, wires, *args)
