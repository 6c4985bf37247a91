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

import math
from functools import reduce
from operator import or_
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qml_essentials_tpu.ops import kernels
from qml_essentials_tpu.ops.dtypes import cdtype
from qml_essentials_tpu.ops.operations import Barrier, KrausChannel, Operation


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
                raise ValueError(
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
                raise NotImplementedError(
                    "Sharded simulation is statevector-only; noise channels "
                    "require the (unsharded) density path."
                )
        return _plan_layout([list(op.wires) for op in ops], self.n, self.g)

    def _simulate_local(self, ops: List[Operation], plan: _LayoutPlan):
        """Run the tape on the local shard following the static plan."""
        n, g = self.n, self.g

        d = jax.lax.axis_index(self.axis)
        dim_local = 2 ** (n - g)
        amp0 = jnp.where(d == 0, 1.0, 0.0).astype(cdtype())
        local = jnp.zeros(dim_local, dtype=cdtype()).at[0].set(1.0) * amp0
        local = local.reshape((2,) * (n - g))

        live_ops = [
            op
            for op in ops
            if not isinstance(op, Barrier)
        ]
        assert len(live_ops) == len(plan.steps), (
            "layout plan does not match the traced tape"
        )
        for op, step in zip(live_ops, plan.steps):
            if step.exchange:
                local = _exchange_bits(local, step.exchange, self.axis, g)
            local = kernels.apply_matrix(local, op.matrix, list(step.local_axes))
        return local

    def _global_sign(self, order: Sequence[int], logical: int) -> jnp.ndarray:
        """±1 sign of a Z on a *global* qubit, constant per device."""
        p = list(order).index(logical)
        d = jax.lax.axis_index(self.axis)
        bit = (d >> (self.g - 1 - p)) & 1
        return (1.0 - 2.0 * bit).astype(jnp.float32)

    # ------------------------------------------------------------- readouts
    def expval_z(self, tape_fn: Callable, wires: Sequence[int], *args) -> jnp.ndarray:
        """⟨Z_w⟩ for each wire in *wires*; one psum-reduced scalar per wire.

        Differentiable: ``jax.grad`` through the returned values
        backpropagates through the collectives and the local kernels.
        """
        plan = self._host_plan(tape_fn, *args)
        order = plan.final_order
        g = self.g

        def shard_body(*inner_args):
            ops = tape_fn(*inner_args)
            local = self._simulate_local(ops, plan)
            probs = jnp.abs(local) ** 2
            outs = []
            for w in wires:
                p = order.index(w)
                if p >= g:
                    ax = p - g
                    marg = jnp.sum(
                        probs, axis=tuple(i for i in range(probs.ndim) if i != ax)
                    )
                    val = marg[0] - marg[1]
                else:
                    val = self._global_sign(order, w) * jnp.sum(probs)
                outs.append(jax.lax.psum(val, self.axis))
            return jnp.stack(outs).real.astype(jnp.float32)

        fn = jax.shard_map(
            shard_body,
            mesh=self.mesh,
            in_specs=tuple(P() for _ in args),
            out_specs=P(),
            check_vma=False,
        )
        return fn(*args)

    def state(self, tape_fn: Callable, *args) -> jnp.ndarray:
        """Full statevector, gathered and unpermuted to logical qubit order.

        The result is a global ``(2**n,)`` array sharded on its leading axis;
        the final unpermute transpose compiles to XLA collectives.  The
        physical→logical permutation comes from the static layout plan (no
        trace side-channels).
        """
        n = self.n
        plan = self._host_plan(tape_fn, *args)

        def shard_body(*inner_args):
            ops = tape_fn(*inner_args)
            local = self._simulate_local(ops, plan)
            return local.reshape(1, -1)

        fn = jax.shard_map(
            shard_body,
            mesh=self.mesh,
            in_specs=tuple(P() for _ in args),
            out_specs=P(self.axis, None),
            check_vma=False,
        )
        stacked = fn(*args)  # (D, 2^(n-g)) sharded on axis 0
        psi = stacked.reshape((2,) * n)
        # psi axes are in physical order; transpose physical -> logical.
        inv = np.argsort(plan.final_order)
        return jnp.transpose(psi, tuple(int(i) for i in inv)).reshape(-1)

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
