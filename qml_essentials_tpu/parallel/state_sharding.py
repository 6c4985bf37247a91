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
  the whole global block is exchanged with ``g`` gate-free local qubits via
  one ``jax.lax.all_to_all`` (a distributed transpose over ICI), after which
  the gate is local.  The logical→physical qubit permutation is tracked
  symbolically and only undone at readout.
* Measurements reduce with ``psum`` over the mesh axis.

This is the from-scratch equivalent of a distributed statevector backend —
the reference has none (its multi-device story is a comment at
qml_essentials/script.py:443-453).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qml_essentials_tpu.ops import kernels
from qml_essentials_tpu.ops.dtypes import cdtype
from qml_essentials_tpu.ops.operations import Barrier, KrausChannel, Operation


class _QubitLayout:
    """Tracks the logical→physical qubit permutation during sharded simulation.

    ``order[p] = logical qubit held at physical position p``.  Positions
    ``0..g-1`` are the global (device-index) bits, most-significant first;
    positions ``g..n-1`` are local tensor axes ``0..n-g-1``.
    """

    def __init__(self, n_qubits: int, n_global: int) -> None:
        self.n = n_qubits
        self.g = n_global
        self.order: List[int] = list(range(n_qubits))

    def position(self, logical: int) -> int:
        return self.order.index(logical)

    def is_local(self, logical: int) -> bool:
        return self.position(logical) >= self.g

    def local_axis(self, logical: int) -> int:
        return self.position(logical) - self.g

    def pick_victim(self, protected: Sequence[int]) -> int:
        """One local physical position not holding any protected logical qubit."""
        protected = set(protected)
        for p in range(self.n - 1, self.g - 1, -1):
            if self.order[p] not in protected:
                return p
        raise ValueError(
            "Gate support too wide for the sharded layout: no free local "
            f"qubit ({self.n - self.g} local positions)."
        )

    def swap_positions(self, a: int, b: int) -> None:
        """Record the exchange of two physical positions."""
        self.order[a], self.order[b] = self.order[b], self.order[a]


def _swap_global_local_bit(
    local: jnp.ndarray, global_pos: int, local_axis: int, axis_name: str, g: int
) -> jnp.ndarray:
    """Exchange one device-index bit with one local tensor axis.

    Devices differing only in the target global bit form pairs; a grouped
    ``all_to_all`` splitting on the local axis performs the pairwise
    distributed transpose ``out[b][l] = in[l][b]`` — exactly a qubit swap
    between the sharded and local halves of the state.
    """
    D = 2**g
    mask = 1 << (g - 1 - global_pos)
    groups = [[d, d | mask] for d in range(D) if not d & mask]

    r = local.ndim
    perm = [local_axis] + [a for a in range(r) if a != local_axis]
    inv = np.argsort(perm)
    x = jnp.transpose(local, perm).reshape(2, -1)
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
    ``lambda p: Script(f)._record(p)`` — and is traced once inside
    ``shard_map``.
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
    def _simulate_local(self, ops: List[Operation]):
        """Run the tape on the local shard; returns (local_tensor, layout)."""
        n, g = self.n, self.g
        layout = _QubitLayout(n, g)

        d = jax.lax.axis_index(self.axis)
        dim_local = 2 ** (n - g)
        amp0 = jnp.where(d == 0, 1.0, 0.0).astype(cdtype())
        local = jnp.zeros(dim_local, dtype=cdtype()).at[0].set(1.0) * amp0
        local = local.reshape((2,) * (n - g))

        for op in ops:
            if isinstance(op, Barrier):
                continue
            if isinstance(op, KrausChannel):
                raise NotImplementedError(
                    "Sharded simulation is statevector-only; noise channels "
                    "require the (unsharded) density path."
                )
            while not all(layout.is_local(w) for w in op.wires):
                # Bring one global gate qubit local per collective exchange.
                w = next(w for w in op.wires if not layout.is_local(w))
                gpos = layout.position(w)
                victim = layout.pick_victim(op.wires)
                local = _swap_global_local_bit(
                    local, gpos, victim - g, self.axis, g
                )
                layout.swap_positions(gpos, victim)
            axes = [layout.local_axis(w) for w in op.wires]
            local = kernels.apply_matrix(local, op.matrix, axes)
        return local, layout

    def _global_sign(self, layout: _QubitLayout, logical: int) -> jnp.ndarray:
        """±1 sign of a Z on a *global* qubit, constant per device."""
        p = layout.position(logical)
        d = jax.lax.axis_index(self.axis)
        bit = (d >> (layout.g - 1 - p)) & 1
        return (1.0 - 2.0 * bit).astype(jnp.float32)

    # ------------------------------------------------------------- readouts
    def expval_z(self, tape_fn: Callable, wires: Sequence[int], *args) -> jnp.ndarray:
        """⟨Z_w⟩ for each wire in *wires*; one psum-reduced scalar per wire."""

        def shard_body(*inner_args):
            ops = tape_fn(*inner_args)
            local, layout = self._simulate_local(ops)
            probs = jnp.abs(local) ** 2
            outs = []
            for w in wires:
                if layout.is_local(w):
                    ax = layout.local_axis(w)
                    marg = jnp.sum(
                        probs, axis=tuple(i for i in range(probs.ndim) if i != ax)
                    )
                    val = marg[0] - marg[1]
                else:
                    val = self._global_sign(layout, w) * jnp.sum(probs)
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
        the final unpermute transpose compiles to XLA collectives.
        """
        n, g = self.n, self.g

        order_box: List[List[int]] = []

        def shard_body(*inner_args):
            ops = tape_fn(*inner_args)
            local, layout = self._simulate_local(ops)
            order_box.append(list(layout.order))
            return local.reshape(1, -1)

        fn = jax.shard_map(
            shard_body,
            mesh=self.mesh,
            in_specs=tuple(P() for _ in args),
            out_specs=P(self.axis, None),
            check_vma=False,
        )
        stacked = fn(*args)  # (D, 2^(n-g)) sharded on axis 0
        order = order_box[-1]
        psi = stacked.reshape((2,) * n)
        # psi axes are in physical order; transpose physical -> logical.
        inv = np.argsort(order)
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
