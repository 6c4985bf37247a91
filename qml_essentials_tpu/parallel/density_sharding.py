"""Distributed density-matrix simulation over the interleaved doubled register.

The single-device density engine (``ops/simulation.py``) lowers an n-qubit
noisy tape to a *pure-state* tape on 2n qubits with ket/bra bits interleaved
(data qubit ``w`` owns doubled wires ``2w`` and ``2w+1``); every unitary
becomes ``U ⊗ conj(U)`` and every Kraus channel one superoperator pass.
That lowering composes directly with the sharded statevector backend
(:mod:`~qml_essentials_tpu.parallel.state_sharding`): the doubled register
is just a 2n-qubit state, so the same Belady layout planner, grouped
all_to_all exchanges and local matmul kernels run a *distributed density
matrix* — ``4**n`` amplitudes split over the mesh's ``state`` axis — that
no single chip could hold.  (The reference is single-device throughout;
its density semantics live at qml_essentials/simulation.py:107-128 and
263-377.)

Measurement never materialises the density matrix:

* ``probs`` / diagonal expvals read the *pair diagonal* — the entries where
  every (ket, bra) bit pair agrees — directly off each local shard.  Under
  the physical layout a data qubit's pair may be split across the device
  index and a local axis; the selection handles all three cases (both bits
  local → a ``jnp.diagonal``, both global → a device-constant validity
  mask, mixed → a traced index taken from ``axis_index``).  Each diagonal
  entry lives on exactly one device, so ``probs`` assembles with one
  all_gather of the ``2**k`` selected entries per shard plus a host-built
  static gather — no psum, no ``4**n`` traffic.
* General Hermitian observables measure as ``Tr(O ρ_S)``: one planned
  exchange brings the observable qubits' *pairs* local, the pair-diagonal
  selection with those qubits kept un-diagonalised partial-traces everything
  else, and the local ``ρ_S`` partial contracts against ``O`` before a psum.
* Finite shots draw from the gathered exact ``probs`` (a ``2**n`` vector —
  already the cheap object) with the reference's diagonal-only expval
  semantics (qml_essentials/simulation.py:320-377).
* ``density`` gathers the doubled state once and deinterleaves — the full
  matrix is the requested output, so the gather is inherent to the request.

Gradients flow through plain autodiff: superoperator steps are not
unitarily invertible, so the inner simulator's adjoint-state backward is
disabled (``adjointable = False``) and residual-stacking autodiff
differentiates the shard body, collectives included.
"""

from __future__ import annotations

import logging
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from qml_essentials_tpu.ops.dtypes import cdtype
from qml_essentials_tpu.ops.operations import Operation
from qml_essentials_tpu.parallel.state_sharding import (
    ShardedStateSim,
    ShardingUnavailable,
    _exchange,
    reduce_zword,
    zword_of,
)

logger = logging.getLogger(__name__)


class _PairLayout(NamedTuple):
    """Static classification of every data qubit's (ket, bra) wire pair.

    Positions refer to the physical order after the circuit plan (and any
    measurement exchange).  ``local`` pairs carry both bits on local axes;
    ``glob`` pairs sit entirely in the device index; ``mixed`` pairs split
    one bit into the device index and one onto a local axis.
    """

    local: Tuple[Tuple[int, int, int], ...]  # (w, axis_ket, axis_bra)
    glob: Tuple[Tuple[int, int, int], ...]  # (w, pos_ket, pos_bra)
    mixed: Tuple[Tuple[int, int, int], ...]  # (w, global_pos, local_axis)


def _classify_pairs(
    order: Sequence[int], n: int, g: int, keep: frozenset
) -> Tuple[_PairLayout, Tuple[Tuple[int, int, int], ...]]:
    """Split data-qubit pairs into layout classes; *keep* pairs stay whole.

    Returns the layout for pairs to be diagonal-selected plus the kept
    pairs' ``(w, axis_ket, axis_bra)`` local axes (kept pairs must be fully
    local — callers arrange that with a measurement exchange first).
    """
    pos = {q: p for p, q in enumerate(order)}
    local, glob, mixed, kept = [], [], [], []
    for w in range(n):
        pk, pb = pos[2 * w], pos[2 * w + 1]
        if w in keep:
            if pk < g or pb < g:
                raise ShardingUnavailable(
                    f"observable qubit {w} has a sharded ket/bra bit after "
                    "the measurement exchange"
                )
            kept.append((w, pk - g, pb - g))
            continue
        if pk >= g and pb >= g:
            local.append((w, pk - g, pb - g))
        elif pk < g and pb < g:
            glob.append((w, pk, pb))
        else:
            gp, la = (pk, pb - g) if pk < g else (pb, pk - g)
            mixed.append((w, gp, la))
    return (
        _PairLayout(tuple(local), tuple(glob), tuple(mixed)),
        tuple(kept),
    )


def _device_bit(axis: str, g: int, p: int) -> jnp.ndarray:
    """This device's index bit at sharded physical position *p* (traced)."""
    d = jax.lax.axis_index(axis)
    return (d >> (g - 1 - p)) & 1


def _pair_select(
    local: jnp.ndarray,
    layout: _PairLayout,
    kept: Tuple[Tuple[int, int, int], ...],
    axis: str,
    g: int,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], List[int], List[Tuple[int, int, int]]]:
    """Select the shard's pair-diagonal entries (kept pairs untouched).

    Returns ``(x, mask, diag_qubits, kept_axes)``:

    * ``x`` — the selected tensor.  Kept pairs' ket/bra axes come first (in
      their surviving order), then one trailing diagonal axis per ``local``
      pair in ascending-qubit order.
    * ``mask`` — 0/1 validity scalar from both-global pairs (``None`` if
      every device is valid).
    * ``diag_qubits`` — the data qubit owning each trailing diagonal axis.
    * ``kept_axes`` — ``(w, cur_ket, cur_bra)`` current axis indices of the
      kept pairs inside ``x``.
    """
    # Live-axis bookkeeping: alive[i] identifies what current axis i holds —
    # an original local axis id (int) or a ("diag", w) marker appended by
    # jnp.diagonal.
    alive: List = list(range(local.ndim))

    # Mixed pairs first: index the local bit at the device's global bit.
    # Descending axis order keeps earlier indices valid during removal.
    for w, gp, la in sorted(layout.mixed, key=lambda t: -t[2]):
        cur = alive.index(la)
        local = jax.lax.dynamic_index_in_dim(
            local, _device_bit(axis, g, gp), axis=cur, keepdims=False
        )
        alive.pop(cur)

    # Both-local pairs: one jnp.diagonal each (diag axis appends at the end).
    diag_qubits: List[int] = []
    for w, ak, ab in sorted(layout.local):
        c1, c2 = alive.index(ak), alive.index(ab)
        local = jnp.diagonal(local, axis1=c1, axis2=c2)
        for c in sorted((c1, c2), reverse=True):
            alive.pop(c)
        alive.append(("diag", w))
        diag_qubits.append(w)

    # Both-global pairs: the device holds diagonal entries only when its
    # two index bits agree.
    mask = None
    for w, pk, pb in layout.glob:
        eq = (_device_bit(axis, g, pk) == _device_bit(axis, g, pb)).astype(
            jnp.float32
        )
        mask = eq if mask is None else mask * eq

    kept_axes = [
        (w, alive.index(ak), alive.index(ab)) for w, ak, ab in kept
    ]
    return local, mask, diag_qubits, kept_axes


class _DensObs(NamedTuple):
    """Static measurement spec for one observable on the doubled register."""

    kind: str  # "zword" | "general"
    word: Tuple[int, ...]
    exchange: Tuple[Tuple[int, int], ...]
    order: Tuple[int, ...]  # physical order after the exchange
    op: Optional[Operation]


class ShardedDensitySim:
    """Density-matrix simulator sharded over a mesh axis.

    Runs the interleaved doubled-register lowering
    (:func:`~qml_essentials_tpu.ops.simulation._lower_interleaved_tape`)
    through :class:`ShardedStateSim` on ``2 * n_qubits`` wires.  Raises
    :class:`ShardingUnavailable` at plan time for tapes with no contiguous
    doubled form (very wide gates/diagonals/channels), so callers fall back
    to the single-device density path.
    """

    def __init__(self, n_qubits: int, mesh: Mesh, axis: str = "state") -> None:
        self.n = n_qubits
        self.inner = ShardedStateSim(2 * n_qubits, mesh, axis)
        self.inner.adjointable = False  # superoperators are not unitary
        self.mesh = mesh
        self.axis = axis
        self.g = self.inner.g

    # ---------------------------------------------------------------- plan
    def _lowered_fn(self, tape_fn: Callable) -> Callable:
        """Wrap *tape_fn* to emit the lowered 2n-qubit interleaved tape."""
        from qml_essentials_tpu.ops import simulation as _sim

        n, g = self.n, self.g
        local_width = 2 * n - g

        def lowered(*args) -> List[Operation]:
            dtape = _sim._lower_interleaved_tape(list(tape_fn(*args)), n)
            if dtape is None:
                raise ShardingUnavailable(
                    "tape has no interleaved doubled form (wide gate, "
                    "diagonal or channel); use the single-device density path"
                )
            for op in dtape:
                if len(op.wires) > local_width:
                    raise ShardingUnavailable(
                        f"doubled operator on {len(op.wires)} wires exceeds "
                        f"the local shard width {local_width}"
                    )
            return dtape

        return lowered

    def _plan(self, lowered_fn: Callable, *args):
        return self.inner._host_plan(lowered_fn, *args)

    def _plan_obs(
        self, observables: Sequence, order: Sequence[int]
    ) -> Tuple[_DensObs, ...]:
        """Static measurement specs (ints / wire tuples → Z-words;
        Operations with I/Z labels → Z-words; anything else → a planned
        pair exchange plus a local ``Tr(O ρ_S)`` contraction)."""
        specs: List[_DensObs] = []
        for ob in observables:
            if isinstance(ob, int):
                specs.append(_DensObs("zword", (ob,), (), tuple(order), None))
                continue
            if isinstance(ob, tuple):
                specs.append(
                    _DensObs("zword", reduce_zword(ob), (), tuple(order), None)
                )
                continue
            w = zword_of(ob)
            if w is not None:
                specs.append(
                    _DensObs("zword", reduce_zword(w), (), tuple(order), None)
                )
                continue
            pair_wires = [b for q in ob.wires for b in (2 * q, 2 * q + 1)]
            pairs, new_order = self.inner._measurement_exchange(
                order, pair_wires
            )
            specs.append(
                _DensObs("general", (), pairs, tuple(new_order), ob)
            )
        return tuple(specs)

    # ----------------------------------------------------------- local math
    def _local_zword_val(
        self, local: jnp.ndarray, word: Sequence[int], order: Sequence[int]
    ) -> jnp.ndarray:
        """Per-shard partial of ``Tr(Z_word ρ)`` off the pair diagonal."""
        layout, _ = _classify_pairs(order, self.n, self.g, frozenset())
        x, mask, diag_qubits, _ = _pair_select(
            local, layout, (), self.axis, self.g
        )
        sign = None
        word = set(word)
        # Device-determined bits in the word contribute a constant sign.
        for w, pk, pb in layout.glob:
            if w in word:
                s = 1.0 - 2.0 * _device_bit(self.axis, self.g, pk).astype(
                    jnp.float32
                )
                sign = s if sign is None else sign * s
        for w, gp, la in layout.mixed:
            if w in word:
                s = 1.0 - 2.0 * _device_bit(self.axis, self.g, gp).astype(
                    jnp.float32
                )
                sign = s if sign is None else sign * s
        # Diagonal axes in the word contract against (1, -1).
        for i, w in enumerate(diag_qubits):
            if w in word:
                shape = [1] * x.ndim
                shape[i] = 2
                x = x * jnp.asarray([1.0, -1.0], x.dtype).reshape(shape)
        val = jnp.sum(x)
        if sign is not None:
            val = val * sign
        if mask is not None:
            val = val * mask.astype(val.dtype)
        return val

    def _local_general_val(
        self, local: jnp.ndarray, spec: _DensObs, via_ppermute: bool = False
    ) -> jnp.ndarray:
        """Per-shard partial of ``Tr(O ρ)`` (psum completes the trace)."""
        x = local
        if spec.exchange:
            x = _exchange(x, spec.exchange, self.axis, self.g, via_ppermute)
        keep = frozenset(spec.op.wires)
        layout, kept = _classify_pairs(spec.order, self.n, self.g, keep)
        x, mask, _, kept_axes = _pair_select(x, layout, kept, self.axis, self.g)
        # Partial trace: sum the trailing diagonal axes (all non-kept axes).
        kept_set = {a for _, ak, ab in kept_axes for a in (ak, ab)}
        sum_axes = tuple(a for a in range(x.ndim) if a not in kept_set)
        rho = jnp.sum(x, axis=sum_axes) if sum_axes else x
        # Axis order after the sum: transpose to (ket..., bra...) following
        # the observable's wire order.
        remap = {a: i for i, a in enumerate(sorted(kept_set))}
        by_qubit = {w: (remap[ak], remap[ab]) for w, ak, ab in kept_axes}
        perm = [by_qubit[q][0] for q in spec.op.wires] + [
            by_qubit[q][1] for q in spec.op.wires
        ]
        m = len(spec.op.wires)
        rho = jnp.transpose(rho, perm).reshape(2**m, 2**m)
        o = jnp.asarray(spec.op.matrix, dtype=cdtype())
        val = jnp.sum(o * rho.T)
        if mask is not None:
            val = val * mask.astype(val.dtype)
        return val

    # ------------------------------------------------------------ programs
    def build_expval_program(
        self,
        tape_fn: Callable,
        observables: Tuple,
        example_args: tuple,
        in_axes: Optional[Tuple] = None,
        data_axis: Optional[str] = None,
    ) -> Callable:
        """Jitted shard-map program for ``Tr(O ρ)`` expectation values.

        With ``in_axes`` the batch vmaps inside the shard body (ppermute
        exchanges) and with *data_axis* additionally splits over the mesh's
        data axis — the doubled register stays sharded throughout.
        """
        lowered = self._lowered_fn(tape_fn)
        scalar_args = self.inner._scalar_slice(example_args, in_axes)
        plan = self._plan(lowered, *scalar_args)
        order = plan.final_order
        specs = self._plan_obs(observables, order)

        def one(via_ppermute, *single_args):
            local = self.inner._simulate_local(
                lowered(*single_args), plan, via_ppermute=via_ppermute
            )
            vals = []
            for spec in specs:
                if spec.kind == "zword":
                    vals.append(self._local_zword_val(local, spec.word, order))
                else:
                    vals.append(
                        self._local_general_val(local, spec, via_ppermute)
                    )
            return jnp.stack(vals)

        if in_axes is None:

            def shard_body(*inner_args):
                from qml_essentials_tpu.parallel import state_sharding as _ss

                _ss.TRACE_COUNT += 1
                partials = one(False, *inner_args)
                return jax.lax.psum(partials, self.axis).real.astype(
                    jnp.float32
                )

            in_specs = tuple(P() for _ in example_args)
            out_specs = P()
        else:

            def shard_body(*inner_args):
                from qml_essentials_tpu.parallel import state_sharding as _ss

                _ss.TRACE_COUNT += 1
                partials = jax.vmap(
                    lambda *a: one(True, *a), in_axes=in_axes
                )(*inner_args)
                return jax.lax.psum(partials, self.axis).real.astype(
                    jnp.float32
                )

            in_specs = self.inner._batched_in_specs(
                example_args, in_axes, data_axis
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

    def _probs_sel(self, order: Sequence[int], diag_qubits: Sequence[int]):
        """Static gather mapping (device, selected-entry) → logical index.

        Each logical diagonal entry lives on exactly one device: both-global
        and mixed pairs pin its device bits, the ``local`` pairs' values
        index the trailing diagonal axes in ascending-qubit order.
        """
        n, g = self.n, self.g
        pos = {q: p for p, q in enumerate(order)}
        k = len(diag_qubits)
        xs = np.arange(2**n, dtype=np.int64)
        v = [(xs >> (n - 1 - w)) & 1 for w in range(n)]
        d = np.zeros_like(xs)
        for p in range(g):
            d |= v[order[p] // 2][...] << (g - 1 - p)
        j = np.zeros_like(xs)
        for i, w in enumerate(diag_qubits):
            j |= v[w] << (k - 1 - i)
        return d * (2**k) + j

    def build_probs_program(
        self,
        tape_fn: Callable,
        example_args: tuple,
        in_axes: Optional[Tuple] = None,
        data_axis: Optional[str] = None,
    ) -> Callable:
        """Exact ``probs`` (the ``2**n`` pair diagonal, logical order).

        The shard body selects its ``2**k`` diagonal entries; one all_gather
        plus a host-precomputed static gather assembles the logical vector —
        never touching the off-diagonal ``4**n`` bulk.  With ``in_axes`` the
        batch vmaps inside the shard body.
        """
        lowered = self._lowered_fn(tape_fn)
        scalar_args = self.inner._scalar_slice(example_args, in_axes)
        plan = self._plan(lowered, *scalar_args)
        order = plan.final_order
        layout, _ = _classify_pairs(order, self.n, self.g, frozenset())
        batched = in_axes is not None

        def one(via_ppermute, *single_args):
            local = self.inner._simulate_local(
                lowered(*single_args), plan, via_ppermute=via_ppermute
            )
            x, _, _, _ = _pair_select(local, layout, (), self.axis, self.g)
            return x.real.astype(jnp.float32).reshape(-1)

        if not batched:

            def shard_body(*inner_args):
                from qml_essentials_tpu.parallel import state_sharding as _ss

                _ss.TRACE_COUNT += 1
                return one(False, *inner_args).reshape(1, -1)

            in_specs = tuple(P() for _ in example_args)
            out_specs = P(self.axis, None)
        else:

            def shard_body(*inner_args):
                from qml_essentials_tpu.parallel import state_sharding as _ss

                _ss.TRACE_COUNT += 1
                return jax.vmap(
                    lambda *a: one(True, *a), in_axes=in_axes
                )(*inner_args)  # (B_local, 2**k)

            in_specs = self.inner._batched_in_specs(
                example_args, in_axes, data_axis
            )
            out_specs = P(data_axis, self.axis)

        # The trailing diagonal-axis order is static: ascending data qubit
        # among both-local pairs (matches _pair_select's iteration).
        diag_qubits = [w for w, _, _ in sorted(layout.local)]
        sel = jnp.asarray(self._probs_sel(order, diag_qubits))

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
            stacked = fn(*args)  # (D, 2**k) / (B, D * 2**k) device-major
            if not batched:
                return jnp.take(stacked.reshape(-1), sel)
            return jnp.take(stacked, sel, axis=1)

        return run

    def build_density_program(
        self,
        tape_fn: Callable,
        example_args: tuple,
        in_axes: Optional[Tuple] = None,
        data_axis: Optional[str] = None,
    ) -> Callable:
        """Full ``(2**n, 2**n)`` density matrix (gather + deinterleave).

        The output *is* the full matrix, so the gather is inherent; the
        deinterleave is the single precomputed index gather the unsharded
        engine uses (ops/simulation.py ``_deinterleave_index``).  Batched
        requests return ``(B, 2**n, 2**n)``.
        """
        from qml_essentials_tpu.ops import simulation as _sim

        lowered = self._lowered_fn(tape_fn)
        state_fn = self.inner.build_state_program(
            lowered, example_args, in_axes=in_axes, data_axis=data_axis
        )
        idx = jnp.asarray(_sim._deinterleave_index(self.n))
        dim = 2**self.n

        def run(*args):
            vec = state_fn(*args)  # interleaved logical order
            if in_axes is None:
                return jnp.take(vec, idx).reshape(dim, dim)
            return jnp.take(vec, idx, axis=1).reshape(-1, dim, dim)

        return run

    def density(self, tape_fn: Callable, *args) -> jnp.ndarray:
        """One-shot helper around :meth:`build_density_program`."""
        return self.build_density_program(tape_fn, args)(*args)

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
        """Finite shots off the sharded pair diagonal.

        The exact ``probs`` vector (already the cheap ``2**n`` object) is
        gathered, then sampled with a single categorical draw; expvals use
        the reference's diagonal-only shot semantics
        (qml_essentials/simulation.py:358-368).  Batched requests take a
        ``jax.random.split`` key batch and sample each element with its own
        key over the batched sharded probabilities.
        """
        if type not in ("probs", "expval"):
            raise ShardingUnavailable(
                f"sharded density shots support probs/expval, not {type!r}"
            )
        probs_fn = self.build_probs_program(
            tape_fn, example_args, in_axes=in_axes, data_axis=data_axis
        )
        diags = []
        if type == "expval":
            for ob in observables:
                if isinstance(ob, int):
                    word: Optional[Tuple[int, ...]] = (ob,)
                    op_obj = None
                elif isinstance(ob, tuple):
                    word, op_obj = reduce_zword(ob), None
                else:
                    word, op_obj = zword_of(ob), ob
                    if word is not None:
                        word = reduce_zword(word)
                if word is not None:
                    diag = np.ones(1)
                    wires = list(word)
                    for _ in wires:
                        diag = np.kron(diag, np.array([1.0, -1.0]))
                else:
                    wires = list(op_obj.wires)
                    diag = np.real(np.diagonal(np.asarray(op_obj.matrix)))
                diags.append((tuple(wires), jnp.asarray(diag, jnp.float32)))

        n = self.n

        def sample_one(key, p):
            samples = jax.random.categorical(
                key, jnp.log(jnp.clip(p, 1e-30, None)), shape=(shots,)
            )
            est = (
                jnp.zeros(2**n, jnp.float32).at[samples].add(1.0) / shots
            )
            if type == "probs":
                return est
            est_t = est.reshape((2,) * n)
            vals = []
            for wires, diag in diags:
                if wires:
                    marg = jnp.sum(
                        est_t,
                        axis=tuple(a for a in range(n) if a not in wires),
                    )
                else:
                    marg = jnp.sum(est_t).reshape(())
                # marg axes follow ascending wire order; align the diagonal.
                srt = sorted(wires)
                perm = [wires.index(a) for a in srt]
                k = len(wires)
                d_sorted = jnp.transpose(
                    diag.reshape((2,) * k), perm
                ).reshape(-1)
                vals.append(marg.reshape(-1) @ d_sorted)
            return jnp.stack(vals)

        def run(key, *args):
            p = probs_fn(*args)
            if in_axes is None:
                return sample_one(key, p)
            return jax.vmap(sample_one)(key, p)

        return run
