"""Script: the execution orchestrator (L2).

``Script`` wraps a circuit function whose body records
:class:`~qml_essentials_tpu.ops.operations.Operation` objects, then plans,
compiles and dispatches its simulation:

record (scalar slice) -> metadata -> vmap over the batch -> jit -> AOT
executable -> memory-aware chunking -> optional data-parallel sharding.

TPU-first differences from the reference (qml_essentials/script.py):

* No equinox dependency — a small built-in argument partitioner treats
  non-array positional arguments as compile-time statics.
* A configured :class:`jax.sharding.Mesh` (see
  :mod:`qml_essentials_tpu.parallel`) turns the batched dispatch into true
  data parallelism: batched arguments are placed with a ``NamedSharding``
  over the mesh's ``data`` axis and XLA partitions the one compiled program
  across devices — the "shard_map seam" the reference only documents
  (qml_essentials/script.py:443-453) is implemented here.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

# Exceptions that mean "this circuit cannot be traced" (data-dependent Python
# control flow) as opposed to genuine kernel bugs.
_TRACE_FAILURES = (
    jax.errors.TracerBoolConversionError,
    jax.errors.TracerArrayConversionError,
    jax.errors.TracerIntegerConversionError,
    jax.errors.ConcretizationTypeError,
)

from qml_essentials_tpu import runtime
from qml_essentials_tpu.core import memory
from qml_essentials_tpu.ops import simulation
from qml_essentials_tpu.ops.operations import KrausChannel, Operation
from qml_essentials_tpu.ops.tape import pulse_recording, recording


def _arg_signature(args: tuple) -> tuple:
    """Trace-equivalence signature of positional args for the plan caches.

    Arrays key on (shape, dtype).  Python floats/complex are *continuous*
    gate parameters — the traced program cannot depend on their value — so
    they key on their type only (keying on ``repr`` would re-jit per
    value).  Ints and bools may drive Python control flow in user circuits
    and stay keyed by value.
    """
    out = []
    for a in args:
        if hasattr(a, "shape"):
            out.append((a.shape, str(getattr(a, "dtype", ""))))
        elif isinstance(a, float):
            out.append("<pyfloat>")
        elif isinstance(a, complex):
            out.append("<pycomplex>")
        else:
            out.append(repr(a))
    return tuple(out)


def _make_hashable(obj):
    """Recursively convert dicts/lists/sets into hashable cache-key forms."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _make_hashable(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_make_hashable(x) for x in obj)
    if isinstance(obj, set):
        return frozenset(_make_hashable(x) for x in obj)
    return obj


def _is_arraylike(a: Any) -> bool:
    """True for anything vmap/jit can trace as data (arrays, tracers, scalars)."""
    return hasattr(a, "shape") or isinstance(a, (int, float, complex, bool))


def _obs_signature(obs: List["Operation"]) -> tuple:
    """Value signature of the observable list for the plan caches.

    Observables are baked into the compiled closure as constants, so plans
    built for one observable list must not serve another (the reference
    omits them from its cache key, qml_essentials/script.py:530 — a stale
    2-observable plan would silently answer a later 1-observable request).
    Pauli-labelled observables key on (class, wires, label); concrete
    matrices key on a content hash; tracer matrices (observables built
    under an outer transform) can only key on shape.
    """
    import numpy as np

    sig = []
    for o in obs:
        label = getattr(o, "_pauli_label", None)
        if label is not None:
            sig.append((o.__class__.__name__, tuple(o.wires), label))
            continue
        m = getattr(o, "_matrix", None)
        if m is None or isinstance(m, jax.core.Tracer):
            shape = getattr(m, "shape", None)
            sig.append((o.__class__.__name__, tuple(o.wires), "<traced>", shape))
            continue
        arr = np.asarray(m)
        sig.append(
            (o.__class__.__name__, tuple(o.wires), arr.shape, hash(arr.tobytes()))
        )
    return tuple(sig)


# Whether single-sample (non-batched) executions are routed through a cached
# jit plan.  Per-Script fallback to the eager path happens automatically for
# circuits that cannot be traced (data-dependent Python control flow).
JIT_SINGLE: bool = True

# Force pure-tape ``density`` requests through the sharded doubled-register
# engine instead of the state + outer-product shortcut (tests only — the
# shortcut is strictly cheaper: 2**n simulated amplitudes instead of 4**n).
_DENSITY_VIA_DOUBLED: bool = False


class _Plan(NamedTuple):
    """Compiled artefacts for one batched circuit signature.

    Attributes:
        batched_fn: jitted vmapped callable over the array arguments —
            always valid, including under an outer transform.
        array_pos: positions of array-like positional args (statics are
            baked into the closure).
        n_qubits / use_density / n_ops: batch-invariant tape metadata.
        complex_out: whether the measurement result is complex (state /
            density); in split mode such results cross the jit boundary as
            a stacked (real, imag) pair and are recombined on the host.
    """

    batched_fn: Callable
    array_pos: Tuple[int, ...]
    n_qubits: int
    use_density: bool
    n_ops: int
    complex_out: bool = False


class Script:
    """Circuit container + executor backed by the fused simulation kernels.

    Example:
        >>> def circuit(theta):
        ...     RX(theta, wires=0)
        >>> script = Script(circuit, n_qubits=2)
        >>> script.execute(type="expval", obs=[PauliZ(0)], args=(0.3,))
    """

    def __init__(self, f: Callable[..., None], n_qubits: Optional[int] = None) -> None:
        self.f = f
        self._n_qubits = n_qubits
        self._jit_cache: dict = {}
        # Sharded-routing decision log: (request, "sharded:<route>" | reason)
        # tuples, newest last.  Read by parallel.explain(); fallbacks also
        # warn once per (Script, reason) — at sharding scales a silent
        # fallback is an OOM in waiting.
        self.sharding_decisions: List[Tuple[str, str]] = []
        self._warned_fallbacks: set = set()

    # ------------------------------------------------------------- recording
    def _record(self, *args, **kwargs) -> List[Operation]:
        """Run the circuit function, collecting operations on a fresh tape."""
        with recording() as tape:
            self.f(*args, **kwargs)
        return tape

    def pulse_events(self, *args, **kwargs) -> list:
        """Run the circuit and collect pulse events for schedule drawing."""
        with pulse_recording() as events:
            with recording():
                self.f(*args, **kwargs)
        return events

    # --------------------------------------------------------------- execute
    def execute(
        self,
        type: str = "expval",
        obs: Optional[List[Operation]] = None,
        *,
        args: tuple = (),
        kwargs: Optional[dict] = None,
        in_axes: Optional[Tuple] = None,
        shots: Optional[int] = None,
        key: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Execute the circuit and return measurement results.

        Args:
            type: ``"expval"`` | ``"probs"`` | ``"state"`` | ``"density"``.
            obs: Observables for ``"expval"``.
            args / kwargs: Forwarded to the circuit function.
            in_axes: Per-positional-arg batch axes (vmap convention); when
                given, results carry a leading batch dimension.
            shots: Finite-shot sampling count (``"probs"``/``"expval"`` only).
            key: PRNG key for shot sampling.
        """
        if obs is None:
            obs = []
        if kwargs is None:
            kwargs = {}
        if shots is not None and key is None:
            key = jax.random.PRNGKey(0)

        if in_axes is not None:
            return self._execute_batched(
                type=type,
                obs=obs,
                args=args,
                kwargs=kwargs,
                in_axes=in_axes,
                shots=shots,
                key=key,
            )

        # The sharded-state route tolerates autodiff tracers (shard_map is
        # differentiable) but not vmap batching of the shard_map itself.
        if not self._args_contain_batch_tracer(args):
            sharded = self._try_sharded_state(
                type, obs, args, kwargs, shots=shots, key=key
            )
            if sharded is not None:
                return sharded

        if not self._args_contain_tracer(args) and (
            JIT_SINGLE or runtime.split_complex_outputs()
        ):
            # Jit the single-sample path by default: eager per-gate dispatch
            # costs milliseconds per call while the compiled program is
            # microseconds.  Circuits whose Python control flow depends on
            # concrete argument *values* cannot be traced — those fall back
            # to the eager path once and are remembered.
            if self._jit_cache.get("_single_jit_broken") is not True:
                try:
                    return self._execute_single_jitted(
                        type, obs, args, kwargs, shots, key
                    )
                except _TRACE_FAILURES as exc:
                    # Only genuine trace failures (concrete-value-dependent
                    # Python control flow in the circuit) fall back to the
                    # eager path; real kernel bugs propagate loudly.
                    if runtime.split_complex_outputs():
                        raise  # eager complex would fail anyway
                    logger.info(
                        "Single-sample jit fell back to eager for %r: %s",
                        getattr(self.f, "__name__", self.f),
                        exc,
                    )
                    self._jit_cache["_single_jit_broken"] = True

        tape = self._record(*args, **kwargs)
        n_qubits = self._n_qubits or simulation.infer_n_qubits(tape, obs)
        use_density = simulation.uses_density(tape, type)
        return simulation.simulate_and_measure(
            tape, n_qubits, type, obs, use_density, shots=shots, key=key
        )

    def _try_sharded_state(
        self,
        type: str,
        obs: List[Operation],
        args: tuple,
        kwargs: dict,
        in_axes: Optional[Tuple] = None,
        shots: Optional[int] = None,
        key: Optional[jnp.ndarray] = None,
    ) -> Optional[jnp.ndarray]:
        """Route through the distributed statevector backend when configured.

        Active when the process mesh (:func:`qml_essentials_tpu.parallel.
        get_mesh`) has a ``"state"`` axis and the request is one the sharded
        simulator supports: pure-state ``expval`` over any observable with a
        concrete matrix (I/Z Pauli words take the cheap probability-fold
        path; general Hermitians measure via a planned exchange + local
        contraction + psum), ``state``, ``probs``, and finite-``shots``
        sampling for ``expval``/``probs`` (two-stage per-shard draw, no
        global gather).  Noisy tapes route through the sharded interleaved
        doubled-register engine (:meth:`_try_sharded_density`); pure-tape
        ``density`` requests simulate the sharded state and outer-product
        (the unsharded engine's own optimization).  Every mode accepts
        ``in_axes``: the batch is vmapped inside the shard body (over the
        vmap-safe ppermute exchanges) and — if the mesh also has a ``data``
        axis that divides the batch — split over it, composing data and
        state parallelism through one mesh.  Returns ``None`` (fall through
        to the local path, with a WARNING once per reason — at sharding
        scales a silent fallback is an OOM in waiting) otherwise.
        Reference seam contract: qml_essentials/script.py:443-453.
        """
        import numpy as np

        from qml_essentials_tpu import parallel

        mesh = parallel.get_mesh()
        if mesh is None or "state" not in mesh.axis_names:
            return None

        request = f"{type}(in_axes={in_axes is not None}, shots={shots})"

        def note(route: str) -> None:
            self.sharding_decisions.append((request, route))
            if len(self.sharding_decisions) > 64:
                del self.sharding_decisions[:-64]

        def fall_back(reason: str) -> None:
            note(f"fallback: {reason}")
            # Warn once per (Script, reason): with sharding's purpose being
            # states too large for one device, a silent single-device
            # fallback is an OOM in waiting.
            log = (
                logger.warning
                if reason not in self._warned_fallbacks
                else logger.info
            )
            self._warned_fallbacks.add(reason)
            log(
                "Sharded route unavailable (%s); falling back to the "
                "single-device path for %r.",
                reason,
                getattr(self.f, "__name__", self.f),
            )

        from qml_essentials_tpu.parallel import state_sharding

        if type not in ("expval", "state", "probs", "density"):
            fall_back(f"measurement type {type!r} not sharded")
            return None
        if shots is not None and type not in ("expval", "probs"):
            fall_back(f"shot sampling is undefined for type {type!r}")
            return None
        observables: tuple = ()
        obs_sig: tuple = ()
        if type == "expval":
            norm, sig = [], []
            for o in obs:
                w = state_sharding.zword_of(o)
                if w is not None:
                    norm.append(w)
                    sig.append(("zword", w))
                    continue
                m = getattr(o, "_matrix", None)
                if m is None or isinstance(m, jax.core.Tracer):
                    fall_back(
                        f"observable {o.name} has no concrete matrix"
                    )
                    return None
                norm.append(o)
                sig.append(
                    (
                        "gen",
                        o.__class__.__name__,
                        tuple(o.wires),
                        np.asarray(m).tobytes(),
                    )
                )
            observables, obs_sig = tuple(norm), tuple(sig)

        arg_shapes = _arg_signature(args)
        cache_kwargs = _make_hashable(
            {k: v for k, v in kwargs.items() if not hasattr(v, "shape")}
        )
        mesh_key = (
            tuple(mesh.axis_names),
            tuple(mesh.shape.values()),
            tuple(d.id for d in mesh.devices.flat),
        )
        from qml_essentials_tpu.models.unitary import UnitaryGates

        cache_key = (
            "sharded", type, obs_sig, in_axes, shots,
            arg_shapes, cache_kwargs, mesh_key,
            UnitaryGates.batch_gate_error,
        )

        batch_size = (
            self._batch_size(args, in_axes) if in_axes is not None else None
        )

        def shot_keys():
            # Batched shots: one independent key per batch element, matching
            # the unsharded batched shot plan (jax.random.split over key).
            if in_axes is None:
                return key
            return jax.random.split(key, batch_size)

        cached = self._jit_cache.get(cache_key)
        if cached is not None:
            note("sharded:cached")
            return (
                cached(shot_keys(), *args) if shots is not None else cached(*args)
            )

        scalar_args = args
        data_axis = None
        if in_axes is not None:
            scalar_args = tuple(
                self._slice_first(a, ax) if ax is not None else a
                for a, ax in zip(args, in_axes)
            )
            if "data" in mesh.axis_names and mesh.shape["data"] > 1:
                if batch_size % mesh.shape["data"] == 0:
                    data_axis = "data"

        tape = self._record(*scalar_args, **kwargs)
        n_qubits = self._n_qubits or simulation.infer_n_qubits(tape, obs)
        tape_fn = lambda *a: self._record(*a, **kwargs)  # noqa: E731

        has_kraus = any(isinstance(op, KrausChannel) for op in tape)
        if has_kraus or (type == "density" and _DENSITY_VIA_DOUBLED):
            # Noisy tapes route through the sharded interleaved
            # doubled-register engine (the 4**n object no chip can hold).
            return self._try_sharded_density(
                type, observables, tape_fn, args, in_axes, data_axis,
                shots, shot_keys, n_qubits, mesh, cache_key, fall_back, note,
            )

        if 2 ** n_qubits < 2 * mesh.shape["state"]:
            fall_back("too few qubits to shard meaningfully")
            return None

        sim = state_sharding.ShardedStateSim(n_qubits, mesh)
        try:
            if shots is not None:
                fn = sim.build_shot_program(
                    tape_fn, type, observables, shots, args,
                    in_axes=in_axes, data_axis=data_axis,
                )
                out = fn(shot_keys(), *args)
            elif type == "expval":
                fn = sim.build_expval_program(
                    tape_fn, observables, args,
                    in_axes=in_axes, data_axis=data_axis,
                )
                out = fn(*args)
            elif type == "state":
                fn = sim.build_state_program(
                    tape_fn, args, in_axes=in_axes, data_axis=data_axis
                )
                out = fn(*args)
            elif type == "density":
                # Pure tape, explicit density request: simulate the sharded
                # 2**n statevector and outer-product — mirroring the
                # unsharded engine's pure-density optimization
                # (ops/simulation.py simulate_and_measure) instead of
                # paying the 4**n doubled register.
                state_fn = sim.build_state_program(
                    tape_fn, args, in_axes=in_axes, data_axis=data_axis
                )

                def fn(*a):
                    psi = state_fn(*a)
                    return jnp.einsum("...i,...j->...ij", psi, jnp.conj(psi))

                out = fn(*args)
            else:
                fn = sim.build_probs_program(
                    tape_fn, args, in_axes=in_axes, data_axis=data_axis
                )
                out = fn(*args)
            # The compiled program is signature-stable: cache it (only
            # after the first successful call — plan-time exclusions must
            # keep falling back on every call) so repeat calls neither
            # rebuild the shard_map nor re-trace.
            self._jit_cache[cache_key] = fn
            note("sharded:state")
            return out
        except state_sharding.ShardingUnavailable as exc:
            # Plan-time exclusions (noise channels seen only under tracing,
            # observable support too wide for the layout) fall back cleanly.
            fall_back(str(exc))
            return None

    def _try_sharded_density(
        self,
        type: str,
        observables: tuple,
        tape_fn,
        args: tuple,
        in_axes: Optional[Tuple],
        data_axis: Optional[str],
        shots: Optional[int],
        shot_keys,
        n_qubits: int,
        mesh,
        cache_key,
        fall_back,
        note,
    ) -> Optional[jnp.ndarray]:
        """Route a density-mode request through the sharded doubled register.

        Supports ``expval`` (Z-words off the pair diagonal, general
        Hermitians via an exchanged local ``Tr(O ρ_S)``), ``probs``,
        ``density`` and finite ``shots`` for probs/expval — each batchable
        via ``in_axes`` (vmapped shard bodies over ppermute exchanges, the
        batch optionally split over the mesh's data axis); tapes with no
        interleaved doubled form fall back to the single-device path.
        """
        from qml_essentials_tpu.parallel import density_sharding, state_sharding

        if type == "state":
            fall_back("state output is undefined for density tapes")
            return None
        if 4 ** n_qubits < 2 * mesh.shape["state"]:
            fall_back("too few qubits to shard the density meaningfully")
            return None
        sim = density_sharding.ShardedDensitySim(n_qubits, mesh)
        try:
            if shots is not None:
                fn = sim.build_shot_program(
                    tape_fn, type, observables, shots, args,
                    in_axes=in_axes, data_axis=data_axis,
                )
                out = fn(shot_keys(), *args)
            elif type == "expval":
                fn = sim.build_expval_program(
                    tape_fn, observables, args,
                    in_axes=in_axes, data_axis=data_axis,
                )
                out = fn(*args)
            elif type == "probs":
                fn = sim.build_probs_program(
                    tape_fn, args, in_axes=in_axes, data_axis=data_axis
                )
                out = fn(*args)
            else:  # density
                fn = sim.build_density_program(
                    tape_fn, args, in_axes=in_axes, data_axis=data_axis
                )
                out = fn(*args)
            # Cache only after the first successful call so plan-time
            # exclusions keep falling back cleanly on every call.
            self._jit_cache[cache_key] = fn
            note("sharded:density")
            return out
        except state_sharding.ShardingUnavailable as exc:
            fall_back(str(exc))
            return None

    def _execute_single_jitted(
        self,
        type: str,
        obs: List[Operation],
        args: tuple,
        kwargs: dict,
        shots: Optional[int],
        key: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """Single-sample execution through a cached jit (split-mode path)."""
        arg_shapes = _arg_signature(args)
        cache_kwargs = _make_hashable(
            {k: v for k, v in kwargs.items() if not hasattr(v, "shape")}
        )
        cache_key = (
            "single", type, shots, arg_shapes, cache_kwargs, _obs_signature(obs)
        )
        in_axes = (None,) * len(args)

        run_args = args if shots is None else args + (key,)
        run_axes = in_axes if shots is None else in_axes + (None,)

        plan = self._jit_cache.get(cache_key)
        if plan is None:
            metadata = self._record_metadata(args, kwargs, obs, type)
            n_qubits, use_density, _ = metadata

            if shots is None:

                def single_fn(*single_args):
                    tape = self._record(*single_args, **kwargs)
                    return simulation.simulate_and_measure(
                        tape, n_qubits, type, obs, use_density
                    )

            else:

                def single_fn(*single_args_and_key):
                    *single_args, shot_key = single_args_and_key
                    tape = self._record(*single_args, **kwargs)
                    exact = simulation.simulate_and_measure(
                        tape, n_qubits, "probs", obs, use_density
                    )
                    return simulation.sample_shots(
                        exact, n_qubits, type, obs, shots, shot_key
                    )

            plan = self._build_plan(
                single_fn,
                run_args,
                run_axes,
                metadata,
                complex_out=type in ("state", "density"),
                vmap=False,
            )
            self._jit_cache[cache_key] = plan

        array_args = tuple(run_args[i] for i in plan.array_pos)
        array_args = self._place_on_accelerator(array_args)
        out = plan.batched_fn(*array_args)
        return self._recombine_complex(out, plan, batched=False)

    # ------------------------------------------------------------- internals
    @staticmethod
    def _args_contain_tracer(args: tuple) -> bool:
        """Whether any leaf of *args* is a JAX tracer (outer transform active)."""
        return any(
            isinstance(x, jax.core.Tracer) for x in jax.tree_util.tree_leaves(args)
        )

    @staticmethod
    def _args_contain_batch_tracer(args: tuple) -> bool:
        """Whether any leaf of *args* is an outer-``vmap`` batch tracer."""
        from jax._src.interpreters.batching import BatchTracer

        return any(
            isinstance(x, BatchTracer) for x in jax.tree_util.tree_leaves(args)
        )

    @staticmethod
    def _batch_size(args: tuple, in_axes: Tuple) -> int:
        for a, ax in zip(args, in_axes):
            if ax is not None:
                return a.shape[ax]
        return 1

    @staticmethod
    def _slice_first(a: Any, ax: int) -> Any:
        """First element along axis *ax* (index_in_dim also handles key arrays)."""
        return jax.lax.index_in_dim(a, 0, axis=ax, keepdims=False)

    def _record_metadata(
        self, scalar_args: tuple, kwargs: dict, obs: List[Operation], type: str
    ) -> Tuple[int, bool, int]:
        """One scalar-slice trace to derive (n_qubits, use_density, n_ops)."""
        tape = self._record(*scalar_args, **kwargs)
        n_qubits = self._n_qubits or simulation.infer_n_qubits(tape, obs)
        return n_qubits, simulation.uses_density(tape, type), len(tape)

    def _build_plan(
        self,
        single_fn: Callable,
        args: tuple,
        in_axes: Tuple,
        metadata: Tuple[int, bool, int],
        complex_out: bool = False,
        vmap: bool = True,
    ) -> _Plan:
        """vmap *single_fn* over the array args and jit the result.

        Non-array positional arguments (None, strings, dicts) are baked into
        the closure as statics; the vmap/jit axes cover only array-like args.
        The circuit is re-traced inside the closure so gate matrices may
        depend on the batched (traced) arguments.  With ``vmap=False`` the
        plan wraps a plain (single-sample) jit — used for the single path on
        backends that cannot run the simulation eagerly.
        """
        n_qubits, use_density, n_ops = metadata

        array_pos = tuple(
            i
            for i, (a, ax) in enumerate(zip(args, in_axes))
            if ax is not None or _is_arraylike(a)
        )
        statics = {i: a for i, a in enumerate(args) if i not in set(array_pos)}
        inner_axes = tuple(in_axes[i] for i in array_pos)
        n_args = len(args)
        split_out = complex_out and runtime.split_complex_outputs()

        def over_arrays(*array_args):
            full = []
            it = iter(array_args)
            for i in range(n_args):
                full.append(next(it) if i in array_pos else statics[i])
            out = single_fn(*full)
            if split_out:
                out = jnp.stack([jnp.real(out), jnp.imag(out)])
            return out

        if vmap:
            batched_fn = jax.jit(jax.vmap(over_arrays, in_axes=inner_axes))
        else:
            batched_fn = jax.jit(over_arrays)
        return _Plan(batched_fn, array_pos, n_qubits, use_density, n_ops, split_out)

    def _chunk_size(
        self, cache_key: tuple, plan: _Plan, type: str, n_obs: int, batch_size: int
    ) -> int:
        """Memoized memory-aware chunk size for this signature + batch size."""
        mem_key = ("_mem", cache_key, batch_size)
        chunk = self._jit_cache.get(mem_key)
        if chunk is None:
            chunk = memory.compute_chunk_size(
                plan.n_qubits,
                batch_size,
                type,
                plan.use_density,
                n_obs,
                n_ops=plan.n_ops,
            )
            self._jit_cache[mem_key] = chunk
        return chunk

    @staticmethod
    def _shard_batched_args(
        array_args: tuple, inner_axes: Tuple, batch_size: int
    ) -> tuple:
        """Place batched args on the configured mesh's ``data`` axis (DP).

        No-op without a configured mesh, under tracers, or when the batch
        does not divide the data-axis size.
        """
        from qml_essentials_tpu.parallel import get_mesh

        mesh = get_mesh()
        if mesh is None or "data" not in mesh.axis_names:
            return array_args
        n_data = mesh.shape["data"]
        if n_data <= 1 or batch_size % n_data != 0:
            return array_args
        if any(isinstance(a, jax.core.Tracer) for a in array_args):
            return array_args

        from jax.sharding import NamedSharding, PartitionSpec as P

        out = []
        for a, ax in zip(array_args, inner_axes):
            if ax is not None and hasattr(a, "shape"):
                spec = [None] * a.ndim
                spec[ax] = "data"
                out.append(jax.device_put(a, NamedSharding(mesh, P(*spec))))
            else:
                out.append(a)
        return tuple(out)

    @staticmethod
    def _place_on_accelerator(array_args: tuple) -> tuple:
        """In split mode, move concrete array args onto the accelerator so
        the compiled program targets it (eager work stays on the CPU)."""
        accel = runtime.accelerator_device()
        if accel is None:
            return array_args

        import numpy as _np

        def place(a):
            if not hasattr(a, "shape") or isinstance(a, jax.core.Tracer):
                return a
            if isinstance(a, jax.Array) and accel in a.devices():
                return a
            # Stage through host memory: device-to-device transfers are not
            # supported by the split-mode backend.  Typed key arrays cannot
            # round-trip through numpy; transfer their uint32 data instead.
            try:
                host = _np.asarray(a)
            except Exception:
                if isinstance(a, jax.Array) and jax.dtypes.issubdtype(
                    a.dtype, jax.dtypes.prng_key
                ):
                    data = jax.device_put(
                        _np.asarray(jax.random.key_data(a)), accel
                    )
                    return jax.random.wrap_key_data(
                        data, impl=jax.random.key_impl(a)
                    )
                return a
            return jax.device_put(host, accel)

        return tuple(place(a) for a in array_args)

    @staticmethod
    def _recombine_complex(result, plan: _Plan, batched: bool):
        """Reassemble a (real, imag)-stacked result into a complex array.

        Concrete results are recombined on the host (numpy) — the whole
        point of the split is that the accelerator cannot transfer complex
        buffers; tracer results recombine symbolically.
        """
        if not plan.complex_out:
            return result
        re = result[:, 0] if batched else result[0]
        im = result[:, 1] if batched else result[1]
        if isinstance(result, jax.core.Tracer):
            return re + 1j * im
        import numpy as _np

        return _np.asarray(re) + 1j * _np.asarray(im)

    def _dispatch(
        self,
        aot_key: Optional[tuple],
        plan: _Plan,
        args: tuple,
        in_axes: Tuple,
        batch_size: int,
        chunk_size: int,
        in_transform: bool,
    ) -> jnp.ndarray:
        """Run a built plan through the leanest applicable path."""
        array_args = tuple(args[i] for i in plan.array_pos)
        inner_axes = tuple(in_axes[i] for i in plan.array_pos)

        if chunk_size < batch_size:
            out = memory.execute_chunked(
                plan.batched_fn,
                array_args,
                inner_axes,
                batch_size,
                chunk_size,
                clear_caches=memory.CLEAR_CACHES_BETWEEN_CHUNKS,
            )
            return self._recombine_complex(out, plan, batched=True)

        if not in_transform:
            array_args = self._shard_batched_args(array_args, inner_axes, batch_size)
            array_args = self._place_on_accelerator(array_args)
            if aot_key is not None:
                # Ahead-of-time compile skips per-call jit cache-key work; it
                # matters for small circuits in tight loops.
                compiled = self._jit_cache.get(aot_key)
                if compiled is None:
                    compiled = plan.batched_fn.lower(*array_args).compile()
                    self._jit_cache[aot_key] = compiled
                out = compiled(*array_args)
                return self._recombine_complex(out, plan, batched=True)
        out = plan.batched_fn(*array_args)
        return self._recombine_complex(out, plan, batched=True)

    def _execute_batched(
        self,
        type: str,
        obs: List[Operation],
        args: tuple,
        kwargs: dict,
        in_axes: Tuple,
        shots: Optional[int] = None,
        key: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Vectorised execution over the batch axes given by *in_axes*."""
        if len(in_axes) != len(args):
            raise ValueError(
                f"in_axes has {len(in_axes)} entries but args has {len(args)}. "
                "Provide one in_axes entry per positional argument."
            )

        batch_size = self._batch_size(args, in_axes)
        in_transform = self._args_contain_tracer(args)

        # Batch, state and data parallelism compose: on a ("data", "state")
        # mesh a batched request vmaps the local simulation inside the shard
        # body and splits the batch over the data axis — for every
        # measurement mode (expval/probs/state/density and finite shots).
        if not self._args_contain_batch_tracer(args):
            sharded = self._try_sharded_state(
                type, obs, args, kwargs, in_axes=in_axes, shots=shots, key=key
            )
            if sharded is not None:
                return sharded

        arg_shapes = _arg_signature(args)
        from qml_essentials_tpu.models.unitary import UnitaryGates

        gate_error = UnitaryGates.batch_gate_error
        cache_kwargs = _make_hashable(
            {k: v for k, v in kwargs.items() if not hasattr(v, "shape")}
        )

        # --- Shot mode: exact probabilities, then per-element sampling. ---
        if shots is not None and type in ("probs", "expval"):
            cache_key = (
                type,
                "shots",
                shots,
                in_axes,
                arg_shapes,
                cache_kwargs,
                gate_error,
                _obs_signature(obs),
            )
            shot_in_axes = in_axes + (0,)
            shot_args = args + (jax.random.split(key, batch_size),)

            plan = self._jit_cache.get(cache_key)
            if plan is None:
                scalar_args = tuple(
                    self._slice_first(a, ax) if ax is not None else a
                    for a, ax in zip(args, in_axes)
                )
                metadata = self._record_metadata(scalar_args, kwargs, obs, type)
                n_qubits, use_density, _ = metadata

                def _single_execute_shots(*single_args_and_key):
                    *single_args, shot_key = single_args_and_key
                    tape = self._record(*single_args, **kwargs)
                    exact = simulation.simulate_and_measure(
                        tape, n_qubits, "probs", obs, use_density
                    )
                    return simulation.sample_shots(
                        exact, n_qubits, type, obs, shots, shot_key
                    )

                plan = self._build_plan(
                    _single_execute_shots, shot_args, shot_in_axes, metadata
                )
                self._jit_cache[cache_key] = plan

            chunk_size = self._chunk_size(cache_key, plan, type, len(obs), batch_size)
            return self._dispatch(
                None, plan, shot_args, shot_in_axes, batch_size, chunk_size, in_transform
            )

        # --- Exact mode ---------------------------------------------------
        cache_key = (
            type, in_axes, arg_shapes, cache_kwargs, gate_error,
            _obs_signature(obs),
        )
        plan = self._jit_cache.get(cache_key)
        if plan is None:
            scalar_args = tuple(
                self._slice_first(a, ax) if ax is not None else a
                for a, ax in zip(args, in_axes)
            )
            metadata = self._record_metadata(scalar_args, kwargs, obs, type)
            n_qubits, use_density, _ = metadata

            def _single_execute(*single_args):
                tape = self._record(*single_args, **kwargs)
                return simulation.simulate_and_measure(
                    tape, n_qubits, type, obs, use_density
                )

            plan = self._build_plan(
                _single_execute,
                args,
                in_axes,
                metadata,
                complex_out=type in ("state", "density"),
            )
            self._jit_cache[cache_key] = plan

        chunk_size = self._chunk_size(cache_key, plan, type, len(obs), batch_size)
        return self._dispatch(
            ("_aot", cache_key, batch_size),
            plan,
            args,
            in_axes,
            batch_size,
            chunk_size,
            in_transform,
        )

    # ----------------------------------------------------------------- draw
    def draw(
        self,
        figure: str = "text",
        args: tuple = (),
        kwargs: Optional[dict] = None,
        **draw_kwargs: Any,
    ) -> Union[str, Any]:
        """Render the circuit: ``"text"`` | ``"mpl"`` | ``"tikz"`` | ``"pulse"``."""
        if figure not in ("text", "mpl", "tikz", "pulse"):
            raise ValueError(
                f"Invalid figure mode: {figure!r}. "
                "Must be 'text', 'mpl', 'tikz', or 'pulse'."
            )
        if kwargs is None:
            kwargs = {}

        if figure == "pulse":
            from qml_essentials_tpu.utils.drawing import draw_pulse_schedule

            events = self.pulse_events(*args, **kwargs)
            n_qubits = (
                self._n_qubits
                or max((w for ev in events for w in ev.wires), default=0) + 1
            )
            return draw_pulse_schedule(events, n_qubits, **draw_kwargs)

        from qml_essentials_tpu.utils.drawing import draw_mpl, draw_text, draw_tikz

        tape = self._record(*args, **kwargs)
        n_qubits = self._n_qubits or simulation.infer_n_qubits(tape, [])
        ops = [op for op in tape if not isinstance(op, KrausChannel)]

        if figure == "text":
            return draw_text(ops, n_qubits, **draw_kwargs)
        if figure == "mpl":
            return draw_mpl(ops, n_qubits, **draw_kwargs)
        return draw_tikz(ops, n_qubits, **draw_kwargs)
