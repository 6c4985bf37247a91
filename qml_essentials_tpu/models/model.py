"""The data-reuploading quantum circuit Model (L5, user-facing).

TPU-first redesign
------------------

The circuit *structure* of a model never changes between calls: which
ansatz layers run, which encoding gates fire (the data-reuploading mask is
concrete), where state preparation and noise go.  This module therefore
compiles the circuit once into a **static segment program** — a flat tuple
of ``("prep",) / ("pqc", layer) / ("enc", layer, sites) / ("golomb",
layer)`` descriptors — at construction (and again whenever the mask
changes).  ``_variational`` is a small interpreter over that program: no
per-call Python decisions about structure, so a jit trace walks a fixed
instruction list and the encoding sites are resolved ahead of time instead
of through nested ``if mask[q, f]`` checks inside the trace.

Behavioural parity with the reference Model (qml_essentials/model.py:
ctor 26-210, noise validation 223-299, reupload spectrum 451-512, init
strategies 631-722, encoding 746-816, circuit 818-963, observables
965-998, batching 1414-1483, forward orchestration 1512-1737) — the
*behaviour* is reproduced from that spec; the mechanics here (segment
program, broadcast-based batch fusion, key stream) are this build's own.
"""

from __future__ import annotations

import logging
import warnings
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import random

from qml_essentials_tpu.core import jaqsi as js
from qml_essentials_tpu.models.ansaetze import Ansaetze, Circuit, Encoding
from qml_essentials_tpu.models.gates import Gates, PulseInformation as pinfo
from qml_essentials_tpu.ops import operations as op
from qml_essentials_tpu.ops.operations import KrausChannel
from qml_essentials_tpu.ops.tape import recording
from qml_essentials_tpu.utils import safe_random_split

log = logging.getLogger(__name__)


# Supported decoherence/noise knobs and their inactive defaults.  (Physics
# constants / API contract shared with the reference.)
_NOISE_DEFAULTS: Dict[str, Union[float, None]] = {
    "BitFlip": 0.0,
    "PhaseFlip": 0.0,
    "Depolarizing": 0.0,
    "MultiQubitDepolarizing": 0.0,
    "AmplitudeDamping": 0.0,
    "PhaseDamping": 0.0,
    "GateError": 0.0,
    "ThermalRelaxation": None,
    "StatePreparation": 0.0,
    "Measurement": 0.0,
}

_THERMAL_KEYS = ("t1", "t2", "t_factor")


class _KeyStream:
    """Stateful PRNG splitter threading one key through the circuit walk.

    ``None`` keys flow through untouched (noise-free circuits never touch
    the PRNG), mirroring :func:`safe_random_split`.
    """

    __slots__ = ("key",)

    def __init__(self, key) -> None:
        self.key = key

    def __call__(self):
        self.key, sub = safe_random_split(self.key)
        return sub


class Model:
    """A data-reuploading quantum circuit model.

    Parameter tensors have shape ``[batch, impl_layers, n_params_per_layer]``
    where ``impl_layers = n_layers + 1`` when data reuploading is active
    (the closing ansatz layer after the last encoding, Schuld et al.).
    """

    def __init__(
        self, n_qubits: int, n_layers: int,
        circuit_type: Union[str, Circuit] = "No_Ansatz",
        data_reupload: Union[bool, List[List[bool]], List[List[List[bool]]]] = True,
        state_preparation: Union[str, Callable, List[Union[str, Callable]], None] = None,
        encoding: Union[Encoding, str, Callable, List[Union[str, Callable]]] = Gates.RX,
        trainable_frequencies: bool = False, initialization: str = "random",
        initialization_domain: List[float] = [0, 2 * jnp.pi],
        output_qubit: Union[List[int], int] = -1, shots: Optional[int] = None,
        random_seed: int = 1000, remove_zero_encoding: bool = True,
        repeat_batch_axis: List[bool] = [True, True, True],
        pulse_shape: str = "gaussian",
    ) -> None:
        """Build the model and compile its segment program.

        Args:
            n_qubits: Number of qubits.
            n_layers: Number of ansatz layers.
            circuit_type: Ansatz name (see :class:`Ansaetze`) or Circuit class.
            data_reupload: ``True``/``False`` or an explicit boolean mask of
                shape ``(n_layers, n_qubits[, n_input_feat])``.
            state_preparation: Gate(s) applied to every qubit before layer 0.
            encoding: Encoding gate(s) or an :class:`Encoding` strategy.
            trainable_frequencies: Make encoding scales trainable
                (arXiv:2309.03279).
            initialization: ``random`` | ``zeros`` | ``pi`` |
                ``zero-controlled`` | ``pi-controlled``.
            initialization_domain: ``[lo, hi]`` for random init.
            output_qubit: Measured qubit(s); ``-1`` = all.
            shots: Finite-shot count (``None`` = analytic).
            random_seed: Seed for parameter init and noise keys.
            remove_zero_encoding: Elide encoding gates for all-zero inputs.
            repeat_batch_axis: Which of (inputs, params, pulse) axes fuse
                into the flat execution batch.
            pulse_shape: Active pulse envelope for pulse-mode execution.
        """
        self.n_qubits: int = n_qubits
        self.n_layers: int = n_layers
        self.output_qubit = output_qubit
        self.shots = shots
        self.remove_zero_encoding = remove_zero_encoding
        self.trainable_frequencies = trainable_frequencies
        self.repeat_batch_axis = repeat_batch_axis
        self.noise_params = None
        self.execution_type = "expval"
        self.gate_mode = "unitary"
        self._zero_inputs = False
        self._batch_shape: Optional[Tuple[int, int, int]] = None

        pinfo.set_envelope(pulse_shape)

        # State preparation: resolved once into (gate, pulse_params) pairs.
        try:
            prep_gates = Gates.parse_gates(state_preparation, Gates)
        except ValueError as e:
            raise ValueError(f"Error parsing encodings: {e}")
        self._sp = prep_gates
        self.sp_pulse_params = []
        for g in prep_gates:
            name = getattr(g, "__name__", str(g))
            info = pinfo.gate_by_name(name)
            self.sp_pulse_params.append(None if info is None else info.params)

        # Encoding strategy.
        self._enc = encoding if isinstance(encoding, Encoding) else Encoding(
            "hamming", encoding
        )
        if self._enc.is_golomb:
            self._enc._n_qubits = n_qubits
        self.n_input_feat: int = len(self._enc)
        self.enc_params = jnp.ones((n_layers, n_qubits, self.n_input_feat))

        # Ansatz.
        self.pqc: Circuit = (
            getattr(Ansaetze, circuit_type or "No_Ansatz")()
            if isinstance(circuit_type, str)
            else circuit_type()
        )

        # Data-reupload mask (concrete booleans) — this also compiles the
        # segment program and derives the frequency spectrum estimate.
        self.data_reupload = data_reupload

        impl_layers = n_layers + (1 if self.has_dru else 0)
        self._params_shape = (impl_layers, self.pqc.n_params_per_layer(n_qubits))
        self._pulse_params_shape = (
            impl_layers,
            self.pqc.n_pulse_params_per_layer(n_qubits),
        )
        log.info(
            f"Ansatz {self.pqc.__class__.__name__}: {impl_layers} implicit "
            f"layers x {self._params_shape[1]} params."
        )

        self._inialization_strategy = initialization
        self._initialization_domain = initialization_domain
        self.random_key = self.initialize_params(random.key(random_seed))
        self.pulse_params = jnp.ones((1, *self._pulse_params_shape))

        # Executor: auto-routes statevector vs density from the tape.
        self.script = js.Script(f=self._variational, n_qubits=n_qubits)

    # =============================================================== properties
    @property
    def noise_params(self) -> Optional[Dict[str, Union[float, Dict[str, float]]]]:
        """Noise parameter dict, or ``None`` when noise-free."""
        return self._noise_params

    @noise_params.setter
    def noise_params(self, kvs: Optional[Dict]) -> None:
        self._noise_params = self._canon_noise(kvs)

    @staticmethod
    def _canon_noise(kvs: Optional[Dict]) -> Optional[Dict]:
        """Fill defaults, warn on unknown keys, validate thermal relaxation."""
        if kvs is None or all(v == 0.0 for v in kvs.values()):
            return None

        unknown = set(kvs) - set(_NOISE_DEFAULTS)
        for key in unknown:
            warnings.warn(
                f"Ignoring unsupported noise type {key!r}.", UserWarning
            )
        merged = dict(_NOISE_DEFAULTS)
        merged.update(kvs)

        tr = merged["ThermalRelaxation"]
        if isinstance(tr, dict):
            for k in set(tr) - set(_THERMAL_KEYS):
                warnings.warn(
                    f"Unknown ThermalRelaxation key {k!r} ignored "
                    f"(expected t1/t2/t_factor).",
                    UserWarning,
                )
            tr = {k: tr.get(k, 0.0) for k in _THERMAL_KEYS}
            degenerate = not all(tr.values()) or tr["t2"] > 2 * tr["t1"]
            if degenerate:
                warnings.warn(
                    "ThermalRelaxation values are degenerate (need all nonzero "
                    "and t2 <= 2*t1); skipping the channel.",
                    UserWarning,
                )
                merged["ThermalRelaxation"] = 0.0
            else:
                merged["ThermalRelaxation"] = tr
        return merged

    @property
    def output_qubit(self) -> List[int]:
        """Measured qubit indices (``-1`` expanded to all qubits)."""
        return self._output_qubit

    @output_qubit.setter
    def output_qubit(self, value: Union[int, List[int]]) -> None:
        if isinstance(value, int):
            if value == -1:
                value = list(range(self.n_qubits))
            else:
                assert value < self.n_qubits, (
                    f"output_qubit {value} is out of range for {self.n_qubits} qubits."
                )
                value = [value]
        else:
            assert len(value) <= self.n_qubits, (
                f"output_qubit lists at most {self.n_qubits} entries "
                f"(got {len(value)})."
            )
        self._output_qubit = value

    @property
    def execution_type(self) -> str:
        """One of ``expval`` / ``probs`` / ``state`` / ``density``."""
        return self._execution_type

    @execution_type.setter
    def execution_type(self, value: str) -> None:
        k = len(self.output_qubit)
        shapes = {
            "expval": (k,),
            "probs": (2,) * (k if isinstance(self.output_qubit, (list, tuple)) else 1),
            "state": (2**k,),
            "density": (2**k, 2**k),
        }
        if value not in shapes:
            raise ValueError(f"Invalid execution type: {value}.")
        self._result_shape = shapes[value]

        if value == "state" and not self.all_qubit_measurement:
            warnings.warn(
                f"execution_type={value!r} always covers the full register; "
                f"output_qubit={self.output_qubit} has no effect.",
                UserWarning,
            )
        if value == "probs" and self.shots is None:
            warnings.warn(
                "probs mode without shots returns exact probabilities.",
                UserWarning,
            )
        if value == "density" and self.shots is not None:
            raise ValueError(
                "density mode is incompatible with finite shots."
            )
        self._execution_type = value

    @property
    def shots(self) -> Optional[int]:
        """Number of measurement shots (``None`` = analytic)."""
        return self._shots

    @shots.setter
    def shots(self, value: Optional[int]) -> None:
        self._shots = None if (type(value) is int and value <= 0) else value

    @property
    def params(self) -> jnp.ndarray:
        """Variational parameters, batch-first."""
        return self._params

    @params.setter
    def params(self, value: jnp.ndarray) -> None:
        self._params = value.reshape(1, *value.shape) if value.ndim == 2 else value

    # ``enc_params`` (encoding scales) and ``pulse_params`` (pulse scalers)
    # are plain attributes — no invariants to guard.

    @property
    def data_reupload(self) -> np.ndarray:
        """Concrete boolean reupload mask, shape (n_layers, n_qubits, n_feat)."""
        return self._data_reupload

    @data_reupload.setter
    def data_reupload(self, value) -> None:
        self._data_reupload = self._canon_mask(value)
        self._derive_spectrum()
        self._compile_program()

    def _canon_mask(self, value) -> np.ndarray:
        """Normalise bool/2D/3D mask input to a concrete (L, Q, F) array."""
        L, Q, F = self.n_layers, self.n_qubits, self.n_input_feat
        if isinstance(value, bool):
            if value:
                return np.ones((L, Q, F), dtype=bool)
            mask = np.zeros((L, Q, F), dtype=bool)
            mask[0, 0] = True  # single encoding on qubit 0, layer 0
            return mask
        mask = np.asarray(value)
        if mask.ndim == 2:
            assert mask.shape == (L, Q), (
                f"Data reuploading array has wrong shape. "
                f"Expected {(L, Q)} or {(L, Q, F)}, got {mask.shape}."
            )
            mask = np.repeat(mask[..., None], F, axis=2)
        assert mask.shape == (L, Q, F), (
            f"Data reuploading array has wrong shape. "
            f"Expected {(L, Q, F)}, got {mask.shape}."
        )
        return mask.astype(bool)

    def _derive_spectrum(self) -> None:
        """Per-feature degree / frequency estimate from the encoding count."""
        counts = [
            int(np.count_nonzero(self._data_reupload[..., f]))
            for f in range(self.n_input_feat)
        ]
        self.degree = tuple(self._enc.get_n_freqs(c) for c in counts)
        self.frequencies = tuple(self._enc.get_spectrum(c) for c in counts)
        self._has_dru = max(int(np.max(f)) for f in self.frequencies) > 1

    # ------------------------------------------------------- segment program
    def _compile_program(self) -> None:
        """Compile the static circuit structure into a segment tuple.

        Segments: ``("prep",)``, ``("pqc", layer_index)``,
        ``("golomb", layer)``, ``("enc", layer, sites)`` with *sites* a
        tuple of concrete ``(qubit, feature)`` pairs from the reupload
        mask.  Structure decisions happen here, once — the per-call
        interpreter in :meth:`_variational` just walks the list.
        """
        program: List[tuple] = []
        if self._sp:
            program.append(("prep",))
        golomb = self._enc.is_golomb
        for layer in range(self.n_layers):
            program.append(("pqc", layer))
            mask = self._data_reupload[layer]
            if golomb:
                if mask[:, 0].any():
                    program.append(("golomb", layer))
            else:
                sites = tuple(
                    (q, f)
                    for q in range(self.n_qubits)
                    for f in range(self.n_input_feat)
                    if mask[q, f]
                )
                if sites:
                    program.append(("enc", layer, sites))
        if self._has_dru:
            program.append(("pqc", self.n_layers))
        self._program = tuple(program)

    # ``degree`` / ``frequencies`` (per-feature spectrum estimates) are set
    # by :meth:`_derive_spectrum` and readable as plain attributes.

    @property
    def has_dru(self) -> bool:
        """Whether data reuploading is active (spectrum beyond degree 1)."""
        return self._has_dru

    @property
    def all_qubit_measurement(self) -> bool:
        """Whether the measurement covers every qubit."""
        return self.output_qubit == list(range(self.n_qubits))

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        """(B_inputs, B_params, B_pulse) from the last call; (1,1,1) before."""
        return self._batch_shape or (1, 1, 1)

    @property
    def eff_batch_shape(self) -> Tuple[int, ...]:
        """Batch shape restricted to the enabled repeat axes."""
        return tuple(
            s for s, on in zip(self.batch_shape, self.repeat_batch_axis) if on and s
        )

    def exact_spectrum(self, method: str = "tree") -> Tuple[np.ndarray, ...]:
        """Exact per-feature Fourier support via the analytic FourierTree.

        Unlike :attr:`frequencies` (an encoding-count estimate that can
        overestimate), this derives the support symbolically; see
        :meth:`~qml_essentials_tpu.analysis.coefficients.FourierTree.get_exact_support`.
        """
        from qml_essentials_tpu.analysis.coefficients import FourierTree

        tree = FourierTree(self)
        where = {feat: pos for pos, feat in enumerate(tree.features)}

        seen: set = set()
        for freqs in tree.get_exact_support(method=method):
            arr = np.atleast_2d(np.asarray(freqs))
            for row in arr:
                seen.add(tuple(int(v) for v in np.atleast_1d(row)))

        out = []
        for feat in range(self.n_input_feat):
            if seen and feat in where:
                out.append(np.array(sorted({t[where[feat]] for t in seen}), dtype=int))
            else:
                out.append(np.array([0], dtype=int))
        return tuple(out)

    # ============================================================ param init
    _INIT_STRATEGIES = ("random", "zeros", "pi", "zero-controlled", "pi-controlled")

    def initialize_params(
        self,
        random_key: Optional[jnp.ndarray] = None,
        repeat: int = 1,
        initialization: Optional[str] = None,
        initialization_domain: Optional[List[float]] = None,
    ) -> jnp.ndarray:
        """(Re-)initialise variational parameters; returns the advanced key.

        ``zero-controlled`` / ``pi-controlled`` draw randomly, then pin the
        controlled-rotation slots (per the ansatz's control indices) to 0 / π.
        """
        strategy = initialization or self._inialization_strategy
        lo, hi = initialization_domain or self._initialization_domain
        shape = (repeat, *self._params_shape)

        random_key, sub_key = safe_random_split(
            self.random_key if random_key is None else random_key
        )

        if strategy not in self._INIT_STRATEGIES:
            raise Exception("Invalid initialization method")

        if strategy == "zeros":
            drawn = jnp.zeros(shape)
        elif strategy == "pi":
            drawn = jnp.full(shape, jnp.pi)
        else:
            drawn = random.uniform(sub_key, shape, minval=lo, maxval=hi)

        if strategy.endswith("-controlled"):
            pin = 0.0 if strategy.startswith("zero") else jnp.pi
            ctl = self.pqc.get_control_indices(self.n_qubits)
            if ctl is None:
                warnings.warn(
                    f"{strategy} init requested but the ansatz exposes no "
                    f"controlled-rotation slots; keeping the random draw.",
                    UserWarning,
                )
            else:
                host = np.array(drawn)
                host[:, :, ctl[0] : ctl[1] : ctl[2]] = pin
                drawn = jnp.array(host)

        self.params = drawn
        log.info(f"Initialized parameters {shape} with strategy {strategy}.")
        return random_key

    # ================================================================ circuit
    def transform_input(
        self, inputs: jnp.ndarray, enc_params: jnp.ndarray
    ) -> jnp.ndarray:
        """Linear input scaling by encoding parameters (arXiv:2309.03279)."""
        return inputs * enc_params

    def _resolve_circuit_args(
        self, pulse_params, random_key, enc_params, gate_mode, noise_params
    ):
        """Fall back to instance state for omitted circuit kwargs (warning
        once per condition — direct `_variational` calls bypass `_forward`)."""
        if enc_params is None:
            if self.trainable_frequencies:
                warnings.warn(
                    "_variational called without enc_params; falling back to "
                    "the stored self.enc_params.",
                    RuntimeWarning,
                )
            enc_params = self.enc_params
        if pulse_params is None:
            if gate_mode == "pulse":
                warnings.warn(
                    "_variational called without pulse_params; falling back to "
                    "the stored self.pulse_params.",
                    RuntimeWarning,
                )
            pulse_params = self.pulse_params
        if noise_params is None and self.noise_params is not None:
            warnings.warn(
                "_variational called without noise_params; falling back to "
                "the stored self.noise_params.",
                RuntimeWarning,
            )
            noise_params = self.noise_params
        if noise_params is not None and random_key is None:
            warnings.warn(
                "_variational called without a random_key while noise is "
                "active; reusing the model key.",
                RuntimeWarning,
            )
            random_key = self.random_key
        return pulse_params, random_key, enc_params, noise_params

    def _variational(
        self,
        params: jnp.ndarray,
        inputs: jnp.ndarray,
        pulse_params: Optional[jnp.ndarray] = None,
        random_key=None,
        enc_params: Optional[jnp.ndarray] = None,
        gate_mode: str = "unitary",
        noise_params: Optional[Dict] = None,
    ) -> None:
        """Interpret the segment program, emitting gates onto the active tape.

        The first five positional arguments are batchable; keyword arguments
        broadcast.  Segment kinds: state prep, ansatz layer (params[layer]),
        encoding sites (concrete (qubit, feature) list), golomb encoding.
        """
        # Per-sample views: drop singleton batch axes left by vmap plumbing.
        if params.ndim > 2 and params.shape[0] == 1:
            params = params[0]
        if inputs.ndim > 1 and inputs.shape[0] == 1:
            inputs = inputs[0]

        pulse_params, random_key, enc_params, noise_params = (
            self._resolve_circuit_args(
                pulse_params, random_key, enc_params, gate_mode, noise_params
            )
        )
        if pulse_params.ndim > 2 and pulse_params.shape[0] == 1:
            pulse_params = pulse_params[0]

        keys = _KeyStream(random_key)
        elide_encoding = (
            self.remove_zero_encoding
            and self._zero_inputs
            and self.batch_shape[0] == 1
        )

        if noise_params is not None:
            p_prep = noise_params.get("StatePreparation", 0.0)
            if p_prep > 0:
                for q in range(self.n_qubits):
                    op.BitFlip(p_prep, wires=q)

        for segment in self._program:
            kind = segment[0]
            if kind == "prep":
                for q in range(self.n_qubits):
                    for gate, gate_pp in zip(self._sp, self.sp_pulse_params):
                        gate(
                            wires=q,
                            pulse_params=gate_pp,
                            noise_params=noise_params,
                            random_key=keys(),
                            gate_mode=gate_mode,
                        )
            elif kind == "pqc":
                layer = segment[1]
                self.pqc(
                    params[layer],
                    self.n_qubits,
                    pulse_params=pulse_params[min(layer, pulse_params.shape[0] - 1)],
                    noise_params=noise_params,
                    random_key=keys(),
                    gate_mode=gate_mode,
                )
            elif kind == "enc":
                keys()  # layer-level split (keeps noise keys layer-decorrelated)
                if elide_encoding:
                    continue
                layer, sites = segment[1], segment[2]
                for q, f in sites:
                    self._enc[f](
                        self.transform_input(inputs[..., f], enc_params[layer, q, f]),
                        wires=q,
                        noise_params=noise_params,
                        random_key=keys(),
                    )
            elif kind == "golomb":
                keys()
                if elide_encoding:
                    continue
                layer = segment[1]
                self._enc[0](
                    self.transform_input(
                        inputs[..., 0], jnp.mean(enc_params[layer, :, 0])
                    ),
                    wires=list(range(self.n_qubits)),
                    noise_params=noise_params,
                    random_key=keys(),
                )

        if noise_params is not None:
            self._emit_decoherence(noise_params)

    def _emit_decoherence(self, noise_params: Dict) -> None:
        """Post-circuit decoherence channels on every qubit."""
        amp = noise_params.get("AmplitudeDamping", 0.0)
        phase = noise_params.get("PhaseDamping", 0.0)
        meas = noise_params.get("Measurement", 0.0)
        thermal = noise_params.get("ThermalRelaxation", 0.0)
        tg = (
            self._get_circuit_depth() * thermal["t_factor"]
            if isinstance(thermal, dict)
            else None
        )
        for q in range(self.n_qubits):
            if amp > 0:
                op.AmplitudeDamping(amp, wires=q)
            if phase > 0:
                op.PhaseDamping(phase, wires=q)
            if meas > 0:
                op.BitFlip(meas, wires=q)
            if tg is not None:
                op.ThermalRelaxationError(
                    1.0, thermal["t1"], thermal["t2"], tg, q
                )

    def _build_obs(self) -> Tuple[str, List[op.Operation]]:
        """Translate execution_type / output_qubit into (meas_type, obs)."""
        if self.execution_type != "expval":
            return self.execution_type, []
        obs = [
            op.PauliZ(wires=spec, record=False)
            if isinstance(spec, int)
            else js.build_parity_observable(list(spec))
            for spec in self.output_qubit
        ]
        return "expval", obs

    def _get_circuit_depth(self, inputs: Optional[jnp.ndarray] = None) -> int:
        """Critical-path depth of the noise-free circuit (cached).

        Standard list-scheduling: each gate starts after the busiest of its
        wires; depth is the maximum finish time.
        """
        cached = getattr(self, "_depth_cache", None)
        if cached is not None:
            return cached

        inputs = self._inputs_validation(inputs)
        saved = self._noise_params
        self._noise_params = None
        try:
            with recording() as tape:
                self._variational(
                    self.params[0] if self.params.ndim == 3 else self.params,
                    inputs[0] if inputs.ndim == 2 else inputs,
                    noise_params=None,
                )
        finally:
            self._noise_params = saved

        finish: Dict[int, int] = {}
        depth = 0
        for gate in tape:
            if isinstance(gate, KrausChannel):
                continue
            t = 1 + max((finish.get(w, 0) for w in gate.wires), default=0)
            finish.update({w: t for w in gate.wires})
            depth = max(depth, t)
        self._depth_cache = depth
        return depth

    # ================================================================ drawing
    def _draw_call_args(self, inputs) -> tuple:
        inputs = self._inputs_validation(inputs)
        params = self.params[0] if self.params.ndim == 3 else self.params
        inp = inputs[0] if inputs.ndim == 2 else inputs
        return params, inp

    def draw(self, inputs: Optional[jnp.ndarray] = None,
             figure: str = "text", **kwargs: Any) -> Union[str, Any]:
        """Render the circuit: ``text`` | ``mpl`` | ``tikz`` | ``pulse``."""
        if figure == "pulse":
            return self.draw_pulse(inputs=inputs, **kwargs)
        params, inp = self._draw_call_args(inputs)
        saved = self._noise_params
        self._noise_params = None
        try:
            return js.Script(f=self._variational, n_qubits=self.n_qubits).draw(
                figure=figure,
                args=(params, inp),
                kwargs={"noise_params": None},
                **kwargs,
            )
        finally:
            self._noise_params = saved

    def draw_pulse(self, inputs: Optional[jnp.ndarray] = None, **kwargs: Any) -> Any:
        """Render the pulse schedule of the circuit (pulse mode)."""
        params, inp = self._draw_call_args(inputs)
        return js.Script(f=self._variational, n_qubits=self.n_qubits).draw(
            figure="pulse",
            args=(params, inp),
            kwargs={"gate_mode": "pulse", "noise_params": None},
            **kwargs,
        )

    def __str__(self) -> str:
        return self.draw(figure="text")

    __repr__ = __str__

    # ============================================================= validation
    def _params_validation(self, params: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Normalise params to (batch, impl_layers, n_params_per_layer)."""
        if params is None:
            return self.params
        if params.ndim == 2:
            params = params[None]
        # Never persist tracers on the instance: under jax.grad/vmap the
        # stored value would leak out of its trace and poison later calls.
        if not isinstance(params, jax.core.Tracer):
            self.params = params
        return params

    def _pulse_params_validation(
        self, pulse_params: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        """Normalise pulse params to (batch, impl_layers, n_pulse_per_layer)."""
        if pulse_params is None:
            return self.pulse_params
        if pulse_params.ndim == 2:
            pulse_params = pulse_params[None]
        if not isinstance(pulse_params, jax.core.Tracer):
            self.pulse_params = pulse_params
        return pulse_params

    def _enc_params_validation(self, enc_params: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Normalise encoding params to (n_layers, n_qubits, n_input_feat)."""
        if enc_params is None:
            enc_params = self.enc_params
        elif not isinstance(enc_params, jax.core.Tracer):
            self.enc_params = (
                enc_params if self.trainable_frequencies else jnp.array(enc_params)
            )
        if enc_params.ndim == 1:
            if self.n_input_feat > 1:
                raise ValueError(
                    f"Input dimension {self.n_input_feat} >1 but "
                    f"`enc_params` has shape {enc_params.shape}"
                )
            enc_params = enc_params.reshape(-1, 1)
        return enc_params

    def _inputs_validation(
        self, inputs: Union[None, List, float, int, jnp.ndarray]
    ) -> jnp.ndarray:
        """Normalise inputs to (batch_size, n_input_feat)."""
        F = self.n_input_feat
        if inputs is None:
            inputs = jnp.zeros((1, F))
        elif isinstance(inputs, list):
            inputs = jnp.array(np.stack(inputs))
        elif isinstance(inputs, (int, float)):
            inputs = jnp.array([inputs])

        self._zero_inputs = not inputs.any()

        if inputs.ndim <= 1:
            if F == 1:
                inputs = inputs.reshape(-1, 1)
            elif inputs.shape[0] == F:
                inputs = inputs.reshape(1, -1)
            else:
                warnings.warn(
                    f"Got {inputs.shape[0]} input values for {F} features; "
                    "broadcasting the column to every feature.",
                    UserWarning,
                )
                inputs = jnp.repeat(inputs.reshape(-1, 1), F, axis=1)
        elif inputs.shape[1] != F:
            raise ValueError(
                f"Input shape {inputs.shape} does not match the expected "
                f"{F} feature column(s)."
            )
        return inputs

    # =============================================================== batching
    def _assimilate_batch(
        self, inputs: jnp.ndarray, params: jnp.ndarray,
        pulse_params: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Fuse the (inputs × params × pulse) batch axes into one flat axis.

        Each tensor whose own axis is enabled is broadcast over the other
        *enabled* axes and flattened; ``broadcast_to`` keeps the expansion
        symbolic until XLA decides a layout (no host-side materialisation).
        """
        sizes = (
            inputs.shape[0],
            1 if 0 in params.shape else params.shape[0],
            pulse_params.shape[0],
        )
        self._batch_shape = sizes
        enabled = self.repeat_batch_axis

        def spread(t: jnp.ndarray, axis: int) -> jnp.ndarray:
            if sizes[axis] <= 1 or not enabled[axis]:
                return t
            lead = tuple(
                sizes[i] if (enabled[i] or i == axis) else 1 for i in range(3)
            )
            expand = [1, 1, 1]
            expand[axis] = sizes[axis]
            t = t.reshape(tuple(expand) + t.shape[1:])
            t = jnp.broadcast_to(t, lead + t.shape[3:])
            return t.reshape((-1,) + t.shape[3:])

        return spread(inputs, 0), spread(params, 1), spread(pulse_params, 2)

    def _requires_density(self) -> bool:
        """Whether the configuration forces mixed-state simulation."""
        if self.execution_type == "density":
            return True
        if self.noise_params is None:
            return False
        return any(
            v is not None and v > 0
            for k, v in self.noise_params.items()
            if k != "GateError" and not isinstance(v, dict)
        ) or isinstance(self.noise_params.get("ThermalRelaxation"), dict)

    # ================================================================ forward
    def __call__(self, params=None, inputs=None, **kwargs) -> jnp.ndarray:
        """Execute the model; see :meth:`_forward`."""
        return self._forward(params=params, inputs=inputs, **kwargs)

    def _forward(
        self, params: Optional[jnp.ndarray] = None,
        inputs: Optional[jnp.ndarray] = None,
        pulse_params: Optional[jnp.ndarray] = None,
        enc_params: Optional[jnp.ndarray] = None, data_reupload=None,
        noise_params: Optional[Dict] = None,
        execution_type: Optional[str] = None, force_mean: bool = False,
        gate_mode: str = "unitary",
    ) -> jnp.ndarray:
        """Forward pass: canonicalise → fuse batches → execute → shape.

        Output shapes by ``execution_type``: ``expval`` → (n_out,),
        ``density`` → (2^k, 2^k), ``probs`` → (2^k,), ``state`` → (2^n,),
        with leading batch dims as applicable.
        """
        for knob, value in (("noise_params", noise_params),
                            ("execution_type", execution_type),
                            ("data_reupload", data_reupload)):
            if value is not None:
                setattr(self, knob, value)
        self.gate_mode = gate_mode

        if pulse_params is not None and gate_mode != "pulse":
            raise ValueError(
                "pulse_params only apply in gate_mode='pulse'; drop them or "
                "switch the gate mode."
            )

        params = self._params_validation(params)
        pulse_params = self._pulse_params_validation(pulse_params)
        inputs = self._inputs_validation(inputs)
        enc_params = self._enc_params_validation(enc_params)
        inputs, params, pulse_params = self._assimilate_batch(
            inputs, params, pulse_params
        )

        self.random_key, call_key = safe_random_split(self.random_key)
        shot_key = None
        if self.shots is not None:
            call_key, shot_key = safe_random_split(call_key)

        meas_type, obs = self._build_obs()
        run_kwargs = dict(noise_params=self.noise_params, gate_mode=self.gate_mode)
        B = int(np.prod(self.eff_batch_shape))

        if B > 1:
            axes = tuple(0 if b > 1 else None for b in self.batch_shape)
            result = self.script.execute(
                type=meas_type,
                obs=obs,
                args=(
                    params,
                    inputs,
                    pulse_params,
                    safe_random_split(call_key, num=B),
                    enc_params,
                ),
                kwargs=run_kwargs,
                in_axes=(axes[1], axes[0], axes[2], 0, None),
                shots=self.shots,
                key=shot_key,
            )
        else:
            result = self.script.execute(
                type=meas_type, obs=obs, kwargs=run_kwargs,
                args=(params, inputs, pulse_params, call_key, enc_params),
                shots=self.shots, key=shot_key,
            )

        return self._shape_result(result, force_mean)

    def _shape_result(self, result, force_mean: bool) -> jnp.ndarray:
        """Post-process raw executor output into the documented shape."""
        if isinstance(result, list):
            result = jnp.stack(result)
            if result.ndim > 1:
                result = jnp.moveaxis(result, 0, 1)

        partial = not self.all_qubit_measurement
        if partial and self.execution_type == "density":
            result = js.partial_trace(result, self.n_qubits, self.output_qubit)
        elif partial and self.execution_type == "probs":
            groups = self.output_qubit
            if isinstance(groups[0], (list, tuple)):
                result = jnp.stack(
                    [
                        js.marginalize_probs(result, self.n_qubits, list(g))
                        for g in groups
                    ]
                )
            else:
                result = js.marginalize_probs(result, self.n_qubits, groups)

        result = jnp.asarray(result)
        result = result.reshape((*self.eff_batch_shape, *self._result_shape)).squeeze()

        if (
            force_mean
            and self.execution_type in ("expval", "probs")
            and result.ndim > 0
            and self._result_shape[0] > 1
        ):
            result = result.mean(axis=-1)
        return result
