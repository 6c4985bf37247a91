"""Quantum Optimal Control: two-stage pulse-parameter synthesis.

Stage 0 is a coarse multiplicative grid scan whose per-candidate refinement
is a single fused ``jax.lax.scan`` of Adam steps; Stage 1 is AdamW with a
warmup-cosine schedule, global-norm gradient clipping, log-space
reparameterisation of scale-like parameters, optional early stopping
(masked updates inside the scan) and vmapped multi-restart — every
optimisation loop is one XLA program, the TPU-native shape for control
synthesis.  A composite-aware *joint* mode optimises one shared leaf
parameter vector against a weighted sum of process fidelities over leaf and
composite gates (with tied RX/RY envelopes and coordinate-descent Stage 0).

Run as a CLI: ``python -m qml_essentials_tpu.pulse.qoc --gates RX RY ...``.

Reference parity: qml_essentials/qoc.py (cost functions 171-519, registry
522-631, QOC 634-2605, defaults 2608-2638, profiling 2641-2757, CLI
2760-3086).
"""

from __future__ import annotations

import argparse
import csv
import itertools
import logging
import os
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax
import numpy as np
import optax
from jax import numpy as jnp

from qml_essentials_tpu.analysis.math import fidelity, phase_difference
from qml_essentials_tpu.core import jaqsi as js
from qml_essentials_tpu.models.gates import Gates, PulseEnvelope, PulseInformation
from qml_essentials_tpu.ops import operations as op

# QOC needs f64 throughout: pulse landscapes have tiny curvature near the
# optimum and f32 gradients stall (matches the reference, qoc.py:18).
jax.config.update("jax_enable_x64", True)

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------


def _build_optimizer(schedule, grad_clip: float):
    """AdamW, optionally preceded by a global-norm gradient clip."""
    use_clip = grad_clip and grad_clip > 0 and jnp.isfinite(grad_clip)
    if use_clip:
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(schedule),
        )
    return optax.adamw(schedule)


def _safe_eval(cost_fn: Callable, params: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the cost; map non-finite results to +inf."""
    loss = cost_fn(params)
    return jnp.where(jnp.isfinite(loss), loss, jnp.inf)


def _with_basis_prep(circuit_fn: Callable, k: int, n_wires: int) -> Callable:
    """Prefix *circuit_fn* with PauliX gates preparing basis state |k> (MSB first)."""
    bits = [(k >> (n_wires - 1 - i)) & 1 for i in range(n_wires)]

    def prepared(*args, **kwargs):
        for i, bit in enumerate(bits):
            if bit:
                op.PauliX(wires=i)
        circuit_fn(*args, **kwargs)

    prepared.__name__ = f"basis{k}_{circuit_fn.__name__}"
    return prepared


def _sample_rotation_angles(n_samples: int) -> jnp.ndarray:
    """Boundary-biased angle sample: full sweep + extra density in [pi/2, 3pi/2]."""
    if n_samples <= 1:
        return jnp.linspace(0.0, 2.0 * jnp.pi, max(n_samples, 1), endpoint=False)
    k_focus = max(1, n_samples // 3)
    k_uniform = n_samples - k_focus
    ws_uniform = jnp.linspace(0.0, 2.0 * jnp.pi, k_uniform, endpoint=False)
    ws_focus = jnp.linspace(0.5 * jnp.pi, 1.5 * jnp.pi, k_focus, endpoint=False)
    return jnp.concatenate([ws_uniform, ws_focus])


def _run_gate_stage(stage: Optional[Callable], w) -> None:
    if stage is not None:
        stage(w)


def _chain_gate_stages(*stages: Callable) -> Callable:
    """Compose multiple preparation stages into one."""

    def chained(w):
        for stage in stages:
            stage(w)

    return chained


def _make_gate_pair(
    pulse_gate: Callable,
    target_gate: Callable,
    prep: Optional[Callable] = None,
    post: Optional[Callable] = None,
) -> Tuple[Callable, Callable]:
    """Matching (pulse, target) circuits with optional pre/post stages."""

    def pulse_circuit(w, pp):
        _run_gate_stage(prep, w)
        pulse_gate(w, pp)
        _run_gate_stage(post, w)

    def target_circuit(w):
        _run_gate_stage(prep, w)
        target_gate(w)
        _run_gate_stage(post, w)

    return pulse_circuit, target_circuit


class Cost:
    """Weighted, kwargs-injected cost term; compose terms with ``+``."""

    def __init__(
        self,
        cost: Callable,
        weight: Union[float, Tuple],
        ckwargs: Optional[dict] = None,
    ):
        self.cost = cost
        self.weight = weight
        self.ckwargs = ckwargs if ckwargs is not None else {}

    def __call__(self, *args, **kwargs):
        cost = self.cost(*args, **kwargs, **self.ckwargs)
        if isinstance(self.weight, tuple):
            return jnp.array(
                [c * w for c, w in zip(cost, self.weight, strict=True)]
            ).sum()
        return cost * self.weight

    def __add__(self, other):
        if other is None:
            return lambda *args, **kwargs: self(*args, **kwargs)
        if callable(other):
            return lambda *args, **kwargs: (
                self(*args, **kwargs) + other(*args, **kwargs)
            )
        raise TypeError(f"Cannot add Cost and {type(other)}")


# ---------------------------------------------------------------------------
# Cost functions
# ---------------------------------------------------------------------------


def fidelity_cost_fn(
    pulse_params: jnp.ndarray,
    pulse_scripts: Union[js.Script, List[js.Script]],
    target_scripts: Union[js.Script, List[js.Script]],
    n_samples: int,
) -> Tuple[float, float]:
    """State-vector cost ``(1 - F, 1 - cos(dphi))`` averaged over angles.

    Multiple (pulse, target) script pairs probe different initial states
    (|0> and |+>), exposing rotation-axis tilt.  All angles run in one
    vmapped execution per script.
    """
    if not isinstance(pulse_scripts, (list, tuple)):
        pulse_scripts = [pulse_scripts]
    if not isinstance(target_scripts, (list, tuple)):
        target_scripts = [target_scripts]
    assert len(pulse_scripts) == len(target_scripts), (
        f"pulse_scripts and target_scripts must have the same length "
        f"({len(pulse_scripts)} vs {len(target_scripts)})."
    )

    ws = _sample_rotation_angles(n_samples)

    abs_diffs = []
    phase_diffs = []
    for p_script, t_script in zip(pulse_scripts, target_scripts):
        pulse_states = p_script.execute(
            type="state", args=(ws, pulse_params), in_axes=(0, None)
        )
        target_states = t_script.execute(type="state", args=(ws,), in_axes=(0,))
        abs_diffs.append(jnp.mean(1.0 - fidelity(pulse_states, target_states)))
        phase_diffs.append(
            jnp.mean(1.0 - jnp.cos(phase_difference(pulse_states, target_states)))
        )

    return jnp.mean(jnp.stack(abs_diffs)), jnp.mean(jnp.stack(phase_diffs))


def unitary_cost_fn(
    pulse_params: jnp.ndarray,
    pulse_basis_scripts: List[js.Script],
    target_basis_scripts: List[js.Script],
    n_samples: int,
    n_qubits: int,
) -> Tuple[float, float]:
    """Process-fidelity cost ``(1 - |Tr E|^2/d^2, 1 - cos(angle Tr E))``.

    Column-stacks ``2**n`` basis-state evolutions into the full unitary at
    every sampled angle (``E = U_target† U_pulse``); the phase term pins
    the global phase so composed gates stay consistent.
    """
    d = 2**n_qubits
    assert len(pulse_basis_scripts) == d, (
        f"pulse_basis_scripts must have {d} entries; got "
        f"{len(pulse_basis_scripts)}."
    )
    assert len(target_basis_scripts) == d, (
        f"target_basis_scripts must have {d} entries; got "
        f"{len(target_basis_scripts)}."
    )

    ws = _sample_rotation_angles(n_samples)

    pulse_cols = []
    target_cols = []
    for k in range(d):
        pulse_cols.append(
            pulse_basis_scripts[k].execute(
                type="state", args=(ws, pulse_params), in_axes=(0, None)
            )
        )
        target_cols.append(
            target_basis_scripts[k].execute(type="state", args=(ws,), in_axes=(0,))
        )

    U_pulse = jnp.stack(pulse_cols, axis=-1)  # (n_samples, d, d)
    U_target = jnp.stack(target_cols, axis=-1)

    E = jnp.einsum("sji,sjk->sik", jnp.conj(U_target), U_pulse)
    trE = jnp.einsum("sii->s", E)

    F_pro = jnp.abs(trE) ** 2 / float(d) ** 2
    process_loss = jnp.mean(1.0 - F_pro)
    phase_loss = jnp.mean(1.0 - jnp.cos(jnp.angle(trE)))
    return process_loss, phase_loss


def joint_unitary_cost_fn(
    pulse_params: jnp.ndarray,
    gate_specs: List[dict],
    n_samples: int,
) -> Tuple[float, float]:
    """Weighted sum of :func:`unitary_cost_fn` terms sharing one theta.

    Each spec carries ``{name, n_qubits, weight, assembler,
    pulse_basis_scripts, target_basis_scripts}``; the assembler maps the
    joint vector to that gate's flat pulse params.
    """
    total_proc = jnp.asarray(0.0)
    total_phase = jnp.asarray(0.0)
    total_w = 0.0
    for spec in gate_specs:
        per_gate_pp = spec["assembler"](pulse_params)
        proc_loss, phase_loss = unitary_cost_fn(
            per_gate_pp,
            spec["pulse_basis_scripts"],
            spec["target_basis_scripts"],
            n_samples,
            spec["n_qubits"],
        )
        w = spec["weight"]
        total_proc = total_proc + w * proc_loss
        total_phase = total_phase + w * phase_loss
        total_w += w
    if total_w > 0:
        total_proc = total_proc / total_w
        total_phase = total_phase / total_w
    return total_proc, total_phase


def pulse_width_cost_fn(pulse_params: jnp.ndarray, envelope: str) -> jnp.ndarray:
    """Penalty on the pulse width (last envelope parameter; 0 if none)."""
    n_env = PulseEnvelope.get(envelope)["n_envelope_params"]
    width = pulse_params[n_env - 1] if n_env > 0 else 0
    return jnp.asarray(width, dtype=jnp.float64)


def evolution_time_cost_fn(pulse_params: jnp.ndarray, t_target: float) -> jnp.ndarray:
    """Squared relative deviation of the evolution time from *t_target*."""
    t = pulse_params[-1]
    return ((t - t_target) / t_target) ** 2


def spectral_density_cost_fn(
    pulse_params: jnp.ndarray, envelope: str, n_fft: int = 1024
) -> jnp.ndarray:
    """Normalised RMS bandwidth of the pulse's power spectral density."""
    info = PulseEnvelope.get(envelope)
    n_env = info["n_envelope_params"]
    envelope_fn = info["fn"]
    if n_env == 0 or envelope_fn is None:
        return jnp.asarray(0.0, dtype=jnp.float64)

    env_params = pulse_params[:n_env]
    t_evol = pulse_params[-1]
    t_c = t_evol / 2.0

    t_samples = jnp.linspace(0.0, t_evol, n_fft)
    signal = jax.vmap(lambda t: envelope_fn(env_params, t, t_c))(t_samples)

    spectrum = jnp.fft.rfft(signal)
    psd = jnp.abs(spectrum) ** 2
    psd = psd / (jnp.sum(psd) + 1e-12)
    freqs = jnp.linspace(0.0, 1.0, len(psd))
    mean_freq = jnp.sum(freqs * psd)
    rms_bw = jnp.sqrt(jnp.sum((freqs - mean_freq) ** 2 * psd))
    return jnp.asarray(rms_bw, dtype=jnp.float64)


class CostFnRegistry:
    """Registry of cost functions available for pulse optimisation."""

    _REGISTRY: Dict[str, dict] = {
        "fidelity": {
            "fn": fidelity_cost_fn,
            "default_weight": (0.5, 0.5),
            "ckwargs_keys": ["pulse_scripts", "target_scripts", "n_samples"],
        },
        "unitary": {
            "fn": unitary_cost_fn,
            "default_weight": (0.5, 0.5),
            "ckwargs_keys": [
                "pulse_basis_scripts",
                "target_basis_scripts",
                "n_samples",
                "n_qubits",
            ],
        },
        "pulse_width": {
            "fn": pulse_width_cost_fn,
            "default_weight": 1.0,
            "ckwargs_keys": ["envelope"],
        },
        "evolution_time": {
            "fn": evolution_time_cost_fn,
            "default_weight": 1.0,
            "ckwargs_keys": ["t_target"],
        },
        "spectral_density": {
            "fn": spectral_density_cost_fn,
            "default_weight": 1.0,
            "ckwargs_keys": ["envelope"],
        },
    }

    @classmethod
    def available(cls) -> List[str]:
        return list(cls._REGISTRY.keys())

    @classmethod
    def register(cls, name: str, fn: Callable, default_weight, ckwargs_keys) -> None:
        """Register a new cost function at runtime."""
        cls._REGISTRY[name] = {
            "fn": fn,
            "default_weight": default_weight,
            "ckwargs_keys": list(ckwargs_keys),
        }

    @classmethod
    def get(cls, name: str) -> dict:
        if name not in cls._REGISTRY:
            raise ValueError(
                f"Unknown cost function '{name}'. Available: {cls.available()}"
            )
        return cls._REGISTRY[name]

    @classmethod
    def parse_cost_arg(
        cls, spec: Union[str, Tuple]
    ) -> Tuple[str, Union[float, Tuple[float, ...]]]:
        """Parse ``"name:w1,w2,..."`` into ``(name, weight)``."""
        if isinstance(spec, tuple):
            return spec
        if ":" in spec:
            name, weight_str = spec.split(":", 1)
            parts = [float(x) for x in weight_str.split(",")]
            weight: Union[float, Tuple[float, ...]] = (
                parts[0] if len(parts) == 1 else tuple(parts)
            )
        else:
            name = spec
            weight = cls.get(name)["default_weight"]

        got = len(weight) if isinstance(weight, tuple) else 1
        default_weight = cls.get(name)["default_weight"]
        expected = len(default_weight) if isinstance(default_weight, tuple) else 1
        if got != expected:
            raise ValueError(
                f"Cost function '{name}' expects {expected} weight(s), got {got}."
            )
        return name, weight


# ---------------------------------------------------------------------------
# QOC
# ---------------------------------------------------------------------------


class QOC:
    """Two-stage quantum optimal control for pulse-level gate synthesis."""

    GATES_1Q: List[str] = ["RX", "RY", "RZ", "Rot", "H"]
    GATES_2Q: List[str] = ["CX", "CY", "CZ", "CRX", "CRY", "CRZ"]

    DEFAULT_PARAM_RANGES = {
        1: [(0.05, 3.0)],
        2: [(0.05, 3.0), (0.05, 3.0)],
        3: [(0.05, 3.0)] * 3,
        4: [(0.05, 3.0)] * 4,
    }

    SCAN_REL_FACTORS: Tuple[float, ...] = (0.5, 0.75, 1.0, 1.25, 1.5)

    def __init__(
        self,
        envelope: str,
        cost_fns: List[Tuple[str, Union[float, Tuple[float, ...]]]],
        t_target: float,
        n_steps: int,
        n_samples: int,
        learning_rate: float,
        log_interval: int = 50,
        file_dir: str = None,
        warmup_ratio: float = 0.0,
        end_lr_ratio: float = 1.0,
        n_restarts: int = 1,
        restart_noise_scale: float = 0.5,
        grad_clip: float = 1.0,
        random_seed: int = 42,
        scan_steps: int = 0,
        scan_grid_size: int = 5,
        scan_ranges: Optional[List[Tuple[float, float]]] = None,
        log_scale_params: Optional[List[int]] = None,
        early_stop_patience: int = 0,
        early_stop_min_delta: float = 0.0,
        plot: bool = False,
    ):
        """Configure the optimiser; see the reference CLI for knob semantics."""
        self.envelope = envelope
        self.n_steps = n_steps
        self.n_samples = n_samples
        self.learning_rate = learning_rate
        self.warmup_ratio = warmup_ratio
        self.end_lr_ratio = end_lr_ratio
        self.log_interval = log_interval
        self.file_dir = (
            file_dir if file_dir else os.path.dirname(os.path.realpath(__file__))
        )
        self.t_target = t_target
        self.n_restarts = max(1, n_restarts)
        self.restart_noise_scale = restart_noise_scale
        self.grad_clip = grad_clip
        self.random_key = jax.random.PRNGKey(random_seed)
        self.scan_steps = scan_steps
        self.scan_grid_size = scan_grid_size
        self.scan_ranges = scan_ranges

        n_env = PulseEnvelope.get(envelope)["n_envelope_params"]
        if log_scale_params is not None:
            self.log_scale_params = log_scale_params
        elif n_env >= 2:
            self.log_scale_params = [0, -1]  # amplitude and evolution time
        else:
            self.log_scale_params = []
        self._log_mask_cache: Dict[int, jnp.ndarray] = {}

        self.early_stop_patience = max(0, int(early_stop_patience))
        self.early_stop_min_delta = float(early_stop_min_delta)
        self.plot = plot

        log.info(
            f"Training parameters: {self.n_steps} steps, {self.n_samples} "
            f"samples, {self.learning_rate} learning rate"
        )

        summed_weights = 0
        for name, _weight in cost_fns:
            CostFnRegistry.get(name)
            summed_weights += sum(_weight) if isinstance(_weight, tuple) else _weight
        assert jnp.isclose(summed_weights, 1.0, rtol=1e-8), (
            f"Cost function weights must sum to 1. Got {summed_weights}"
        )
        self.cost_fns = cost_fns

        PulseInformation.set_envelope(self.envelope)

    # ---------------------------------------------------------- persistence
    def save_results(self, gate: str, fidelity: float, pulse_params) -> None:
        """Write/merge per-gate optimised params + fidelity into the CSV."""
        if self.file_dir is None:
            return
        os.makedirs(self.file_dir, exist_ok=True)
        filename = os.path.join(self.file_dir, f"qoc_results_{self.envelope}.csv")

        rows = []
        if os.path.isfile(filename):
            with open(filename, newline="") as f:
                rows = list(csv.reader(f))

        entry = [gate, fidelity] + list(map(float, pulse_params))
        with open(filename, mode="w", newline="") as f:
            writer = csv.writer(f)
            match = False
            for row in rows:
                if row and row[0] == gate:
                    if fidelity <= float(row[1]):
                        log.warning(
                            f"Pulse parameters for {gate} already exist with "
                            f"higher fidelity ({row[1]} >= {fidelity})"
                        )
                    writer.writerow(entry)
                    match = True
                else:
                    writer.writerow(row)
            if not match:
                writer.writerow(entry)

    # --------------------------------------------------------- log-space
    def _log_mask(self, n: int) -> jnp.ndarray:
        cached = self._log_mask_cache.get(n)
        if cached is not None and cached.shape[0] == n:
            return cached
        mask = np.zeros(n, dtype=bool)
        for idx in self.log_scale_params:
            i = idx if idx >= 0 else n + idx
            if 0 <= i < n:
                mask[i] = True
        out = jnp.asarray(mask)
        self._log_mask_cache[n] = out
        return out

    def _to_log_space(self, params: jnp.ndarray) -> jnp.ndarray:
        """Replace log-scaled entries by ``log(|p| + eps)``."""
        if not self.log_scale_params:
            return params
        mask = self._log_mask(params.shape[0])
        return jnp.where(mask, jnp.log(jnp.abs(params) + 1e-12), params)

    def _from_log_space(self, log_params: jnp.ndarray) -> jnp.ndarray:
        """Inverse of :meth:`_to_log_space`."""
        if not self.log_scale_params:
            return log_params
        mask = self._log_mask(log_params.shape[0])
        return jnp.where(mask, jnp.exp(log_params), log_params)

    # ------------------------------------------------------------- stage 0
    def _build_scan_grid(
        self,
        n_params: int,
        init_pulse_params: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """Grid for Stage 0: user ranges > multiplicative around init > legacy."""
        if self.scan_ranges is not None:
            ranges = self.scan_ranges
            assert len(ranges) == n_params, (
                f"scan_ranges has {len(ranges)} entries but gate has "
                f"{n_params} parameters."
            )
            axes = [
                jnp.logspace(jnp.log10(lo), jnp.log10(hi), self.scan_grid_size)
                for lo, hi in ranges
            ]
        elif init_pulse_params is not None:
            if self.scan_grid_size == len(self.SCAN_REL_FACTORS):
                factors = jnp.array(self.SCAN_REL_FACTORS, dtype=jnp.float64)
            else:
                half = (self.scan_grid_size - 1) / 2.0
                factors = (
                    jnp.array([1.0], dtype=jnp.float64)
                    if half <= 0
                    else jnp.linspace(0.5, 1.5, self.scan_grid_size, dtype=jnp.float64)
                )
            axes = [factors * float(p) for p in init_pulse_params]
        else:
            ranges = self.DEFAULT_PARAM_RANGES.get(n_params, [(0.1, 10.0)] * n_params)
            axes = [
                jnp.logspace(jnp.log10(lo), jnp.log10(hi), self.scan_grid_size)
                for lo, hi in ranges
            ]

        grid = jnp.array(list(itertools.product(*axes)))
        return grid, axes

    def stage_0_opt(
        self, init_pulse_params: jnp.ndarray, total_cost: Callable
    ) -> Tuple[jnp.ndarray, Optional[Tuple[List[jnp.ndarray], list]]]:
        """Stage 0: grid scan with per-candidate fused Adam refinement.

        Uses the *same* weighted cost as Stage 1 (a fidelity-only scan can
        land in a phase-biased basin); non-finite candidates are skipped
        with the solver switched to throw=False for the scan's duration.
        """

        def total_cost_log(log_params, *args):
            return total_cost(self._from_log_space(log_params), *args)

        best_scan_params = init_pulse_params
        best_scan_loss = _safe_eval(total_cost, init_pulse_params)
        if not jnp.isfinite(best_scan_loss):
            log.warning(
                "Stage 0: initial pulse parameters produced a non-finite "
                "loss; falling back to a placeholder loss of +inf."
            )

        landscape_data: list = []
        axes_out: Optional[List[jnp.ndarray]] = None

        if self.scan_steps > 0:
            grid, axes_out = self._build_scan_grid(
                len(init_pulse_params), init_pulse_params=init_pulse_params
            )
            log.info(
                f"Stage 0: grid scan over {len(grid)} candidates, "
                f"{self.scan_steps} refinement steps each"
            )

            scan_optimizer = optax.chain(
                optax.clip_by_global_norm(self.grad_clip if self.grad_clip > 0 else 1.0),
                optax.adam(self.learning_rate * 2),
            )

            @jax.jit
            def refine_candidate(log_candidate):
                """scan_steps fused Adam steps; returns (params, failed)."""
                opt_state0 = scan_optimizer.init(log_candidate)

                def body(carry, _):
                    log_p, opt_state, failed = carry
                    loss, grads = jax.value_and_grad(total_cost_log)(log_p)
                    updates, opt_state = scan_optimizer.update(grads, opt_state, log_p)
                    new_log_p = optax.apply_updates(log_p, updates)
                    new_failed = failed | (~jnp.all(jnp.isfinite(new_log_p)))
                    new_log_p = jnp.where(new_failed, log_p, new_log_p)
                    return (new_log_p, opt_state, new_failed), loss

                (final_log_p, _, failed), _ = jax.lax.scan(
                    body,
                    (log_candidate, opt_state0, jnp.bool_(False)),
                    None,
                    length=self.scan_steps,
                )
                return final_log_p, failed

            prev_solver_defaults = js.Evolution.set_solver_defaults(throw=False)
            n_skipped = 0
            try:
                for ci, candidate in enumerate(grid):
                    log_candidate = self._to_log_space(candidate)
                    raw_loss = _safe_eval(total_cost, candidate)
                    try:
                        log_p, failed_flag = refine_candidate(log_candidate)
                    except Exception as exc:  # pragma: no cover - defensive
                        log.debug(f"  Candidate {ci} raised: {exc}; skipping.")
                        physical_p, loss = candidate, raw_loss
                    else:
                        if bool(failed_flag):
                            physical_p, loss = candidate, raw_loss
                        else:
                            physical_p = self._from_log_space(log_p)
                            if not jnp.all(jnp.isfinite(physical_p)):
                                physical_p, loss = candidate, raw_loss
                            else:
                                loss = _safe_eval(total_cost, physical_p)

                    # Keep the better of (raw, refined).
                    if jnp.isfinite(raw_loss) and (
                        not jnp.isfinite(loss) or raw_loss < loss
                    ):
                        physical_p, loss = candidate, raw_loss

                    if not jnp.isfinite(loss):
                        n_skipped += 1
                        continue
                    landscape_data.append((ci, candidate, float(loss)))
                    if loss < best_scan_loss:
                        best_scan_loss = loss
                        best_scan_params = physical_p
            finally:
                if prev_solver_defaults:
                    js.Evolution.set_solver_defaults(**prev_solver_defaults)

            if n_skipped:
                log.warning(
                    f"Stage 0: skipped {n_skipped}/{len(grid)} candidates due "
                    "to solver failure or non-finite loss."
                )
            log.info(
                f"Stage 0 complete. Best loss: {float(best_scan_loss):.6e}, "
                f"params: {best_scan_params}"
            )

        scan_data = (axes_out, landscape_data) if self.scan_steps > 0 else None
        return best_scan_params, scan_data

    # ------------------------------------------------------------- stage 1
    def stage_1_opt(
        self, best_scan_params: jnp.ndarray, total_costs: Callable
    ) -> Tuple[jnp.ndarray, list, jnp.ndarray]:
        """Stage 1: AdamW with warmup-cosine schedule, restarts, log-space."""

        def total_costs_log(log_params):
            return total_costs(self._from_log_space(log_params))

        warmup_steps = int(self.n_steps * self.warmup_ratio)
        end_value = self.learning_rate * self.end_lr_ratio
        if warmup_steps > 0 or self.end_lr_ratio < 1.0:
            schedule = optax.warmup_cosine_decay_schedule(
                init_value=(end_value if warmup_steps > 0 else self.learning_rate),
                peak_value=self.learning_rate,
                warmup_steps=warmup_steps,
                decay_steps=self.n_steps,
                end_value=end_value,
            )
        else:
            schedule = self.learning_rate
        optimizer = _build_optimizer(schedule, self.grad_clip)

        if self.n_restarts <= 1:
            return self._stage_1_sequential(
                best_scan_params, total_costs, total_costs_log, optimizer
            )
        return self._stage_1_parallel(
            best_scan_params, total_costs, total_costs_log, optimizer
        )

    def _perturb_starts(self, start_params: jnp.ndarray) -> jnp.ndarray:
        """(n_restarts, n_params) start matrix; restart 0 is unperturbed."""
        n_params = start_params.shape[0]
        keys = jax.random.split(self.random_key, self.n_restarts)
        noise = jax.vmap(lambda k: jax.random.normal(k, shape=(n_params,)))(keys)
        noise = noise.at[0].set(0.0)
        scale = jnp.maximum(jnp.abs(start_params), 0.1) * self.restart_noise_scale
        starts = start_params[None, :] + noise * scale[None, :]

        positive_mask = np.zeros(n_params, dtype=bool)
        positive_mask[-1] = True  # evolution time must stay positive
        for idx in self.log_scale_params:
            i = idx if idx >= 0 else n_params + idx
            if 0 <= i < n_params:
                positive_mask[i] = True
        return jnp.where(jnp.asarray(positive_mask)[None, :], jnp.abs(starts), starts)

    def _stage_1_sequential(
        self,
        start_params: jnp.ndarray,
        total_costs: Callable,
        total_costs_log: Callable,
        optimizer,
    ) -> Tuple[jnp.ndarray, list, jnp.ndarray]:
        """Single restart fused into one ``lax.scan`` with masked early stop."""
        log_params = self._to_log_space(start_params)
        opt_state = optimizer.init(log_params)
        init_loss = total_costs(start_params)

        min_delta = self.early_stop_min_delta
        patience = self.early_stop_patience
        eff_patience = patience if patience > 0 else self.n_steps + 1

        def scan_body(carry, _):
            (
                log_params,
                opt_state,
                best_loss,
                best_log_params,
                since_improve,
                stopped_flag,
                stopped_step,
                step_idx,
            ) = carry
            loss, grads = jax.value_and_grad(total_costs_log)(log_params)
            updates, new_opt_state = optimizer.update(grads, opt_state, log_params)
            stepped = optax.apply_updates(log_params, updates)

            improved = loss < best_loss - min_delta
            best_loss = jnp.where(improved, loss, best_loss)
            best_log_params = jnp.where(improved, log_params, best_log_params)
            since_improve = jnp.where(
                improved, jnp.int32(0), since_improve + jnp.int32(1)
            )

            trigger = since_improve >= jnp.int32(eff_patience)
            new_stopped = stopped_flag | trigger
            stopped_step = jnp.where(
                stopped_flag,
                stopped_step,
                jnp.where(trigger, step_idx + jnp.int32(1), stopped_step),
            )

            new_log_params = jnp.where(new_stopped, log_params, stepped)
            new_opt_state_kept = jax.tree_util.tree_map(
                lambda new, old: jnp.where(new_stopped, old, new),
                new_opt_state,
                opt_state,
            )
            return (
                new_log_params,
                new_opt_state_kept,
                best_loss,
                best_log_params,
                since_improve,
                new_stopped,
                stopped_step,
                step_idx + jnp.int32(1),
            ), loss

        init_carry = (
            log_params,
            opt_state,
            init_loss,
            log_params,
            jnp.int32(0),
            jnp.bool_(False),
            jnp.int32(self.n_steps),
            jnp.int32(0),
        )

        @jax.jit
        def run_scan(carry):
            return jax.lax.scan(scan_body, carry, None, length=self.n_steps)

        final_carry, step_losses = run_scan(init_carry)
        _, _, best_loss, best_log_params, _, stopped_flag, stopped_step, _ = final_carry

        host_losses, host_best, host_stopped, host_step = jax.device_get(
            (step_losses, best_loss, stopped_flag, stopped_step)
        )
        for step in range(0, self.n_steps, max(1, self.log_interval)):
            log.info(f"Step {step}/{self.n_steps}, Loss: {float(host_losses[step]):.3e}")
        if bool(host_stopped):
            log.info(f"Early stop at step {int(host_step)}/{self.n_steps}.")
        log.info(f"Restart 1/1 finished with best loss: {float(host_best):.3e}")

        loss_history = [init_loss] + list(step_losses)
        return self._from_log_space(best_log_params), loss_history, best_loss

    def _stage_1_parallel(
        self,
        start_params: jnp.ndarray,
        total_costs: Callable,
        total_costs_log: Callable,
        optimizer,
    ) -> Tuple[jnp.ndarray, list, jnp.ndarray]:
        """All restarts x all steps vmapped+scanned into one XLA program."""
        params_batch = self._perturb_starts(start_params)
        log.info(
            f"Stage 1 (parallel): vmapping {self.n_restarts} restarts x "
            f"{self.n_steps} steps in a single fused program."
        )

        log_params_batch = jax.vmap(self._to_log_space)(params_batch)
        opt_state_batch = jax.vmap(optimizer.init)(log_params_batch)
        init_losses = jax.vmap(total_costs)(params_batch)

        def opt_step(log_params, opt_state):
            loss, grads = jax.value_and_grad(total_costs_log)(log_params)
            updates, opt_state = optimizer.update(grads, opt_state, log_params)
            return optax.apply_updates(log_params, updates), opt_state, loss

        v_opt_step = jax.vmap(opt_step, in_axes=(0, 0))

        def scan_body(carry, _):
            log_params, opt_state, prev_log_params, best_loss, best_log_params = carry
            new_log_params, new_opt_state, loss = v_opt_step(log_params, opt_state)
            improved = loss < best_loss
            best_loss = jnp.where(improved, loss, best_loss)
            best_log_params = jnp.where(
                improved[:, None], prev_log_params, best_log_params
            )
            return (
                new_log_params,
                new_opt_state,
                log_params,
                best_loss,
                best_log_params,
            ), loss

        init_carry = (
            log_params_batch,
            opt_state_batch,
            log_params_batch,
            init_losses,
            log_params_batch,
        )

        @jax.jit
        def run_scan(carry):
            return jax.lax.scan(scan_body, carry, None, length=self.n_steps)

        final_carry, step_losses = run_scan(init_carry)
        _, _, _, best_losses, best_log_params_batch = final_carry

        host_best_losses = jax.device_get(best_losses)
        for r in range(self.n_restarts):
            log.info(
                f"Restart {r + 1}/{self.n_restarts} finished with best loss: "
                f"{float(host_best_losses[r]):.3e}"
            )

        winner = int(jnp.argmin(best_losses))
        global_best_loss = best_losses[winner]
        global_best_params = self._from_log_space(best_log_params_batch[winner])
        winner_history = [init_losses[winner]]
        winner_history.extend(step_losses[:, winner])
        return global_best_params, winner_history, global_best_loss

    # ------------------------------------------------------------- plotting
    def plot_loss_landscape(
        self, gate_name: str, grid_axes: List[jnp.ndarray], landscape_data: list
    ) -> None:
        """Save a Phase-0 loss-landscape figure (1-D/2-D/sorted scatter)."""
        import matplotlib.pyplot as plt

        if not landscape_data:
            log.warning("plot_loss_landscape: no landscape data to plot, skipping.")
            return
        os.makedirs(self.file_dir, exist_ok=True)
        n_params = len(grid_axes)
        indices, _params_list, losses = zip(*landscape_data)
        losses_arr = np.array(losses, dtype=float)

        fig, ax = plt.subplots(figsize=(8, 5))
        if n_params == 1:
            x = np.array([float(grid_axes[0][i]) for i in indices])
            sc = ax.scatter(x, losses_arr, c=losses_arr, cmap="viridis_r", s=60)
            fig.colorbar(sc, ax=ax, label="Loss")
            ax.set_xlabel("Parameter value")
            ax.set_xscale("log")
            ax.set_yscale("log")
        elif n_params == 2:
            n = self.scan_grid_size
            loss_grid = np.full((n, n), np.nan)
            for ci, _, loss in landscape_data:
                loss_grid[ci // n, ci % n] = loss
            masked = np.ma.masked_invalid(loss_grid)
            cmap = plt.cm.viridis_r.copy()
            cmap.set_bad(color="lightgrey")
            im = ax.imshow(
                masked,
                origin="lower",
                cmap=cmap,
                aspect="auto",
                extent=[
                    float(grid_axes[1][0]),
                    float(grid_axes[1][-1]),
                    float(grid_axes[0][0]),
                    float(grid_axes[0][-1]),
                ],
            )
            fig.colorbar(im, ax=ax, label="Loss")
        else:
            order = np.argsort(losses_arr)
            sc = ax.scatter(
                losses_arr[order],
                np.arange(len(order)),
                c=np.array(indices)[order],
                cmap="plasma",
                s=40,
            )
            fig.colorbar(sc, ax=ax, label="Trial number")
            ax.set_xlabel("Loss")
            ax.set_xscale("log")

        ax.set_title(f"Loss Landscape (Phase 0) — {gate_name}")
        fig.tight_layout()
        path = os.path.join(self.file_dir, f"{gate_name}_loss_landscape.png")
        fig.savefig(path, dpi=150)
        plt.close(fig)
        log.info(f"Loss landscape saved to {path}")

    def plot_loss_curve(self, gate_name: str, loss_history: list) -> None:
        """Save a Phase-1 training-loss curve figure."""
        import matplotlib.pyplot as plt

        if not loss_history:
            log.warning("plot_loss_curve: empty loss history, skipping.")
            return
        os.makedirs(self.file_dir, exist_ok=True)
        losses = [float(v) for v in loss_history]
        best = min(losses)

        fig, ax = plt.subplots(figsize=(9, 4))
        ax.plot(losses, linewidth=1.2, label="Loss")
        ax.axhline(best, color="red", linestyle="--", label=f"Best: {best:.3e}")
        ax.set_xlabel("Step")
        ax.set_ylabel("Loss")
        ax.set_yscale("log")
        ax.set_title(f"Training Loss (Phase 1) — {gate_name}")
        ax.legend()
        fig.tight_layout()
        path = os.path.join(self.file_dir, f"{gate_name}_loss_curve.png")
        fig.savefig(path, dpi=150)
        plt.close(fig)
        log.info(f"Loss curve saved to {path}")

    # ------------------------------------------------------------- per-gate
    def optimize(self, wires: int) -> Callable:
        """Decorator factory running the two-stage optimisation for a gate."""

        def decorator(create_circuits):
            def wrapper(init_pulse_params: jnp.ndarray = None):
                pulse_circuit, target_circuit = create_circuits()

                # Second script pair probing from |+>^n so rotation-axis
                # tilt is visible to the state-vector cost.
                def _with_plus_prep(circuit_fn):
                    def prepared(*args, **kwargs):
                        for q in range(wires):
                            op.H(wires=q)
                        circuit_fn(*args, **kwargs)

                    prepared.__name__ = f"plus_{circuit_fn.__name__}"
                    return prepared

                pulse_scripts = [
                    js.Script(pulse_circuit, n_qubits=wires),
                    js.Script(_with_plus_prep(pulse_circuit), n_qubits=wires),
                ]
                target_scripts = [
                    js.Script(target_circuit, n_qubits=wires),
                    js.Script(_with_plus_prep(target_circuit), n_qubits=wires),
                ]

                d_basis = 2**wires
                pulse_basis_scripts = [
                    js.Script(_with_basis_prep(pulse_circuit, k, wires), n_qubits=wires)
                    for k in range(d_basis)
                ]
                target_basis_scripts = [
                    js.Script(
                        _with_basis_prep(target_circuit, k, wires), n_qubits=wires
                    )
                    for k in range(d_basis)
                ]

                gate_name = create_circuits.__name__.split("_")[1]
                if init_pulse_params is None:
                    init_pulse_params = PulseInformation.gate_by_name(gate_name).params

                all_ckwargs = {
                    "pulse_scripts": pulse_scripts,
                    "target_scripts": target_scripts,
                    "pulse_basis_scripts": pulse_basis_scripts,
                    "target_basis_scripts": target_basis_scripts,
                    "envelope": self.envelope,
                    "n_samples": self.n_samples,
                    "n_qubits": wires,
                    "t_target": self.t_target,
                }

                def _build_cost(name, weight):
                    meta = CostFnRegistry.get(name)
                    return Cost(
                        cost=meta["fn"],
                        weight=weight,
                        ckwargs={
                            k: v
                            for k, v in all_ckwargs.items()
                            if k in meta["ckwargs_keys"]
                        },
                    )

                total_costs = None
                for name, weight in self.cost_fns:
                    total_costs = _build_cost(name, weight) + total_costs

                best_scan_params, scan_data = self.stage_0_opt(
                    init_pulse_params, total_costs
                )
                best_params, best_history, best_loss = self.stage_1_opt(
                    best_scan_params, total_costs
                )
                self.save_results(
                    gate=gate_name,
                    fidelity=1 - best_loss.item(),
                    pulse_params=best_params,
                )

                if self.plot:
                    if scan_data is not None:
                        grid_axes, landscape_items = scan_data
                        self.plot_loss_landscape(gate_name, grid_axes, landscape_items)
                    self.plot_loss_curve(gate_name, best_history)

                return best_params, best_history

            return wrapper

        return decorator

    @staticmethod
    def _gate_factories() -> Dict[str, Tuple[Callable, Callable]]:
        """Per-gate ``(pulse, target)`` pairs with symmetry-breaking preps."""
        return {
            "RX": _make_gate_pair(
                lambda w, pp: Gates.RX(w, 0, pulse_params=pp, gate_mode="pulse"),
                lambda w: op.RX(w, wires=0),
            ),
            "RY": _make_gate_pair(
                lambda w, pp: Gates.RY(w, 0, pulse_params=pp, gate_mode="pulse"),
                lambda w: op.RY(w, wires=0),
            ),
            "RZ": _make_gate_pair(
                lambda w, pp: Gates.RZ(w, 0, pulse_params=pp, gate_mode="pulse"),
                lambda w: op.RZ(w, wires=0),
                prep=lambda w: op.H(wires=0),
                post=lambda w: op.H(wires=0),
            ),
            "H": _make_gate_pair(
                lambda w, pp: Gates.H(0, pulse_params=pp, gate_mode="pulse"),
                lambda w: op.H(wires=0),
                prep=lambda w: op.RY(w, wires=0),
            ),
            "Rot": _make_gate_pair(
                lambda w, pp: Gates.Rot(
                    w, w * 2, w * 3, 0, pulse_params=pp, gate_mode="pulse"
                ),
                lambda w: op.Rot(w, w * 2, w * 3, wires=0),
                prep=lambda w: op.H(wires=0),
            ),
            "CX": _make_gate_pair(
                lambda w, pp: Gates.CX(wires=[0, 1], pulse_params=pp, gate_mode="pulse"),
                lambda w: op.CX(wires=[0, 1]),
                prep=_chain_gate_stages(
                    lambda w: op.RY(w, wires=0), lambda w: op.H(wires=1)
                ),
            ),
            "CY": _make_gate_pair(
                lambda w, pp: Gates.CY(wires=[0, 1], pulse_params=pp, gate_mode="pulse"),
                lambda w: op.CY(wires=[0, 1]),
                prep=_chain_gate_stages(
                    lambda w: op.RX(w, wires=0), lambda w: op.H(wires=1)
                ),
            ),
            "CZ": _make_gate_pair(
                lambda w, pp: Gates.CZ(wires=[0, 1], pulse_params=pp, gate_mode="pulse"),
                lambda w: op.CZ(wires=[0, 1]),
                prep=_chain_gate_stages(
                    lambda w: op.RY(w, wires=0), lambda w: op.H(wires=1)
                ),
            ),
            "CRX": _make_gate_pair(
                lambda w, pp: Gates.CRX(
                    w, wires=[0, 1], pulse_params=pp, gate_mode="pulse"
                ),
                lambda w: op.CRX(w, wires=[0, 1]),
                prep=lambda w: op.H(wires=0),
            ),
            "CRY": _make_gate_pair(
                lambda w, pp: Gates.CRY(
                    w, wires=[0, 1], pulse_params=pp, gate_mode="pulse"
                ),
                lambda w: op.CRY(w, wires=[0, 1]),
                prep=lambda w: op.H(wires=0),
            ),
            "CRZ": _make_gate_pair(
                lambda w, pp: Gates.CRZ(
                    w, wires=[0, 1], pulse_params=pp, gate_mode="pulse"
                ),
                lambda w: op.CRZ(w, wires=[0, 1]),
                prep=_chain_gate_stages(
                    lambda w: op.H(wires=0), lambda w: op.H(wires=1)
                ),
            ),
        }

    @staticmethod
    def _joint_gate_factories() -> Dict[str, Tuple[Callable, Callable]]:
        """Prep-free pairs for joint mode (the unitary cost needs no probes)."""
        table = {}
        for name in ("RX", "RY", "RZ"):
            table[name] = _make_gate_pair(
                (
                    lambda w, pp, _n=name: getattr(Gates, _n)(
                        w, wires=0, pulse_params=pp, gate_mode="pulse"
                    )
                ),
                lambda w, _n=name: getattr(op, _n)(w, wires=0),
            )
        table["H"] = _make_gate_pair(
            lambda w, pp: Gates.H(0, pulse_params=pp, gate_mode="pulse"),
            lambda w: op.H(wires=0),
        )
        for name in ("CZ", "CX"):
            table[name] = _make_gate_pair(
                (
                    lambda w, pp, _n=name: getattr(Gates, _n)(
                        wires=[0, 1], pulse_params=pp, gate_mode="pulse"
                    )
                ),
                lambda w, _n=name: getattr(op, _n)(wires=[0, 1]),
            )
        for name in ("CRX", "CRY", "CRZ"):
            table[name] = _make_gate_pair(
                (
                    lambda w, pp, _n=name: getattr(Gates, _n)(
                        w, wires=[0, 1], pulse_params=pp, gate_mode="pulse"
                    )
                ),
                lambda w, _n=name: getattr(op, _n)(w, wires=[0, 1]),
            )
        return table

    def _create_pair(self, gate_name: str) -> Tuple[Callable, Callable]:
        try:
            return self._gate_factories()[gate_name]
        except KeyError as exc:
            raise ValueError(f"No factory for gate {gate_name!r}.") from exc

    # Compatibility wrappers: qoc.create_<gate>
    def create_RX(self):
        return self._create_pair("RX")

    def create_RY(self):
        return self._create_pair("RY")

    def create_RZ(self):
        return self._create_pair("RZ")

    def create_H(self):
        return self._create_pair("H")

    def create_Rot(self):
        return self._create_pair("Rot")

    def create_CX(self):
        return self._create_pair("CX")

    def create_CY(self):
        return self._create_pair("CY")

    def create_CZ(self):
        return self._create_pair("CZ")

    def create_CRX(self):
        return self._create_pair("CRX")

    def create_CRY(self):
        return self._create_pair("CRY")

    def create_CRZ(self):
        return self._create_pair("CRZ")

    def create_CPhase(self):
        """(pulse, target) pair for CPhase with |+>|+> preparation."""

        def pulse_circuit(w, pulse_params):
            op.H(wires=0)
            op.H(wires=1)
            Gates.CPhase(w, wires=[0, 1], pulse_params=pulse_params, gate_mode="pulse")

        def target_circuit(w):
            op.H(wires=0)
            op.H(wires=1)
            op.ControlledPhaseShift(w, wires=[0, 1])

        return pulse_circuit, target_circuit

    def optimize_all(self, sel_gates, make_log: bool) -> None:
        """Per-gate optimisation over the selected gates; optional log CSV."""
        log_history: Dict[str, list] = {}
        for gate in self.GATES_1Q + self.GATES_2Q:
            if gate in sel_gates or "all" in sel_gates:
                n_wires = 1 if gate in self.GATES_1Q else 2
                opt = self.optimize(wires=n_wires)
                gate_factory = getattr(self, f"create_{gate}")
                log.info(f"Optimizing {gate} gate...")
                best_params, loss_history = opt(gate_factory)()
                best_fid = 1 - min(float(loss) for loss in loss_history)
                log.info(f"Best achieved fidelity: {best_fid * 100:.5f}%")
                log_history[gate] = log_history.get(gate, []) + loss_history

        if make_log:
            with open(os.path.join(self.file_dir, "qoc_logs.csv"), "w") as f:
                writer = csv.writer(f)
                writer.writerow(log_history.keys())
                writer.writerows(zip(*log_history.values()))

    # ------------------------------------------------------------ joint mode
    JOINT_LEAVES_DEFAULT: Tuple[str, ...] = ("RX", "RY", "RZ", "CZ")
    JOINT_TARGETS_DEFAULT: Tuple[str, ...] = (
        "RX",
        "RY",
        "RZ",
        "H",
        "CX",
        "CRX",
        "CRY",
        "CRZ",
    )
    # Composites are up-weighted: they are what fails tightened tests, and
    # the leaves start near-perfect so they would otherwise dominate.
    JOINT_WEIGHTS_DEFAULT: Dict[str, float] = {
        "RX": 0.3,
        "RY": 0.3,
        "RZ": 0.3,
        "H": 1.0,
        "CX": 2.0,
        "CRX": 3.0,
        "CRY": 3.0,
        "CRZ": 3.0,
    }
    # RX/RY differ only by a static carrier phase — share their envelope.
    JOINT_TIED_GROUPS_DEFAULT: Tuple[Tuple[str, ...], ...] = (("RX", "RY"),)

    def _build_joint_layout(
        self,
        leaf_names: Tuple[str, ...],
        tied_groups: Optional[Tuple[Tuple[str, ...], ...]] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, slice], List[int]]:
        """Joint theta layout: per-leaf slices (tied leaves share a slice)."""
        if tied_groups is None:
            tied_groups = self.JOINT_TIED_GROUPS_DEFAULT

        rep_of: Dict[str, str] = {n: n for n in leaf_names}
        leaf_set = set(leaf_names)
        for group in tied_groups:
            present = [n for n in group if n in leaf_set]
            if len(present) < 2:
                continue
            head = present[0]
            for member in present[1:]:
                rep_of[member] = head

        n_env = PulseEnvelope.get(self.envelope)["n_envelope_params"]

        leaf_slices: Dict[str, slice] = {}
        init_chunks = []
        log_idx: List[int] = []
        offset = 0
        for name in leaf_names:
            rep = rep_of[name]
            if rep != name:
                leaf_slices[name] = leaf_slices[rep]
                continue

            pp = PulseInformation.gate_by_name(name)
            assert pp is not None and pp.is_leaf, (
                f"_build_joint_layout: {name!r} is not a leaf gate"
            )
            tied_members = [m for m in leaf_names if rep_of[m] == name]
            if len(tied_members) > 1:
                # Shared init = elementwise mean so no member dominates.
                stacked = jnp.stack(
                    [
                        jnp.asarray(
                            PulseInformation.gate_by_name(m).params, dtype=jnp.float64
                        )
                        for m in tied_members
                    ]
                )
                chunk = jnp.mean(stacked, axis=0)
            else:
                chunk = jnp.asarray(pp.params, dtype=jnp.float64)
            n_p = chunk.shape[0]
            leaf_slices[name] = slice(offset, offset + n_p)
            init_chunks.append(chunk)
            if name in ("RX", "RY") and n_env >= 2:
                log_idx.append(offset)  # amplitude
                log_idx.append(offset + n_p - 1)  # evolution time
            offset += n_p

        return jnp.concatenate(init_chunks), leaf_slices, log_idx

    @staticmethod
    def _assemble_for_gate(
        theta: jnp.ndarray, pp_obj, leaf_slices: Dict[str, slice]
    ) -> jnp.ndarray:
        """Flat per-gate pulse params drawn from the joint theta."""
        if pp_obj.is_leaf:
            sl = leaf_slices.get(pp_obj.name)
            if sl is None:
                return jnp.asarray(pp_obj.params, dtype=jnp.float64)
            return theta[sl]
        return jnp.concatenate(
            [
                QOC._assemble_for_gate(theta, child, leaf_slices)
                for child in pp_obj.childs
            ]
        )

    def _joint_stage_0_coord_descent(
        self,
        init_theta: jnp.ndarray,
        leaf_slices: Dict[str, slice],
        total_cost: Callable,
    ) -> jnp.ndarray:
        """Per-leaf grid sweeps with greedy acceptance (O(sum) not O(prod))."""
        if self.scan_steps <= 0:
            log.info("Joint Stage 0: scan disabled (scan_steps=0); skipping.")
            return init_theta

        current = init_theta
        best_loss = _safe_eval(total_cost, current)
        log.info(
            f"Joint Stage 0: coordinate descent over {len(leaf_slices)} "
            f"leaves, init_loss={float(best_loss):.6e}"
        )

        prev_solver_defaults = js.Evolution.set_solver_defaults(throw=False)
        try:
            seen_slices: set = set()
            for leaf_name, sl in leaf_slices.items():
                key = (sl.start, sl.stop)
                if key in seen_slices:
                    continue
                seen_slices.add(key)
                leaf_init = current[sl]
                n_p = int(leaf_init.shape[0])
                if n_p == 0:
                    continue
                grid, _ = self._build_scan_grid(n_p, init_pulse_params=leaf_init)
                for cand in grid:
                    new_theta = current.at[sl].set(cand)
                    loss = _safe_eval(total_cost, new_theta)
                    if loss < best_loss:
                        best_loss = loss
                        current = new_theta
                log.info(
                    f"  Joint scan after leaf {leaf_name}: "
                    f"best_loss={float(best_loss):.6e}"
                )
        finally:
            if prev_solver_defaults:
                js.Evolution.set_solver_defaults(**prev_solver_defaults)
        return current

    def _create_joint_pair_for(self, gate_name: str):
        table = self._joint_gate_factories()
        if gate_name in table:
            return table[gate_name]
        log.warning(
            f"_create_joint_pair_for: no prep-free factory for {gate_name!r}; "
            f"falling back to create_{gate_name} (preps may hide errors)."
        )
        return self._create_pair(gate_name)

    def optimize_joint(
        self,
        target_gates: Optional[List[str]] = None,
        leaf_names: Optional[List[str]] = None,
        weights: Optional[Dict[str, float]] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, slice], list]:
        """Joint composite-aware optimisation of the shared leaf params."""
        target_gates = (
            list(target_gates) if target_gates else list(self.JOINT_TARGETS_DEFAULT)
        )
        leaf_names = list(leaf_names) if leaf_names else list(self.JOINT_LEAVES_DEFAULT)

        merged_weights: Dict[str, float] = dict(self.JOINT_WEIGHTS_DEFAULT)
        if weights:
            merged_weights.update({k: float(v) for k, v in weights.items()})
        weights = merged_weights

        log.info(f"Joint optimisation: leaves={leaf_names}, targets={target_gates}")
        init_theta, leaf_slices, joint_log_idx = self._build_joint_layout(
            tuple(leaf_names)
        )

        gate_specs: List[dict] = []
        for gname in target_gates:
            pp_obj = PulseInformation.gate_by_name(gname)
            if pp_obj is None:
                log.warning(f"  Skipping unknown gate {gname!r}.")
                continue
            n_wires = 1 if gname in self.GATES_1Q else 2
            d_basis = 2**n_wires
            pulse_circuit, target_circuit = self._create_joint_pair_for(gname)

            pulse_basis_scripts = [
                js.Script(_with_basis_prep(pulse_circuit, k, n_wires), n_qubits=n_wires)
                for k in range(d_basis)
            ]
            target_basis_scripts = [
                js.Script(_with_basis_prep(target_circuit, k, n_wires), n_qubits=n_wires)
                for k in range(d_basis)
            ]

            def _make_assembler(pp_obj=pp_obj):
                def assemble(theta):
                    return QOC._assemble_for_gate(theta, pp_obj, leaf_slices)

                return assemble

            gate_specs.append(
                {
                    "name": gname,
                    "n_qubits": n_wires,
                    "weight": float(weights.get(gname, 1.0)),
                    "assembler": _make_assembler(),
                    "pulse_basis_scripts": pulse_basis_scripts,
                    "target_basis_scripts": target_basis_scripts,
                }
            )

        # Reuse the unitary weight tuple for the joint objective.
        ((_, weight_tuple),) = (
            ((n, w) for n, w in self.cost_fns if n == "unitary")
            if any(n == "unitary" for n, _ in self.cost_fns)
            else ((None, (0.5, 0.5)),)
        )
        joint_cost = Cost(
            cost=joint_unitary_cost_fn,
            weight=weight_tuple,
            ckwargs={"gate_specs": gate_specs, "n_samples": self.n_samples},
        )

        prev_log_scale = self.log_scale_params
        self.log_scale_params = joint_log_idx
        self._log_mask_cache.clear()
        try:
            best_scan_theta = self._joint_stage_0_coord_descent(
                init_theta, leaf_slices, joint_cost
            )
            best_theta, best_history, best_loss = self.stage_1_opt(
                best_scan_theta, joint_cost
            )
        finally:
            self.log_scale_params = prev_log_scale
            self._log_mask_cache.clear()

        log.info(f"Joint optimisation done. final loss={float(best_loss):.6e}")

        joint_fid = float(1.0 - best_loss)
        for leaf_name, sl in leaf_slices.items():
            self.save_results(
                gate=leaf_name, fidelity=joint_fid, pulse_params=best_theta[sl]
            )
        # Make the new leaf defaults live in this process.
        for leaf_name, sl in leaf_slices.items():
            PulseInformation.gate_by_name(leaf_name).params = best_theta[sl]

        return best_theta, leaf_slices, best_history


default_qoc_params = {
    "envelope": "drag",
    "cost_fns": [("unitary", (0.5, 0.5))],
    "t_target": 0.5,
    "n_steps": 800,
    "n_samples": 20,
    "learning_rate": 0.0001,
    "warmup_ratio": 0.05,
    "end_lr_ratio": 0.01,
    "log_interval": 50,
    "file_dir": None,
    "n_restarts": 5,
    "restart_noise_scale": 0.01,
    "grad_clip": 1.0,
    "random_seed": 1000,
    "scan_steps": 20,
    "scan_grid_size": 4,
    "scan_ranges": None,
    "log_scale_params": None,
    "early_stop_patience": 0,
    "early_stop_min_delta": 0.0,
}


def profile_pulse_pipeline(
    gate: str = "RX",
    n_samples: int = 3,
    rwa: Optional[bool] = None,
    n_qubits: int = 1,
) -> dict:
    """Time JIT compile vs steady state of a pulse gate's fwd + value_and_grad."""
    import time

    with PulseInformation.preserve_state():
        if rwa is not None:
            PulseInformation.set_rwa(bool(rwa))
        from qml_essentials_tpu.pulse.pulses import PulseGates

        gate_op = getattr(op, gate)
        gate_pulse = getattr(PulseGates, gate)

        def pulse_circuit(theta, pp):
            gate_pulse(theta, wires=0, pulse_params=pp)

        def target_circuit(theta):
            gate_op(theta, wires=0)

        pulse_script = js.Script(pulse_circuit, n_qubits=n_qubits)
        target_script = js.Script(target_circuit, n_qubits=n_qubits)

        theta = jnp.asarray(jnp.pi / 4)
        pp = PulseInformation.gate_by_name(gate).params
        target_state = jax.lax.stop_gradient(
            target_script.execute(type="state", args=(theta,))
        )

        @jax.jit
        def fwd(theta, pp):
            return pulse_script.execute(type="state", args=(theta, pp))

        @jax.jit
        def loss_and_grad(pp):
            def loss_fn(p):
                state = pulse_script.execute(type="state", args=(theta, p))
                return 1.0 - jnp.abs(jnp.vdot(target_state, state)) ** 2

            return jax.value_and_grad(loss_fn)(pp)

        t0 = time.perf_counter()
        jax.block_until_ready(fwd(theta, pp))
        compile_fwd = time.perf_counter() - t0

        t0 = time.perf_counter()
        loss, grads = loss_and_grad(pp)
        jax.block_until_ready((loss, grads))
        compile_grad = time.perf_counter() - t0

        fwd_t, grad_t = [], []
        for _ in range(n_samples):
            t0 = time.perf_counter()
            jax.block_until_ready(fwd(theta, pp))
            fwd_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            loss, grads = loss_and_grad(pp)
            jax.block_until_ready((loss, grads))
            grad_t.append(time.perf_counter() - t0)

        result = {
            "gate": gate,
            "rwa": PulseInformation.get_rwa(),
            "compile_fwd": compile_fwd,
            "mean_fwd": float(np.mean(fwd_t)),
            "compile_grad": compile_grad,
            "mean_grad": float(np.mean(grad_t)),
            "loss": float(loss),
        }
        log.info(
            f"[profile] gate={gate} rwa={result['rwa']} "
            f"compile fwd/grad: {compile_fwd * 1e3:.1f}/"
            f"{compile_grad * 1e3:.1f} ms, mean fwd/grad: "
            f"{result['mean_fwd'] * 1e3:.1f}/{result['mean_grad'] * 1e3:.1f} ms"
        )
        return result


def _build_arg_parser() -> argparse.ArgumentParser:
    """CLI for pulse-level gate synthesis."""
    parser = argparse.ArgumentParser(
        description="Quantum Optimal Control — pulse-level gate synthesis."
    )
    parser.add_argument(
        "--gates",
        type=str,
        nargs="+",
        default=["RX", "RY", "RZ", "CZ"],
        choices=QOC.GATES_1Q + QOC.GATES_2Q + ["all"],
    )
    parser.add_argument("--log", action="store_true", default=False)
    parser.add_argument("--no-log", action="store_false", dest="log")
    parser.add_argument(
        "--envelope",
        type=str,
        default=default_qoc_params["envelope"],
        choices=PulseEnvelope.available(),
    )
    parser.add_argument(
        "--costs", type=str, nargs="+", default=default_qoc_params["cost_fns"]
    )
    parser.add_argument("--t_target", type=float, default=default_qoc_params["t_target"])
    parser.add_argument("--n_steps", type=int, default=default_qoc_params["n_steps"])
    parser.add_argument("--n_samples", type=int, default=default_qoc_params["n_samples"])
    parser.add_argument(
        "--learning_rate", type=float, default=default_qoc_params["learning_rate"]
    )
    parser.add_argument(
        "--warmup_ratio", type=float, default=default_qoc_params["warmup_ratio"]
    )
    parser.add_argument(
        "--end_lr_ratio", type=float, default=default_qoc_params["end_lr_ratio"]
    )
    parser.add_argument(
        "--log_interval", type=int, default=default_qoc_params["log_interval"]
    )
    parser.add_argument("--file_dir", type=str, default=default_qoc_params["file_dir"])
    parser.add_argument(
        "--n_restarts", type=int, default=default_qoc_params["n_restarts"]
    )
    parser.add_argument(
        "--restart_noise_scale",
        type=float,
        default=default_qoc_params["restart_noise_scale"],
    )
    parser.add_argument("--grad_clip", type=float, default=default_qoc_params["grad_clip"])
    parser.add_argument(
        "--random_seed", type=int, default=default_qoc_params["random_seed"]
    )
    parser.add_argument("--scan_steps", type=int, default=default_qoc_params["scan_steps"])
    parser.add_argument(
        "--scan_grid_size", type=int, default=default_qoc_params["scan_grid_size"]
    )
    parser.add_argument(
        "--scan_ranges", type=str, nargs="*", default=default_qoc_params["scan_ranges"]
    )
    parser.add_argument("--plot", action="store_true", default=False)
    parser.add_argument(
        "--early_stop_patience",
        type=int,
        default=default_qoc_params["early_stop_patience"],
    )
    parser.add_argument(
        "--early_stop_min_delta",
        type=float,
        default=default_qoc_params["early_stop_min_delta"],
    )
    parser.add_argument("--joint", action="store_true", default=False)
    parser.add_argument("--joint_targets", nargs="+", type=str, default=None)
    parser.add_argument("--joint_leaves", nargs="+", type=str, default=None)
    parser.add_argument("--joint_weights", nargs="+", type=str, default=None)
    parser.add_argument("--rwa", action="store_true", default=False)
    parser.add_argument("--drive", action="store_true", default=False)
    return parser


def main(argv: Optional[List[str]] = None) -> None:
    """CLI entry point."""
    args = _build_arg_parser().parse_args(argv)

    scan_ranges = None
    if args.scan_ranges is not None:
        scan_ranges = []
        for pair in args.scan_ranges:
            lo, hi = pair.split(",")
            scan_ranges.append((float(lo), float(hi)))

    PulseInformation.set_rwa(args.rwa)
    PulseInformation.set_frame("drive" if args.drive else "lab")

    cost_fns = [CostFnRegistry.parse_cost_arg(spec) for spec in args.costs]

    logger = logging.getLogger("qml_essentials_tpu.pulse.qoc")
    logger.setLevel(logging.INFO)
    logger.addHandler(logging.StreamHandler())

    qoc = QOC(
        envelope=args.envelope,
        cost_fns=cost_fns,
        t_target=args.t_target,
        n_steps=args.n_steps,
        n_samples=args.n_samples,
        learning_rate=args.learning_rate,
        warmup_ratio=args.warmup_ratio,
        end_lr_ratio=args.end_lr_ratio,
        log_interval=args.log_interval,
        file_dir=args.file_dir,
        n_restarts=args.n_restarts,
        restart_noise_scale=args.restart_noise_scale,
        grad_clip=args.grad_clip,
        random_seed=args.random_seed,
        scan_steps=args.scan_steps,
        scan_grid_size=args.scan_grid_size,
        scan_ranges=scan_ranges,
        early_stop_patience=args.early_stop_patience,
        early_stop_min_delta=args.early_stop_min_delta,
        plot=args.plot,
    )

    if args.joint:
        joint_weights = None
        if args.joint_weights:
            joint_weights = {}
            for spec in args.joint_weights:
                gname, w = spec.split(":")
                joint_weights[gname.strip()] = float(w)
        qoc.optimize_joint(
            target_gates=args.joint_targets,
            leaf_names=args.joint_leaves,
            weights=joint_weights,
        )
    else:
        qoc.optimize_all(sel_gates=args.gates, make_log=args.log)


if __name__ == "__main__":
    main()
