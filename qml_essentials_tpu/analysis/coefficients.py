"""Fourier analysis of QML models.

Four components:

* :class:`Coefficients` — numerical spectrum via batched model evaluation on
  an input grid + on-device ``jnp.fft.fftn`` (trivially TPU-friendly: the
  grid rides the executor's fused batch path).
* :class:`FourierTree` — the analytic sine-cosine tree of Nemkov et al.
  (PhysRevA.108.032406): symbolic structure in host NumPy (exact dyadic
  arithmetic), parameter-dependent leaf factors in vectorised JAX.
* :class:`FCC` — Fourier-coefficient-correlation fingerprints
  (arXiv:2508.20868): NaN-tolerant pearson / complex-pearson / spearman /
  covariance over sampled spectra, with redundancy trimming and weighting.
* :class:`Datasets` — random model-compatible Fourier-series targets.

Reference parity: qml_essentials/coefficients.py (Coefficients 23-237,
FourierTree 240-963, FCC 966-1649, Datasets 1652-1788).
"""

from __future__ import annotations

import itertools
import logging
import math
import sys
import warnings
from collections import defaultdict
from functools import lru_cache, reduce
from typing import Any, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
from jax import random
from scipy.stats import rankdata

from qml_essentials_tpu.analysis.pauli import PauliCircuit
from qml_essentials_tpu.models.model import Model
from qml_essentials_tpu.ops.operations import PauliWord

log = logging.getLogger(__name__)


class Coefficients:
    """Numerical Fourier coefficients of a model via FFT over an input grid."""

    @classmethod
    def get_spectrum(
        cls,
        model: Model,
        mfs: int = 1,
        mts: int = 1,
        shift: bool = False,
        trim: bool = False,
        numerical_cap: Optional[float] = -1,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """FFT-extracted coefficients and frequencies of the model.

        Args:
            model: The model to sample.
            mfs: Frequency-domain oversampling multiplier.
            mts: Time-domain oversampling multiplier.
            shift: Apply fftshift to centre the spectrum.
            trim: Remove the Nyquist frequency from even spectra.
            numerical_cap: Zero out coefficients below this magnitude (and,
                for one feature, drop frequencies that vanish entirely).
        """
        kwargs.setdefault("force_mean", True)
        kwargs.setdefault("execution_type", "expval")

        coeffs, freqs = cls._fourier_transform(model, mfs=mfs, mts=mts, **kwargs)

        if not jnp.isclose(jnp.sum(coeffs).imag, 0.0, atol=1.0e-6):
            raise ValueError(
                f"Spectrum is not real. Imaginary part of coefficients is: "
                f"{jnp.sum(coeffs).imag}"
            )

        if trim:
            for ax in range(model.n_input_feat):
                if coeffs.shape[ax] % 2 == 0:
                    coeffs = np.delete(coeffs, len(coeffs) // 2, axis=ax)
                    freqs = [np.delete(freq, len(freq) // 2, axis=ax) for freq in freqs]

        if shift:
            coeffs = jnp.fft.fftshift(coeffs, axes=list(range(model.n_input_feat)))
            freqs = np.fft.fftshift(freqs)

        if numerical_cap is not None and numerical_cap > 0:
            coeffs = jnp.where(
                jnp.abs(coeffs) < numerical_cap, jnp.zeros_like(coeffs), coeffs
            )
            if model.n_input_feat == 1:
                if coeffs.ndim == 1:
                    surviving = coeffs != 0
                else:
                    surviving = jnp.any(coeffs != 0, axis=tuple(range(1, coeffs.ndim)))
                coeffs = coeffs[surviving]
                freqs = [freqs[0][surviving]]

        if len(freqs) == 1:
            freqs = freqs[0]
        return coeffs, freqs

    @classmethod
    def _fourier_transform(
        cls, model: Model, mfs: int, mts: int, **kwargs: Any
    ) -> Tuple[jnp.ndarray, list]:
        """Evaluate the model on a uniform grid and FFT the outputs."""
        n_freqs = jnp.array(
            [mfs * model.degree[i] for i in range(model.n_input_feat)]
        )
        start, stop, step = 0, 2 * mts * jnp.pi, 2 * jnp.pi / n_freqs
        inputs: List = [
            jnp.arange(start, stop, step[i]) for i in range(model.n_input_feat)
        ]

        nd_inputs = jnp.array(
            jnp.meshgrid(*[inputs[i] for i in range(model.n_input_feat)])
        ).T.reshape(-1, model.n_input_feat)

        outputs = model(inputs=nd_inputs, **kwargs)
        outputs = outputs.reshape(
            *[inputs[i].shape[0] for i in range(model.n_input_feat)], -1
        ).squeeze()

        coeffs = jnp.fft.fftn(outputs, axes=list(range(model.n_input_feat)))
        freqs = [
            jnp.fft.fftfreq(int(mts * n_freqs[i]), 1 / n_freqs[i])
            for i in range(model.n_input_feat)
        ]
        return coeffs / math.prod(outputs.shape[0 : model.n_input_feat]), freqs

    @classmethod
    def get_psd(cls, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Power spectral density of the coefficients."""

        def abs2(x):
            return x.real**2 + x.imag**2

        scale = 2.0 / (len(coeffs) ** 2)
        return scale * abs2(coeffs)

    @classmethod
    def evaluate_Fourier_series(
        cls,
        coefficients: jnp.ndarray,
        frequencies: jnp.ndarray,
        inputs: Union[jnp.ndarray, list, float],
    ) -> float:
        """Evaluate ``sum_w c_w exp(i w · x)`` at one or more input points."""
        coefficients = jnp.asarray(coefficients)

        def flatten_grid(freq_axes):
            freq_axes = [jnp.asarray(freq) for freq in freq_axes]
            freq_grid = jnp.stack(jnp.meshgrid(*freq_axes, indexing="ij"), axis=-1)
            flat_frequencies = freq_grid.reshape(-1, len(freq_axes))
            flat_coefficients = coefficients.reshape(
                flat_frequencies.shape[0], *coefficients.shape[len(freq_axes) :]
            )
            return flat_coefficients, flat_frequencies

        if isinstance(frequencies, list):
            flat_coefficients, flat_frequencies = flatten_grid(frequencies)
        else:
            frequencies = jnp.asarray(frequencies)
            if frequencies.ndim == 1:
                flat_frequencies = frequencies[:, jnp.newaxis]
                flat_coefficients = coefficients.reshape(
                    flat_frequencies.shape[0], *coefficients.shape[1:]
                )
            else:
                n_features, n_axis_freqs = frequencies.shape
                is_axis_frequencies = (
                    coefficients.shape[:n_features] == (n_axis_freqs,) * n_features
                )
                if is_axis_frequencies:
                    flat_coefficients, flat_frequencies = flatten_grid(frequencies)
                else:
                    flat_frequencies = frequencies
                    flat_coefficients = coefficients.reshape(
                        flat_frequencies.shape[0], *coefficients.shape[1:]
                    )

        inputs = jnp.asarray(inputs)
        if inputs.ndim == 0:
            inputs = inputs.reshape(1, 1)
        elif inputs.ndim == 1:
            if flat_frequencies.shape[1] == 1:
                inputs = inputs[:, jnp.newaxis]
            elif inputs.shape[0] == flat_frequencies.shape[1]:
                inputs = inputs[jnp.newaxis, :]
            else:
                inputs = jnp.repeat(
                    inputs[:, jnp.newaxis], flat_frequencies.shape[1], axis=1
                )
        exponents = jnp.exp(1j * (inputs @ flat_frequencies.T))
        exp = jnp.tensordot(exponents, flat_coefficients, axes=([1], [0]))
        return jnp.squeeze(jnp.real(exp))


class FourierTree:
    """Analytic sine-cosine coefficient tree (Nemkov et al.).

    The symbolic structure (which rotations contribute sine/cosine factors
    to which leaf, leaf observables, frequency/weight matrices) is built
    once in exact host NumPy; only the parameter-dependent leaf factors are
    evaluated in JAX, so the spectrum stays differentiable.

    Usage::

        tree = FourierTree(model)
        exp = tree()                          # expectation value
        coeff_list, freq_list = tree.get_spectrum()
    """

    def __init__(self, model: Model):
        self.model = model
        self.n_qubits = model.n_qubits

        self._params = self._single_param_set(model.params)

        # Canonical Pauli-Clifford structure at a fixed base input (the base
        # value only sets angles, never which Pauli words appear).
        base_inputs = np.ones(model.n_input_feat)
        operations, observables = self._build_canonical_tape(self._params, base_inputs)

        self.parameters = [
            jnp.squeeze(p) for p in PauliCircuit.get_parameters(operations)
        ]
        self.n_params = len(self.parameters)

        self.pauli_words: List[PauliWord] = [
            PauliWord.from_operation(op, self.n_qubits) for op in operations
        ]

        # Cumulative X/Y support for light-cone early stopping.
        self.cumulative_xy: List[np.ndarray] = []
        running = np.zeros(self.n_qubits, dtype=bool)
        for pw in self.pauli_words:
            running = np.logical_or(running, pw.xy_mask)
            self.cumulative_xy.append(running.copy())

        self.observable_words: List[PauliWord] = [
            PauliWord.from_operation(obs, self.n_qubits) for obs in observables
        ]

        self._detect_inputs(base_inputs)
        self._structure_built = False

    # ------------------------------------------------------------ plumbing
    def _ensure_structure(self) -> None:
        if not self._structure_built:
            self._build_leaf_arrays()
            self._build_spectrum_structure()
            self._structure_built = True

    def _single_param_set(self, params) -> jnp.ndarray:
        """De-batch model parameters; the tree describes a single set."""
        params = jnp.asarray(params)
        if params.ndim > 2 and params.shape[0] > 1:
            warnings.warn(
                f"FourierTree supports a single parameter set; using the first "
                f"of {params.shape[0]} batched parameter sets.",
                UserWarning,
            )
            params = params[0]
        return params

    def _build_canonical_tape(self, params, inputs):
        """Record the circuit and bring it to Pauli-Clifford normal form."""
        params = self._single_param_set(params)
        inputs = self.model._inputs_validation(inputs)
        raw_tape = self.model.script._record(params=params, inputs=inputs)
        _, obs_list = self.model._build_obs()
        return PauliCircuit.from_parameterised_circuit(
            raw_tape, observables=obs_list, n_qubits=self.n_qubits
        )

    def _canonical_parameters(self, inputs) -> np.ndarray:
        """Canonical rotation angles recorded for the given inputs."""
        operations, _ = self._build_canonical_tape(self._params, inputs)
        return np.array(
            [float(jnp.squeeze(p)) for p in PauliCircuit.get_parameters(operations)]
        )

    def _detect_inputs(self, base_inputs: np.ndarray) -> None:
        """Find the input-encoding columns by finite-differencing the angles.

        Every canonical rotation angle is affine in the inputs (encodings are
        linear; Clifford commutation flips signs only), so perturbing one
        feature at a time isolates the columns depending on it together with
        the signed integer frequency scaling.
        """
        tol = 1e-6
        d = self.model.n_input_feat
        base = np.asarray(base_inputs, dtype=float)
        p_base = np.array([float(p) for p in self.parameters])

        response = np.zeros((d, self.n_params))
        for f in range(d):
            step = base.copy()
            step[f] += 1.0
            response[f] = self._canonical_parameters(step) - p_base

        input_indices: Dict[int, list] = defaultdict(list)
        all_input_indices: List[int] = []
        scaling = np.ones(self.n_params, dtype=np.int64)
        for k in range(self.n_params):
            feats = np.flatnonzero(np.abs(response[:, k]) > tol)
            if feats.size == 0:
                continue
            if feats.size > 1:
                raise NotImplementedError(
                    f"Rotation {k} depends on multiple input features "
                    f"{feats.tolist()}; the Fourier tree requires each encoding "
                    "rotation to be linear in a single feature."
                )
            f = int(feats[0])
            omega = float(response[f, k])
            w = int(round(omega))
            if abs(omega - w) > tol:
                warnings.warn(
                    f"Non-integer input scaling {omega:.4f} on rotation {k} "
                    f"(feature {f}); rounding to {w}. The Fourier tree supports "
                    "integer frequency scalings only.",
                    UserWarning,
                )
            input_indices[f].append(k)
            all_input_indices.append(k)
            scaling[k] = w

        self.input_indices = input_indices
        self.all_input_indices = all_input_indices
        self.input_scaling = scaling
        input_set = set(all_input_indices)
        self.var_positions = np.array(
            [i for i in range(self.n_params) if i not in input_set], dtype=np.int64
        )
        self.features = sorted(input_indices.keys())

    # ------------------------------------------------- symbolic structure
    def _build_leaf_arrays(self) -> None:
        """Enumerate tree leaves per root into (S, C, terms) count matrices.

        Uses the C++ enumerator (qml_essentials_tpu.native) when available —
        the recursion is the exponential host-side hot loop — with the
        Python implementation as a transparent fallback.
        """
        from qml_essentials_tpu import native

        self.leaf_arrays: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for obs_word in self.observable_words:
            result = native.enumerate_leaves(
                self.pauli_words, obs_word, self.n_qubits
            )
            if result is not None:
                self.leaf_arrays.append(result)
                continue

            leaves: List[Tuple[np.ndarray, np.ndarray, complex]] = []
            zeros = np.zeros(self.n_params, dtype=np.int64)
            self._collect_leaves(
                obs_word, self.n_params - 1, zeros.copy(), zeros.copy(), leaves
            )
            if leaves:
                S = np.stack([leaf[0] for leaf in leaves])
                C = np.stack([leaf[1] for leaf in leaves])
                terms = np.array([leaf[2] for leaf in leaves], dtype=np.complex128)
            else:
                S = np.zeros((0, self.n_params), dtype=np.int64)
                C = np.zeros((0, self.n_params), dtype=np.int64)
                terms = np.zeros(0, dtype=np.complex128)
            self.leaf_arrays.append((S, C, terms))

    def _collect_leaves(
        self,
        observable: PauliWord,
        pauli_idx: int,
        sin_counts: np.ndarray,
        cos_counts: np.ndarray,
        leaves: List[Tuple[np.ndarray, np.ndarray, complex]],
    ) -> None:
        """Depth-first leaf enumeration with light-cone pruning."""
        if self._early_stopping_possible(pauli_idx, observable):
            return

        while pauli_idx >= 0:
            last = self.pauli_words[pauli_idx]
            if not observable.commutes_with(last):
                break
            pauli_idx -= 1
        else:  # leaf reached
            term = observable.zero_expectation()
            if term != 0:
                leaves.append((sin_counts, cos_counts, term))
            return

        last = self.pauli_words[pauli_idx]

        cos_left = cos_counts.copy()
        cos_left[pauli_idx] += 1
        self._collect_leaves(
            observable, pauli_idx - 1, sin_counts.copy(), cos_left, leaves
        )

        sin_right = sin_counts.copy()
        sin_right[pauli_idx] += 1
        self._collect_leaves(
            last.compose(observable),
            pauli_idx - 1,
            sin_right,
            cos_counts.copy(),
            leaves,
        )

    def _early_stopping_possible(self, pauli_idx: int, observable: PauliWord) -> bool:
        """Light cone: an X/Y on the observable must be reachable by some
        remaining rotation's X/Y support, else the node is identically zero."""
        obs_iz = np.logical_not(observable.xy_mask)
        combined = np.logical_or(obs_iz, self.cumulative_xy[pauli_idx]).all()
        return not bool(combined)

    def _build_spectrum_structure(self) -> None:
        """Per root: frequency vectors and the (n_freq, n_leaves) weight W
        with ``coeffs = W @ (terms * variational_factors)``."""
        self.freqs_per_root: List[np.ndarray] = []
        self.weights_per_root: List[np.ndarray] = []
        d = len(self.features)

        for S, C, _ in self.leaf_arrays:
            n_leaves = S.shape[0]
            freq_to_col: Dict[tuple, np.ndarray] = defaultdict(
                lambda: np.zeros(n_leaves, dtype=np.complex128)
            )
            for leaf in range(n_leaves):
                # Expand each active input column individually (columns of
                # the same feature may carry different integer scalings).
                col_factors: List[List[Tuple[int, int, float]]] = []
                half_exp = 0
                for axis, feat in enumerate(self.features):
                    for k in self.input_indices[feat]:
                        s = int(S[leaf, k])
                        c = int(C[leaf, k])
                        if s == 0 and c == 0:
                            continue
                        half_exp += s + c
                        w_k = int(self.input_scaling[k])
                        col_factors.append(
                            [
                                (axis, int(o) * w_k, wt)
                                for o, wt in self._binomial_terms(s, c)
                            ]
                        )
                half = 0.5**half_exp

                if d == 0:
                    freq_to_col[(0,)][leaf] += half
                    continue
                if not col_factors:
                    freq_to_col[(0,) * d][leaf] += half
                    continue
                for combo in itertools.product(*col_factors):
                    omega = [0] * d
                    weight = half
                    for axis, o, wt in combo:
                        omega[axis] += o
                        weight *= wt
                    freq_to_col[tuple(omega)][leaf] += weight

            if freq_to_col:
                omegas = sorted(freq_to_col.keys())
                W = np.stack([freq_to_col[o] for o in omegas])
                freqs = np.array(omegas, dtype=np.int64)
            else:
                freqs = np.zeros((1, max(d, 1)), dtype=np.int64)
                W = np.zeros((1, n_leaves), dtype=np.complex128)

            if freqs.shape[1] == 1:
                freqs = freqs[:, 0]
            self.freqs_per_root.append(freqs)
            # W entries are dyadic rationals × {±1, ±i}: exact in float64,
            # which makes the symbolic zero-tests in get_exact_support exact.
            self.weights_per_root.append(W)

    @staticmethod
    def _binomial_terms(s: int, c: int) -> List[Tuple[int, float]]:
        """Expansion of ``cos^c x (i sin x)^s`` in ``e^{i omega x}``
        (without the global 0.5 factor): ``omega = 2a + 2b - s - c``."""
        terms = []
        for a in range(s + 1):
            for b in range(c + 1):
                weight = math.comb(s, a) * math.comb(c, b) * (-1) ** (s - a)
                terms.append((2 * a + 2 * b - s - c, float(weight)))
        return terms

    # ------------------------------------------------- numeric evaluation
    @staticmethod
    def _safe_pow(base: jnp.ndarray, exp: jnp.ndarray) -> jnp.ndarray:
        """``base ** exp`` correct for negative real bases and integer exps."""
        mag = jnp.abs(base)[None, :] ** exp
        sign = jnp.where(exp % 2 == 0, 1.0, jnp.sign(base)[None, :])
        return sign * mag

    _I_POW = None  # lazily jnp.array([1, 1j, -1, -1j])

    def _leaf_factors(
        self, S: np.ndarray, C: np.ndarray, columns: np.ndarray
    ) -> jnp.ndarray:
        """Vectorised per-leaf ``prod_i cos^C (i sin)^S`` over *columns*."""
        if FourierTree._I_POW is None:
            FourierTree._I_POW = jnp.array([1, 1j, -1, -1j])

        if S.shape[0] == 0:
            return jnp.zeros(0, dtype=jnp.complex64)

        theta = jnp.stack([self.parameters[i] for i in columns])
        S_sub = jnp.asarray(S[:, columns])
        C_sub = jnp.asarray(C[:, columns])

        cos_part = self._safe_pow(jnp.cos(theta), C_sub)
        sin_mag = self._safe_pow(jnp.sin(theta), S_sub)
        i_part = FourierTree._I_POW[S_sub % 4]
        return jnp.prod(cos_part * sin_mag * i_part, axis=1)

    def __call__(
        self,
        params: Optional[jnp.ndarray] = None,
        inputs: Optional[jnp.ndarray] = None,
        **kwargs,
    ) -> jnp.ndarray:
        """Expectation value(s) via the tree (matches the circuit expval)."""
        params = (
            self.model._params_validation(params)
            if params is not None
            else self.model.params
        )
        inputs = (
            self.model._inputs_validation(inputs)
            if inputs is not None
            else self.model._inputs_validation(1.0)
        )

        if kwargs.get("execution_type", "expval") != "expval":
            raise NotImplementedError(
                f'Currently, only "expval" execution type is supported when '
                f"building FourierTree. Got {kwargs.get('execution_type', 'expval')}."
            )
        if kwargs.get("noise_params", None) is not None:
            raise NotImplementedError(
                "Currently, noise is not supported when building FourierTree."
            )

        operations, _ = self._build_canonical_tape(params, inputs)
        self.parameters = [
            jnp.squeeze(p) for p in PauliCircuit.get_parameters(operations)
        ]

        self._ensure_structure()
        all_columns = np.arange(self.n_params, dtype=np.int64)
        results = []
        for S, C, terms in self.leaf_arrays:
            factors = self._leaf_factors(S, C, all_columns)
            results.append(jnp.real(jnp.sum(jnp.asarray(terms) * factors)))
        results = jnp.array(results)

        if kwargs.get("force_mean", False):
            return jnp.mean(results)
        return results

    def get_spectrum(
        self, force_mean: bool = False
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Analytic coefficients and frequencies, one entry per root."""
        self._ensure_structure()
        per_root_coeffs: List[jnp.ndarray] = []
        for (S, C, terms), W in zip(self.leaf_arrays, self.weights_per_root):
            leaf_const = jnp.asarray(terms) * self._leaf_factors(
                S, C, self.var_positions
            )
            per_root_coeffs.append(jnp.asarray(W) @ leaf_const)
        return self._combine_roots(per_root_coeffs, self.freqs_per_root, force_mean)

    def get_exact_support(self, method: str = "tree") -> List[np.ndarray]:
        """Exact symbolic frequency support (no parameter sampling).

        ``"tree"`` groups leaves by their square-free variational signature
        and tests the exact dyadic group sums; ``"dp"`` merges states on
        (rotation index, observable) and unions the expansion supports —
        scalable, single feature, cannot see cross-path cancellations.
        """
        if method == "dp":
            return self._support_dp()
        if method != "tree":
            raise ValueError(f"Unknown method '{method}'. Use 'tree' or 'dp'.")

        self._ensure_structure()
        supports = []
        for (S, C, terms), W, freqs in zip(
            self.leaf_arrays, self.weights_per_root, self.freqs_per_root
        ):
            freqs = np.asarray(freqs)
            n_leaves = S.shape[0]
            if n_leaves == 0:
                supports.append(freqs[:0])
                continue

            signature = np.hstack([S[:, self.var_positions], C[:, self.var_positions]])
            _, groups = np.unique(signature, axis=0, return_inverse=True)
            n_groups = int(groups.max()) + 1

            contrib = (W * terms[None, :]).T  # (n_leaves, n_freq)
            group_sums = np.zeros((n_groups, W.shape[0]), dtype=np.complex128)
            np.add.at(group_sums, groups, contrib)

            mask = (np.abs(group_sums) > 1e-12).any(axis=0)
            supports.append(freqs[mask])
        return supports

    def _support_dp(self) -> List[np.ndarray]:
        """Merged-state DP over (rotation index, bare observable) with
        achievable (s, c) input-count pairs as a bitmask per state."""
        if len(self.features) != 1:
            raise NotImplementedError(
                "The 'dp' support method currently supports exactly one input "
                "feature; use method='tree' for multi-feature models."
            )
        if self.all_input_indices and np.any(
            self.input_scaling[self.all_input_indices] != 1
        ):
            raise NotImplementedError(
                "The 'dp' support method does not support non-unit input "
                "frequency scaling (it aggregates sin/cos counts and cannot "
                "represent per-gate scalings); use method='tree'."
            )

        n = self.n_qubits
        is_input = np.zeros(self.n_params, dtype=bool)
        is_input[self.all_input_indices] = True
        n_inp = int(is_input.sum())
        stride = n_inp + 1  # bit index for (s, c) is s * stride + c

        def encode(word: PauliWord) -> Tuple[int, int]:
            x = z = 0
            for q in range(n):
                x |= int(word.x[q]) << q
                z |= int(word.z[q]) << q
            return x, z

        paulis = [encode(w) for w in self.pauli_words]
        cum_xy = []
        running = 0
        for xp, _ in paulis:
            running |= xp
            cum_xy.append(running)

        def parity(v: int) -> int:
            return bin(v).count("1") & 1

        def dp(idx: int, xo: int, zo: int, memo: dict) -> int:
            if idx >= 0 and (xo & ~cum_xy[idx]):
                return 0
            while idx >= 0:
                xp, zp = paulis[idx]
                if parity(xo & zp) ^ parity(zo & xp):
                    break
                idx -= 1
            else:
                return 1 if xo == 0 else 0
            key = (idx, xo, zo)
            hit = memo.get(key)
            if hit is not None:
                return hit
            xp, zp = paulis[idx]
            cos_child = dp(idx - 1, xo, zo, memo)
            sin_child = dp(idx - 1, xo ^ xp, zo ^ zp, memo)
            if is_input[idx]:
                val = (cos_child << 1) | (sin_child << stride)
            else:
                val = cos_child | sin_child
            memo[key] = val
            return val

        old_limit = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old_limit, self.n_params + 1000))
        try:
            supports = []
            for obs in self.observable_words:
                memo: dict = {}
                xo, zo = encode(obs)
                mask = dp(self.n_params - 1, xo, zo, memo)
                freqs: set = set()
                while mask:
                    bit = mask & -mask
                    i = bit.bit_length() - 1
                    freqs |= self._expansion_support(i // stride, i % stride)
                    mask ^= bit
                supports.append(np.array(sorted(freqs), dtype=np.int64))
        finally:
            sys.setrecursionlimit(old_limit)
        return supports

    @staticmethod
    @lru_cache(maxsize=None)
    def _expansion_support(s: int, c: int) -> frozenset:
        """Non-zero frequencies of ``cos^c x (i sin x)^s`` via the exact
        integer polynomial ``(t - 1)^s (t + 1)^c``."""
        coeffs = [1]
        for _ in range(s):  # multiply by (t - 1)
            new = [0] * (len(coeffs) + 1)
            for i, a in enumerate(coeffs):
                new[i + 1] += a
                new[i] -= a
            coeffs = new
        for _ in range(c):  # multiply by (t + 1)
            new = [0] * (len(coeffs) + 1)
            for i, a in enumerate(coeffs):
                new[i + 1] += a
                new[i] += a
            coeffs = new
        m = s + c
        return frozenset(2 * k - m for k, a in enumerate(coeffs) if a != 0)

    def _combine_roots(
        self,
        per_root_coeffs: List[jnp.ndarray],
        per_root_freqs: List[np.ndarray],
        force_mean: bool,
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Optionally average the per-root spectra on their frequency union."""
        if not force_mean:
            return (
                [jnp.asarray(c) for c in per_root_coeffs],
                [jnp.asarray(f) for f in per_root_freqs],
            )

        accum: Dict[tuple, complex] = defaultdict(complex)
        for coeffs, freqs in zip(per_root_coeffs, per_root_freqs):
            freqs_np = np.asarray(freqs)
            for k in range(freqs_np.shape[0]):
                key = (
                    (int(freqs_np[k]),)
                    if freqs_np.ndim == 1
                    else tuple(int(v) for v in freqs_np[k])
                )
                accum[key] += complex(coeffs[k])
        n_roots = max(len(per_root_coeffs), 1)
        keys = sorted(accum.keys())
        mean_coeffs = jnp.array([accum[k] / n_roots for k in keys])
        freq_arr = np.array(keys, dtype=np.int64)
        if freq_arr.shape[1] == 1:
            freq_arr = freq_arr[:, 0]
        return [mean_coeffs], [jnp.asarray(freq_arr)]


class FCC:
    """Fourier-coefficient-correlation fingerprints (arXiv:2508.20868)."""

    @classmethod
    def get_fcc(
        cls,
        model: Model,
        n_samples: int,
        random_key: Optional[jnp.ndarray] = None,
        method: Optional[str] = "pearson",
        scale: Optional[bool] = False,
        weight: Optional[bool] = False,
        trim_redundant: Optional[bool] = True,
        **kwargs,
    ) -> float:
        """Average |correlation| of sampled Fourier coefficients (the FCC)."""
        # Memory-efficient fast path: trim before correlating.
        if trim_redundant and not weight:
            _, coeffs, freqs = cls._calculate_coefficients(
                model, n_samples, random_key, scale, **kwargs
            )
            pos_idx = cls._calculate_mask(freqs)
            coeffs_flat = coeffs.reshape(-1, coeffs.shape[-1])
            coeffs_sub = coeffs_flat[pos_idx]

            fp = cls._correlate(coeffs_sub.transpose(), method=method)
            abs_fp = jnp.abs(fp)
            diag = jnp.abs(jnp.diagonal(fp))

            total_sum = jnp.nansum(abs_fp)
            total_count = jnp.sum(jnp.isfinite(abs_fp))
            diag_sum = jnp.nansum(diag)
            diag_count = jnp.sum(jnp.isfinite(diag))

            lower_sum = (total_sum - diag_sum) / 2.0
            lower_count = (total_count - diag_count) / 2.0
            return lower_sum / lower_count

        fingerprint, _ = cls.get_fourier_fingerprint(
            model,
            n_samples,
            random_key,
            method,
            scale,
            weight,
            trim_redundant=trim_redundant,
            **kwargs,
        )
        return cls.calculate_fcc(fingerprint)

    @classmethod
    def get_fourier_fingerprint(
        cls,
        model: Model,
        n_samples: int,
        random_key: Optional[jnp.ndarray] = None,
        method: Optional[str] = "pearson",
        scale: Optional[bool] = False,
        weight: Optional[bool] = False,
        trim_redundant: Optional[bool] = True,
        nan_to_one: Optional[bool] = False,
        **kwargs: Any,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Correlation matrix of sampled coefficients + frequency labels."""
        _, coeffs, freqs = cls._calculate_coefficients(
            model, n_samples, random_key, scale, **kwargs
        )

        if trim_redundant and not weight:
            pos_idx = cls._calculate_mask(freqs)
            pos_freqs = cls._flat_frequencies(freqs)[pos_idx]

            coeffs_flat = coeffs.reshape(-1, coeffs.shape[-1])
            coeffs_sub = coeffs_flat[pos_idx]
            fingerprint = cls._correlate(coeffs_sub.transpose(), method=method)

            if nan_to_one:
                fingerprint = jnp.where(jnp.isnan(fingerprint), 1.0, fingerprint)

            M = fingerprint.shape[0]
            lower_tri_mask = jnp.tri(M, k=-1, dtype=bool)
            fingerprint = jnp.where(lower_tri_mask, fingerprint, jnp.nan)

            row_mask = jnp.any(jnp.isfinite(fingerprint), axis=1)
            col_mask = jnp.any(jnp.isfinite(fingerprint), axis=0)
            fingerprint = fingerprint[row_mask][:, col_mask]
            return fingerprint, (pos_freqs[row_mask], pos_freqs[col_mask])

        fingerprint = cls._correlate(coeffs.transpose(), method=method)

        if nan_to_one:
            fingerprint = jnp.where(jnp.isnan(fingerprint), 1.0, fingerprint)

        fingerprint = (
            cls._weighting_mean(fingerprint, coeffs) if weight else fingerprint
        )

        if trim_redundant:
            pos_idx = cls._calculate_mask(freqs)
            pos_freqs = cls._flat_frequencies(freqs)[pos_idx]

            fingerprint = fingerprint[pos_idx][:, pos_idx]
            M = fingerprint.shape[0]
            lower_tri_mask = jnp.tri(M, k=-1, dtype=bool)
            fingerprint = jnp.where(lower_tri_mask, fingerprint, jnp.nan)

            row_mask = jnp.any(jnp.isfinite(fingerprint), axis=1)
            col_mask = jnp.any(jnp.isfinite(fingerprint), axis=0)
            fingerprint = fingerprint[row_mask][:, col_mask]
            return fingerprint, (pos_freqs[row_mask], pos_freqs[col_mask])

        return fingerprint, freqs

    @classmethod
    def calculate_fcc(cls, fourier_fingerprint: jnp.ndarray) -> float:
        """FCC of an existing fingerprint: mean absolute finite entry."""
        return jnp.nanmean(jnp.abs(fourier_fingerprint))

    @classmethod
    def _calculate_mask(cls, freqs: jnp.ndarray) -> jnp.ndarray:
        """Flat indices of the non-negative-frequency rows/cols (C order)."""
        freqs_arr = jnp.asarray(freqs)
        if freqs_arr.ndim == 1:
            pos_flat = freqs_arr >= 0
        else:
            axes_pos = [freqs_arr[i] >= 0 for i in range(freqs_arr.shape[0])]
            expanded = []
            n_axes = len(axes_pos)
            for i, p in enumerate(axes_pos):
                shape = [1] * n_axes
                shape[i] = p.shape[0]
                expanded.append(p.reshape(shape))
            nd_pos = reduce(jnp.logical_and, expanded)
            pos_flat = nd_pos.flatten()
        return jnp.where(pos_flat)[0]

    @classmethod
    def _flat_frequencies(cls, freqs: jnp.ndarray) -> jnp.ndarray:
        """Per-coefficient frequency labels in the C-order used above."""
        fa = jnp.asarray(freqs)
        if fa.ndim == 1:
            return fa
        grids = jnp.meshgrid(*[fa[i] for i in range(fa.shape[0])], indexing="ij")
        return jnp.stack(grids, axis=-1).reshape(-1, fa.shape[0])

    @classmethod
    def _calculate_coefficients(
        cls,
        model: Model,
        n_samples: int,
        random_key: Optional[jnp.ndarray] = None,
        scale: bool = False,
        **kwargs: Any,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Sampled (params, coefficients, frequencies) for the fingerprint."""
        if n_samples > 0:
            if scale:
                total_samples = int(
                    2**model.n_qubits * n_samples * model.n_input_feat
                )
                log.info(f"Using {total_samples} samples.")
            else:
                total_samples = n_samples
            model.initialize_params(random_key, repeat=total_samples)

        coeffs, freqs = Coefficients.get_spectrum(
            model, shift=True, trim=True, **kwargs
        )
        return model.params, coeffs, freqs

    @classmethod
    def _correlate(cls, mat: jnp.ndarray, method: str = "pearson") -> jnp.ndarray:
        """Correlate flattened coefficient axes with the chosen method."""
        assert len(mat.shape) >= 2, "Input matrix must have at least 2 dimensions"

        if method == "pearson":
            return cls._pearson(mat.reshape(mat.shape[0], -1))
        if method == "complex_pearson":
            return cls._complex_pearson(mat.reshape(mat.shape[0], -1))
        if method == "spearman":
            return cls._spearman(mat.reshape(mat.shape[0], -1))
        if method == "covariance":
            return cls._covariance(mat.reshape(mat.shape[0], -1))
        raise ValueError(
            f"Unknown correlation method: {method}. Must be 'pearson', "
            "'complex_pearson', 'spearman' or 'covariance'."
        )

    @classmethod
    def _covariance(cls, mat: jnp.ndarray, minp: Optional[int] = 1) -> jnp.ndarray:
        """NaN-tolerant Hermitian sample covariance between columns."""
        mat = jnp.asarray(mat)
        real_dtype = jnp.asarray(mat.real).dtype

        mask = jnp.isfinite(mat)
        fmask = mask.astype(real_dtype)
        safe = jnp.where(mask, mat, 0.0)

        nobs = fmask.T @ fmask
        nobs_safe = jnp.where(nobs > 0, nobs, 1.0)

        sum_x = safe.T @ fmask
        sum_y = fmask.T @ safe

        masked = safe * fmask
        sum_conj_xy = jnp.conj(masked).T @ masked

        sxy = sum_conj_xy - (jnp.conj(sum_x) * sum_y) / nobs_safe
        denom = jnp.where(nobs > 1, nobs - 1, jnp.nan)
        result = sxy / denom
        return jnp.where(nobs < minp, jnp.nan, result)

    @classmethod
    def _complex_pearson(
        cls, mat: jnp.ndarray, minp: Optional[int] = 1
    ) -> jnp.ndarray:
        """NaN-tolerant complex Pearson correlation (Hermitian normalised)."""
        mat = jnp.asarray(mat)
        real_dtype = jnp.asarray(mat.real).dtype

        mask = jnp.isfinite(mat)
        fmask = mask.astype(real_dtype)
        safe = jnp.where(mask, mat, 0.0)

        nobs = fmask.T @ fmask
        nobs_safe = jnp.where(nobs > 0, nobs, 1.0)

        sum_x = safe.T @ fmask
        sum_y = fmask.T @ safe

        masked = safe * fmask
        sum_conj_xy = jnp.conj(masked).T @ masked

        safe_abs_sq = jnp.abs(safe) ** 2
        sum_abs_x2 = safe_abs_sq.T @ fmask
        sum_abs_y2 = fmask.T @ safe_abs_sq

        ssx = sum_abs_x2 - jnp.abs(sum_x) ** 2 / nobs_safe
        ssy = sum_abs_y2 - jnp.abs(sum_y) ** 2 / nobs_safe
        sxy = sum_conj_xy - (jnp.conj(sum_x) * sum_y) / nobs_safe

        denom = jnp.sqrt(ssx * ssy)
        result = jnp.where(denom > 0, sxy / jnp.where(denom > 0, denom, 1.0), jnp.nan)
        magnitude = jnp.abs(result)
        result = jnp.where(magnitude > 1.0, result / magnitude, result)
        return jnp.where(nobs < minp, jnp.nan, result)

    @classmethod
    def _pearson(cls, mat: jnp.ndarray, minp: Optional[int] = 1) -> jnp.ndarray:
        """NaN-tolerant Pearson correlation (complex split into re/im rows)."""
        if jnp.iscomplexobj(mat):
            mat = jnp.concatenate([mat.real, mat.imag], axis=0)

        cov = cls._covariance(mat, minp=minp)
        std = jnp.sqrt(jnp.diagonal(cov))
        denom = std[:, None] * std[None, :]
        result = jnp.where(denom > 0, cov / jnp.where(denom > 0, denom, 1.0), jnp.nan)
        return jnp.clip(jnp.real(result), -1.0, 1.0)

    @classmethod
    def _spearman(cls, mat: jnp.ndarray, minp: Optional[int] = 1) -> jnp.ndarray:
        """NaN-tolerant Spearman correlation (rank-transformed Pearson)."""
        if jnp.iscomplexobj(mat):
            mat = jnp.concatenate([mat.real, mat.imag], axis=0)

        mat = jnp.asarray(mat)
        N, K = mat.shape
        if N < minp:
            return jnp.full((K, K), jnp.nan)

        mask = np.asarray(jnp.isfinite(mat))
        ranks = np.full((N, K), np.nan)
        mat_np = np.asarray(mat)
        for j in range(K):
            valid = mask[:, j]
            if valid.any():
                ranks[valid, j] = rankdata(mat_np[valid, j], method="average")
        ranks = jnp.asarray(ranks)

        rank_mask = jnp.isfinite(ranks)
        safe_ranks = jnp.where(rank_mask, ranks, 0.0)
        fmask = rank_mask.astype(ranks.dtype)
        nobs = fmask.T @ fmask

        sum_x = safe_ranks.T @ fmask
        sum_y = fmask.T @ safe_ranks
        sum_xy = safe_ranks.T @ safe_ranks
        safe_sq = safe_ranks**2
        sum_x2 = safe_sq.T @ fmask
        sum_y2 = fmask.T @ safe_sq

        nobs_safe = jnp.where(nobs > 0, nobs, 1.0)
        ssx = sum_x2 - sum_x**2 / nobs_safe
        ssy = sum_y2 - sum_y**2 / nobs_safe
        sxy = sum_xy - (sum_x * sum_y) / nobs_safe

        denom = jnp.sqrt(ssx * ssy)
        result = jnp.where(denom > 0, sxy / jnp.where(denom > 0, denom, 1.0), jnp.nan)
        result = jnp.clip(result, -1.0, 1.0)
        return jnp.where(nobs < minp, jnp.nan, result)

    @classmethod
    def _weighting_linear(cls, fourier_fingerprint: jnp.ndarray) -> jnp.ndarray:
        """Triangular ("tent") frequency weighting peaking at DC."""
        assert (
            fourier_fingerprint.shape[0] % 2 != 0
            and fourier_fingerprint.shape[1] % 2 != 0
        ), (
            "Correlation matrix must have odd dimensions. "
            "Hint: use `trim` argument when calling `get_spectrum`."
        )
        assert fourier_fingerprint.shape[0] == fourier_fingerprint.shape[1], (
            "Correlation matrix must be square."
        )
        N = fourier_fingerprint.shape[0]
        center = N // 2
        k = jnp.arange(N)
        u = (center - jnp.abs(k - center)) / (2 * center)
        return fourier_fingerprint * (u[:, None] + u[None, :])

    @classmethod
    def _weighting_mean(
        cls, fourier_fingerprint: jnp.ndarray, coeffs: jnp.ndarray
    ) -> jnp.ndarray:
        """Rank-1 weighting by mean coefficient magnitudes."""
        assert fourier_fingerprint.shape[0] == fourier_fingerprint.shape[1], (
            "Correlation matrix must be square."
        )
        assert len(coeffs.shape) >= 2, (
            "Coefficient matrix must contain coefficient axes and a sample axis."
        )
        coefficient_means = jnp.abs(jnp.mean(coeffs, axis=-1))
        coefficient_means = coefficient_means.T.reshape(-1)
        assert fourier_fingerprint.shape[0] == coefficient_means.shape[0], (
            "Correlation matrix size must match the number of Fourier coefficients."
        )
        return (
            fourier_fingerprint
            * coefficient_means[:, None]
            * coefficient_means[None, :]
        )


class Datasets:
    """Model-compatible random Fourier-series targets."""

    @classmethod
    def generate_fourier_series(
        cls,
        random_key: jnp.ndarray,
        model: Model,
        coefficients_min: float = 0.0,
        coefficients_max: float = 1.0,
        zero_centered: bool = False,
    ):
        """Random Fourier series over the model's frequency spectrum.

        Coefficients are drawn uniformly from an annulus in the complex
        plane with conjugate symmetry enforced, so the series is real.

        Returns ``[domain_samples, values, coefficients]``.
        """
        domain_samples = jnp.stack(
            jnp.meshgrid(
                *[jnp.arange(0, 2 * jnp.pi, 2 * jnp.pi / d) for d in model.degree]
            )
        ).T.reshape(-1, model.n_input_feat)

        frequencies = jnp.stack(jnp.meshgrid(*model.frequencies)).T.reshape(
            -1, model.n_input_feat
        )

        coefficients = cls.uniform_circle(
            random_key,
            low=coefficients_min,
            high=coefficients_max,
            size=math.prod(model.degree) // 2 + 1,
        )

        if zero_centered:
            coefficients = coefficients.at[0].set(0.0)
        else:
            coefficients = coefficients.at[0].set(coefficients[0].real)

        coefficients = jnp.concat(
            [jnp.flip(coefficients[..., 1:]).conjugate(), coefficients],
            axis=-1,
        )

        values = jnp.real(
            (
                jnp.exp(1j * (domain_samples @ frequencies.T)) * coefficients
            ).sum(axis=1)
            / coefficients.size
        )

        return [
            domain_samples.reshape(*model.degree, -1),
            values.reshape(model.degree),
            coefficients.reshape(model.degree),
        ]

    @classmethod
    def uniform_circle(
        cls,
        random_key: jnp.ndarray,
        size: Union[jnp.ndarray, List, int],
        low: float = 0.0,
        high: float = 1.0,
    ) -> jnp.ndarray:
        """Complex numbers uniform in an annulus ``low <= |z|^2 <= high``."""
        if isinstance(size, int):
            size = jnp.array([size])
        random_key, random_key1 = random.split(random_key)
        return jnp.sqrt(
            random.uniform(random_key, size, minval=low, maxval=high)
        ) * jnp.exp(2j * jnp.pi * random.uniform(random_key1, size))
