"""Entanglement measures: Meyer-Wallach, Bell, relative entropy, EoF, CE.

All measures consume a :class:`~qml_essentials_tpu.models.model.Model` and
run its circuit with overridden execution types; multi-register circuits
(Bell / SWAP tests) replay the model's variational tape on shifted qubit
registers via :func:`~qml_essentials_tpu.ops.tape.copy_to_tape`.

Reference parity: qml_essentials/entanglement.py (meyer_wallach 16-103,
bell_measurements 105-219, relative_entropy 221-372,
entanglement_of_formation 374-468, concentratable 470-684, separable
sampling 687-712).
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qml_essentials_tpu.analysis.math import logm_v
from qml_essentials_tpu.core import jaqsi as js
from qml_essentials_tpu.models.model import Model
from qml_essentials_tpu.ops import operations as op
from qml_essentials_tpu.ops.tape import copy_to_tape
from qml_essentials_tpu.utils import safe_random_split

log = logging.getLogger(__name__)


class Entanglement:
    """Entangling-capability measures over sampled model parameters."""

    @classmethod
    def meyer_wallach(
        cls,
        model: Model,
        n_samples: Optional[int],
        random_key: Optional[jax.Array] = None,
        scale: bool = False,
        **kwargs: Any,
    ) -> float:
        """Meyer-Wallach entangling capability (pure states), in [0, 1].

        Averages ``2 (1 - mean_j Tr rho_j^2)`` over sampled parameter sets
        (Meyer & Wallach 2002; sampling protocol of Sim et al. 2019).
        """
        if "noise_params" in kwargs:
            log.warning(
                "Meyer-Wallach measure not suitable for noisy circuits. "
                "Consider 'concentratable entanglement' instead."
            )

        if scale:
            n_samples = 2**model.n_qubits * n_samples

        if n_samples is not None and n_samples > 0:
            random_key = model.initialize_params(random_key, repeat=n_samples)

        kwargs.setdefault("inputs", None)
        rhos = model(execution_type="density", **kwargs).reshape(
            -1, 2**model.n_qubits, 2**model.n_qubits
        )
        ent = cls._compute_meyer_wallach_meas(rhos, model.n_qubits)
        log.debug(f"Variance of measure: {ent.var()}")
        return ent.mean()

    @classmethod
    def _compute_meyer_wallach_meas(
        cls, rhos: jnp.ndarray, n_qubits: int
    ) -> jnp.ndarray:
        """Per-sample Meyer-Wallach value from batched density matrices."""
        qb = list(range(n_qubits))

        def _single(rho):
            purity_sum = 0.0
            for j in range(n_qubits):
                keep = qb[:j] + qb[j + 1 :]
                reduced = js.partial_trace(rho, n_qubits, keep)
                purity_sum += jnp.trace((reduced @ reduced).real, axis1=-2, axis2=-1)
            return 2 * (1 - purity_sum / n_qubits)

        return jax.vmap(_single)(rhos)

    @classmethod
    def bell_measurements(
        cls,
        model: Model,
        n_samples: int,
        random_key: Optional[jax.Array] = None,
        scale: bool = False,
        **kwargs: Any,
    ) -> float:
        """Meyer-Wallach via Bell measurements on a doubled (2n) register."""
        if "noise_params" in kwargs:
            log.warning(
                "Bell Measurements not suitable for noisy circuits. "
                "Consider 'concentratable entanglement' instead."
            )

        if scale:
            n_samples = 2**model.n_qubits * n_samples

        n = model.n_qubits

        def _bell_circuit(params, inputs, pulse_params=None, random_key=None, **kw):
            def vari():
                model._variational(
                    params,
                    inputs,
                    pulse_params=pulse_params,
                    random_key=random_key,
                    **kw,
                )

            vari()  # first copy on wires 0..n-1
            copy_to_tape(vari, offset=n)  # second copy on wires n..2n-1
            for q in range(n):
                op.CX(wires=[q, q + n])
                op.H(wires=q)

        bell_script = js.Script(f=_bell_circuit, n_qubits=2 * n)

        if n_samples is not None and n_samples > 0:
            random_key = model.initialize_params(random_key, repeat=n_samples)
            params = model.params
        else:
            if len(model.params.shape) <= 2:
                params = model.params.reshape(1, *model.params.shape)
            else:
                log.info(f"Using sample size of model params: {model.params.shape[0]}")
                params = model.params

        n_samples = params.shape[0]
        inputs = model._inputs_validation(kwargs.get("inputs", None))

        if n_samples > 1:
            random_keys = safe_random_split(random_key, num=n_samples)
            result = bell_script.execute(
                type="probs",
                args=(params, inputs, model.pulse_params, random_keys),
                kwargs=kwargs,
                in_axes=(0, None, None, 0),
            )
        else:
            result = bell_script.execute(
                type="probs",
                args=(params, inputs, model.pulse_params, random_key),
                kwargs=kwargs,
            )

        # For each qubit pair (q, q+n): P(|11>) estimates (1 - purity)/2.
        per_qubit = []
        for q in range(n):
            per_qubit.append(js.marginalize_probs(result, 2 * n, [q, q + n]))
        exp = jnp.stack(per_qubit, axis=-2)  # (..., n, 4)
        exp = 1 - 2 * exp[..., -1]

        if not jnp.isclose(jnp.sum(exp.imag), 0, atol=1e-6):
            log.warning("Imaginary part of probabilities detected")
            exp = jnp.abs(exp)

        measure = 2 * (1 - exp.mean(axis=0))
        entangling_capability = min(max(float(measure.mean()), 0.0), 1.0)
        log.debug(f"Variance of measure: {measure.var()}")
        return entangling_capability

    @classmethod
    def relative_entropy(
        cls,
        model: Model,
        n_samples: int,
        n_sigmas: int,
        random_key: Optional[jax.Array] = None,
        scale: bool = False,
        **kwargs: Any,
    ) -> float:
        """Relative entropy of entanglement vs sampled separable states.

        Upper bound (nearest separable state is NP-hard); normalised by the
        GHZ state's relative entropy so results land in [0, 1].
        """
        dim = 2**model.n_qubits
        if scale:
            n_samples = dim * n_samples
            n_sigmas = dim * n_sigmas

        if random_key is None:
            random_key = model.random_key

        log_sigmas = sample_random_separable_states(
            model.n_qubits, n_samples=n_sigmas, random_key=random_key, take_log=True
        )
        random_key, _ = jax.random.split(random_key)

        if n_samples is not None and n_samples > 0:
            model.initialize_params(random_key, repeat=n_samples)
        else:
            if len(model.params.shape) <= 2:
                model.params = model.params.reshape(1, *model.params.shape)
            else:
                log.info(f"Using sample size of model params: {model.params.shape[0]}")

        rhos, log_rhos = cls._compute_log_density(model, **kwargs)

        rel_entropies = jnp.zeros((n_sigmas, model.params.shape[0]))
        for i, log_sigma in enumerate(log_sigmas):
            rel_entropies = rel_entropies.at[i].set(
                cls._compute_rel_entropies(rhos, log_rhos, log_sigma)
            )

        # GHZ relative entropy is maximal — use it for normalisation.
        ghz_model = Model(model.n_qubits, 1, "GHZ", data_reupload=False)
        rho_ghz, log_rho_ghz = cls._compute_log_density(ghz_model, **kwargs)
        ghz_entropies = cls._compute_rel_entropies(rho_ghz, log_rho_ghz, log_sigmas)

        normalised = rel_entropies / ghz_entropies
        entangling_capability = normalised.T.min(axis=1)
        log.debug(f"Variance of measure: {entangling_capability.var()}")
        return entangling_capability.mean()

    @classmethod
    def _compute_log_density(
        cls, model: Model, **kwargs
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Density matrices and their base-2 matrix logarithms."""
        kwargs.setdefault("inputs", None)
        rho = model(execution_type="density", **kwargs)
        rho = rho.reshape(-1, 2**model.n_qubits, 2**model.n_qubits)
        log_rho = logm_v(rho) / jnp.log(2)
        return rho, log_rho

    @classmethod
    def _compute_rel_entropies(
        cls,
        rhos: jnp.ndarray,
        log_rhos: jnp.ndarray,
        log_sigmas: jnp.ndarray,
    ) -> jnp.ndarray:
        """``S(rho || sigma) = Tr[rho (log rho - log sigma)]`` batched."""
        n_rhos = rhos.shape[0]
        if log_sigmas.ndim == 3:
            n_sigmas = log_sigmas.shape[0]
            rhos = jnp.tile(rhos, (n_sigmas, 1, 1))
            log_rhos = jnp.tile(log_rhos, (n_sigmas, 1, 1))
        else:
            n_sigmas = 1
            log_sigmas = log_sigmas[jnp.newaxis, ...].repeat(n_rhos, axis=0)

        def _single(rho, log_rho, log_sigma):
            prod = rho @ (log_rho - log_sigma)
            return jnp.abs(jnp.trace(prod, axis1=-2, axis2=-1))

        rel = jax.vmap(_single)(rhos, log_rhos, log_sigmas)
        if n_sigmas > 1:
            rel = rel.reshape(n_sigmas, n_rhos)
        return rel

    @classmethod
    def entanglement_of_formation(
        cls,
        model: Model,
        n_samples: int,
        random_key: Optional[jax.Array] = None,
        scale: bool = False,
        always_decompose: bool = False,
        **kwargs: Any,
    ) -> float:
        """Entanglement of formation via eigendecomposition into pure states.

        The decomposition is not unique; this reports the entanglement of
        *some* pure-state decomposition (arXiv:quant-ph/0504163).  Pure
        inputs reduce to Meyer-Wallach unless ``always_decompose``.
        """
        if scale:
            n_samples = 2**model.n_qubits * n_samples

        if n_samples is not None and n_samples > 0:
            model.initialize_params(random_key, repeat=n_samples)
        else:
            if len(model.params.shape) <= 2:
                model.params = model.params.reshape(1, *model.params.shape)
            else:
                log.info(f"Using sample size of model params: {model.params.shape[0]}")

        kwargs.setdefault("inputs", None)
        rhos = model(execution_type="density", **kwargs)
        rhos = rhos.reshape(-1, 2**model.n_qubits, 2**model.n_qubits)
        ent = cls._compute_entanglement_of_formation(
            rhos, model.n_qubits, always_decompose
        )
        return ent.mean()

    @classmethod
    def _compute_entanglement_of_formation(
        cls,
        rhos: jnp.ndarray,
        n_qubits: int,
        always_decompose: bool,
    ) -> jnp.ndarray:
        """Eigenvalue-weighted Meyer-Wallach over the eigenvector ensemble."""
        eigenvalues, eigenvectors = jnp.linalg.eigh(rhos)
        if not always_decompose and jnp.isclose(eigenvalues, 1.0).any(axis=-1).all():
            return cls._compute_meyer_wallach_meas(rhos, n_qubits)

        pure = np.einsum("sij,sik->sijk", eigenvectors, eigenvectors.conjugate())
        measures = cls._compute_meyer_wallach_meas(
            pure.reshape(-1, 2**n_qubits, 2**n_qubits), n_qubits
        )
        return np.einsum(
            "si,si->s", measures.reshape(-1, 2**n_qubits), eigenvalues
        )

    @classmethod
    def concentratable_entanglement(
        cls,
        model: Model,
        n_samples: int,
        random_key: Optional[jax.Array] = None,
        scale: bool = False,
        **kwargs: Any,
    ) -> float:
        """Concentratable entanglement via a 3n-qubit SWAP test
        (arXiv:2104.06923); valid for noisy circuits too."""
        n = model.n_qubits
        if scale:
            n_samples = 2**n * n_samples

        def _swap_test_circuit(params, inputs, pulse_params=None, random_key=None, **kw):
            def vari():
                model._variational(
                    params,
                    inputs,
                    pulse_params=pulse_params,
                    random_key=random_key,
                    **kw,
                )

            copy_to_tape(vari, offset=n)  # first copy on wires n..2n-1
            copy_to_tape(vari, offset=2 * n)  # second copy on wires 2n..3n-1
            for i in range(n):
                op.H(wires=i)
            for i in range(n):
                op.CSWAP(wires=[i, i + n, i + 2 * n])
            for i in range(n):
                op.H(wires=i)

        swap_script = js.Script(f=_swap_test_circuit, n_qubits=3 * n)

        if n_samples is not None and n_samples > 0:
            random_key = model.initialize_params(random_key, repeat=n_samples)
        else:
            if len(model.params.shape) <= 2:
                model.params = model.params.reshape(1, *model.params.shape)
            else:
                log.info(f"Using sample size of model params: {model.params.shape[0]}")

        params = model.params
        inputs = model._inputs_validation(kwargs.get("inputs", None))
        n_batch = params.shape[0]

        if n_batch > 1:
            random_keys = safe_random_split(random_key, num=n_batch)
            probs = swap_script.execute(
                type="probs",
                args=(params, inputs, model.pulse_params, random_keys),
                in_axes=(0, None, None, 0),
                kwargs=kwargs,
            )
        else:
            probs = swap_script.execute(
                type="probs",
                args=(params, inputs, model.pulse_params, random_key),
                kwargs=kwargs,
            )

        probs = js.marginalize_probs(probs, 3 * n, tuple(range(n)))
        ent = 1 - probs[..., 0]
        log.debug(f"Variance of measure: {ent.var()}")
        return float(ent.mean())

    @classmethod
    def concentratable_entanglement_estimation(
        cls,
        model: Model,
        n_samples: int,
        random_key: Optional[jax.Array] = None,
        scale: bool = False,
        **kwargs: Any,
    ) -> float:
        """Concentratable entanglement estimated from Bell-basis measurements
        on a doubled register with a composite SWAP observable."""
        n = model.n_qubits
        N = 2**n
        if scale:
            n_samples = N * n_samples

        def _bell_basis_measurement(
            params, inputs, pulse_params=None, random_key=None, **kw
        ):
            def vari():
                model._variational(
                    params,
                    inputs,
                    pulse_params=pulse_params,
                    random_key=random_key,
                    **kw,
                )

            copy_to_tape(vari, offset=0)
            copy_to_tape(vari, offset=n)
            for i in range(n):
                op.CX(wires=[i, i + n])
                op.H(wires=i)

        bell_basis_script = js.Script(f=_bell_basis_measurement, n_qubits=2 * n)

        if n_samples is not None and n_samples > 0:
            random_key = model.initialize_params(random_key, repeat=n_samples)
        else:
            if len(model.params.shape) <= 2:
                model.params = model.params.reshape(1, *model.params.shape)
            else:
                log.info(f"Using sample size of model params: {model.params.shape[0]}")

        params = model.params
        inputs = model._inputs_validation(kwargs.get("inputs", None))
        n_batch = params.shape[0]

        # SWAP in the Bell basis is diagonal: diag(1, 1, 1, -1).
        SWAP = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, -1]])
        CE_observable = op.Id([0, n], record=False) + op.Operation(
            [0, n], SWAP, record=False
        )
        for i in range(1, n):
            CE_observable = CE_observable @ (
                op.Id([i, i + n], record=False)
                + op.Operation([i, i + n], SWAP, record=False)
            )
        CE_observable = (1 / N) * CE_observable

        if n_batch > 1:
            random_keys = safe_random_split(random_key, num=n_batch)
            expvals = bell_basis_script.execute(
                type="expval",
                obs=[CE_observable],
                args=(params, inputs, model.pulse_params, random_keys),
                in_axes=(0, None, None, 0),
                kwargs=kwargs,
            )
        else:
            expvals = bell_basis_script.execute(
                type="expval",
                obs=[CE_observable],
                args=(params, inputs, model.pulse_params, random_key),
                kwargs=kwargs,
            )

        ent = 1 - expvals
        log.debug(f"Variance of measure: {ent.var()}")
        return float(ent.mean())


def sample_random_separable_states(
    n_qubits: int,
    n_samples: int,
    random_key: jax.Array,
    take_log: bool = False,
) -> jnp.ndarray:
    """Random separable density matrices (product of single-qubit rotations)."""
    model = Model(n_qubits, 1, "No_Entangling", data_reupload=False)
    model.initialize_params(random_key, repeat=n_samples)
    sigmas = model(execution_type="density", inputs=None)
    if take_log:
        sigmas = logm_v(sigmas) / jnp.log(2.0 + 0j)
    return sigmas
