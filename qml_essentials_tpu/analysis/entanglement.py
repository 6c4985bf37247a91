"""Entanglement measures: Meyer-Wallach, Bell, relative entropy, EoF, CE.

Every measure consumes a :class:`~qml_essentials_tpu.models.model.Model`
and runs its circuit under an overridden execution type.  The shared
plumbing lives in three module helpers: `_param_batch` (sample or reuse a
parameter batch), `_replicated` (build a multi-register circuit from the
model's variational tape via :func:`copy_to_tape`), and `_run_batched`
(dispatch a Script over the parameter batch with per-sample noise keys).
The measures themselves are then short.

Behavioural parity: qml_essentials/entanglement.py (meyer_wallach 16-103,
bell_measurements 105-219, relative_entropy 221-372, EoF 374-468,
concentratable 470-684, separable sampling 687-712).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, List, Optional, Tuple

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


# ----------------------------------------------------------------- plumbing


def _param_batch(model, n_samples, random_key, scale):
    """Sample a fresh parameter batch, or reuse the model's stored one.

    ``n_samples > 0`` draws that many sets (× 2^n when *scale*); otherwise
    the stored parameters are used, reshaped to batch-first.
    Returns ``(params, advanced_key, n_batch)``.
    """
    if scale and n_samples is not None and n_samples > 0:
        n_samples = 2**model.n_qubits * n_samples
    if n_samples is not None and n_samples > 0:
        random_key = model.initialize_params(random_key, repeat=n_samples)
    elif model.params.ndim <= 2:
        model.params = model.params.reshape(1, *model.params.shape)
    else:
        log.info(f"Using sample size of model params: {model.params.shape[0]}")
    params = model.params
    return params, random_key, params.shape[0]


def _replicated(model, copies: List[int], suffix: Callable[[], None]):
    """Circuit function replaying the model's tape on shifted registers.

    *copies* lists the register offsets (in units of ``n_qubits``) that
    receive a copy of the variational circuit; *suffix* appends the
    measurement network.
    """
    n = model.n_qubits

    def circuit(params, inputs, pulse_params=None, random_key=None, **kw):
        def body():
            model._variational(
                params, inputs, pulse_params=pulse_params, random_key=random_key, **kw
            )

        for c in copies:
            copy_to_tape(body, offset=c * n)
        suffix()

    return circuit


def _run_batched(script, model, params, inputs, random_key, n_batch, *,
                 type: str, obs=None, kwargs=None):
    """Execute *script* over the parameter batch with per-sample keys."""
    obs = obs or []
    kwargs = kwargs or {}
    if n_batch > 1:
        keys = safe_random_split(random_key, num=n_batch)
        return script.execute(
            type=type,
            obs=obs,
            args=(params, inputs, model.pulse_params, keys),
            in_axes=(0, None, None, 0),
            kwargs=kwargs,
        )
    return script.execute(
        type=type,
        obs=obs,
        args=(params, inputs, model.pulse_params, random_key),
        kwargs=kwargs,
    )


def _sampled_densities(model, n_samples, random_key, scale, **kwargs):
    """Batched density matrices over a (possibly fresh) parameter batch."""
    _param_batch(model, n_samples, random_key, scale)
    kwargs.setdefault("inputs", None)
    dim = 2**model.n_qubits
    return model(execution_type="density", **kwargs).reshape(-1, dim, dim)


def _qubit_purities(rho: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
    """``Tr rho_j^2`` for every single-qubit reduction of one density matrix."""
    everyone = list(range(n_qubits))
    vals = [
        jnp.trace(
            (lambda r: (r @ r).real)(
                js.partial_trace(rho, n_qubits, everyone[:j] + everyone[j + 1:])
            ),
            axis1=-2,
            axis2=-1,
        )
        for j in range(n_qubits)
    ]
    return jnp.stack(vals)


def _mw_values(rhos: jnp.ndarray, n_qubits: int) -> jnp.ndarray:
    """Per-sample Meyer-Wallach measure ``2 (1 - mean_j Tr rho_j^2)``."""
    purity_mean = jax.vmap(lambda r: _qubit_purities(r, n_qubits).mean())(rhos)
    return 2.0 * (1.0 - purity_mean)


# ----------------------------------------------------------------- measures


class Entanglement:
    """Entangling-capability measures over sampled model parameters."""

    @classmethod
    def meyer_wallach(cls, model: Model, n_samples: Optional[int],
                      random_key: Optional[jax.Array] = None,
                      scale: bool = False, **kwargs: Any) -> float:
        """Meyer-Wallach entangling capability (pure states), in [0, 1].

        Averages ``2 (1 - mean_j Tr rho_j^2)`` over sampled parameter sets
        (Meyer & Wallach 2002; sampling protocol of Sim et al. 2019).
        """
        if "noise_params" in kwargs:
            log.warning(
                "Meyer-Wallach measure not suitable for noisy circuits. "
                "Consider 'concentratable entanglement' instead."
            )
        rhos = _sampled_densities(model, n_samples, random_key, scale, **kwargs)
        values = _mw_values(rhos, model.n_qubits)
        log.debug(f"Variance of measure: {values.var()}")
        return values.mean()

    @classmethod
    def bell_measurements(cls, model: Model, n_samples: int,
                          random_key: Optional[jax.Array] = None,
                          scale: bool = False, **kwargs: Any) -> float:
        """Meyer-Wallach via Bell measurements on a doubled (2n) register."""
        if "noise_params" in kwargs:
            log.warning(
                "Bell Measurements not suitable for noisy circuits. "
                "Consider 'concentratable entanglement' instead."
            )
        n = model.n_qubits

        def bell_pairs():
            for q in range(n):
                op.CX(wires=[q, q + n])
                op.H(wires=q)

        # First copy sits at offset 0, partner register at offset n.
        circuit = _replicated(model, [0, 1], bell_pairs)
        script = js.Script(f=circuit, n_qubits=2 * n)

        params, random_key, n_batch = _param_batch(
            model, n_samples, random_key, scale
        )
        inputs = model._inputs_validation(kwargs.get("inputs", None))
        probs = _run_batched(
            script, model, params, inputs, random_key, n_batch,
            type="probs", kwargs=kwargs,
        )

        # P(|11>) on the pair (q, q+n) estimates (1 - Tr rho_q^2) / 2.
        p11 = jnp.stack(
            [js.marginalize_probs(probs, 2 * n, [q, q + n]) for q in range(n)],
            axis=-2,
        )[..., -1]
        purities = 1 - 2 * p11
        if not jnp.isclose(jnp.sum(purities.imag), 0, atol=1e-6):
            log.warning("Imaginary part of probabilities detected")
            purities = jnp.abs(purities)

        values = 2 * (1 - purities.mean(axis=0))
        log.debug(f"Variance of measure: {values.var()}")
        return min(max(float(values.mean()), 0.0), 1.0)

    @classmethod
    def relative_entropy(cls, model: Model, n_samples: int, n_sigmas: int,
                         random_key: Optional[jax.Array] = None,
                         scale: bool = False, **kwargs: Any) -> float:
        """Relative entropy of entanglement vs sampled separable states.

        An upper bound (the nearest separable state is NP-hard to find),
        normalised by the GHZ state's relative entropy so results land in
        [0, 1].
        """
        if scale:
            n_sigmas = 2**model.n_qubits * n_sigmas

        if random_key is None:
            random_key = model.random_key
        log_sigmas = sample_random_separable_states(
            model.n_qubits, n_samples=n_sigmas, random_key=random_key, take_log=True
        )
        random_key, _ = jax.random.split(random_key)

        rhos, log_rhos = cls._log_densities(
            model, n_samples, random_key, scale, **kwargs
        )
        divergences = jnp.stack(
            [cls._relative_entropies(rhos, log_rhos, ls) for ls in log_sigmas]
        )

        # The GHZ state maximises the measure — normalise against it.
        ghz = Model(model.n_qubits, 1, "GHZ", data_reupload=False)
        ghz_rho, ghz_log = cls._log_densities(ghz, None, None, False, **kwargs)
        ghz_div = cls._relative_entropies(ghz_rho, ghz_log, log_sigmas)

        best = (divergences / ghz_div).T.min(axis=1)
        log.debug(f"Variance of measure: {best.var()}")
        return best.mean()

    @classmethod
    def _log_densities(cls, model, n_samples, random_key, scale, **kwargs):
        """Density matrices and their base-2 matrix logarithms."""
        rhos = _sampled_densities(model, n_samples, random_key, scale, **kwargs)
        return rhos, logm_v(rhos) / jnp.log(2)

    @classmethod
    def _relative_entropies(cls, rhos, log_rhos, log_sigmas):
        """``S(rho || sigma) = Tr[rho (log rho - log sigma)]``, batched.

        ``log_sigmas`` is either one matrix (broadcast over rhos) or a
        stack aligned against tiled rhos (sigma-major result).
        """
        if log_sigmas.ndim == 3:
            m = log_sigmas.shape[0]
            k = rhos.shape[0]
            r = jnp.tile(rhos, (m, 1, 1))
            lr = jnp.tile(log_rhos, (m, 1, 1))
            ls = log_sigmas
        else:
            m, k = 1, rhos.shape[0]
            r, lr = rhos, log_rhos
            ls = jnp.broadcast_to(log_sigmas, rhos.shape)

        div = jax.vmap(
            lambda a, la, lb: jnp.abs(jnp.trace(a @ (la - lb), axis1=-2, axis2=-1))
        )(r, lr, ls)
        return div.reshape(m, k) if m > 1 else div

    @classmethod
    def entanglement_of_formation(cls, model: Model, n_samples: int,
                                  random_key: Optional[jax.Array] = None,
                                  scale: bool = False,
                                  always_decompose: bool = False,
                                  **kwargs: Any) -> float:
        """Entanglement of formation via an eigenvector decomposition.

        The pure-state decomposition is not unique; this reports the
        entanglement of *some* decomposition (arXiv:quant-ph/0504163).
        Pure inputs reduce to Meyer-Wallach unless ``always_decompose``.
        """
        rhos = _sampled_densities(model, n_samples, random_key, scale, **kwargs)
        n = model.n_qubits
        dim = 2**n

        evals, evecs = jnp.linalg.eigh(rhos)
        is_pure = jnp.isclose(evals, 1.0).any(axis=-1).all()
        if not always_decompose and is_pure:
            return _mw_values(rhos, n).mean()

        # |v_i><v_i| for every eigenvector of every sample.
        projectors = jnp.einsum(
            "sij,sik->sijk", evecs, evecs.conjugate()
        ).reshape(-1, dim, dim)
        mw = _mw_values(projectors, n).reshape(-1, dim)
        return jnp.einsum("si,si->s", mw, evals).mean()

    @classmethod
    def concentratable_entanglement(cls, model: Model, n_samples: int,
                                    random_key: Optional[jax.Array] = None,
                                    scale: bool = False,
                                    **kwargs: Any) -> float:
        """Concentratable entanglement via a 3n-qubit SWAP test
        (arXiv:2104.06923); valid for noisy circuits too."""
        n = model.n_qubits

        def swap_network():
            for i in range(n):
                op.H(wires=i)
            for i in range(n):
                op.CSWAP(wires=[i, i + n, i + 2 * n])
            for i in range(n):
                op.H(wires=i)

        # Two circuit copies on registers 1 and 2; ancillas on register 0.
        circuit = _replicated(model, [1, 2], swap_network)
        script = js.Script(f=circuit, n_qubits=3 * n)

        params, random_key, n_batch = _param_batch(
            model, n_samples, random_key, scale
        )
        inputs = model._inputs_validation(kwargs.get("inputs", None))
        probs = _run_batched(
            script, model, params, inputs, random_key, n_batch,
            type="probs", kwargs=kwargs,
        )

        anc = js.marginalize_probs(probs, 3 * n, tuple(range(n)))
        values = 1 - anc[..., 0]
        log.debug(f"Variance of measure: {values.var()}")
        return float(values.mean())

    @classmethod
    def concentratable_entanglement_estimation(
            cls, model: Model, n_samples: int,
            random_key: Optional[jax.Array] = None,
            scale: bool = False, **kwargs: Any) -> float:
        """Concentratable entanglement estimated from Bell-basis
        measurements on a doubled register with a composite SWAP observable."""
        n = model.n_qubits

        def bell_basis():
            for i in range(n):
                op.CX(wires=[i, i + n])
                op.H(wires=i)

        circuit = _replicated(model, [0, 1], bell_basis)
        script = js.Script(f=circuit, n_qubits=2 * n)

        params, random_key, n_batch = _param_batch(
            model, n_samples, random_key, scale
        )
        inputs = model._inputs_validation(kwargs.get("inputs", None))
        expvals = _run_batched(
            script, model, params, inputs, random_key, n_batch,
            type="expval", obs=[cls._swap_parity_observable(n)], kwargs=kwargs,
        )

        values = 1 - expvals
        log.debug(f"Variance of measure: {values.var()}")
        return float(values.mean())

    @staticmethod
    def _swap_parity_observable(n: int) -> op.Operation:
        """``(1/2^n) prod_i (Id + SWAP_{i,i+n})`` in the Bell basis
        (where SWAP is diagonal: diag(1, 1, 1, -1))."""
        swap_diag = jnp.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, -1]]
        )
        total = None
        for i in range(n):
            factor = op.Id([i, i + n], record=False) + op.Operation(
                [i, i + n], swap_diag, record=False
            )
            total = factor if total is None else total @ factor
        return (1 / 2**n) * total


def sample_random_separable_states(
    n_qubits: int,
    n_samples: int,
    random_key: jax.Array,
    take_log: bool = False,
) -> jnp.ndarray:
    """Random separable density matrices (products of single-qubit rotations)."""
    product_model = Model(n_qubits, 1, "No_Entangling", data_reupload=False)
    product_model.initialize_params(random_key, repeat=n_samples)
    sigmas = product_model(execution_type="density", inputs=None)
    if take_log:
        sigmas = logm_v(sigmas) / jnp.log(2.0 + 0j)
    return sigmas
