"""Expressibility: sampled state-fidelity histograms vs the Haar measure.

Two departures from the reference implementation
(qml_essentials/expressibility.py):

* Fidelities run entirely on-device via the eigendecomposition-based
  matrix square root (batched under vmap) — the reference loops host-side
  ``scipy.linalg.sqrtm`` per pair.
* The binned Haar integral is evaluated in **closed form**: the Sim et al.
  fidelity PDF ``(N-1)(1-F)^(N-2)`` has antiderivative ``-(1-F)^(N-1)``,
  so each bin's mass is ``(1-lo)^(N-1) - (1-hi)^(N-1)`` exactly — no
  numerical quadrature and no ``.cache/haar_*.npy`` files needed (the
  ``cache`` flag is accepted for API compatibility and ignored).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qml_essentials_tpu.analysis.math import _sqrt_matrix
from qml_essentials_tpu.models.model import Model


def _uhlmann_fidelities(rho: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Batched Uhlmann fidelity ``(Tr sqrt(sqrt(rho) sigma sqrt(rho)))^2``."""
    root = _sqrt_matrix(rho)
    evs = jnp.linalg.eigvalsh(root @ sigma @ root)
    evs = jnp.clip(jnp.real(evs), 0.0, None)
    return jnp.abs(jnp.sum(jnp.sqrt(evs), axis=-1) ** 2)


class Expressibility:
    """Sim et al. 2019 expressibility: KL(fidelity histogram || Haar PDF)."""

    @classmethod
    def _sample_state_fidelities(cls, model: Model, n_samples: int,
                                 random_key: Optional[jax.Array] = None,
                                 kwargs: Any = None) -> jnp.ndarray:
        """Fidelities of ``n_samples`` random state pairs (on-device).

        One batched density evaluation produces ``2 n`` states; the first
        half pairs with the second.
        """
        model.initialize_params(random_key, repeat=n_samples * 2)
        dms = jnp.asarray(
            model(params=model.params, execution_type="density", **(kwargs or {}))
        )
        return _uhlmann_fidelities(dms[:n_samples], dms[n_samples:])

    @classmethod
    def state_fidelities(cls, n_samples: int, n_bins: int, model: Model,
                         random_key: Optional[jax.Array] = None,
                         scale: bool = False,
                         **kwargs: Any) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Histogram of sampled state fidelities; returns (bin edges, counts/n)."""
        if scale:
            n_samples *= 2**model.n_qubits
            n_bins *= model.n_qubits

        fids = cls._sample_state_fidelities(
            model=model, n_samples=n_samples, random_key=random_key, kwargs=kwargs
        )
        edges = jnp.linspace(0, 1, n_bins + 1)
        counts, _ = jnp.histogram(fids, bins=edges)
        return edges, counts / n_samples

    # ------------------------------------------------------------- Haar side
    @classmethod
    def _haar_probability(cls, fidelity: float, n_qubits: int) -> float:
        """Haar fidelity PDF ``(N-1)(1-F)^(N-2)`` (Sim et al. 2019)."""
        N = 2**n_qubits
        return (N - 1) * (1 - fidelity) ** (N - 2)

    @classmethod
    def haar_integral(cls, n_qubits: int, n_bins: int, cache: bool = True,
                      scale: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-bin Haar PDF mass, in closed form.

        ``integral (N-1)(1-F)^(N-2) dF = -(1-F)^(N-1)``, so bin ``[lo, hi)``
        carries exactly ``(1-lo)^(N-1) - (1-hi)^(N-1)``.  The *cache*
        argument is accepted for reference API compatibility but unused —
        the closed form is cheaper than any disk read.
        """
        if scale:
            n_bins *= n_qubits
        N = 2**n_qubits
        edges = np.linspace(0.0, 1.0, n_bins + 1)
        survivals = (1.0 - edges) ** (N - 1)
        masses = survivals[:-1] - survivals[1:]
        return jnp.linspace(0, 1, n_bins), jnp.asarray(masses)

    # ------------------------------------------------------------ divergence
    @classmethod
    def kullback_leibler_divergence(cls, vqc_prob_dist: jnp.ndarray,
                                    haar_dist: jnp.ndarray) -> np.ndarray:
        """Row-wise ``KL(p || haar)`` with the 0 log 0 := 0 convention."""
        p = np.atleast_2d(np.asarray(vqc_prob_dist, dtype=np.float64))
        q = np.asarray(haar_dist, dtype=np.float64)
        assert p.shape[-1] == q.shape[-1], (
            "All probabilities for inputs should have the same shape as "
            f"Haar. Got {q.shape} for Haar and {vqc_prob_dist.shape} for VQC"
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = np.where(p > 0, p * (np.log(p) - np.log(q)), 0.0)
            terms = np.where((p > 0) & (q == 0), np.inf, terms)
        return terms.sum(axis=-1)

    @classmethod
    def kl_divergence_to_haar(cls, model: Model, n_samples: int, n_bins: int,
                              random_key: Optional[jax.Array] = None,
                              scale: bool = False,
                              **kwargs: Any) -> np.ndarray:
        """Shortcut: sample fidelities, histogram, KL against the Haar PDF."""
        _, hist = cls.state_fidelities(
            n_samples, n_bins, model, random_key=random_key,
            scale=scale, **kwargs,
        )
        _, haar = cls.haar_integral(model.n_qubits, n_bins=n_bins, scale=scale)
        return cls.kullback_leibler_divergence(hist, haar)
