"""Expressibility: sampled state-fidelity histograms vs the Haar measure.

Fidelities run entirely on-device via the eigendecomposition-based matrix
square root (:func:`~qml_essentials_tpu.analysis.math._sqrt_matrix`, batched
under vmap) — the reference loops host-side ``scipy.linalg.sqrtm``
(qml_essentials/expressibility.py:49-62).

Reference parity: qml_essentials/expressibility.py (full module, including
the ``.cache/haar_*.npy`` integral cache).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import integrate
from scipy.special import rel_entr

from qml_essentials_tpu.analysis.math import _sqrt_matrix
from qml_essentials_tpu.models.model import Model


class Expressibility:
    """Sim et al. 2019 expressibility: KL(fidelity histogram || Haar PDF)."""

    @classmethod
    def _sample_state_fidelities(
        cls,
        model: Model,
        n_samples: int,
        random_key: Optional[jax.Array] = None,
        kwargs: Any = None,
    ) -> jnp.ndarray:
        """Fidelities of ``n_samples`` random state pairs (on-device)."""
        model.initialize_params(random_key, repeat=n_samples * 2)

        sv: jnp.ndarray = model(
            params=model.params,
            execution_type="density",
            **kwargs,
        )

        rho = jnp.asarray(sv[:n_samples])
        sigma = jnp.asarray(sv[n_samples:])

        sqrt_rho = _sqrt_matrix(rho)  # batched eigh-based sqrt
        inner = sqrt_rho @ sigma @ sqrt_rho
        evs = jnp.clip(jnp.real(jnp.linalg.eigvalsh(inner)), 0.0, None)
        fidelity = jnp.sum(jnp.sqrt(evs), axis=-1) ** 2
        return jnp.abs(fidelity)

    @classmethod
    def state_fidelities(
        cls,
        n_samples: int,
        n_bins: int,
        model: Model,
        random_key: Optional[jax.Array] = None,
        scale: bool = False,
        **kwargs: Any,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Histogram of sampled state fidelities; returns (bin edges, counts/n)."""
        if scale:
            n_samples = 2**model.n_qubits * n_samples
            n_bins = model.n_qubits * n_bins

        fidelities = cls._sample_state_fidelities(
            n_samples=n_samples,
            random_key=random_key,
            model=model,
            kwargs=kwargs,
        )
        y = jnp.linspace(0, 1, n_bins + 1)
        z, _ = jnp.histogram(fidelities, bins=y)
        return y, z / n_samples

    @classmethod
    def _haar_probability(cls, fidelity: float, n_qubits: int) -> float:
        """Haar fidelity PDF ``(N-1)(1-F)^(N-2)`` (Sim et al. 2019)."""
        N = 2**n_qubits
        return (N - 1) * (1 - fidelity) ** (N - 2)

    @classmethod
    def _sample_haar_integral(cls, n_qubits: int, n_bins: int) -> np.ndarray:
        """Bin-integrated Haar PDF."""
        dist = np.zeros(n_bins)
        for idx in range(n_bins):
            v = idx / n_bins
            u = (idx + 1) / n_bins
            dist[idx], _ = integrate.quad(cls._haar_probability, v, u, args=(n_qubits,))
        return dist

    @classmethod
    def haar_integral(
        cls,
        n_qubits: int,
        n_bins: int,
        cache: bool = True,
        scale: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Binned Haar PDF with an on-disk ``.cache/haar_*.npy`` cache."""
        if scale:
            n_bins = n_qubits * n_bins

        x = jnp.linspace(0, 1, n_bins)

        file_path = None
        if cache:
            name = f"haar_{n_qubits}q_{n_bins}s_{'scaled' if scale else ''}.npy"
            cache_folder = ".cache"
            if not os.path.exists(cache_folder):
                os.mkdir(cache_folder)
            file_path = os.path.join(cache_folder, name)
            if os.path.isfile(file_path):
                return x, jnp.load(file_path)

        y = cls._sample_haar_integral(n_qubits, n_bins)
        if cache:
            np.save(file_path, y)
        return x, jnp.asarray(y)

    @classmethod
    def kullback_leibler_divergence(
        cls,
        vqc_prob_dist: jnp.ndarray,
        haar_dist: jnp.ndarray,
    ) -> np.ndarray:
        """KL divergence of the sampled histogram against the Haar PDF."""
        if len(vqc_prob_dist.shape) > 1:
            assert all(haar_dist.shape == p.shape for p in vqc_prob_dist), (
                "All probabilities for inputs should have the same shape as "
                f"Haar. Got {haar_dist.shape} for Haar and "
                f"{vqc_prob_dist.shape} for VQC"
            )
        else:
            vqc_prob_dist = vqc_prob_dist.reshape((1, -1))

        kl = np.zeros(vqc_prob_dist.shape[0])
        for idx, p in enumerate(vqc_prob_dist):
            kl[idx] = np.sum(rel_entr(np.asarray(p), np.asarray(haar_dist)))
        return kl

    @classmethod
    def kl_divergence_to_haar(
        cls,
        model: Model,
        n_samples: int,
        n_bins: int,
        random_key: Optional[jax.Array] = None,
        scale: bool = False,
        **kwargs: Any,
    ) -> np.ndarray:
        """Shortcut: sample fidelities, histogram, KL against the Haar PDF."""
        _, fidelities = Expressibility.state_fidelities(
            model=model,
            random_key=random_key,
            n_samples=n_samples,
            n_bins=n_bins,
            scale=scale,
            **kwargs,
        )
        _, haar_probs = Expressibility.haar_integral(
            model.n_qubits, n_bins=n_bins, scale=scale
        )
        return Expressibility.kullback_leibler_divergence(fidelities, haar_probs)
