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


def _setup_jax():
    import jax

    if jax.default_backend() not in ("cpu",):
        # Accelerator available: the framework runtime decides placement.
        pass
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


def dense_baseline(model, x: float, mode: str) -> np.ndarray:
    """Naive dense simulator: full-unitary matrix build, numpy only."""
    from qml_essentials_tpu.ops import kernels
    from qml_essentials_tpu.ops.tape import recording

    n = model.n_qubits
    with recording() as tape:
        model._variational(model.params[0], np.array([x]), noise_params=None)
    U = np.eye(2**n, dtype=complex)
    for g in tape:
        from qml_essentials_tpu.ops.operations import Barrier

        if isinstance(g, Barrier):
            continue
        U = np.asarray(kernels.lift_matrix(g.matrix, g.wires, list(range(n)))) @ U
    psi = U[:, 0]
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
) -> None:
    jax = _setup_jax()
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
    args = parser.parse_args()

    run_sweep(
        list(range(args.qubits[0], args.qubits[1] + 1)),
        args.modes,
        args.iters,
        args.batch,
        args.atol,
        args.out,
        args.plot,
    )
