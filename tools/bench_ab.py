"""A/B the 24q bench across backward strategies and fusion toggles.

Each configuration is measured in-process with the same protocol as
bench.py (lax.scan-chained evaluations, null-program latency subtracted).
Run on the TPU; prints one JSON line per configuration.

Configurations:
  adjoint+fuse   — adjoint-state backward, rotation-fused plan (bench default)
  adjoint        — adjoint-state backward, unfused rotations
  autodiff+fuse  — plain autodiff (per-kernel VJPs, residuals in HBM)
  autodiff       — plain autodiff, unfused rotations

At 24 qubits the residuals of the autodiff path are only ~2 GB (16 steps
x 134 MB), so the residual-free adjoint is not obviously cheaper: the
adjoint backward moves 4 state-passes per step (undo + pullback on both
arrays) while the residual backward moves 3 (read g, read residual,
write g_prev).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N_QUBITS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N_LAYERS = 2
ITERS = 10
HBM_BYTES_PER_S = 819e9


def measure(label):
    from qml_essentials_tpu import runtime
    from qml_essentials_tpu.core import executor
    from qml_essentials_tpu.models.model import Model
    from qml_essentials_tpu.ops import simulation
    from qml_essentials_tpu.ops.tape import recording

    model = Model(
        n_qubits=N_QUBITS, n_layers=N_LAYERS, circuit_type="Circuit_19",
        random_seed=7,
    )
    meas_type, obs = model._build_obs()
    params0 = np.asarray(model.params[0])

    def forward(params, inputs):
        with recording() as tape:
            model._variational(params, inputs, noise_params=None)
        out = simulation.simulate_and_measure(
            tape, N_QUBITS, meas_type, obs, use_density=False
        )
        return jnp.mean(out)

    grad_step = jax.value_and_grad(forward)

    def many(params, xs):
        def body(carry, x):
            val, grads = grad_step(params, x)
            return carry + val + jnp.sum(grads), None

        acc, _ = jax.lax.scan(body, 0.0, xs)
        return acc

    step = jax.jit(many)
    accel = runtime.accelerator_device() or jax.devices()[0]
    params = jax.device_put(params0, accel)
    xs = jax.device_put(
        np.linspace(-1.0, 1.0, ITERS, dtype=np.float32).reshape(ITERS, 1), accel
    )
    float(step(params, xs))  # compile + run

    null = jax.jit(lambda v: v + 1.0)
    null_x = jax.device_put(np.float32(0.0), accel)
    float(null(null_x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(null(null_x))
    latency = (time.perf_counter() - t0) / 5

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(step(params, xs))
        best = min(best, (time.perf_counter() - t0 - latency) / ITERS)

    print(
        json.dumps(
            {
                "config": label,
                "n_qubits": N_QUBITS,
                "ms_per_eval": round(best * 1e3, 3),
                "evals_per_s": round(1.0 / best, 3),
            }
        ),
        flush=True,
    )
    return best


def main():
    import qml_essentials_tpu  # noqa: F401
    from qml_essentials_tpu.ops import adjoint, simulation

    configs = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "adjoint+fuse", "autodiff+fuse", "adjoint", "autodiff",
    ]
    from qml_essentials_tpu.ops import saved

    for label in configs:
        adjoint.set_adjoint("adjoint" in label)
        # Force the strategy: "auto" would route 24q to the saved-residual
        # executor regardless of the adjoint toggle.
        simulation.set_backward_mode(
            "adjoint" if "adjoint" in label else "autodiff"
        )
        saved.set_lambda_mode("f32" if "lam32" in label else "bf16")
        simulation.FUSE_LAYOUT_ROT = "fuse" in label
        simulation.USE_CHAINS = "chains" in label
        simulation.REFUSE_MAX_WIDTH = 10 if "w10" in label else 9
        try:
            measure(label)
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"config": label, "error": repr(e)[:300]}), flush=True)
    adjoint.set_adjoint(True)
    simulation.FUSE_LAYOUT_ROT = True
    simulation.USE_CHAINS = False
    simulation.REFUSE_MAX_WIDTH = 9


if __name__ == "__main__":
    main()
