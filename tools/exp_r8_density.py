"""Round-4 probe: density-mode throughput on the doubled register.

Measures the 13-qubit noisy Circuit_19 density simulation on the
accelerator, comparing:

  il     — the interleaved doubled-register engine (fused windows +
           one-pass superoperator channels; the simulate_and_measure path)
  naive  — the per-window two-sided einsum pair plus per-Kraus loop the
           round-3 build used (reference-style asymptotics)

Usage: python tools/exp_r8_density.py [n_qubits]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 13
LAYERS = 2
ITERS = 5
HBM_BYTES_PER_S = 819e9


def main() -> None:
    import qml_essentials_tpu  # noqa: F401
    from qml_essentials_tpu import runtime
    from qml_essentials_tpu.models.model import Model
    from qml_essentials_tpu.ops import kernels, simulation
    from qml_essentials_tpu.ops.operations import KrausChannel
    from qml_essentials_tpu.ops.tape import recording

    model = Model(
        n_qubits=N, n_layers=LAYERS, circuit_type="Circuit_19", random_seed=7
    )
    model.noise_params = {"Depolarizing": 0.01}
    params0 = np.asarray(model.params[0])
    key = jax.random.PRNGKey(11)

    def record(params, inputs):
        with recording() as tape:
            model._variational(
                params, inputs,
                noise_params=model.noise_params, random_key=key,
            )
        return tape

    def purity_il(params, inputs):
        dtape = simulation._lower_interleaved_tape(record(params, inputs), N)
        rho2 = simulation._simulate_interleaved_ri(dtape, 2 * N)
        return jnp.sum(rho2[0] ** 2 + rho2[1] ** 2)

    def purity_naive(params, inputs):
        rho2 = kernels.zero_density_ri(N)
        for kind, payload, wires in simulation.plan_contractions(
            record(params, inputs), n_qubits=N
        ):
            if kind == "mat":
                rho2 = kernels.apply_unitary_to_density_flat_ri(
                    rho2, payload, wires, N
                )
            elif isinstance(payload, KrausChannel):
                rho2 = payload.apply_to_density_ri(rho2, N)
            else:
                rho2 = kernels.apply_unitary_to_density_flat_ri(
                    rho2, payload.matrix, list(payload.wires), N
                )
        return jnp.sum(rho2[0] ** 2 + rho2[1] ** 2)

    accel = runtime.accelerator_device() or jax.devices()[0]
    params = jax.device_put(params0, accel)
    x = jax.device_put(np.array([0.37], dtype=np.float32), accel)

    results = {}
    for name, fn in (("il", purity_il), ("naive", purity_naive)):
        t0 = time.time()
        val = float(jax.jit(fn)(params, x))
        print(f"{name:6s} first call (compile+run) {time.time() - t0:6.1f}s "
              f"purity={val:.8f}", flush=True)
        results[name] = val

        def many(params, xs, _fn=fn):
            def body(carry, xx):
                return carry + _fn(params, xx), None

            acc, _ = jax.lax.scan(body, 0.0, xs)
            return acc

        step = jax.jit(many)
        xs = jax.device_put(
            np.linspace(-1, 1, ITERS, dtype=np.float32).reshape(ITERS, 1),
            accel,
        )
        float(step(params, xs))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(step(params, xs))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        passes = best * HBM_BYTES_PER_S / (16 * 4**N)
        print(
            f"{name:6s} {best * 1e3:9.3f} ms/eval "
            f"(~{passes:6.1f} roofline passes)", flush=True,
        )
    print(f"purity |diff| = {abs(results['il'] - results['naive']):.2e}")


if __name__ == "__main__":
    main()
