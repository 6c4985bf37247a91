"""Sweep (PALLAS_FUSE_WIDTH, REFUSE_MAX_WIDTH) on the 24q bench.

The zero-overlap time model (docs/performance.md) prices an evaluation as
``passes x ~0.55 ms/move + total MXU flops / ~200 TFLOPs``: wider windows
trade passes for quadratic MXU work.  This sweep measures the real
trade-off end to end (bench.py protocol, fewer iters).

Usage: python tools/bench_widths.py [w:rw ...]   (default sweep below)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N_QUBITS = 24
N_LAYERS = 2
ITERS = 10


def measure(width, refuse):
    from qml_essentials_tpu import runtime
    from qml_essentials_tpu.models.model import Model
    from qml_essentials_tpu.ops import simulation
    from qml_essentials_tpu.ops.tape import recording

    simulation.PALLAS_FUSE_WIDTH = width
    simulation.REFUSE_MAX_WIDTH = refuse

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

    with recording() as tape:
        model._variational(
            jnp.asarray(params0), jnp.array([0.37]), noise_params=None
        )
    plan = simulation.plan_contractions(tape, n_qubits=N_QUBITS)
    sched = simulation.schedule_layout(plan, N_QUBITS)
    n_sched = len(sched)

    grad_step = jax.value_and_grad(forward)

    def many(params, xs):
        def body(carry, x):
            val, grads = grad_step(params, x)
            return carry + val + jnp.sum(grads), None

        acc, _ = jax.lax.scan(body, 0.0, xs)
        return acc

    accel = runtime.accelerator_device() or jax.devices()[0]
    step = jax.jit(many, device=accel)
    params = jax.device_put(params0, accel)
    xs = jax.device_put(
        np.linspace(-1.0, 1.0, ITERS, dtype=np.float32).reshape(ITERS, 1),
        accel,
    )
    float(step(params, xs))

    null = jax.jit(lambda v: v + 1.0, device=accel)
    nx = jax.device_put(np.float32(0.0), accel)
    float(null(nx))
    t0 = time.perf_counter()
    for _ in range(5):
        float(null(nx))
    lat = (time.perf_counter() - t0) / 5

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(step(params, xs))
        best = min(best, (time.perf_counter() - t0 - lat) / ITERS)

    print(
        json.dumps(
            {
                "width": width,
                "refuse": refuse,
                "sched_steps": n_sched,
                "ms_per_eval": round(best * 1e3, 3),
            }
        ),
        flush=True,
    )


def main():
    configs = [tuple(map(int, a.split(":"))) for a in sys.argv[1:]] or [
        (8, 9),
        (8, 8),
        (7, 8),
        (7, 7),
    ]
    import qml_essentials_tpu  # noqa: F401

    for w, rw in configs:
        try:
            measure(w, rw)
        except Exception as e:  # noqa: BLE001
            print(f"{w}:{rw} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
