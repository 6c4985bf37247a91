"""Headline benchmark: 24-qubit Circuit_19 forward + adjoint gradient.

Measures steady-state throughput of a jitted expectation-value forward pass
plus parameter gradient on the flagship data-reuploading model (Circuit_19,
24 qubits, 2 layers, full data reuploading) — the BASELINE.md north star.
Iterations are chained inside one compiled program (``lax.scan``) so the
number measures device compute, not host/tunnel round trips.

Gradients run through the "auto" backward strategy (ops/simulation.py):
plain autodiff through the fused Pallas kernels' custom VJPs while the
residual stack fits in HBM (3 state-passes per backward step; the case at
24q where residuals are ~2 GB), switching to the residual-free
adjoint-state backward (ops/adjoint.py, 4 passes per step) beyond that.
tools/bench_ab.py measures both strategies explicitly.

The reported value is the achieved fraction of the HBM roofline
(BASELINE.md north star: >= 70% on one v5e).  Roofline model: every fused
contraction step must read and write the full complex64 state
(16 bytes/amplitude); the adjoint pass costs ~3 additional state passes per
step, so minimum traffic is ``4 * n_steps * 16 * 2**n`` bytes/evaluation.
(The adjoint path actually needs only ~3 passes/step, so >1.0 is possible.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", plus
auxiliary absolute numbers "evals_per_s" and "ms_per_eval" so regressions
cannot hide inside the roofline model}.  Two auxiliary points ride along
(skippable with BENCH_FAST=1): the 26-qubit fwd+grad where the
adjoint-state backward takes over ("aux_26q_*"), and the 13-qubit noisy
density forward through the interleaved doubled-register engine
("aux_density13q_*").
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

N_QUBITS = 24
N_LAYERS = 2
ITERS = 30
HBM_BYTES_PER_S = 819e9

AUX_26Q = 26
AUX_26Q_ITERS = 10
DENSITY_QUBITS = 13
DENSITY_ITERS = 10


def _null_latency(accel) -> float:
    """Host<->device round-trip latency (the tunnel costs ~30ms per call);
    measured with a null program and subtracted so numbers reflect device
    compute, not dispatch."""
    null = jax.jit(lambda v: v + 1.0)
    null_x = jax.device_put(np.float32(0.0), accel)
    float(null(null_x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(null(null_x))
    return (time.perf_counter() - t0) / 5


def _bench_fwd_grad(n_qubits: int, iters: int, accel, latency: float) -> dict:
    """fwd and fwd+grad ms/eval for Circuit_19 at *n_qubits* (scan-chained)."""
    from qml_essentials_tpu.models.model import Model
    from qml_essentials_tpu.ops import simulation
    from qml_essentials_tpu.ops.tape import recording

    model = Model(
        n_qubits=n_qubits,
        n_layers=N_LAYERS,
        circuit_type="Circuit_19",
        random_seed=7,
    )
    meas_type, obs = model._build_obs()
    params0 = np.asarray(model.params[0])

    def forward(params, inputs):
        with recording() as tape:
            model._variational(params, inputs, noise_params=None)
        out = simulation.simulate_and_measure(
            tape, n_qubits, meas_type, obs, use_density=False
        )
        return jnp.mean(out)

    # Count fused contraction steps once (concrete trace on the host).
    with recording() as tape:
        model._variational(
            jnp.asarray(params0), jnp.array([0.37]), noise_params=None
        )
    n_steps = len(simulation.plan_contractions(tape, n_qubits=n_qubits))

    grad_step = jax.value_and_grad(forward)

    def scan_of(fn):
        def many(params, xs):
            def body(carry, x):
                out = fn(params, x)
                if isinstance(out, tuple):
                    val, grads = out
                    return carry + val + jnp.sum(grads), None
                return carry + out, None

            acc, _ = jax.lax.scan(body, 0.0, xs)
            return acc

        return jax.jit(many)

    params = jax.device_put(params0, accel)
    xs = jax.device_put(
        np.linspace(-1.0, 1.0, iters, dtype=np.float32).reshape(iters, 1),
        accel,
    )

    out = {"n_steps": n_steps}
    for key, fn in (("fwd_grad", grad_step), ("fwd", forward)):
        step = scan_of(fn)
        float(step(params, xs))  # warmup / compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(step(params, xs))
            best = min(best, (time.perf_counter() - t0 - latency) / iters)
        out[key] = best
    return out


def _bench_density(accel, latency: float) -> dict:
    """13q noisy Circuit_19 density forward (interleaved doubled engine)."""
    from qml_essentials_tpu.models.model import Model
    from qml_essentials_tpu.ops import simulation
    from qml_essentials_tpu.ops.tape import recording

    n = DENSITY_QUBITS
    model = Model(
        n_qubits=n, n_layers=N_LAYERS, circuit_type="Circuit_19",
        random_seed=7,
    )
    model.noise_params = {"Depolarizing": 0.01}
    meas_type, obs = model._build_obs()
    params0 = np.asarray(model.params[0])
    key = jax.random.PRNGKey(11)

    def forward(params, inputs):
        with recording() as tape:
            model._variational(
                params, inputs,
                noise_params=model.noise_params, random_key=key,
            )
        out = simulation.simulate_and_measure(
            tape, n, meas_type, obs, use_density=True
        )
        return jnp.mean(out)

    def many(params, xs):
        def body(carry, x):
            return carry + forward(params, x), None

        acc, _ = jax.lax.scan(body, 0.0, xs)
        return acc

    step = jax.jit(many)
    params = jax.device_put(params0, accel)
    xs = jax.device_put(
        np.linspace(-1.0, 1.0, DENSITY_ITERS, dtype=np.float32).reshape(
            DENSITY_ITERS, 1
        ),
        accel,
    )
    float(step(params, xs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(step(params, xs))
        best = min(best, (time.perf_counter() - t0 - latency) / DENSITY_ITERS)
    return {"aux_density13q_ms_per_fwd": round(best * 1e3, 3)}


def main() -> None:
    import qml_essentials_tpu  # noqa: F401 (configures the runtime)
    from qml_essentials_tpu import runtime

    accel = runtime.accelerator_device() or jax.devices()[0]
    latency = _null_latency(accel)

    head = _bench_fwd_grad(N_QUBITS, ITERS, accel, latency)
    elapsed, best_fwd, n_steps = head["fwd_grad"], head["fwd"], head["n_steps"]

    state_bytes = 16 * (2**N_QUBITS)  # complex64 read+write per pass
    min_bytes = 4 * n_steps * state_bytes  # fwd + ~3x adjoint passes
    ideal_time = min_bytes / HBM_BYTES_PER_S
    fraction = ideal_time / elapsed

    record = {
        "metric": "hbm_roofline_fraction_c19_24q_fwd_adjoint",
        "value": round(float(fraction), 4),
        "unit": "fraction_of_819GBps_roofline",
        "vs_baseline": round(float(fraction) / 0.70, 4),
        "evals_per_s": round(1.0 / elapsed, 3),
        "ms_per_eval": round(elapsed * 1e3, 3),
        "ms_per_fwd": round(best_fwd * 1e3, 3),
        "n_steps": n_steps,
    }

    if not os.environ.get("BENCH_FAST"):
        aux = _bench_fwd_grad(AUX_26Q, AUX_26Q_ITERS, accel, latency)
        ideal26 = (
            4 * aux["n_steps"] * 16 * (2**AUX_26Q) / HBM_BYTES_PER_S
        )
        record.update(
            {
                "aux_26q_ms_per_eval": round(aux["fwd_grad"] * 1e3, 3),
                "aux_26q_ms_per_fwd": round(aux["fwd"] * 1e3, 3),
                "aux_26q_roofline_fraction": round(
                    ideal26 / aux["fwd_grad"], 4
                ),
                "aux_26q_n_steps": aux["n_steps"],
            }
        )
        record.update(_bench_density(accel, latency))

    print(json.dumps(record))


if __name__ == "__main__":
    main()
