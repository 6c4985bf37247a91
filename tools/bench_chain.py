"""Per-step profiler for the chain executor.

Builds the 24q Circuit_19 chain plan with concrete payloads, then times
each chain step's forward and adjoint kernels in isolation (lax.scan
chained, null-latency subtracted).  Prints one line per step plus totals —
the tool for attributing end-to-end bench regressions to specific passes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
ITERS = 20

_DEV = None


def dev():
    global _DEV
    if _DEV is None:
        import qml_essentials_tpu  # noqa: F401
        from qml_essentials_tpu import runtime

        _DEV = runtime.accelerator_device() or jax.devices()[0]
        print(f"device: {_DEV}", flush=True)
    return _DEV


def timeit(fn, *args):
    def many(x, rest):
        def body(c, _):
            return fn(c, *rest), None

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out[0, 0]  # scalar readback only (the tunnel costs ~ms/MB)

    step = jax.jit(many, device=dev(), static_argnums=())
    x0 = args[0]
    rest = args[1:]
    float(step(x0, rest))

    null = jax.jit(lambda v: v + 1.0, device=dev())
    nx = jax.device_put(np.float32(0.0), dev())
    float(null(nx))
    t0 = time.perf_counter()
    for _ in range(5):
        float(null(nx))
    lat = (time.perf_counter() - t0) / 5

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(step(x0, rest))
        best = min(best, (time.perf_counter() - t0 - lat) / ITERS)
    return best


def main():
    import qml_essentials_tpu  # noqa: F401
    from qml_essentials_tpu.models.model import Model
    from qml_essentials_tpu.ops import chains, pallas_kernels
    from qml_essentials_tpu.ops.adjoint import _pair
    from qml_essentials_tpu.ops.tape import recording

    model = Model(n_qubits=N, n_layers=2, circuit_type="Circuit_19", random_seed=7)
    params0 = np.asarray(model.params[0])
    with recording() as tape:
        model._variational(
            jnp.asarray(params0), jnp.array([0.37]), noise_params=None
        )
    steps = chains.plan_chains(tape, N)
    assert steps is not None
    print(f"{len(steps)} chain steps", flush=True)

    rng = np.random.RandomState(0)
    s = rng.randn(2, 2**N).astype(np.float32)
    s /= np.sqrt((s**2).sum())
    psi = jax.device_put(s, dev())
    lam = jax.device_put(0.5 * s, dev())

    tot_f = tot_b = 0.0
    for i, (kind, (geom, descs, pays), wires) in enumerate(steps):
        pays2 = tuple(
            jax.device_put(np.asarray(_pair(p)), dev()) for p in pays
        )

        def fwd(x, *pp):
            return pallas_kernels.chain_apply_ri(x, pp, geom, descs, N)

        tf = timeit(fwd, psi, *pays2)

        def adj(x, l, *pp):
            pp_, lp_, gws = pallas_kernels.adjoint_chain_ri(
                x, l, pp, geom, descs, N
            )
            return pp_ + 1e-12 * lp_ + 1e-12 * sum(g.sum() for g in gws)

        tb = timeit(adj, psi, lam, *pays2)
        tot_f += tf
        tot_b += tb
        dd = " ".join(
            f"w{d[1]}-{d[2]}" if d[0] == "win" else f"d{list(d[1])}"
            for d in descs
        )
        print(
            f"step {i:2d} {geom[0]} fwd {tf*1e3:7.3f} ms  adj {tb*1e3:7.3f} ms"
            f"   [{dd}]",
            flush=True,
        )
    print(f"TOTAL fwd {tot_f*1e3:8.3f} ms   adj {tot_b*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
