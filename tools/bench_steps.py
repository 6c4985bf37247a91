"""Per-step profiler for the production (scheduled window) plan.

Builds the 24q Circuit_19 scheduled plan with concrete payloads and times
every step's forward kernel and its VJP backward in isolation (lax.scan
chained, null latency subtracted).  Attributes the end-to-end bench time
to specific passes.

Usage: python tools/bench_steps.py [n_qubits]
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
        return out.reshape(-1)[0]

    step = jax.jit(many, device=dev())
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
    from qml_essentials_tpu.ops import kernels, pallas_kernels, simulation
    from qml_essentials_tpu.ops.tape import recording

    model = Model(n_qubits=N, n_layers=2, circuit_type="Circuit_19", random_seed=7)
    params0 = np.asarray(model.params[0])
    with recording() as tape:
        model._variational(
            jnp.asarray(params0), jnp.array([0.37]), noise_params=None
        )
    plan = simulation.plan_contractions(tape, n_qubits=N)
    peeled, _ = simulation._zero_state_prefix(plan, N)
    sched = simulation.schedule_layout(
        simulation._drop_indices(plan, peeled), N
    )
    print(f"{len(plan)} raw, {len(peeled)} peeled, {len(sched)} scheduled",
          flush=True)

    rng = np.random.RandomState(0)
    s = rng.randn(2, 2**N).astype(np.float32)
    s /= np.sqrt((s**2).sum())
    psi = jax.device_put(s, dev())
    lam = jax.device_put(0.5 * s, dev())

    def step_fn(kind, payload, wires):
        if kind == "mat":
            m = np.asarray(payload)
            # the axon tunnel cannot transfer complex buffers: ship the
            # real-split (2, K, K) pair instead
            w2 = jax.device_put(np.stack([m.real, m.imag]).astype(np.float32), dev())
            return (lambda x, w: kernels.apply_matrix_pair_ri(x, w, wires, N)), (w2,)
        if kind == "rot":
            return (lambda x: kernels._rotate_qubits_ri(x, payload, N)), ()
        if kind == "rotmat":
            r, mat = payload
            m = np.asarray(mat)
            w2 = jax.device_put(np.stack([m.real, m.imag]).astype(np.float32), dev())
            kw = len(wires)
            if kw == r and pallas_kernels.rotmat_usable(r, N):
                return (
                    lambda x, w: pallas_kernels.rotmat_apply_ri(x, w, r, N)
                ), (w2,)
            if pallas_kernels.rotwin_usable(r, kw, N):
                return (
                    lambda x, w: pallas_kernels.rotwin_apply_ri(x, w, r, kw, N)
                ), (w2,)
            return (
                lambda x, w: kernels.apply_matrix_pair_ri(
                    kernels._rotate_qubits_ri(x, r, N), w, wires, N
                )
            ), (w2,)
        if kind == "matrot":
            r, mat = payload
            m = np.asarray(mat)
            w2 = jax.device_put(np.stack([m.real, m.imag]).astype(np.float32), dev())
            if pallas_kernels.matrot_usable(r, N):
                return (
                    lambda x, w: pallas_kernels.matrot_apply_ri(x, w, r, N)
                ), (w2,)
            return (
                lambda x, w: kernels._rotate_qubits_ri(
                    kernels.apply_matrix_pair_ri(x, w, wires, N), r, N
                )
            ), (w2,)
        if kind == "diag":
            d = np.asarray(payload)
            d2 = jax.device_put(np.stack([d.real, d.imag]).astype(np.float32), dev())
            return (
                lambda x, dd: kernels.apply_diagonal_pair_ri(x, dd, wires, N)
            ), (d2,)
        # "op": apply via the operation's own path
        op_obj = payload
        return (lambda x: op_obj.apply_to_state_ri(x, N)), ()

    tot_f = tot_b = 0.0
    for i, (kind, payload, wires) in enumerate(sched):
        fn, extra = step_fn(kind, payload, wires)
        try:
            tf = timeit(fn, psi, *extra)
        except Exception as e:
            print(f"step {i:2d} {kind} {wires and [min(wires), max(wires)]} "
                  f"fwd FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
            continue

        def bwd_run(l, x, *ex):
            out, vjp = jax.vjp(lambda xx: fn(xx, *ex), x)
            (gx,) = vjp(l)
            return gx

        try:
            tb = timeit(bwd_run, lam, psi, *extra) if kind != "op" else 0.0
        except Exception as e:
            print(f"step {i:2d} {kind} bwd FAILED {type(e).__name__}", flush=True)
            tb = 0.0
        tot_f += tf
        tot_b += tb
        desc = (
            f"[{min(wires)}-{max(wires)}]" if wires else ""
        ) if kind != "rot" else f"r={payload}"
        width = len(wires) if wires else 0
        print(
            f"step {i:2d} {kind:7s} w{width:2d} {desc:9s}"
            f" fwd {tf*1e3:7.3f} ms  bwd(f+b) {tb*1e3:7.3f} ms",
            flush=True,
        )
    print(
        f"TOTAL fwd {tot_f*1e3:8.3f} ms   bwd-incl-fwd {tot_b*1e3:8.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
