"""Multi-chip bench harness: sharded statevector/density fwd+grad.

Runs the same sharded programs the driver dryrun certifies
(ShardedStateSim / ShardedDensitySim build_expval_program over a
("state",) mesh) at beyond-single-chip sizes, and reports

  * ms per evaluation (forward, and forward+grad),
  * per-chip HBM-roofline fraction (local-shard passes from the layout
    plan x local-shard bytes / measured time),
  * the exchange-collective share of the traffic (count of grouped
    all_to_all exchanges and their modeled ICI time share).

``--density`` switches to the sharded interleaved doubled-register
density engine: a noisy model (NQubitDepolarizing channels) whose 4**n
register is distributed over the mesh — the object whose whole point is
that no single chip can hold it (reference semantics:
qml_essentials/simulation.py:107-128, 263-377).

On real multi-chip hardware this produces the headline distributed
numbers from the exact plan the virtual-mesh tests certify; without it,
``--virtual D`` provisions a D-device CPU mesh so the harness itself stays
correctness-tested end to end (timings are then meaningless, the JSON says
so).

Usage:
  python tools/bench_multichip.py                       # real devices
  python tools/bench_multichip.py --virtual 8 --qubits 12 --check
  python tools/bench_multichip.py --virtual 8 --qubits 13 --density
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=28)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--circuit", default="Circuit_19")
    ap.add_argument("--devices", type=int, default=0,
                    help="state-axis size (default: all available)")
    ap.add_argument("--virtual", type=int, default=0,
                    help="provision an N-device virtual CPU mesh")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--check", action="store_true",
                    help="assert parity vs the unsharded path (small n only)")
    ap.add_argument("--density", action="store_true",
                    help="bench the sharded density engine on a noisy model")
    ap.add_argument("--noise", type=float, default=0.01,
                    help="depolarizing probability for --density")
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="per-chip HBM bandwidth (GB/s, v5e default)")
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="per-link ICI bandwidth (GB/s each way, v5e default)")
    args = ap.parse_args()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    import qml_essentials_tpu  # noqa: F401
    from qml_essentials_tpu.models.model import Model
    from qml_essentials_tpu.ops.tape import recording
    from qml_essentials_tpu.parallel.state_sharding import ShardedStateSim

    devices = jax.devices()
    D = args.devices or len(devices)
    g = D.bit_length() - 1
    D = 2**g  # largest power of two that fits
    mesh = Mesh(np.array(devices[:D]).reshape(D), axis_names=("state",))

    n = args.qubits
    model = Model(
        n_qubits=n, n_layers=args.layers, circuit_type=args.circuit,
        random_seed=7,
    )
    params0 = jnp.asarray(np.asarray(model.params[0]))
    x0 = jnp.array([0.37])

    noise = {"Depolarizing": args.noise} if args.density else None
    if args.density:
        model.noise_params = noise
        noise = model.noise_params  # canonical form
    key0 = jax.random.PRNGKey(11)

    def tape_fn(params, x):
        with recording() as tape:
            model._variational(
                params, x, noise_params=noise,
                random_key=key0 if noise else None,
            )
        return tape

    words = tuple((w,) for w in range(min(4, n)))
    if args.density:
        from qml_essentials_tpu.parallel.density_sharding import (
            ShardedDensitySim,
        )

        sim = ShardedDensitySim(n, mesh, axis="state")
        lowered = sim._lowered_fn(tape_fn)
        plan = sim._plan(lowered, params0, x0)
        local_width_qubits = 2 * n - sim.g
    else:
        sim = ShardedStateSim(n, mesh, axis="state")
        plan = sim._host_plan(tape_fn, params0, x0)
        local_width_qubits = n - sim.g
    n_steps = len(plan.steps)
    n_exchanges = sum(1 for s in plan.steps if s.exchange)

    prog = sim.build_expval_program(tape_fn, words, (params0, x0))

    def loss(p, x):
        return jnp.sum(prog(p, x))

    grad_prog = jax.jit(jax.value_and_grad(loss))

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    fwd_s = timed(prog, params0, x0)
    fg_s = timed(grad_prog, params0, x0)

    if args.check:
        from qml_essentials_tpu.ops import simulation

        def dense(p, x):
            return simulation.simulate_and_measure(
                tape_fn(p, x), n, "expval",
                [__import__(
                    "qml_essentials_tpu.ops.operations", fromlist=["PauliZ"]
                ).PauliZ(wires=w, record=False) for w, in words],
                use_density=args.density,
            )

        ref = np.asarray(jax.jit(dense)(params0, x0))
        got = np.asarray(prog(params0, x0))
        assert np.allclose(got, ref, atol=1e-6), (got, ref)

    virtual = args.virtual > 0 or all(d.platform == "cpu" for d in devices[:D])
    # complex64 read+write per local pass over the (possibly doubled) shard.
    local_bytes = 16 * 2 ** local_width_qubits
    # fwd: one pass per planned step; grad via the sharded adjoint backward:
    # ~4 passes per step (undo + cotangent pullback), same model as bench.py.
    fwd_ideal = n_steps * local_bytes / (args.hbm_gbps * 1e9)
    fg_ideal = 4 * n_steps * local_bytes / (args.hbm_gbps * 1e9)
    # Each grouped exchange is an all_to_all moving ~the whole local shard
    # ((D-1)/D of it) across ICI; grad replays exchanges ~2x (fwd + undo).
    ex_bytes = n_exchanges * local_bytes / 2 * (D - 1) / max(D, 1)
    ex_time = ex_bytes / (args.ici_gbps * 1e9)

    print(json.dumps({
        "metric": (
            "sharded_density_fwd_grad" if args.density else "sharded_fwd_grad"
        ),
        "n_qubits": n,
        "circuit": args.circuit,
        "noise": args.noise if args.density else None,
        "devices": D,
        "virtual_mesh": virtual,
        "ms_per_fwd": round(fwd_s * 1e3, 3),
        "ms_per_fwd_grad": round(fg_s * 1e3, 3),
        "plan_steps": n_steps,
        "plan_exchanges": n_exchanges,
        "per_chip_roofline_fraction_fwd": (
            None if virtual else round(fwd_ideal / fwd_s, 4)
        ),
        "per_chip_roofline_fraction_fwd_grad": (
            None if virtual else round(fg_ideal / fg_s, 4)
        ),
        "modeled_exchange_time_share_fwd": (
            None if virtual else round(ex_time / fwd_s, 4)
        ),
    }))


if __name__ == "__main__":
    main()
