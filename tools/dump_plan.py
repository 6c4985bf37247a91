"""Print the scheduled 24q Circuit_19 contraction plan (step kinds/supports)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24

import numpy as np

import qml_essentials_tpu  # noqa: F401
from qml_essentials_tpu.models.model import Model
from qml_essentials_tpu.ops import pallas_kernels, simulation
from qml_essentials_tpu.ops.tape import recording

pallas_kernels.ENABLED = True  # force the large-state scheduling path

model = Model(n_qubits=N, n_layers=2, circuit_type="Circuit_19", random_seed=7)
params0 = np.asarray(model.params[0])

import jax.numpy as jnp

with recording() as tape:
    model._variational(jnp.asarray(params0), jnp.array([0.37]), noise_params=None)

print(f"tape: {len(tape)} ops")
plan = simulation.plan_contractions(tape, n_qubits=N)
print(f"plan: {len(plan)} steps (pre-layout)")
for kind, payload, wires in plan:
    lbl = payload.name if kind == "op" else ""
    print(f"  {kind:4s} wires={wires} {lbl}")

sched = simulation.schedule_layout(plan, N)
print(f"\nscheduled: {len(sched)} steps")
for kind, payload, wires in sched:
    if kind == "rot":
        print(f"  rot  r={payload}")
    else:
        w = sorted(wires)
        contig = w == list(range(w[0], w[0] + len(w)))
        print(f"  {kind:4s} wires={w} contig={contig}")
