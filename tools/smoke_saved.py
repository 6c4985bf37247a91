"""Quick smoke: saved executor (bf16 and f32 lambda) vs per-kernel loop."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from qml_essentials_tpu.ops import operations as op
from qml_essentials_tpu.ops import pallas_kernels, saved, simulation
from qml_essentials_tpu.ops.tape import recording

N = 10

pallas_kernels.ENABLED = True
pallas_kernels.PALLAS_MIN_N = N
pallas_kernels.INTERPRET = True
simulation.BACKWARD_MODE = "autodiff"


def forward(theta):
    with recording() as tape:
        for q in range(N):
            op.H(wires=q)
        for i, q in enumerate(range(N)):
            op.RY(theta[i % theta.shape[0]], wires=q)
        for q in range(N - 1):
            op.CX(wires=[q, q + 1])
        op.CX(wires=[N - 1, 0])
        for i, q in enumerate(range(N)):
            op.RZ(theta[(i + 1) % theta.shape[0]], wires=q)
    psi2 = simulation.simulate_pure_ri(tape, N)
    probs = psi2[0] ** 2 + psi2[1] ** 2
    half = probs.reshape(2, -1).sum(axis=1)
    return half[0] - half[1]


theta0 = jnp.linspace(0.2, 1.3, 4).astype(jnp.float32)

saved.ENABLED = False
v_ref, g_ref = jax.value_and_grad(forward)(theta0)
print("loop   :", float(v_ref), np.asarray(g_ref))

saved.ENABLED = True
saved.LAMBDA_MODE = "f32"
v_f, g_f = jax.value_and_grad(forward)(theta0)
print("sav f32:", float(v_f), np.asarray(g_f))
print("  dv", abs(float(v_f - v_ref)), "dg", float(jnp.abs(g_f - g_ref).max()))

saved.LAMBDA_MODE = "bf16"
v_b, g_b = jax.value_and_grad(forward)(theta0)
print("sav b16:", float(v_b), np.asarray(g_b))
print("  dv", abs(float(v_b - v_ref)), "dg", float(jnp.abs(g_b - g_ref).max()))

# batched through vmap + jit
def loss(ths):
    return jax.vmap(forward)(ths).sum()

ths = jnp.stack([theta0, theta0 * 0.5, theta0 + 0.1])
gv = jax.jit(jax.grad(loss))(ths)
saved.ENABLED = False
gv_ref = jax.jit(jax.grad(loss))(ths)
print("vmap dg:", float(jnp.abs(gv - gv_ref).max()))
print("OK")
