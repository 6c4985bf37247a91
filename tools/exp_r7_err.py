"""Precision probe: end-to-end error of bf16 cotangent storage.

Simulates the saved-mode backward chain at reduced size (window at the
bottom of the register so every step is one (K, K) x (K, B) matmul —
same rounding statistics as the 24q plan, feasible on one CPU):

    lam_{j-1} = U_j^H lam_j       stored bf16 between steps
    gw_j      = lam_j x_j^H       bf16 single-pass gram (GRAM_MODE bf16)

vs a float64 oracle with f64 grams.  Reports per-step lambda relative
error and the worst gram error across all steps (max-abs and
relative-to-peak), for both the current f32-lambda + bf16-gram default
and the probed bf16-lambda variant.
"""

import sys

import numpy as np
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
K_LOG = 9
STEPS = 15
K = 2**K_LOG
B = 2**N // K


def bf16(v):
    r = np.asarray(jnp.asarray(v.real, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32))
    i = np.asarray(jnp.asarray(v.imag, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32))
    return r + 1j * i


def main():
    rng = np.random.default_rng(1)
    ws = []
    for _ in range(STEPS):
        m = rng.standard_normal((K, K)) + 1j * rng.standard_normal((K, K))
        q, _ = np.linalg.qr(m)
        ws.append(q)
    # step-input states x_j: random unit states (stand-ins for the saved
    # forward residuals; exact values don't matter for rounding statistics)
    xs = []
    for _ in range(STEPS):
        x = rng.standard_normal((K, B)) + 1j * rng.standard_normal((K, B))
        x /= np.linalg.norm(x)
        xs.append(x.astype(np.complex128))
    lam = rng.standard_normal((K, B)) + 1j * rng.standard_normal((K, B))
    lam /= np.linalg.norm(lam)

    # f64 oracle
    lam64 = lam.astype(np.complex128)
    grams64 = []
    lams64 = []
    for q, x in zip(reversed(ws), reversed(xs)):
        grams64.append(lam64 @ x.conj().T)
        lam64 = q.conj().T @ lam64
        lams64.append(lam64.copy())

    def chain(store):
        """store: postprocess applied to lambda between steps."""
        lamc = store(lam.astype(np.complex64))
        grams = []
        lams = []
        for q, x in zip(reversed(ws), reversed(xs)):
            # bf16 single-pass gram (inputs cast, f32 accumulate)
            grams.append(bf16(lamc) @ bf16(x).conj().T)
            lamc = store((q.conj().T.astype(np.complex64) @ lamc.astype(np.complex64)))
            lams.append(lamc.copy())
        return grams, lams

    for name, store in (("f32-lam", lambda v: v.astype(np.complex64)), ("bf16-lam", bf16)):
        grams, lams = chain(store)
        lrel = [
            np.linalg.norm(a - b) / np.linalg.norm(b) for a, b in zip(lams, lams64)
        ]
        gmax = 0.0
        grel = 0.0
        for g, g64 in zip(grams, grams64):
            e = np.abs(g - g64).max()
            gmax = max(gmax, e)
            grel = max(grel, e / np.abs(g64).max())
        print(
            f"{name}: lam rel-err first {lrel[0]:.2e} last {lrel[-1]:.2e}  "
            f"gram max-abs {gmax:.2e} rel-to-peak {grel:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
