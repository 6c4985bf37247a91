"""Round-7 perf experiments: bf16 state-cotangent backward steps.

In the plan-level residual ("saved") backward, the inter-step cotangent λ
only ever feeds *parameter* gradients — the gram contraction, which already
runs in raw bf16 by default (GRAM_MODE). Storing λ itself as bf16 between
steps halves two of the three DMA streams of a residual backward step
(read λ, read residual x, write λ'), dropping the per-step traffic from
~402 MB to ~268 MB at 24 qubits — the same as a forward pass.

Probes (24q, shapes of the scheduled Circuit_19 plan):

  bwd_f32     current residual backward step (`_apply_bwd`), a=7 k=9
  bwd_bf16    same kernel with λ bf16 in/out (x stays f32, gw f32)
  bwd_bf16_top  top-window variant (k=8)
  err         end-to-end λ-propagation error of a 15-step bf16 chain vs f64

Timing harness matches exp_r3_micro (lax.scan chaining, null-latency
subtracted).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from exp_r3_micro import DIM, N, dev  # noqa: E402

ITERS = 30


def _pl():
    from jax.experimental import pallas as pl

    return pl


def _params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        vmem_limit_bytes=96 * 1024 * 1024,
        dimension_semantics=("arbitrary", "arbitrary"),
    )


def timeit_lam(fn, lam0, *args):
    """Steady-state seconds per call, chaining the cotangent through scan."""

    def many(lam):
        def body(c, _):
            return fn(c, *args), None

        out, _ = jax.lax.scan(body, lam, None, length=ITERS)
        return out

    step = jax.jit(many, device=dev())
    r = step(lam0)
    float(np.asarray(jax.device_get(r[0, 0])).ravel()[0])

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
        r = step(lam0)
        float(np.asarray(jax.device_get(r[0, 0])).ravel()[0])
        best = min(best, (time.perf_counter() - t0 - lat) / ITERS)
    return best


def _rand_state(rng, dtype=jnp.float32):
    x = rng.standard_normal((2, DIM)).astype(np.float32)
    return jax.device_put(x, dev()).astype(dtype)


def _rand_w(rng, K):
    w = rng.standard_normal((2, K, K)).astype(np.float32) / np.sqrt(K)
    return jax.device_put(w, dev())


def _dot16(a, b):
    return jax.lax.dot(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _dotl(w, lam):
    """f32 gate x bf16 cotangent: (hi, lo) split of the gate, 2 MXU passes."""
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot(x, y, preferred_element_type=jnp.float32)

    return d(wh, lam) + d(wl, lam)


def _bwd16_kernel(w_ref, g_ref, x_ref, gp_ref, gw_ref):
    pl = _pl()
    wr = w_ref[0]
    wi = w_ref[1]
    wrT = wr.T
    wiT = wi.T

    ia = pl.program_id(0)
    ib = pl.program_id(1)

    @pl.when(jnp.logical_and(ia == 0, ib == 0))
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    for c in range(g_ref.shape[1]):
        gr = g_ref[0, c]
        gi = g_ref[1, c]
        xr = x_ref[0, c]
        xi = x_ref[1, c]

        t1 = _dotl(wrT, gr)
        t2 = _dotl(-wiT, gi)
        t3 = _dotl(wrT - wiT, gr + gi)
        gp_ref[0, c] = (t1 - t2).astype(gp_ref.dtype)
        gp_ref[1, c] = (t3 - t1 - t2).astype(gp_ref.dtype)

        s1 = _dot16(gr, xr.T)
        s2 = _dot16(gi, xi.T)
        s3 = _dot16(gr + gi, (xr - xi).T)
        gw_ref[0] += s1 + s2
        gw_ref[1] += s3 - s1 + s2


def _apply_bwd16(w2, g, x, a, k, n):
    pl = _pl()
    K = 2**k
    A = 2**a
    B = (2**n) // (A * K)
    TB = min(1024 if K <= 512 else 256, B)
    target = max(1, (2 * 1024 * 1024) // (K * TB * 4))
    AC = 1
    while AC * 2 <= min(A, target):
        AC *= 2
    gv = g.reshape(2, A, K, B)
    xv = x.reshape(2, A, K, B)
    g_psi, gw2 = pl.pallas_call(
        _bwd16_kernel,
        grid=(A // AC, B // TB),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ia, ib: (0, 0, 0)),
            pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
            pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
        ],
        out_specs=[
            pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
            pl.BlockSpec((2, K, K), lambda ia, ib: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, A, K, B), g.dtype),
            jax.ShapeDtypeStruct((2, K, K), jnp.float32),
        ],
        compiler_params=_params(),
    )(w2, gv, xv)
    return g_psi.reshape(g.shape), gw2


def exp_bwd_f32(a=7, k=9):
    from qml_essentials_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(0)
    w2 = _rand_w(rng, 2**k)
    x = _rand_state(rng)
    lam0 = _rand_state(rng)

    def f(lam):
        gp, _ = pk._apply_bwd(w2, lam, x, a, k, N)
        return gp

    sec = timeit_lam(f, lam0)
    print(f"bwd_f32 a={a} k={k}: {sec*1e3:8.3f} ms/step", flush=True)


def exp_bwd_bf16(a=7, k=9):
    rng = np.random.default_rng(0)
    w2 = _rand_w(rng, 2**k)
    x = _rand_state(rng)
    lam0 = _rand_state(rng, jnp.bfloat16)

    def f(lam):
        gp, _ = _apply_bwd16(w2, lam, x, a, k, N)
        return gp

    sec = timeit_lam(f, lam0)
    print(f"bwd_bf16 a={a} k={k}: {sec*1e3:8.3f} ms/step", flush=True)


def exp_err(steps=15, k=9, a=7):
    """λ-propagation error of a bf16 chain vs float64 (numpy oracle), and
    the resulting gram error, on random unitary-ish windows."""
    rng = np.random.default_rng(1)
    K = 2**k
    # random unitary window (QR of complex gaussian)
    ws = []
    for _ in range(steps):
        m = rng.standard_normal((K, K)) + 1j * rng.standard_normal((K, K))
        q, _ = np.linalg.qr(m)
        ws.append(q)
    lam = rng.standard_normal(DIM) + 1j * rng.standard_normal(DIM)
    lam /= np.linalg.norm(lam)
    A = 2**a
    B = DIM // (A * K)

    def apply_h(v, q):
        return np.einsum(
            "ij,ajb->aib", q.conj().T, v.reshape(A, K, B)
        ).reshape(-1)

    # f64 oracle chain
    lam64 = lam.astype(np.complex128)
    outs64 = []
    for q in ws:
        lam64 = apply_h(lam64, q)
        outs64.append(lam64.copy())

    # bf16-storage chain (f32 compute, bf16 round-trip each step)
    def to_bf16(v):
        return np.asarray(
            jnp.asarray(v.real, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)
        ) + 1j * np.asarray(
            jnp.asarray(v.imag, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)
        )

    lam16 = to_bf16(lam)
    rel = []
    for i, q in enumerate(ws):
        lam16 = to_bf16(apply_h(lam16.astype(np.complex64), q))
        rel.append(
            np.linalg.norm(lam16 - outs64[i]) / np.linalg.norm(outs64[i])
        )
    print(f"lambda rel-err per step: first {rel[0]:.2e} last {rel[-1]:.2e}")

    # gram error at the last step: g = lam x^H restricted to the window
    x = rng.standard_normal(DIM) + 1j * rng.standard_normal(DIM)
    x /= np.linalg.norm(x)

    def gram(l, v):
        return np.einsum(
            "aib,ajb->ij", l.reshape(A, K, B), v.conj().reshape(A, K, B)
        )

    g64 = gram(outs64[-1], x.astype(np.complex128))
    g16 = gram(lam16, x)
    print(
        "gram err: max-abs {:.2e} rel-to-peak {:.2e}".format(
            np.abs(g16 - g64).max(), np.abs(g16 - g64).max() / np.abs(g64).max()
        )
    )


EXPS = {
    "bwd_f32": lambda: exp_bwd_f32(7, 9),
    "bwd_f32_k10": lambda: exp_bwd_f32(0, 10),
    "bwd_bf16": lambda: exp_bwd_bf16(7, 9),
    "bwd_bf16_k10": lambda: exp_bwd_bf16(0, 10),
    "err": exp_err,
}


def main():
    names = sys.argv[1:] or list(EXPS)
    for nm in names:
        try:
            EXPS[nm]()
        except Exception as e:  # noqa: BLE001
            print(f"{nm}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
