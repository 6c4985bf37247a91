"""Measure this chip's *actual* bf16 MXU peak and the Pallas in-kernel
matmul throughput, to frame the window kernels' ~50%-of-nominal efficiency.

  xla/<M>     — chained XLA bf16 matmuls (M,M)@(M,M), data-dependent so
                nothing folds away; reports TFLOP/s.
  pallas/<K,TB> — a Pallas kernel that loops `it` dots of (K,K)@(K,TB)
                on VMEM-resident operands (no HBM traffic in the loop);
                reports TFLOP/s per bf16 pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]


def _sync(out):
    # block_until_ready is not a real sync through the axon tunnel;
    # force a scalar readback.
    float(np.asarray(jax.device_get(jnp.sum(out.astype(jnp.float32)))))


def timeit(f, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def exp_xla(M=1024, iters=64, prec=jax.lax.Precision.DEFAULT):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (M, M), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.bfloat16)

    @jax.jit
    def f(a, b):
        def body(x, _):
            y = jax.lax.dot(x, b, precision=prec,
                            preferred_element_type=jnp.bfloat16)
            # renormalise so values stay finite but data-dependent
            y = y * (1.0 / M)
            return y.astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, a, None, length=iters)
        return out

    dt = timeit(f, a, b)
    flops = 2.0 * M * M * M * iters
    print(f"xla/bf16/{M}: {flops / dt / 1e12:.1f} TFLOP/s  ({dt*1e3:.2f} ms)")


def exp_pallas(K=256, TB=512, iters=64):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(w_ref, x_ref, o_ref):
        w = w_ref[...]
        acc = x_ref[...]
        for _ in range(iters):
            acc = jax.lax.dot(w, acc, precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=jnp.float32)
            acc = (acc * (1.0 / K)).astype(jnp.float32)
        o_ref[...] = acc

    w = jax.random.normal(jax.random.PRNGKey(0), (K, K), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (K, TB), jnp.float32)

    @jax.jit
    def f(w, x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((K, TB), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(w.astype(jnp.bfloat16).astype(jnp.float32), x)

    dt = timeit(f, w, x)
    flops = 2.0 * K * K * TB * iters
    print(f"pallas/{K}x{K}@{K}x{TB}: {flops / dt / 1e12:.1f} TFLOP/s  "
          f"({dt*1e3:.2f} ms for {iters} dots)")


if __name__ == "__main__":
    print(f"device: {dev.device_kind}")
    for M in (512, 1024, 2048):
        exp_xla(M)
    for K, TB in ((128, 512), (256, 512), (512, 512), (1024, 256),
                  (256, 2048), (512, 2048)):
        exp_pallas(K, TB)
