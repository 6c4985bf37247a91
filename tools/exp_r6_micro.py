"""Round-6 perf experiments: is the ~225 GB/s Pallas ceiling per-DMA-stream?

The backward kernels (3 arrays per pass) average ~0.69 ms/pass while the
forward window kernels (1 array in, 1 out) take ~1.16 ms — per-array DMA
queues may each pin at ~110 GB/s while the aggregate scales.  Probes:

  ew          — XLA elementwise y = x * c (the ~790 GB/s reference)
  copy1       — baseline grid-pipelined copy, one operand (re-check ~225)
  copysplit2  — SAME bytes split into 2 operands + 2 outputs per grid step
  copysplit4  — split into 4 operands + 4 outputs
  copybf16    — one-operand copy in bf16 (same element count, half bytes):
                if time matches f32, the ceiling is transfer-count-bound
  copylane<L> — lane-dim variants (128 / 512 / 1024 wide rows)

All report GB/s on the bytes actually moved (read + write).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from exp_r3_micro import (  # noqa: E402
    DIM,
    PASS_BYTES,
    args_state,
    dev,
    timeit,
)
from jax.experimental import pallas as pl  # noqa: E402


def _pltpu():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu


def report_bytes(name, sec, nbytes):
    print(
        f"{name:16s} {sec*1e3:8.3f} ms/apply  {nbytes/sec/1e9:7.1f} GB/s",
        flush=True,
    )


def exp_ew():
    def f(x):
        return x * jnp.float32(1.0000001)

    report_bytes("ew", timeit(f), PASS_BYTES)


def exp_copy1(mb=4):
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4
    G = 2 * DIM // elems

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def f(x):
        xv = x.reshape(G, elems // 256, 256)
        blk = (1, elems // 256, 256)
        y = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec(blk, lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(xv.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(xv)
        return y.reshape(2, DIM)

    report_bytes(f"copy1/{mb}MB", timeit(f), PASS_BYTES)


def _copysplit(ways, mb=2):
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4  # per-operand block elements
    per = 2 * DIM // ways  # elements per operand
    G = per // elems

    def kern(*refs):
        ins, outs = refs[:ways], refs[ways:]
        for i, o in zip(ins, outs):
            o[...] = i[...]

    blk = (1, elems // 256, 256)

    def f(x):
        xs = [
            x.reshape(ways, G, elems // 256, 256)[w] for w in range(ways)
        ]
        ys = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec(blk, lambda i: (i, 0, 0))] * ways,
            out_specs=[pl.BlockSpec(blk, lambda i: (i, 0, 0))] * ways,
            out_shape=[
                jax.ShapeDtypeStruct(xs[0].shape, jnp.float32)
            ] * ways,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(*xs)
        return jnp.stack(ys).reshape(2, DIM)

    report_bytes(f"copysplit{ways}/{mb}MB", timeit(f), PASS_BYTES)


def exp_copybf16(mb=4):
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 2  # bf16 elements per block (mb MB)
    total = 2 * DIM  # same element count as the f32 pair
    G = total // elems

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def f(x):
        xv = x.astype(jnp.bfloat16).reshape(G, elems // 256, 256)
        y = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec((1, elems // 256, 256), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, elems // 256, 256), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(xv.shape, jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(xv)
        return y.astype(jnp.float32).reshape(2, DIM)

    report_bytes(f"copybf16/{mb}MB", timeit(f), PASS_BYTES)


def exp_copylane(L=512, mb=4):
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4
    G = 2 * DIM // elems

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def f(x):
        xv = x.reshape(G, elems // L, L)
        blk = (1, elems // L, L)
        y = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec(blk, lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec(blk, lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(xv.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(xv)
        return y.reshape(2, DIM)

    report_bytes(f"copylane{L}/{mb}MB", timeit(f), PASS_BYTES)


EXPS = {
    "ew": exp_ew,
    "copy1": lambda: exp_copy1(4),
    "copysplit2": lambda: _copysplit(2, 2),
    "copysplit2b": lambda: _copysplit(2, 4),
    "copysplit4": lambda: _copysplit(4, 2),
    "copybf16": lambda: exp_copybf16(4),
    "copylane128": lambda: exp_copylane(128, 4),
    "copylane512": lambda: exp_copylane(512, 4),
    "copylane1024": lambda: exp_copylane(1024, 4),
}


def main():
    names = sys.argv[1:] or list(EXPS)
    for nm in names:
        try:
            EXPS[nm]()
        except Exception as e:  # noqa: BLE001
            print(f"{nm}: FAILED {type(e).__name__}: {e}", flush=True)




def exp_copyplanes(P=2, mb_total=4):
    """One operand whose block has a strided leading dim of P: each grid
    step issues P separate sub-block DMAs (descriptor-level concurrency
    without extra operands or output stacking)."""
    pltpu = _pltpu()
    elems = mb_total * 1024 * 1024 // 4 // P  # per sub-block
    G = 2 * DIM // (P * elems)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def f(x):
        xv = x.reshape(P, G, elems // 256, 256)
        blk = (P, 1, elems // 256, 256)
        y = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec(blk, lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec(blk, lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(xv.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(xv)
        return y.reshape(2, DIM)

    report_bytes(f"copyplanes{P}/{mb_total}MB", timeit(f), PASS_BYTES)


for _p in (1, 2, 4, 8, 16):
    EXPS[f"copyplanes{_p}"] = (lambda p: lambda: exp_copyplanes(p, 4))(_p)
EXPS["copyplanes8big"] = lambda: exp_copyplanes(8, 16)


def exp_readonly(mb=2):
    """Read the full state, write one tiny block per grid step (reduction)."""
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4 // 2  # per plane sub-block
    G = DIM // elems

    def kern(x_ref, o_ref):
        o_ref[...] = jnp.sum(x_ref[...], axis=(1, 2, 3), keepdims=True)

    def f(x):
        xv = x.reshape(2, G, elems // 256, 256)
        y = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec((2, 1, elems // 256, 256),
                                   lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((2, 1, 1, 1), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, G, 1, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(xv)
        # keep the state flowing through scan; fold the sums in cheaply
        return x + jnp.sum(y) * jnp.float32(1e-30)

    report_bytes(f"readonly/{mb}MB", timeit(f), PASS_BYTES // 2)


def exp_writeonly(mb=2):
    """Write the full state from a tiny input per grid step (broadcast)."""
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4 // 2
    G = DIM // elems

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[0, 0, 0, 0] * jnp.ones_like(o_ref)

    def f(x):
        xv = x.reshape(2, G, elems // 256, 256)
        seeds = jnp.zeros((2, G, 1, 1), jnp.float32) + x[0, 0]
        y = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec((2, 1, 1, 1), lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((2, 1, elems // 256, 256),
                                   lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(xv.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(seeds)
        return y.reshape(2, DIM)

    report_bytes(f"writeonly/{mb}MB", timeit(f), PASS_BYTES // 2)


def exp_copyalias(mb=2):
    """Grid-pipelined copy with the input donated as the output buffer."""
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4 // 2
    G = DIM // elems

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * jnp.float32(1.0000001)

    def f(x):
        xv = x.reshape(2, G, elems // 256, 256)
        blk = (2, 1, elems // 256, 256)
        y = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec(blk, lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec(blk, lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(xv.shape, jnp.float32),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(xv)
        return y.reshape(2, DIM)

    report_bytes(f"copyalias/{mb}MB", timeit(f), PASS_BYTES)


EXPS["readonly"] = lambda: exp_readonly(2)
EXPS["readonly4"] = lambda: exp_readonly(4)
EXPS["writeonly"] = lambda: exp_writeonly(2)
EXPS["copyalias"] = lambda: exp_copyalias(2)


def exp_readslice(mb=2):
    """Read the full state, write a tiny slice per grid step."""
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4 // 2
    R = elems // 256
    G = DIM // elems

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[:, :, :8, :128]

    def f(x):
        xv = x.reshape(2, G, R, 256)
        y = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec((2, 1, R, 256), lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((2, 1, 8, 128), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, G, 8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(xv)
        return x + y[0, 0, 0, 0] * jnp.float32(1e-30)

    report_bytes(f"readslice/{mb}MB", timeit(f), PASS_BYTES // 2)


def exp_halfmanual(mb=2, S=2):
    """Mosaic auto-pipelined input + manual async output DMA ring.

    Tests whether taking the output write out of Mosaic's serialized
    in->compute->out step schedule lets read and write streams overlap.
    """
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4 // 2  # per-plane block elems
    R = elems // 256
    G = DIM // elems

    def kern(x_ref, o_hbm, ybuf, osems):
        i = pl.program_id(0)
        s = jax.lax.rem(i, S)

        @pl.when(i >= S)
        def _wait_prev():
            pltpu.make_async_copy(
                ybuf.at[s], o_hbm.at[:, i - S], osems.at[s]
            ).wait()

        ybuf[s] = x_ref[:, 0]
        pltpu.make_async_copy(
            ybuf.at[s], o_hbm.at[:, i], osems.at[s]
        ).start()

        @pl.when(i == G - 1)
        def _drain():
            for d in range(S):
                c = G - 1 - d
                pltpu.make_async_copy(
                    ybuf.at[jax.lax.rem(c, S)], o_hbm.at[:, c],
                    osems.at[jax.lax.rem(c, S)],
                ).wait()

    def f(x):
        xv = x.reshape(2, G, R, 256)
        y = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec((2, 1, R, 256), lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((2, G, R, 256), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((S, 2, R, 256), jnp.float32),
                pltpu.SemaphoreType.DMA((S,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
                has_side_effects=True,
            ),
        )(xv)
        return y.reshape(2, DIM)

    report_bytes(f"halfmanual/{mb}MB/S{S}", timeit(f), PASS_BYTES)


EXPS["readslice"] = lambda: exp_readslice(2)
EXPS["halfmanual"] = lambda: exp_halfmanual(2, 2)
EXPS["halfmanual4"] = lambda: exp_halfmanual(2, 4)
EXPS["halfmanual4b"] = lambda: exp_halfmanual(4, 4)

if __name__ == "__main__":
    main()
