"""Round-5 perf experiments: where is the per-pass bandwidth ceiling?

XLA's elementwise emitter streams the 24q state at ~790 GB/s-equiv while
every Pallas pass measured so far pins at 215-310.  These probes separate
the candidate causes:

  copyblk/*   — grid-pipelined VMEM copy at 2/4/8/16 MB blocks (is the
                ceiling DMA-issue overhead amortised by block size?)
  copy1d/*    — same but flat 1-D blocks (is the (2, ...) leading plane
                dim splitting each block into two DMAs?)
  dmадirect/* — HBM->HBM async_copy at various chunk sizes / depths (no
                VMEM round trip at all)
  mcopy/*     — manual HBM->VMEM->HBM pipeline (mdma-style) at various
                chunk sizes / depths
  mwin/*      — manual pipeline + one K=256 window per chunk (does MXU
                compute hide under the manual stream?)

All report GB/s-equiv on the one-pass metric (268 MB moved / time);
roofline = 819.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from exp_r3_micro import (  # noqa: E402
    DIM,
    N,
    _kara,
    args_state,
    dev,
    report,
    timeit,
    w2_of,
)
from jax.experimental import pallas as pl  # noqa: E402


def _pltpu():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu


# --------------------------------------------------------------------------
# Grid-pipelined copy at varying block sizes
# --------------------------------------------------------------------------


def exp_copyblk(mb=2, dimsem="arbitrary"):
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4  # per plane-block
    G = DIM // elems

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def f(x):
        xv = x.reshape(2, G, elems // 256, 256)
        blk = (2, 1, elems // 256, 256)
        y = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[pl.BlockSpec(blk, lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec(blk, lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(xv.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=(dimsem,),
            ),
        )(xv)
        return y.reshape(2, DIM)

    report(f"copyblk/{mb}MB/{dimsem[:3]}", timeit(f))


def exp_copy1d(mb=2):
    """Flat one-plane-at-a-time copy: grid covers both planes."""
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

    report(f"copy1d/{mb}MB", timeit(f))


# --------------------------------------------------------------------------
# Direct HBM->HBM DMA at varying chunk sizes / depths
# --------------------------------------------------------------------------


def exp_dmadirect(mb=8, S=4):
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4
    NCH = 2 * DIM // elems  # chunks across both planes (flat view)

    def kern(x_ref, o_ref, sems):
        for s in range(min(S, NCH)):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(s * elems, elems)],
                o_ref.at[pl.ds(s * elems, elems)],
                sems.at[s],
            ).start()
        for c in range(NCH):
            s = c % S
            pltpu.make_async_copy(
                x_ref.at[pl.ds(c * elems, elems)],
                o_ref.at[pl.ds(c * elems, elems)],
                sems.at[s],
            ).wait()
            if c + S < NCH:
                pltpu.make_async_copy(
                    x_ref.at[pl.ds((c + S) * elems, elems)],
                    o_ref.at[pl.ds((c + S) * elems, elems)],
                    sems.at[s],
                ).start()

    def f(x):
        y = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((2 * DIM,), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((S,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x.reshape(2 * DIM))
        return y.reshape(2, DIM)

    report(f"dmadirect/{mb}MB/S{S}", timeit(f))


# --------------------------------------------------------------------------
# Manual HBM->VMEM->HBM pipeline (no compute)
# --------------------------------------------------------------------------


def _mcopy_call(mb=8, S=2, compute=None, wk=None):
    pltpu = _pltpu()
    elems = mb * 1024 * 1024 // 4
    R = elems // 256
    NCH = 2 * DIM // elems

    def kern(*refs):
        if wk is not None:
            w_ref, x_ref, o_ref, wbuf, xbuf, ybuf, wsem, isems, osems = refs
            pltpu.make_async_copy(w_ref, wbuf, wsem).start()
            pltpu.make_async_copy(w_ref, wbuf, wsem).wait()
        else:
            x_ref, o_ref, xbuf, ybuf, isems, osems = refs
            wbuf = None
        for s in range(min(S, NCH)):
            pltpu.make_async_copy(x_ref.at[s], xbuf.at[s], isems.at[s]).start()
        for c in range(NCH):
            s = c % S
            pltpu.make_async_copy(x_ref.at[c], xbuf.at[s], isems.at[s]).wait()
            if c >= S:
                pltpu.make_async_copy(
                    ybuf.at[s], o_ref.at[c - S], osems.at[s]
                ).wait()
            if compute is None:
                ybuf[s] = xbuf[s]
            else:
                ybuf[s] = compute(xbuf[s], wbuf)
            pltpu.make_async_copy(ybuf.at[s], o_ref.at[c], osems.at[s]).start()
            if c + S < NCH:
                pltpu.make_async_copy(
                    x_ref.at[c + S], xbuf.at[s], isems.at[s]
                ).start()
        for c in range(max(0, NCH - S), NCH):
            s = c % S
            pltpu.make_async_copy(ybuf.at[s], o_ref.at[c], osems.at[s]).wait()

    def f(x, *ws):
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        scratch = [
            pltpu.VMEM((S, R, 256), jnp.float32),
            pltpu.VMEM((S, R, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((S,)),
            pltpu.SemaphoreType.DMA((S,)),
        ]
        if wk is not None:
            in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] + in_specs
            # order: wbuf, xbuf, ybuf, wsem, isems, osems
            scratch = (
                [pltpu.VMEM((2, wk, wk), jnp.float32)]
                + scratch[:2]
                + [pltpu.SemaphoreType.DMA]
                + scratch[2:]
            )
        y = pl.pallas_call(
            kern,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((NCH, R, 256), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
        )(*ws, x.reshape(NCH, R, 256))
        return y.reshape(2, DIM)

    return f


def exp_mcopy(mb=8, S=2):
    f = _mcopy_call(mb, S)
    report(f"mcopy/{mb}MB/S{S}", timeit(f))


# --------------------------------------------------------------------------
# Manual pipeline + one K=256 window per chunk
#
# Chunks are flat runs of the (2, DIM) pair, so a chunk covers one plane's
# contiguous span; the window sits on bits [8, 16) of the flat index
# (rows of a (R, 256)-view row-major block: row bits are [8, 8+log2(R))).
# Real and imag planes arrive in separate chunks, so the complex product
# cannot be formed per-chunk — this probe measures layout/stream cost with
# a REAL matmul per chunk (same MXU shape as one kara term), not gate
# semantics.
# --------------------------------------------------------------------------


def exp_mwin(mb=8, S=2, K=256):
    def compute(xb, wb):
        R = xb.shape[0]
        v = xb.reshape(R // K, K, 256)
        outs = []
        for p in range(R // K):
            outs.append(
                jax.lax.dot_general(
                    wb[0].astype(jnp.bfloat16),
                    v[p].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        return jnp.stack(outs).reshape(xb.shape)

    f = _mcopy_call(mb, S, compute=compute, wk=K)
    w = w2_of(K)
    report(f"mwin/{mb}MB/S{S}", timeit(f, w))


def exp_mwin3(mb=8, S=2, K=256):
    """Three bf16 matmuls per chunk (split3 cost model for one window)."""

    def compute(xb, wb):
        R = xb.shape[0]
        v = xb.reshape(R // K, K, 256)
        wh = wb[0].astype(jnp.bfloat16)
        wl = wb[1].astype(jnp.bfloat16)
        outs = []
        for p in range(R // K):
            vh = v[p].astype(jnp.bfloat16)
            vl = (v[p] - vh.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                wh, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += jax.lax.dot_general(
                wh, vl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += jax.lax.dot_general(
                wl, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(acc)
        return jnp.stack(outs).reshape(xb.shape)

    f = _mcopy_call(mb, S, compute=compute, wk=K)
    w = w2_of(K)
    report(f"mwin3/{mb}MB/S{S}", timeit(f, w))


EXPS = {
    "copyblk2": lambda: exp_copyblk(2),
    "copyblk4": lambda: exp_copyblk(4),
    "copyblk8": lambda: exp_copyblk(8),
    "copyblk16": lambda: exp_copyblk(16),
    "copyblk8par": lambda: exp_copyblk(8, "parallel"),
    "copy1d2": lambda: exp_copy1d(2),
    "copy1d8": lambda: exp_copy1d(8),
    "dmadirect2": lambda: exp_dmadirect(2, 8),
    "dmadirect8": lambda: exp_dmadirect(8, 4),
    "dmadirect16": lambda: exp_dmadirect(16, 4),
    "mcopy4": lambda: exp_mcopy(4, 4),
    "mcopy8": lambda: exp_mcopy(8, 2),
    "mcopy8s4": lambda: exp_mcopy(8, 4),
    "mcopy16": lambda: exp_mcopy(16, 2),
    "mwin8": lambda: exp_mwin(8, 2),
    "mwin8s4": lambda: exp_mwin(8, 4),
    "mwin3_8": lambda: exp_mwin3(8, 2),
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
