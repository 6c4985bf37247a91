"""Round-3 perf experiments: can we beat the ~215 GB/s per-pass ceiling, or
halve the pass count?

Experiments (select by name on the CLI, default all):

  ew        XLA elementwise pass (reference stream bandwidth)
  pallas_mid  current fused window kernel, a=8 k=8 (round-2 baseline)
  pallas_top  current top-window kernel, k=8
  dot_top   single real dot_general for a top window: state (2,K,B) viewed
            as (2K, B), M the (2K,2K) real representation of the window.
            Zero intermediates — tests whether XLA's matmul streams beat
            the Pallas DMA ceiling.
  dot_mid   einsum "rsij,sajb->raib" one-dot mid window (XLA may transpose)
  pair      fused two-window Pallas kernel (k=7+7 adjacent, supports
            [0,7)+[7,14)): one HBM pass applies BOTH windows (output block
            written back in swapped (K2,K1) layout to skip 2 transposes)
  pairT     same but with the back-transpose (output layout unchanged)
  dma       raw HBM->HBM async-copy probe with 8 in-flight DMA streams

Timing: ops chained via lax.scan inside one jit; host readback forces
completion (block_until_ready is a no-op on axon); null-program latency
subtracted.  Reports ms/apply and effective GB/s assuming one state
read+write (2 x 134 MB at n=24).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = 24
DIM = 2**N
ITERS = 30
PASS_BYTES = 2 * (2 * DIM * 4)  # read + write of the (2, 2**n) f32 pair

_DEV = None


def dev():
    """The accelerator device (runtime pins the JAX default to CPU)."""
    global _DEV
    if _DEV is None:
        import qml_essentials_tpu  # noqa: F401 (runtime.configure())
        from qml_essentials_tpu import runtime

        _DEV = runtime.accelerator_device() or jax.devices()[0]
        print(f"device: {_DEV}", flush=True)
    return _DEV


def timeit(fn, *args):
    """Steady-state seconds per call of fn chained ITERS times in one jit."""

    def many(x):
        def body(c, _):
            return fn(c, *args), None

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    step = jax.jit(many, device=dev())
    x = args_state()
    r = step(x)
    float(np.asarray(jax.device_get(r[0, 0])))  # compile + sync

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
        r = step(x)
        float(np.asarray(jax.device_get(r[0, 0])))
        best = min(best, (time.perf_counter() - t0 - lat) / ITERS)
    return best


_state = None


def args_state():
    global _state
    if _state is None:
        rng = np.random.RandomState(0)
        s = rng.randn(2, DIM).astype(np.float32)
        s /= np.sqrt((s**2).sum())
        _state = jax.device_put(s, dev())
    return _state


def rand_unitary(K, seed=1):
    rng = np.random.RandomState(seed)
    a = rng.randn(K, K) + 1j * rng.randn(K, K)
    q, _ = np.linalg.qr(a)
    return q.astype(np.complex64)


def w2_of(K, seed=1):
    u = rand_unitary(K, seed)
    return jax.device_put(
        np.stack([u.real, u.imag]).astype(np.float32), dev()
    )


def report(name, sec, extra=""):
    gbs = PASS_BYTES / sec / 1e9
    print(f"{name:12s} {sec*1e3:8.3f} ms/apply  {gbs:7.1f} GB/s-equiv {extra}",
          flush=True)


# ---------------------------------------------------------------------------


def exp_ew():
    f = lambda x: x * 1.000001 + 1e-12
    report("ew", timeit(f))


def exp_pallas_mid():
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    w2 = w2_of(256)
    f = lambda x, w: pk.window_apply_ri(x, w, 8, 8, N)
    report("pallas_mid", timeit(f, w2))


def exp_pallas_top():
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    w2 = w2_of(256)
    f = lambda x, w: pk.window_apply_top_ri(x, w, 8, N)
    report("pallas_top", timeit(f, w2))


def _real_rep(w2np, K):
    """(2K, 2K) real representation [[Wr, -Wi], [Wi, Wr]]."""
    wr, wi = w2np[0], w2np[1]
    return np.block([[wr, -wi], [wi, wr]]).astype(np.float32)


def exp_dot_top(precision):
    K = 256
    w2 = np.asarray(w2_of(K))
    M = jax.device_put(_real_rep(w2, K), dev())
    B = DIM // K

    def f(x, M):
        y = jax.lax.dot_general(
            M, x.reshape(2 * K, B),
            (((1,), (0,)), ((), ())),
            precision=precision,
        )
        return y.reshape(2, DIM)

    report(f"dot_top/{precision}", timeit(f, M))


def exp_dot_top_acc():
    """Accuracy of dot_top at HIGH vs the Pallas split3 kernel vs HIGHEST."""
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    K = 256
    w2np = np.asarray(w2_of(K))
    M = jax.device_put(_real_rep(w2np, K), dev())
    B = DIM // K
    x = args_state()

    def dot(x, M, prec):
        return jax.lax.dot_general(
            M, x.reshape(2 * K, B), (((1,), (0,)), ((), ())), precision=prec
        ).reshape(2, DIM)

    hi = jax.jit(partial(dot, prec=jax.lax.Precision.HIGHEST))(x, M)
    h = jax.jit(partial(dot, prec=jax.lax.Precision.HIGH))(x, M)
    w2 = jax.device_put(w2np)
    pal = jax.jit(lambda x, w: pk.window_apply_top_ri(x, w, 8, N))(x, w2)
    hi, h, pal = map(np.asarray, (hi, h, pal))
    print(f"dot_top acc: HIGH vs HIGHEST maxdiff {np.abs(h-hi).max():.3e}; "
          f"pallas split3 vs HIGHEST {np.abs(pal-hi).max():.3e}", flush=True)


def exp_dot_mid(precision):
    K = 256
    A = 256
    B = DIM // (K * A)
    w2np = np.asarray(w2_of(K))
    # M[r,i,s,j]
    wr, wi = w2np[0], w2np[1]
    M4 = np.zeros((2, K, 2, K), np.float32)
    M4[0, :, 0, :] = wr
    M4[0, :, 1, :] = -wi
    M4[1, :, 0, :] = wi
    M4[1, :, 1, :] = wr
    M4 = jax.device_put(M4, dev())

    def f(x, M4):
        xv = x.reshape(2, A, K, B)
        y = jnp.einsum("risj,sajb->raib", M4, xv, precision=precision)
        return y.reshape(2, DIM)

    report(f"dot_mid/{precision}", timeit(f, M4))


# --- mid+top pair kernel (transpose-free) ---------------------------------
#
# Windows [a1, a1+k1) (mid) and [n-k2, n) (top): state viewed as
# (2, A, K1, M, K2) — window-1 contraction hits the LEADING axis of the
# (K1, M*K2) view and window-2 the TRAILING (lane) axis, so both are
# natural MXU matmuls with zero in-kernel transposes.


def _pairmt_kernel(w1_ref, w2_ref, x_ref, o_ref):
    K1 = x_ref.shape[2]
    TM = x_ref.shape[3]
    K2 = x_ref.shape[4]
    xr = x_ref[0, 0].reshape(K1, TM * K2)
    xi = x_ref[1, 0].reshape(K1, TM * K2)
    yr, yi = _kara(w1_ref[0], w1_ref[1], xr, xi)
    yr = yr.reshape(K1 * TM, K2)
    yi = yi.reshape(K1 * TM, K2)
    # trailing contraction: z = y @ W2^T
    w2rT = w2_ref[0].T
    w2iT = w2_ref[1].T
    t1 = _dotp(yr, w2rT)
    t2 = _dotp(yi, w2iT)
    t3 = _dotp(yr + yi, w2rT + w2iT)
    o_ref[0, 0] = (t1 - t2).reshape(K1, TM, K2)
    o_ref[1, 0] = (t3 - t1 - t2).reshape(K1, TM, K2)


def _pairmt_call(k1, k2, a1, TM):
    from jax.experimental.pallas import tpu as pltpu

    K1, K2 = 2**k1, 2**k2
    A = 2**a1
    M = DIM // (A * K1 * K2)
    TM = min(TM, M)
    w1 = w2_of(K1, 1)
    w2 = w2_of(K2, 2)

    def f(x, w1, w2):
        xv = x.reshape(2, A, K1, M, K2)
        y = pl.pallas_call(
            _pairmt_kernel,
            grid=(A, M // TM),
            in_specs=[
                pl.BlockSpec((2, K1, K1), lambda ia, im: (0, 0, 0)),
                pl.BlockSpec((2, K2, K2), lambda ia, im: (0, 0, 0)),
                pl.BlockSpec((2, 1, K1, TM, K2),
                             lambda ia, im: (0, ia, 0, im, 0)),
            ],
            out_specs=pl.BlockSpec((2, 1, K1, TM, K2),
                                   lambda ia, im: (0, ia, 0, im, 0)),
            out_shape=jax.ShapeDtypeStruct((2, A, K1, M, K2), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(w1, w2, xv)
        return y.reshape(2, DIM)

    return f, w1, w2


def exp_pairmt(k1=8, k2=8, a1=8, TM=8):
    f, w1, w2 = _pairmt_call(k1, k2, a1, TM)
    report(f"pairmt/{k1}+{k2}/a{a1}/TM{TM}", timeit(f, w1, w2),
           "(mid+top per pass)")


def exp_pairmt_acc():
    from qml_essentials_tpu.ops import kernels as kr

    f, w1, w2 = _pairmt_call(7, 7, 8, 8)
    x = args_state()
    got = np.asarray(jax.jit(f, device=dev())(x, w1, w2))
    y = kr.apply_matrix_pair_ri(x, w1, list(range(8, 15)), N)
    y = kr.apply_matrix_pair_ri(y, w2, list(range(17, 24)), N)
    y = np.asarray(y)
    print(f"pairmt acc: maxdiff vs einsum ref {np.abs(got-y).max():.3e}",
          flush=True)


# --- pair kernel ----------------------------------------------------------

from jax.experimental import pallas as pl  # noqa: E402


def _dotp(a, b):
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda x, y: jax.lax.dot(
        x, y, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _kara(wr, wi, xr, xi):
    t1 = _dotp(wr, xr)
    t2 = _dotp(wi, xi)
    t3 = _dotp(wr + wi, xr + xi)
    return t1 - t2, t3 - t1 - t2


def _pair_kernel_swap(w1_ref, w2_ref, x_ref, o_ref):
    K1 = x_ref.shape[2]
    K2 = x_ref.shape[3]
    TB = x_ref.shape[4]
    xr = x_ref[0, 0].reshape(K1, K2 * TB)
    xi = x_ref[1, 0].reshape(K1, K2 * TB)
    yr, yi = _kara(w1_ref[0], w1_ref[1], xr, xi)
    yr = jnp.transpose(yr.reshape(K1, K2, TB), (1, 0, 2)).reshape(K2, K1 * TB)
    yi = jnp.transpose(yi.reshape(K1, K2, TB), (1, 0, 2)).reshape(K2, K1 * TB)
    zr, zi = _kara(w2_ref[0], w2_ref[1], yr, yi)
    o_ref[0, 0] = zr.reshape(K2, K1, TB)
    o_ref[1, 0] = zi.reshape(K2, K1, TB)


def _pair_kernel_T(w1_ref, w2_ref, x_ref, o_ref):
    K1 = x_ref.shape[2]
    K2 = x_ref.shape[3]
    TB = x_ref.shape[4]
    xr = x_ref[0, 0].reshape(K1, K2 * TB)
    xi = x_ref[1, 0].reshape(K1, K2 * TB)
    yr, yi = _kara(w1_ref[0], w1_ref[1], xr, xi)
    yr = jnp.transpose(yr.reshape(K1, K2, TB), (1, 0, 2)).reshape(K2, K1 * TB)
    yi = jnp.transpose(yi.reshape(K1, K2, TB), (1, 0, 2)).reshape(K2, K1 * TB)
    zr, zi = _kara(w2_ref[0], w2_ref[1], yr, yi)
    o_ref[0, 0] = jnp.transpose(zr.reshape(K2, K1, TB), (1, 0, 2))
    o_ref[1, 0] = jnp.transpose(zi.reshape(K2, K1, TB), (1, 0, 2))


def _pair_call(kernel, swap, k1, k2, TB):
    from jax.experimental.pallas import tpu as pltpu

    K1, K2 = 2**k1, 2**k2
    A = 1
    B = DIM // (K1 * K2)
    w1 = w2_of(K1, 1)
    w2 = w2_of(K2, 2)
    oshape = (2, A, K2, K1, B) if swap else (2, A, K1, K2, B)
    oblock = (2, 1, K2, K1, TB) if swap else (2, 1, K1, K2, TB)

    def f(x, w1, w2):
        xv = x.reshape(2, A, K1, K2, B)
        y = pl.pallas_call(
            kernel,
            grid=(A, B // TB),
            in_specs=[
                pl.BlockSpec((2, K1, K1), lambda ia, ib: (0, 0, 0)),
                pl.BlockSpec((2, K2, K2), lambda ia, ib: (0, 0, 0)),
                pl.BlockSpec((2, 1, K1, K2, TB),
                             lambda ia, ib: (0, ia, 0, 0, ib)),
            ],
            out_specs=pl.BlockSpec(oblock, lambda ia, ib: (0, ia, 0, 0, ib)),
            out_shape=jax.ShapeDtypeStruct(oshape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )(w1, w2, xv)
        return y.reshape(2, DIM)

    return f, w1, w2


def exp_pair(TB):
    f, w1, w2 = _pair_call(_pair_kernel_swap, True, 7, 7, TB)
    report(f"pair/TB{TB}", timeit(f, w1, w2), "(2 windows per pass)")


def exp_pairT(TB):
    f, w1, w2 = _pair_call(_pair_kernel_T, False, 7, 7, TB)
    report(f"pairT/TB{TB}", timeit(f, w1, w2), "(2 windows per pass)")


def exp_pair8(TB):
    f, w1, w2 = _pair_call(_pair_kernel_swap, True, 8, 8, TB)
    report(f"pair8/TB{TB}", timeit(f, w1, w2), "(2x k=8 per pass)")


def exp_pair_acc():
    """Pair kernel vs two sequential Pallas window applies."""
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    f, w1, w2 = _pair_call(_pair_kernel_swap, True, 7, 7, 128)
    x = args_state()
    got = np.asarray(jax.jit(f)(x, w1, w2))
    # reference: apply w1 on [0,7), w2 on [7,14) with einsum path, then
    # swap blocks to match the swapped output layout
    from qml_essentials_tpu.ops import kernels as kr

    y = kr.apply_matrix_pair_ri(x, w1, list(range(0, 7)), N)
    y = kr.apply_matrix_pair_ri(y, w2, list(range(7, 14)), N)
    yv = np.asarray(y).reshape(2, 128, 128, -1).transpose(0, 2, 1, 3).reshape(2, DIM)
    print(f"pair acc: maxdiff vs einsum ref {np.abs(got-yv).max():.3e}",
          flush=True)


def exp_dma():
    """8-in-flight HBM->HBM DMA copy probe."""
    from jax.experimental.pallas import tpu as pltpu

    NCH = 32
    CH = DIM // NCH  # elements per plane-chunk

    def kern(x_ref, o_ref, sems):
        for s in range(8):
            pltpu.make_async_copy(
                x_ref.at[:, pl.ds(s * CH, CH)],
                o_ref.at[:, pl.ds(s * CH, CH)],
                sems.at[s],
            ).start()
        for c in range(8, NCH):
            s = c % 8
            pltpu.make_async_copy(
                x_ref.at[:, pl.ds((c - 8) * CH, CH)],
                o_ref.at[:, pl.ds((c - 8) * CH, CH)],
                sems.at[s],
            ).wait()
            pltpu.make_async_copy(
                x_ref.at[:, pl.ds(c * CH, CH)],
                o_ref.at[:, pl.ds(c * CH, CH)],
                sems.at[s],
            ).start()
        for c in range(NCH - 8, NCH):
            s = c % 8
            pltpu.make_async_copy(
                x_ref.at[:, pl.ds(c * CH, CH)],
                o_ref.at[:, pl.ds(c * CH, CH)],
                sems.at[s],
            ).wait()

    def f(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((2, DIM), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    report("dma8", timeit(f))


def _mdma_top_call(S=4, NCH=32, k=8):
    """Top-window apply with MANUAL DMA pipelining: S in-flight slots of
    explicit HBM->VMEM / VMEM->HBM async copies, MXU compute overlapped.
    The auto-pipelined BlockSpec grid pins at ~230 GB/s; the raw 8-stream
    copy probe reaches ~331 GB/s — this measures whether a compute kernel
    can ride the faster path."""
    from jax.experimental.pallas import tpu as pltpu

    K = 2**k
    A = DIM // K
    TA = A // NCH
    w2 = w2_of(K)

    def kern(w_ref, x_ref, o_ref, wbuf, xbuf, ybuf, wsem, isems, osems):
        pltpu.make_async_copy(w_ref, wbuf, wsem).start()
        pltpu.make_async_copy(w_ref, wbuf, wsem).wait()
        wrT = wbuf[0].T
        wiT = wbuf[1].T
        for s in range(min(S, NCH)):
            pltpu.make_async_copy(
                x_ref.at[:, pl.ds(s * TA, TA)], xbuf.at[s], isems.at[s]
            ).start()
        for c in range(NCH):
            s = c % S
            pltpu.make_async_copy(
                x_ref.at[:, pl.ds(c * TA, TA)], xbuf.at[s], isems.at[s]
            ).wait()
            if c >= S:
                pltpu.make_async_copy(
                    o_ref.at[:, pl.ds((c - S) * TA, TA)],
                    ybuf.at[s],
                    osems.at[s],
                ).wait()
            xr = xbuf[s, 0]
            xi = xbuf[s, 1]
            t1 = _dotp(xr, wrT)
            t2 = _dotp(xi, wiT)
            t3 = _dotp(xr + xi, wrT + wiT)
            ybuf[s, 0] = t1 - t2
            ybuf[s, 1] = t3 - t1 - t2
            pltpu.make_async_copy(
                ybuf.at[s], o_ref.at[:, pl.ds(c * TA, TA)], osems.at[s]
            ).start()
            if c + S < NCH:
                pltpu.make_async_copy(
                    x_ref.at[:, pl.ds((c + S) * TA, TA)],
                    xbuf.at[s],
                    isems.at[s],
                ).start()
        for c in range(max(0, NCH - S), NCH):
            s = c % S
            pltpu.make_async_copy(
                ybuf.at[s], o_ref.at[:, pl.ds(c * TA, TA)], osems.at[s]
            ).wait()

    def f(x, w):
        y = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((2, A, K), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, K, K), jnp.float32),
                pltpu.VMEM((S, 2, TA, K), jnp.float32),
                pltpu.VMEM((S, 2, TA, K), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((S,)),
                pltpu.SemaphoreType.DMA((S,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
        )(w, x.reshape(2, A, K))
        return y.reshape(2, DIM)

    return f, w2


def exp_mdma_top(S=4, NCH=32, k=8):
    f, w2 = _mdma_top_call(S, NCH, k)
    report(f"mdma_top/S{S}/N{NCH}", timeit(f, w2))


def exp_mdma_top_acc():
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    f, w2 = _mdma_top_call(4, 32)
    x = args_state()
    ref = np.asarray(
        jax.jit(lambda x, w: pk.window_apply_top_ri(x, w, 8, N))(x, w2)
    )
    got = np.asarray(jax.jit(f, device=dev())(x, w2))
    print(f"mdma_top acc: maxdiff vs pallas_top {np.abs(got-ref).max():.3e}",
          flush=True)


EXPS = {
    "ew": exp_ew,
    "pallas_mid": exp_pallas_mid,
    "pallas_top": exp_pallas_top,
    "dot_top": lambda: (exp_dot_top(jax.lax.Precision.HIGH),
                        exp_dot_top(jax.lax.Precision.HIGHEST)),
    "dot_top_acc": exp_dot_top_acc,
    "dot_mid": lambda: exp_dot_mid(jax.lax.Precision.HIGH),
    "pair": lambda: exp_pair(128),
    "pair256": lambda: exp_pair(256),
    "pairmt": lambda: exp_pairmt(8, 8, 8, 8),
    "pairmt77": lambda: exp_pairmt(7, 7, 8, 8),
    "pairmt_adj": lambda: exp_pairmt(8, 8, 16, 1),
    "pairmt_TM32": lambda: exp_pairmt(8, 8, 8, 32),
    "pairmt_acc": exp_pairmt_acc,
    "pairT": lambda: exp_pairT(128),
    "pair8": lambda: exp_pair8(32),
    "pair_acc": exp_pair_acc,
    "dma": exp_dma,
    "mdma_top": lambda: exp_mdma_top(4, 32),
    "mdma_top8": lambda: exp_mdma_top(8, 32),
    "mdma_top64": lambda: exp_mdma_top(8, 64),
    "mdma_top_acc": exp_mdma_top_acc,
}


def main():
    names = sys.argv[1:] or list(EXPS)
    import qml_essentials_tpu  # noqa: F401

    for nm in names:
        try:
            EXPS[nm]()
        except Exception as e:
            print(f"{nm:12s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
