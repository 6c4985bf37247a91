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


def exp_mxu(M=4096, reps=8):
    """Pure MXU peak: chained bf16 (M,M)@(M,M) dots, TFLOPs."""
    rng = np.random.RandomState(0)
    a = jax.device_put(rng.randn(M, M).astype(jnp.bfloat16) * 0.01, dev())

    def f(x):
        for _ in range(reps):
            x = jax.lax.dot(x, x, precision=jax.lax.Precision.DEFAULT)
            x = x * 0.001
        return x

    step = jax.jit(f, device=dev())
    r = step(a)
    float(np.asarray(jax.device_get(r[0, 0])))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = step(a)
        float(np.asarray(jax.device_get(r[0, 0])))
        best = min(best, time.perf_counter() - t0)
    fl = reps * 2 * M**3
    print(f"mxu/{M}      {best*1e3:8.3f} ms/{reps} dots  {fl/best/1e12:7.1f} TFLOPs bf16",
          flush=True)


def exp_mxu_f32(M=4096, reps=8):
    """f32 HIGHEST dot peak (6-pass emulation)."""
    rng = np.random.RandomState(0)
    a = jax.device_put(rng.randn(M, M).astype(np.float32) * 0.01, dev())

    def f(x):
        for _ in range(reps):
            x = jax.lax.dot(x, x, precision=jax.lax.Precision.HIGHEST)
            x = x * 0.001
        return x

    step = jax.jit(f, device=dev())
    r = step(a)
    float(np.asarray(jax.device_get(r[0, 0])))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = step(a)
        float(np.asarray(jax.device_get(r[0, 0])))
        best = min(best, time.perf_counter() - t0)
    fl = reps * 2 * M**3
    print(f"mxuf32/{M}   {best*1e3:8.3f} ms/{reps} dots  {fl/best/1e12:7.1f} TFLOPs-equiv f32",
          flush=True)


def exp_mxu_win(K=256, TB=2048, reps=64):
    """Pure window compute: split3+Karatsuba (K,K)@(K,TB) on VMEM-resident
    data inside one Pallas program — no HBM traffic.  Time per full-state
    equivalent = reps such that reps*TB = DIM/K... reported per GFLOP."""
    from jax.experimental.pallas import tpu as pltpu

    w1 = w2_of(K, 1)

    def kern(w_ref, x_ref, o_ref):
        xr = x_ref[0]
        xi = x_ref[1]
        for _ in range(reps):
            yr, yi = _kara(w_ref[0], w_ref[1], xr, xi)
            xr, xi = yr * 0.5, yi * 0.5
        o_ref[0] = xr
        o_ref[1] = xi

    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(2, K, TB).astype(np.float32) * 0.01, dev())

    def f(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((2, K, TB), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(w, x)

    step = jax.jit(f, device=dev())
    r = step(x, w1)
    float(np.asarray(jax.device_get(r[0, 0, 0])))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = step(x, w1)
        float(np.asarray(jax.device_get(r[0, 0, 0])))
        best = min(best, time.perf_counter() - t0)
    # 9 bf16 passes of 2*K*K*TB flops each per rep
    fl = reps * 9 * 2 * K * K * TB
    full_state = best / (reps * TB) * (DIM // K)
    print(f"mxuwin/K{K}  {best*1e3:8.3f} ms/{reps} reps  {fl/best/1e12:7.1f} TFLOPs bf16; "
          f"{full_state*1e3:7.3f} ms per full-state window compute",
          flush=True)


def exp_pallas_mid():
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    w2 = w2_of(256)
    f = lambda x, w: pk.window_apply_ri(x, w, 8, 8, N)
    report("pallas_mid", timeit(f, w2))


def exp_pallas_mid_prec(mode):
    """pallas_mid under a different in-kernel precision: bound diagnosis.

    split3 = 9 bf16 passes/window, highest = 18, raw = 3.  If the time
    scales with passes the kernel is MXU-bound; if flat, DMA-bound."""
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    old = pk.PRECISION_MODE
    if mode == "raw":
        orig = pk._dotp

        def _raw(a, b):
            return jax.lax.dot(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        pk._dotp = _raw
    else:
        pk.set_precision_mode(mode)
    try:
        w2 = w2_of(256)
        f = lambda x, w: pk.window_apply_ri(x, w, 8, 8, N)
        report(f"pallas_mid/{mode}", timeit(f, w2))
    finally:
        if mode == "raw":
            pk._dotp = orig
        else:
            pk.set_precision_mode(old)


def exp_adj():
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    w2 = w2_of(256)

    def f(x, w):
        pp, lp, gw = pk.adjoint_step_ri(x, x * 0.5, w, 8, 8, N)
        return pp + lp * 1e-20 + gw[0, 0, 0] * 1e-20

    sec = timeit(f, w2)
    print(f"adj_mid      {sec*1e3:8.3f} ms/step  {2*PASS_BYTES/sec/1e9:7.1f} GB/s-equiv (4 moves)", flush=True)


def exp_adj_top():
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    w2 = w2_of(256)

    def f(x, w):
        pp, lp, gw = pk.adjoint_step_top_ri(x, x * 0.5, w, 8, N)
        return pp + lp * 1e-20 + gw[0, 0, 0] * 1e-20

    sec = timeit(f, w2)
    print(f"adj_top      {sec*1e3:8.3f} ms/step  {2*PASS_BYTES/sec/1e9:7.1f} GB/s-equiv (4 moves)", flush=True)


def exp_rot_t(tx, ty):
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    pk._ROT_TX = tx
    pk._ROT_TY = ty
    f = lambda x: pk.rotate_ri(x, 8, N)
    report(f"rot8/T{tx}x{ty}", timeit(f))
    pk._ROT_TX = 512
    pk._ROT_TY = 512


def exp_rot():
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    f = lambda x: pk.rotate_ri(x, 8, N)
    report("rot8", timeit(f))


def exp_pallas_top_ta(ta):
    from qml_essentials_tpu.ops import pallas_kernels as pk

    pk.ENABLED = True
    pk._TA_TOP = ta
    w2 = w2_of(256)
    f = lambda x, w: pk.window_apply_top_ri(x, w, 8, N)
    report(f"pallas_top/TA{ta}", timeit(f, w2))
    pk._TA_TOP = 2048


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


# --- unrolled elementwise windows -----------------------------------------
#
# The chip's one fast data path is the XLA elementwise emitter (~788 GB/s
# vs ~220-330 for every DMA/dot/transpose path).  A narrow window unrolled
# into scalar multiply-adds over K slice views is a single elementwise
# fusion: each input element read once per tile, VPU does 4K flops/element.
# Measures where the VPU knee is (K=4..32).


def _unrolled_apply(x, w2, a, k):
    K = 2**k
    A = 2**a
    B = DIM // (A * K)
    t = x.reshape(2, A, K, B)
    mr, mi = w2[0], w2[1]
    tr = [t[0, :, j, :] for j in range(K)]
    ti = [t[1, :, j, :] for j in range(K)]
    outs_r, outs_i = [], []
    for i in range(K):
        o_r = sum(mr[i, j] * tr[j] for j in range(K)) - sum(
            mi[i, j] * ti[j] for j in range(K)
        )
        o_i = sum(mr[i, j] * ti[j] for j in range(K)) + sum(
            mi[i, j] * tr[j] for j in range(K)
        )
        outs_r.append(o_r)
        outs_i.append(o_i)
    out = jnp.stack([jnp.stack(outs_r, axis=1), jnp.stack(outs_i, axis=1)])
    return out.reshape(2, DIM)


def exp_uw(k, a=8):
    w2 = w2_of(2**k)
    f = lambda x, w: _unrolled_apply(x, w, a, k)
    report(f"uw{k}/a{a}", timeit(f, w2))


def exp_uw_acc(k=3, a=8):
    w2np = np.asarray(w2_of(2**k))
    x = args_state()
    got = np.asarray(jax.jit(lambda x, w: _unrolled_apply(x, w, a, k))(x, jax.device_put(w2np, dev())))
    K = 2**k
    A = 2**a
    B = DIM // (A * K)
    xs = np.asarray(x).reshape(2, A, K, B)
    xc = xs[0] + 1j * xs[1]
    m = w2np[0] + 1j * w2np[1]
    ref = np.einsum("ij,ajb->aib", m, xc)
    g = got.reshape(2, A, K, B)
    print(f"uw{k} acc: maxdiff {max(np.abs(g[0]-ref.real).max(), np.abs(g[1]-ref.imag).max()):.3e}",
          flush=True)


def _unrolled_adjoint_pair(ps, w2, a, k):
    """Packed (psi, lam) undo: both states through W^H in ONE fusion.

    ps: (2, 2, DIM) = (state-kind, component, dim)."""
    K = 2**k
    A = 2**a
    B = DIM // (A * K)
    t = ps.reshape(2, 2, A, K, B)
    # W^H = (Re^T, -Im^T)
    mr = jnp.swapaxes(w2[0], 0, 1)
    mi = -jnp.swapaxes(w2[1], 0, 1)
    outs = []
    for s in range(2):
        tr = [t[s, 0, :, j, :] for j in range(K)]
        ti = [t[s, 1, :, j, :] for j in range(K)]
        outs_r, outs_i = [], []
        for i in range(K):
            o_r = sum(mr[i, j] * tr[j] for j in range(K)) - sum(
                mi[i, j] * ti[j] for j in range(K)
            )
            o_i = sum(mr[i, j] * ti[j] for j in range(K)) + sum(
                mi[i, j] * tr[j] for j in range(K)
            )
            outs_r.append(o_r)
            outs_i.append(o_i)
        outs.append(
            jnp.stack([jnp.stack(outs_r, axis=1), jnp.stack(outs_i, axis=1)])
        )
    return jnp.stack(outs).reshape(2, 2, DIM)


def exp_uadj(k, a=8):
    w2 = w2_of(2**k)

    def f(x, w):
        ps = jnp.stack([x, x * 0.5])
        out = _unrolled_adjoint_pair(ps, w, a, k)
        return out[0]

    # traffic: 2 reads + 2 writes (the stack should fuse); report as 2 passes
    sec = timeit(f, w2)
    gbs = 2 * PASS_BYTES / sec / 1e9
    print(f"uadj{k}/a{a}  {sec*1e3:8.3f} ms/apply  {gbs:7.1f} GB/s-equiv (2 states)",
          flush=True)


def exp_gram(k, a=8, precision=None):
    """Window Gram cotangent gw[i,j] = sum_ab lam[a,i,b] psi[a,j,b]."""
    K = 2**k
    A = 2**a
    B = DIM // (A * K)
    lam = jax.device_put(np.float32(0.5) * np.asarray(args_state()), dev())
    prec = precision or jax.lax.Precision.HIGHEST

    def f(x, lam):
        xv = x.reshape(2, A, K, B)
        lv = lam.reshape(2, A, K, B)
        lr, li = lv[0], lv[1]
        xr, xi = xv[0], xv[1]
        s1 = jnp.einsum("aib,ajb->ij", lr, xr, precision=prec)
        s2 = jnp.einsum("aib,ajb->ij", li, xi, precision=prec)
        s3 = jnp.einsum("aib,ajb->ij", lr + li, xr - xi, precision=prec)
        gw = jnp.stack([s1 + s2, s3 - s1 + s2])
        # keep the carry shape: fold gw back trivially
        return x + 1e-30 * gw[0, 0, 0]

    sec = timeit(f, lam)
    gbs = PASS_BYTES / sec / 1e9
    print(f"gram{k}/a{a}  {sec*1e3:8.3f} ms/apply  {gbs:7.1f} GB/s-equiv (2 reads, {prec})",
          flush=True)


def exp_gram_red(k, a=8):
    """Gram via explicit broadcast-multiply + sum (reduction fusion)."""
    K = 2**k
    A = 2**a
    B = DIM // (A * K)
    lam = jax.device_put(np.float32(0.5) * np.asarray(args_state()), dev())

    def f(x, lam):
        xv = x.reshape(2, A, K, B)
        lv = lam.reshape(2, A, K, B)
        lr, li = lv[0], lv[1]
        xr, xi = xv[0], xv[1]
        # (A, K_i, K_j, B) broadcast products, reduced over (A, B)
        s1 = jnp.sum(lr[:, :, None, :] * xr[:, None, :, :], axis=(0, 3))
        s2 = jnp.sum(li[:, :, None, :] * xi[:, None, :, :], axis=(0, 3))
        s3 = jnp.sum(
            (lr + li)[:, :, None, :] * (xr - xi)[:, None, :, :], axis=(0, 3)
        )
        gw = jnp.stack([s1 + s2, s3 - s1 + s2])
        return x + 1e-30 * gw[0, 0, 0]

    sec = timeit(f, lam)
    gbs = PASS_BYTES / sec / 1e9
    print(f"gramred{k}/a{a}  {sec*1e3:8.3f} ms/apply  {gbs:7.1f} GB/s-equiv (2 reads)",
          flush=True)


# --- mega-window: stream blocks once, apply many small gates in VMEM ------
#
# Window [a, a+12) at 24q: state (2, A=32, K=4096, B=128), grid over A
# (TB = B = 128).  Per block (2, 4096, 128):
#   - gates on window qubits m=0..5 (row strides 2048..64, all >= 8
#     sublanes): VPU strided complex mixes
#   - gates on window qubits 6..11: folded into one dense 64x64 matrix,
#     contracted on the MXU (view (64, 64, TB), split3 Karatsuba)
# Compute scales with GATE COUNT, not K*dim — if the pass stays ~1.3 ms
# (DMA-bound) it replaces ~4 dense k=8 windows per pass.

from jax.experimental import pallas as pl  # noqa: E402


def _mega_1q(xr, xi, s, ar, ai, br, bi, cr, ci, dr, di, K, TB):
    """Apply complex 2x2 [[a,b],[c,d]] on the row-stride-s qubit."""
    G = K // (2 * s)
    vr = xr.reshape(G, 2, s, TB)
    vi = xi.reshape(G, 2, s, TB)
    x0r, x1r = vr[:, 0], vr[:, 1]
    x0i, x1i = vi[:, 0], vi[:, 1]
    y0r = ar * x0r - ai * x0i + br * x1r - bi * x1i
    y0i = ar * x0i + ai * x0r + br * x1i + bi * x1r
    y1r = cr * x0r - ci * x0i + dr * x1r - di * x1i
    y1i = cr * x0i + ci * x0r + dr * x1i + di * x1r
    xr = jnp.stack([y0r, y1r], axis=1).reshape(K, TB)
    xi = jnp.stack([y0i, y1i], axis=1).reshape(K, TB)
    return xr, xi


def _mega_crx(xr, xi, sc, st, hr, hi, K, TB):
    """Controlled 2x2 [[hr+i hi ...]] RX-like mix on control stride sc,
    target stride st (sc > st): only the control=1 half mixes."""
    # view (Gc, 2, mid, 2, st, TB) with strides sc, st
    Gc = K // (2 * sc)
    mid = sc // (2 * st)
    vr = xr.reshape(Gc, 2, mid, 2, st, TB)
    vi = xi.reshape(Gc, 2, mid, 2, st, TB)
    # control=1 block
    c1r0, c1r1 = vr[:, 1, :, 0], vr[:, 1, :, 1]
    c1i0, c1i1 = vi[:, 1, :, 0], vi[:, 1, :, 1]
    # RX(theta) = [[cos, -i sin], [-i sin, cos]] : hr=cos, hi=-sin
    y0r = hr * c1r0 - hi * c1i1
    y0i = hr * c1i0 + hi * c1r1
    y1r = hr * c1r1 - hi * c1i0
    y1i = hr * c1i1 + hi * c1r0
    nr = jnp.stack([y0r, y1r], axis=2)
    ni = jnp.stack([y0i, y1i], axis=2)
    xr = jnp.concatenate([vr[:, :1], nr[:, None]], axis=1).reshape(K, TB)
    xi = jnp.concatenate([vi[:, :1], ni[:, None]], axis=1).reshape(K, TB)
    return xr, xi


def _mega_kernel_factory(n1, nc, use_dense):
    def kern(g1_ref, w64_ref, x_ref, o_ref):
        K = x_ref.shape[2]
        TB = x_ref.shape[3]
        xr = x_ref[0, 0]
        xi = x_ref[1, 0]
        # 1q gates on qubits m=0..n1-1 (strides K/2 >> m)
        for g in range(n1):
            m = g % 6
            s = K >> (m + 1)
            ar = g1_ref[g, 0]
            ai = g1_ref[g, 1]
            br = g1_ref[g, 2]
            bi = g1_ref[g, 3]
            cr = g1_ref[g, 4]
            ci = g1_ref[g, 5]
            dr = g1_ref[g, 6]
            di = g1_ref[g, 7]
            xr, xi = _mega_1q(xr, xi, s, ar, ai, br, bi, cr, ci, dr, di, K, TB)
        # entangling stairs on qubits (0,1)..(nc-1,nc)
        for g in range(nc):
            mc = g % 5
            sc = K >> (mc + 1)
            st = K >> (mc + 2)
            hr = g1_ref[g, 0]
            hi = g1_ref[g, 1]
            xr, xi = _mega_crx(xr, xi, sc, st, hr, hi, K, TB)
        if use_dense:
            # dense 64x64 on the bottom 6 window qubits
            Kg = K // 64
            tr = xr.reshape(Kg, 64, TB)
            ti = xi.reshape(Kg, 64, TB)
            wr64 = w64_ref[0]
            wi64 = w64_ref[1]
            outs_r = []
            outs_i = []
            for q in range(Kg):
                t1, t2 = _kara(wr64, wi64, tr[q], ti[q])
                outs_r.append(t1)
                outs_i.append(t2)
            xr = jnp.stack(outs_r).reshape(K, TB)
            xi = jnp.stack(outs_i).reshape(K, TB)
        o_ref[0, 0] = xr
        o_ref[1, 0] = xi

    return kern


# --- big-block window kernel: raise the DMA rate --------------------------
#
# Same K=256 Karatsuba window as pallas_mid but the block covers AC
# consecutive outer indices -> 4-16 MB DMA chunks instead of 512 KB.


def _bigblk_kernel_factory(AC):
    def kern(w_ref, x_ref, o_ref):
        wr = w_ref[0]
        wi = w_ref[1]
        for c in range(AC):
            xr = x_ref[0, c]
            xi = x_ref[1, c]
            t1, t2 = _kara(wr, wi, xr, xi)
            o_ref[0, c] = t1
            o_ref[1, c] = t2

    return kern


def exp_bigblk(AC=8, k=8, a=8, vmem=100, dimsem=None):
    from jax.experimental.pallas import tpu as pltpu

    K = 2**k
    A = 2**a
    B = DIM // (A * K)
    TB = min(1024, B)
    w2 = w2_of(K)
    kern = _bigblk_kernel_factory(AC)

    def f(x, w):
        xv = x.reshape(2, A, K, B)
        y = pl.pallas_call(
            kern,
            grid=(A // AC, B // TB),
            in_specs=[
                pl.BlockSpec((2, K, K), lambda ia, ib: (0, 0, 0)),
                pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
            ],
            out_specs=pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
            out_shape=jax.ShapeDtypeStruct((2, A, K, B), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem * 1024 * 1024,
                dimension_semantics=dimsem,
            ),
        )(w, xv)
        return y.reshape(2, DIM)

    report(f"bigblk/AC{AC}/{dimsem}", timeit(f, w2))


# --- multi-band mega window: two dense 8-qubit bands in one pass ----------
#
# Block (2, K=4096, TB): band A = window bits 7..0 (view (16, 256, TB),
# 16 batched kara dots), band B = window bits 11..4 (view (256, 16*TB),
# one kara dot on the leading axis).  One HBM pass applies both.


def _band2_kernel(wa_ref, wb_ref, x_ref, o_ref):
    K = x_ref.shape[2]
    TB = x_ref.shape[3]
    xr = x_ref[0, 0]
    xi = x_ref[1, 0]
    # band A: bottom 8 bits
    G = K // 256
    tr = xr.reshape(G, 256, TB)
    ti = xi.reshape(G, 256, TB)
    outs_r, outs_i = [], []
    for g in range(G):
        t1, t2 = _kara(wa_ref[0], wa_ref[1], tr[g], ti[g])
        outs_r.append(t1)
        outs_i.append(t2)
    xr = jnp.stack(outs_r).reshape(K, TB)
    xi = jnp.stack(outs_i).reshape(K, TB)
    # band B: top 8 bits (leading-axis contraction, single dot)
    xr2 = xr.reshape(256, (K // 256) * TB)
    xi2 = xi.reshape(256, (K // 256) * TB)
    yr, yi = _kara(wb_ref[0], wb_ref[1], xr2, xi2)
    o_ref[0, 0] = yr.reshape(K, TB)
    o_ref[1, 0] = yi.reshape(K, TB)


def _band2_kernel_stage(wa_ref, wb_ref, x_ref, o_ref):
    K = x_ref.shape[2]
    TB = x_ref.shape[3]
    G = K // 256
    # band A: write each 256-row group straight into o_ref (VMEM staging)
    for g in range(G):
        sl = slice(g * 256, (g + 1) * 256)
        t1, t2 = _kara(wa_ref[0], wa_ref[1], x_ref[0, 0, sl, :], x_ref[1, 0, sl, :])
        o_ref[0, 0, sl, :] = t1
        o_ref[1, 0, sl, :] = t2
    # band B: top 8 bits, one dot over the staged value
    xr2 = o_ref[0, 0].reshape(256, G * TB)
    xi2 = o_ref[1, 0].reshape(256, G * TB)
    yr, yi = _kara(wb_ref[0], wb_ref[1], xr2, xi2)
    o_ref[0, 0] = yr.reshape(K, TB)
    o_ref[1, 0] = yi.reshape(K, TB)


def _band2_kernel_es(wa_ref, wb_ref, x_ref, o_ref):
    K = x_ref.shape[2]
    TB = x_ref.shape[3]
    G = K // 256

    def bkara(wr, wi, xr, xi):
        # batched karatsuba via einsum on (G, 256, TB)
        def d(m, t):
            mh = m.astype(jnp.bfloat16)
            ml = (m - mh.astype(jnp.float32)).astype(jnp.bfloat16)
            th = t.astype(jnp.bfloat16)
            tl = (t - th.astype(jnp.float32)).astype(jnp.bfloat16)
            e = lambda a, b: jnp.einsum(
                "ij,gjt->git", a, b,
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            return e(mh, th) + e(mh, tl) + e(ml, th)

        t1 = d(wr, xr)
        t2 = d(wi, xi)
        t3 = d(wr + wi, xr + xi)
        return t1 - t2, t3 - t1 - t2

    tr = x_ref[0, 0].reshape(G, 256, TB)
    ti = x_ref[1, 0].reshape(G, 256, TB)
    yr, yi = bkara(wa_ref[0], wa_ref[1], tr, ti)
    xr2 = yr.reshape(256, G * TB)
    xi2 = yi.reshape(256, G * TB)
    zr, zi = _kara(wb_ref[0], wb_ref[1], xr2, xi2)
    o_ref[0, 0] = zr.reshape(K, TB)
    o_ref[1, 0] = zi.reshape(K, TB)


def exp_band2v(kern, tag, k=12, TB=128):
    from jax.experimental.pallas import tpu as pltpu

    K = 2**k
    A = DIM // (K * TB)
    wa = w2_of(256, 1)
    wb = w2_of(256, 2)

    def f(x, wa, wb):
        xv = x.reshape(2, A, K, TB)
        y = pl.pallas_call(
            kern,
            grid=(A,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 1, K, TB), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=pl.BlockSpec((2, 1, K, TB), lambda ia: (0, ia, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, A, K, TB), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(wa, wb, xv)
        return y.reshape(2, DIM)

    report(f"band2{tag}/k{k}", timeit(f, wa, wb))


def exp_band2(k=12, TB=128):
    from jax.experimental.pallas import tpu as pltpu

    K = 2**k
    A = DIM // (K * TB)
    wa = w2_of(256, 1)
    wb = w2_of(256, 2)

    def f(x, wa, wb):
        xv = x.reshape(2, A, K, TB)
        y = pl.pallas_call(
            _band2_kernel,
            grid=(A,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 1, K, TB), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=pl.BlockSpec((2, 1, K, TB), lambda ia: (0, ia, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, A, K, TB), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(wa, wb, xv)
        return y.reshape(2, DIM)

    report(f"band2/k{k}", timeit(f, wa, wb))


# --- roll-based row-mix mega kernel ---------------------------------------
#
# Gate primitive: y = A (.) x + B (.) swap_s(x) where swap_s = XOR-stride-s
# row swap (two pltpu.roll + select on a precomputed mask column) and A, B
# are per-row complex coefficient columns computed OUTSIDE the kernel.
# Covers any 1q gate, any controlled-1q gate, and RXX/RYY/RZZ with one mix.


def _rowmix_kernel_factory(ng, strides):
    from jax.experimental.pallas import tpu as pltpu

    def kern(g_ref, x_ref, o_ref):
        # g_ref: (ng, 8) f32 in SMEM — [ar, ai, br, bi, cr, ci, dr, di]
        xr = x_ref[0, 0]
        xi = x_ref[1, 0]
        K, TB = xr.shape
        it = jax.lax.broadcasted_iota(jnp.int32, (K, TB), 0)
        for g in range(ng):
            s = strides[g % len(strides)]
            d = int(np.log2(s))
            bit = ((it >> d) & 1) == 1
            ar0 = g_ref[g, 0]
            ai0 = g_ref[g, 1]
            br0 = g_ref[g, 2]
            bi0 = g_ref[g, 3]
            cr0 = g_ref[g, 4]
            ci0 = g_ref[g, 5]
            dr0 = g_ref[g, 6]
            di0 = g_ref[g, 7]
            Ar = jnp.where(bit, dr0, ar0)
            Ai = jnp.where(bit, di0, ai0)
            Br = jnp.where(bit, cr0, br0)
            Bi = jnp.where(bit, ci0, bi0)
            swr = jnp.where(
                bit,
                pltpu.roll(xr, shift=s, axis=0),
                pltpu.roll(xr, shift=K - s, axis=0),
            )
            swi = jnp.where(
                bit,
                pltpu.roll(xi, shift=s, axis=0),
                pltpu.roll(xi, shift=K - s, axis=0),
            )
            yr = Ar * xr - Ai * xi + Br * swr - Bi * swi
            yi = Ar * xi + Ai * xr + Br * swi + Bi * swr
            xr, xi = yr, yi
        o_ref[0, 0] = xr
        o_ref[1, 0] = xi

    return kern


def exp_rowmix(ng=36, k=12, TB=128, strides=(2048, 1024, 512, 64, 8, 4, 2, 1)):
    from jax.experimental.pallas import tpu as pltpu

    K = 2**k
    A = DIM // (K * TB)
    rng = np.random.RandomState(3)
    g1 = jax.device_put(rng.randn(max(ng, 1), 8).astype(np.float32), dev())
    kern = _rowmix_kernel_factory(ng, strides)

    def f(x, g1):
        xv = x.reshape(2, A, K, TB)
        y = pl.pallas_call(
            kern,
            grid=(A,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2, 1, K, TB), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=pl.BlockSpec((2, 1, K, TB), lambda ia: (0, ia, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, A, K, TB), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(g1, xv)
        return y.reshape(2, DIM)

    report(f"rowmix/{ng}g/k{k}", timeit(f, g1))


def exp_mega(n1=12, nc=5, use_dense=True, k=12, TB=128):
    from jax.experimental.pallas import tpu as pltpu

    K = 2**k
    A = DIM // (K * TB)
    rng = np.random.RandomState(3)
    g1 = jax.device_put(rng.randn(max(n1, nc, 1), 8).astype(np.float32), dev())
    w64 = w2_of(64, 5)
    kern = _mega_kernel_factory(n1, nc, use_dense)

    def f(x, g1, w64):
        xv = x.reshape(2, A, K, TB)
        y = pl.pallas_call(
            kern,
            grid=(A,),
            in_specs=[
                pl.BlockSpec((max(n1, nc, 1), 8), lambda ia: (0, 0)),
                pl.BlockSpec((2, 64, 64), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 1, K, TB), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=pl.BlockSpec((2, 1, K, TB), lambda ia: (0, ia, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, A, K, TB), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(g1, w64, xv)
        return y.reshape(2, DIM)

    report(f"mega/{n1}q1+{nc}crx+d{int(use_dense)}", timeit(f, g1, w64))


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
    "uw2": lambda: exp_uw(2),
    "uw3": lambda: exp_uw(3),
    "uw4": lambda: exp_uw(4),
    "uw5": lambda: exp_uw(5),
    "uw_acc": exp_uw_acc,
    "uadj3": lambda: exp_uadj(3),
    "uadj4": lambda: exp_uadj(4),
    "gram3": lambda: exp_gram(3),
    "gram8": lambda: exp_gram(8),
    "gramred3": lambda: exp_gram_red(3),
    "ew": exp_ew,
    "mxu": exp_mxu,
    "mxu_f32": exp_mxu_f32,
    "mxuwin": exp_mxu_win,
    "pallas_mid": exp_pallas_mid,
    "pm_raw": lambda: exp_pallas_mid_prec("raw"),
    "band2": lambda: exp_band2(12),
    "band2s": lambda: exp_band2v(_band2_kernel_stage, "s", 12),
    "band2e": lambda: exp_band2v(_band2_kernel_es, "e", 12),
    "band2_13": lambda: exp_band2(13),
    "bbarb1": lambda: exp_bigblk(1, dimsem=("arbitrary", "arbitrary")),
    "bbarb2": lambda: exp_bigblk(2, dimsem=("arbitrary", "arbitrary")),
    "bbarb4": lambda: exp_bigblk(4, dimsem=("arbitrary", "arbitrary")),
    "bbarb16": lambda: exp_bigblk(16, dimsem=("arbitrary", "arbitrary")),
    "bbpar": lambda: exp_bigblk(8, dimsem=("parallel", "parallel")),
    "bbarb": lambda: exp_bigblk(8, dimsem=("arbitrary", "arbitrary")),
    "bb2": lambda: exp_bigblk(2),
    "bb4": lambda: exp_bigblk(4),
    "bb8": lambda: exp_bigblk(8),
    "bb16": lambda: exp_bigblk(16),
    "rm0": lambda: exp_rowmix(0),
    "rm6": lambda: exp_rowmix(6),
    "rm12": lambda: exp_rowmix(12),
    "rm36": lambda: exp_rowmix(36),
    "rm36_big": lambda: exp_rowmix(36, strides=(2048, 1024, 512, 256, 128, 64, 32, 16)),
    "mega0": lambda: exp_mega(0, 0, False),
    "mega1": lambda: exp_mega(6, 0, False),
    "mega2": lambda: exp_mega(12, 5, False),
    "mega3": lambda: exp_mega(12, 5, True),
    "mega4": lambda: exp_mega(24, 10, True),
    "pm_hi": lambda: exp_pallas_mid_prec("highest"),
    "pallas_top": exp_pallas_top,
    "adj": exp_adj,
    "adj_top": exp_adj_top,
    "rot": exp_rot,
    "rta": lambda: exp_rot_t(1024, 512),
    "rtb": lambda: exp_rot_t(512, 1024),
    "rtc": lambda: exp_rot_t(1024, 1024),
    "rtd": lambda: exp_rot_t(2048, 256),
    "rte": lambda: exp_rot_t(256, 2048),
    "pt1024": lambda: exp_pallas_top_ta(1024),
    "pt4096": lambda: exp_pallas_top_ta(4096),
    "pt8192": lambda: exp_pallas_top_ta(8192),
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
