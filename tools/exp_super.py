"""Superwindow probe: one HBM pass applying a FACTORED wide window.

A span-``s`` window (K = 2**s up to 8192) is too expensive as a dense
matmul (MXU cost grows linearly in K while the DMA floor is constant), but
as a *product of small sub-windows* applied sequentially to the
VMEM-resident block it needs only ~0.4-0.8 ms of MXU work — below the
~1.19 ms DMA floor of one 24q state pass.  Each sub-window on window wires
[u, v) is a natively-shaped MXU contraction: the block (AC, Ks, TB)
reshapes to (AC*2**u, K, 2**(s-v)*TB) and the dot contracts the sublane
K axis — no transposes (the trick behind ops/chains.py's
_win_rows_apply, here on the PROVEN window-kernel block geometry instead
of the whole-region chain geometry that defeated Mosaic's pipelining).

Experiments:
  fwd12 / fwd13 / fwd14 — forward superwindow at span 12/13/14
  base2 — two sequential K=256 window passes (what the merge replaces)
  bwd12 / bwd13 — residual-autodiff backward (read g + read x, write gp,
                  accumulate per-sub grams): the 3-array pass
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = 24
DIM = 2**N
ITERS = 30
PASS_BYTES = 2 * (2 * DIM * 4)

_DEV = None


def dev():
    global _DEV
    if _DEV is None:
        import qml_essentials_tpu  # noqa: F401
        from qml_essentials_tpu import runtime

        _DEV = runtime.accelerator_device() or jax.devices()[0]
        print(f"device: {_DEV}", flush=True)
    return _DEV


_state = None


def args_state():
    global _state
    if _state is None:
        rng = np.random.RandomState(0)
        s = rng.randn(2, DIM).astype(np.float32)
        s /= np.sqrt((s**2).sum())
        _state = jax.device_put(s, dev())
    return _state


def timeit(fn, *args):
    def many(x):
        def body(c, _):
            return fn(c, *args), None

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    step = jax.jit(many, device=dev())
    x = args_state()
    r = step(x)
    float(np.asarray(jax.device_get(r[0, 0])))

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


def rand_unitary(K, seed=1):
    rng = np.random.RandomState(seed)
    a = rng.randn(K, K) + 1j * rng.randn(K, K)
    q, _ = np.linalg.qr(a)
    return q.astype(np.complex64)


def w2_of(K, seed=1):
    u = rand_unitary(K, seed)
    return jax.device_put(np.stack([u.real, u.imag]).astype(np.float32), dev())


def report(name, sec, extra=""):
    gbs = PASS_BYTES / sec / 1e9
    print(f"{name:12s} {sec*1e3:8.3f} ms/apply  {gbs:7.1f} GB/s-equiv {extra}",
          flush=True)


# ---------------------------------------------------------------------------

from qml_essentials_tpu.ops import pallas_kernels as pk


def _to_kfront(x, u, v, shape):
    """(AC, Ks, TB) block -> (K, rest) with the sub-window axis leading."""
    K = 2 ** (v - u)
    AC, Ks, TB = shape
    P = 2**u
    Q = Ks // (P * K)
    if P == 1 and AC == 1:
        return x.reshape(K, Q * TB)
    return jnp.moveaxis(x.reshape(AC * P, K, Q * TB), 1, 0).reshape(K, -1)


def _from_kfront(y, u, v, shape):
    K = 2 ** (v - u)
    AC, Ks, TB = shape
    P = 2**u
    Q = Ks // (P * K)
    if P == 1 and AC == 1:
        return y.reshape(shape)
    return jnp.moveaxis(
        y.reshape(K, AC * P, Q * TB), 0, 1
    ).reshape(shape)


FORM = os.environ.get("SUPER_FORM", "loop")


def _sub_apply(xr, xi, wr, wi, u, v, s, shape):
    """One sub-window stage on a (AC, Ks, TB) block value.

    loop form: 2**u small dots per product (no data movement);
    kfront form: one wide dot after a VMEM moveaxis (measured slower:
    2.25 vs 1.90 ms at span 12 / M=16)."""
    if FORM == "kfront":
        fr = _to_kfront(xr, u, v, shape)
        fi = _to_kfront(xi, u, v, shape)
        t1 = pk._dotp(wr, fr)
        t2 = pk._dotp(wi, fi)
        t3 = pk._dotp(wr + wi, fr + fi)
        yr = _from_kfront(t1 - t2, u, v, shape)
        yi = _from_kfront(t3 - t1 - t2, u, v, shape)
        return yr, yi
    K = 2 ** (v - u)
    AC, Ks, TB = shape
    P = 2**u
    Q = Ks // (P * K)
    M = AC * P
    NN = Q * TB
    fr = xr.reshape(M, K, NN)
    fi = xi.reshape(M, K, NN)
    outs_r, outs_i = [], []
    for m in range(M):
        t1 = pk._dotp(wr, fr[m])
        t2 = pk._dotp(wi, fi[m])
        t3 = pk._dotp(wr + wi, fr[m] + fi[m])
        outs_r.append(t1 - t2)
        outs_i.append(t3 - t1 - t2)
    yr = jnp.stack(outs_r) if M > 1 else outs_r[0][None]
    yi = jnp.stack(outs_i) if M > 1 else outs_i[0][None]
    return yr.reshape(shape), yi.reshape(shape)


def _make_fwd_kernel(subs, s):
    def kern(*refs):
        x_ref, o_ref = refs[-2], refs[-1]
        xr = x_ref[0]
        xi = x_ref[1]
        shape = xr.shape
        for (u, v), w_ref in zip(subs, refs[: len(subs)]):
            xr, xi = _sub_apply(xr, xi, w_ref[0], w_ref[1], u, v, s, shape)
        o_ref[0] = xr
        o_ref[1] = xi

    return kern


def super_fwd(psi2, w2s, subs, a, s, n, tb):
    from jax.experimental import pallas as pl

    Ks = 2**s
    A = 2**a
    B = DIM // (A * Ks)
    TB = min(tb, B)
    x = psi2.reshape(2, A, Ks, B)
    in_specs = [
        pl.BlockSpec((2, 2 ** (v - u), 2 ** (v - u)), lambda ia, ib: (0, 0, 0))
        for (u, v) in subs
    ] + [pl.BlockSpec((2, 1, Ks, TB), lambda ia, ib: (0, ia, 0, ib))]
    y = pl.pallas_call(
        _make_fwd_kernel(subs, s),
        grid=(A, B // TB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, 1, Ks, TB), lambda ia, ib: (0, ia, 0, ib)),
        out_shape=jax.ShapeDtypeStruct((2, A, Ks, B), psi2.dtype),
        compiler_params=pk._compiler_params(2),
    )(*w2s, x)
    return y.reshape(psi2.shape)


def _make_bwd_kernel(subs, s):
    """Read (g, x) blocks; write gp = (Π W)† g; accumulate per-sub grams."""
    from jax.experimental import pallas as pl

    nsub = len(subs)

    def kern(*refs):
        wrefs = refs[:nsub]
        g_ref, x_ref = refs[nsub], refs[nsub + 1]
        gp_ref = refs[nsub + 2]
        grefs = refs[nsub + 3 :]
        ia = pl.program_id(0)
        ib = pl.program_id(1)

        @pl.when(jnp.logical_and(ia == 0, ib == 0))
        def _init():
            for gref in grefs:
                gref[...] = jnp.zeros_like(gref)

        shape = x_ref[0].shape
        # Forward mid-states: input of each stage j.
        mids = [(x_ref[0], x_ref[1])]
        for j in range(nsub - 1):
            u, v = subs[j]
            w_ref = wrefs[j]
            mr, mi = _sub_apply(
                mids[-1][0], mids[-1][1], w_ref[0], w_ref[1], u, v, s, shape
            )
            mids.append((mr, mi))
        lr, li = g_ref[0], g_ref[1]
        for j in range(nsub - 1, -1, -1):
            u, v = subs[j]
            w_ref = wrefs[j]
            wr, wi = w_ref[0], w_ref[1]
            xr, xi = mids[j]
            if FORM == "kfront":
                fr = _to_kfront(xr, u, v, shape)
                fi = _to_kfront(xi, u, v, shape)
                gr = _to_kfront(lr, u, v, shape)
                gi = _to_kfront(li, u, v, shape)
                # Gram: gw_j += lam_j x_j† (conjugate Karatsuba, bf16).
                s1 = pk._dotg(gr, fr.T)
                s2 = pk._dotg(gi, fi.T)
                s3 = pk._dotg(gr + gi, (fr - fi).T)
                grefs[j][0] += s1 + s2
                grefs[j][1] += s3 - s1 + s2
                # Pullback: lam <- W† lam.
                wrT, wiT = wr.T, wi.T
                t1 = pk._dotp(wrT, gr)
                t2 = pk._dotp(-wiT, gi)
                t3 = pk._dotp(wrT - wiT, gr + gi)
                lr = _from_kfront(t1 - t2, u, v, shape)
                li = _from_kfront(t3 - t1 - t2, u, v, shape)
                continue
            K = 2 ** (v - u)
            AC, Ks, TB = shape
            P = 2**u
            Q = Ks // (P * K)
            M = AC * P
            NN = Q * TB
            fr = xr.reshape(M, K, NN)
            fi = xi.reshape(M, K, NN)
            gr = lr.reshape(M, K, NN)
            gi = li.reshape(M, K, NN)
            s1 = s2 = s3 = None
            outs_r, outs_i = [], []
            wrT, wiT = wr.T, wi.T
            for m in range(M):
                a1 = pk._dotg(gr[m], fr[m].T)
                a2 = pk._dotg(gi[m], fi[m].T)
                a3 = pk._dotg(gr[m] + gi[m], (fr[m] - fi[m]).T)
                s1 = a1 if s1 is None else s1 + a1
                s2 = a2 if s2 is None else s2 + a2
                s3 = a3 if s3 is None else s3 + a3
                t1 = pk._dotp(wrT, gr[m])
                t2 = pk._dotp(-wiT, gi[m])
                t3 = pk._dotp(wrT - wiT, gr[m] + gi[m])
                outs_r.append(t1 - t2)
                outs_i.append(t3 - t1 - t2)
            grefs[j][0] += s1 + s2
            grefs[j][1] += s3 - s1 + s2
            lr = (jnp.stack(outs_r) if M > 1 else outs_r[0][None]).reshape(shape)
            li = (jnp.stack(outs_i) if M > 1 else outs_i[0][None]).reshape(shape)
        gp_ref[0] = lr
        gp_ref[1] = li

    return kern


def super_bwd(g2, psi2, w2s, subs, a, s, n, tb):
    from jax.experimental import pallas as pl

    Ks = 2**s
    A = 2**a
    B = DIM // (A * Ks)
    TB = min(tb, B)
    gv = g2.reshape(2, A, Ks, B)
    xv = psi2.reshape(2, A, Ks, B)
    in_specs = [
        pl.BlockSpec((2, 2 ** (v - u), 2 ** (v - u)), lambda ia, ib: (0, 0, 0))
        for (u, v) in subs
    ] + [
        pl.BlockSpec((2, 1, Ks, TB), lambda ia, ib: (0, ia, 0, ib)),
        pl.BlockSpec((2, 1, Ks, TB), lambda ia, ib: (0, ia, 0, ib)),
    ]
    out_specs = [pl.BlockSpec((2, 1, Ks, TB), lambda ia, ib: (0, ia, 0, ib))] + [
        pl.BlockSpec((2, 2 ** (v - u), 2 ** (v - u)), lambda ia, ib: (0, 0, 0))
        for (u, v) in subs
    ]
    out_shapes = [jax.ShapeDtypeStruct((2, A, Ks, B), g2.dtype)] + [
        jax.ShapeDtypeStruct((2, 2 ** (v - u), 2 ** (v - u)), g2.dtype)
        for (u, v) in subs
    ]
    outs = pl.pallas_call(
        _make_bwd_kernel(subs, s),
        grid=(A, B // TB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pk._compiler_params(2),
    )(*w2s, gv, xv)
    return outs[0].reshape(g2.shape)


def exp_fwd(s, subs, a, tb, tag):
    w2s = [w2_of(2 ** (v - u), seed=3 + i) for i, (u, v) in enumerate(subs)]

    def f(x):
        return super_fwd(x, w2s, subs, a, s, N, tb)

    report(tag, timeit(f), f"subs={subs} a={a} tb={tb}")


def exp_bwd(s, subs, a, tb, tag):
    w2s = [w2_of(2 ** (v - u), seed=3 + i) for i, (u, v) in enumerate(subs)]
    g = args_state()

    def f(x):
        return super_bwd(g, x, w2s, subs, a, s, N, tb)

    report(tag, timeit(f), f"subs={subs} a={a} tb={tb}")


# ---------------------------------------------------------------------------
# bimat: two DISJOINT windows in one pass — W1 on a mid/bottom support
# [a1, a1+k1) contracted on sublanes, W2 on the register top [n-k2, n)
# contracted on lanes.  Block (2, AC, K1, K2): per outer slice
# y = W1 @ X @ W2^T — both dots natively shaped, no transposes, no M-loop.


def bimat_apply(psi2, w12, w22, k1, k2, n, ta=None):
    """Apply W1 ⊗ W2 on the top span [n-k1-k2, n) in one pass.

    W1 acts on [n-k1-k2, n-k2) (sublane dot ``W1 @ X``), W2 on the top
    [n-k2, n) (lane dot ``X @ W2^T``).  Blocks (2, TA, K1, K2) are fully
    contiguous in HBM."""
    from jax.experimental import pallas as pl

    K1, K2 = 2**k1, 2**k2
    ALL = (2**n) // (K1 * K2)
    TA = ta or max(1, (2 * 1024 * 1024) // (K1 * K2 * 4))
    TA = min(TA, ALL)
    x = psi2.reshape(2, ALL, K1, K2)

    def kern(w1_ref, w2_ref, x_ref, o_ref):
        w1r, w1i = w1_ref[0], w1_ref[1]
        w2r, w2i = w2_ref[0].T, w2_ref[1].T
        for c in range(x_ref.shape[1]):
            xr = x_ref[0, c]
            xi = x_ref[1, c]
            t1 = pk._dotp(w1r, xr)
            t2 = pk._dotp(w1i, xi)
            t3 = pk._dotp(w1r + w1i, xr + xi)
            tr = t1 - t2
            ti = t3 - t1 - t2
            u1 = pk._dotp(tr, w2r)
            u2 = pk._dotp(ti, w2i)
            u3 = pk._dotp(tr + ti, w2r + w2i)
            o_ref[0, c] = u1 - u2
            o_ref[1, c] = u3 - u1 - u2

    y = pl.pallas_call(
        kern,
        grid=(ALL // TA,),
        in_specs=[
            pl.BlockSpec((2, K1, K1), lambda ia: (0, 0, 0)),
            pl.BlockSpec((2, K2, K2), lambda ia: (0, 0, 0)),
            pl.BlockSpec((2, TA, K1, K2), lambda ia: (0, ia, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, TA, K1, K2), lambda ia: (0, ia, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, ALL, K1, K2), psi2.dtype),
        compiler_params=pk._compiler_params(1),
    )(w12, w22, x)
    return y.reshape(psi2.shape)


def exp_bimat(k1, k2, tag, ta=None):
    w12 = w2_of(2**k1, seed=3)
    w22 = w2_of(2**k2, seed=4)

    def f(x):
        return bimat_apply(x, w12, w22, k1, k2, N, ta)

    report(tag, timeit(f), f"k1={k1} k2={k2} ta={ta}")


def exp_bimat_check(k1, k2):
    w12 = w2_of(2**k1, seed=3)
    w22 = w2_of(2**k2, seed=4)
    x = args_state()
    y = np.asarray(jax.device_get(bimat_apply(x, w12, w22, k1, k2, N)))
    xh = np.asarray(jax.device_get(x))
    ref = xh[0].astype(np.complex128) + 1j * xh[1]
    for (lo, kk, w2) in ((N - k1 - k2, k1, w12), (N - k2, k2, w22)):
        w2h = np.asarray(jax.device_get(w2))
        mat = w2h[0].astype(np.complex128) + 1j * w2h[1]
        P = 2**lo
        K = 2**kk
        Q = DIM // (P * K)
        ref = np.einsum("kl,plq->pkq", mat, ref.reshape(P, K, Q)).reshape(-1)
    yh = y[0].astype(np.complex128) + 1j * y[1]
    err = np.max(np.abs(yh - ref))
    print(f"bimat check k1={k1} k2={k2}: max_err={err:.2e}", flush=True)


def exp_base2():
    wa = w2_of(256, seed=3)
    wb = w2_of(256, seed=4)

    def f(x):
        y = pk.window_apply_ri(x, wa, 4, 8, N)
        return pk.window_apply_ri(y, wb, 8, 8, N)

    report("base2", timeit(f))


def exp_correct(s, subs, a, tb):
    """Correctness: superwindow == sequential window applies (host numpy)."""
    w2s = [w2_of(2 ** (v - u), seed=3 + i) for i, (u, v) in enumerate(subs)]
    x = args_state()
    y = np.asarray(jax.device_get(super_fwd(x, w2s, subs, a, s, N, tb)))
    xh = np.asarray(jax.device_get(x))
    ref = xh[0].astype(np.complex128) + 1j * xh[1]
    for (u, v), w2 in zip(subs, w2s):
        w2h = np.asarray(jax.device_get(w2))
        mat = w2h[0].astype(np.complex128) + 1j * w2h[1]
        K = 2 ** (v - u)
        lo = a + u
        P = 2**lo
        Q = DIM // (P * K)
        # state layout: axes (P, K, Q) with the window on the middle axis
        ref = np.einsum(
            "kl,plq->pkq", mat, ref.reshape(P, K, Q)
        ).reshape(-1)
    yh = y[0].astype(np.complex128) + 1j * y[1]
    err = np.max(np.abs(yh - ref))
    print(f"correct s={s} subs={subs}: max_err={err:.2e}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["check", "base2", "fwd12", "fwd13", "bwd12"]
    for nm in names:
        if nm == "check":
            exp_correct(12, ((0, 8), (4, 12)), 4, 128)
        elif nm == "bicheck":
            exp_bimat_check(8, 8)
        elif nm == "bimat88":
            exp_bimat(8, 8, "bimat88")
        elif nm == "bimat88b":
            exp_bimat(8, 8, "bimat88_ta16", 16)
        elif nm == "bimat97":
            exp_bimat(9, 7, "bimat97")
        elif nm == "base2":
            exp_base2()
        elif nm == "fwd12":
            exp_fwd(12, ((0, 8), (4, 12)), 4, 128, "fwd12")
        elif nm == "fwd12b":
            exp_fwd(12, ((0, 8), (4, 12)), 4, 256, "fwd12_tb256")
        elif nm == "fwd12c":
            exp_fwd(12, ((0, 8), (4, 12)), 4, 512, "fwd12_tb512")
        elif nm == "fwd13":
            exp_fwd(13, ((0, 8), (5, 13)), 3, 128, "fwd13")
        elif nm == "fwd13b":
            exp_fwd(13, ((0, 9), (5, 13)), 3, 256, "fwd13_k9_tb256")
        elif nm == "fwd14":
            exp_fwd(14, ((0, 8), (4, 12), (8, 14)), 2, 128, "fwd14_3s")
        elif nm == "bwd12":
            exp_bwd(12, ((0, 8), (4, 12)), 4, 128, "bwd12")
        elif nm == "bwd12b":
            exp_bwd(12, ((0, 8), (4, 12)), 4, 256, "bwd12_tb256")
        elif nm == "bwd13":
            exp_bwd(13, ((0, 8), (5, 13)), 3, 128, "bwd13")
        else:
            print(f"unknown probe {nm}")
