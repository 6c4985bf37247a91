"""Round-4 perf experiments: multi-window *chain* kernels.

One HBM pass applies a whole group of windows to a block that keeps a wide
contiguous span of the register resident in VMEM:

  chainlo  — block (2, GC, 1024, 128) = wires [0, 17) complete
             (lanes = wires 0..6, rows = wires 7..16), grid over the top
             7 wires.  Applies three K=256 windows in one pass:
               [0, 8)  minor-collapse matmul  (GC*512, 256) @ W^T
               [7,15)  row-axis kara dots     W @ (256, 128) x 4*GC
               [9,17)  leading-axis kara dot  W @ (256, 512) x GC
  chainhi  — block (2, 256, LC) = wires [16, 24) complete (rows), LC-lane
             chunks of wires [0, 16).  Applies a [16, 24) window plus a
             two-bit diagonal on wires (23, 0) — the transpiled remnant of
             a ring-wrap entangler (conjugators absorbed into low windows).
  adjlo    — fused adjoint-state backward of chainlo: reads (psi, lam)
             blocks, walks the windows in reverse (gram, undo, pullback),
             writes (psi_prev, lam_prev) and three VMEM-resident gram
             accumulators.

If a chain pass costs ~1 window pass of wall-clock, the 24q Circuit_19
plan drops from 16 fused steps to ~7 chain passes.
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
    _dotp,
    _kara,
    args_state,
    dev,
    rand_unitary,
    report,
    timeit,
    w2_of,
)
from jax.experimental import pallas as pl  # noqa: E402


def _params(ngrid=1, vmem=100):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        vmem_limit_bytes=vmem * 1024 * 1024,
        dimension_semantics=("arbitrary",) * ngrid,
    )


def _karaT(xr, xi, wr, wi):
    """y = x @ W^T (window applied from the right), Karatsuba."""
    t1 = _dotp(xr, wr.T)
    t2 = _dotp(xi, wi.T)
    t3 = _dotp(xr + xi, (wr + wi).T)
    return t1 - t2, t3 - t1 - t2


# --------------------------------------------------------------------------
# chainlo: wires [0, 17) resident; windows [0,8), [7,15), [9,17)
# --------------------------------------------------------------------------


def _chainlo_kernel(w0_ref, w1_ref, w2_ref, x_ref, o_ref):
    GC = x_ref.shape[1]
    xr = x_ref[0]  # (GC, 1024, 128)
    xi = x_ref[1]

    # [0, 8): lanes + row bit 0 -> minor collapse to 256 lanes
    br = xr.reshape(GC * 512, 256)
    bi = xi.reshape(GC * 512, 256)
    br, bi = _karaT(br, bi, w0_ref[0], w0_ref[1])
    xr = br.reshape(GC, 1024, 128)
    xi = bi.reshape(GC, 1024, 128)

    # [7, 15): row bits 0..7 -> (GC, 4, 256, 128) row-slice dots
    outs_r, outs_i = [], []
    for c in range(GC):
        vr = xr[c].reshape(4, 256, 128)
        vi = xi[c].reshape(4, 256, 128)
        rs, is_ = [], []
        for p in range(4):
            t1, t2 = _kara(w1_ref[0], w1_ref[1], vr[p], vi[p])
            rs.append(t1)
            is_.append(t2)
        outs_r.append(jnp.stack(rs).reshape(1024, 128))
        outs_i.append(jnp.stack(is_).reshape(1024, 128))
    xr = jnp.stack(outs_r)
    xi = jnp.stack(outs_i)

    # [9, 17): row bits 2..9 -> (256, 512) leading-axis dot per GC row
    outs_r, outs_i = [], []
    for c in range(GC):
        vr = xr[c].reshape(256, 512)
        vi = xi[c].reshape(256, 512)
        t1, t2 = _kara(w2_ref[0], w2_ref[1], vr, vi)
        outs_r.append(t1.reshape(1024, 128))
        outs_i.append(t2.reshape(1024, 128))
    o_ref[0] = jnp.stack(outs_r)
    o_ref[1] = jnp.stack(outs_i)


def _chainlo_call(GC=4):
    w0 = w2_of(256, 1)
    w1 = w2_of(256, 2)
    w2 = w2_of(256, 3)
    A = DIM // (1024 * 128)  # 128

    def f(x, w0, w1, w2):
        xv = x.reshape(2, A, 1024, 128)
        y = pl.pallas_call(
            _chainlo_kernel,
            grid=(A // GC,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, GC, 1024, 128), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=pl.BlockSpec((2, GC, 1024, 128), lambda ia: (0, ia, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, A, 1024, 128), jnp.float32),
            compiler_params=_params(1),
        )(w0, w1, w2, xv)
        return y.reshape(2, DIM)

    return f, (w0, w1, w2)


def exp_chainlo(GC=4):
    f, ws = _chainlo_call(GC)
    report(f"chainlo/GC{GC}", timeit(f, *ws))


def exp_chainlo_acc():
    from qml_essentials_tpu.ops import kernels

    f, (w0, w1, w2) = _chainlo_call(4)
    x = args_state()

    def ref_fn(x, w0, w1, w2):
        # Flat state is big-endian (wire 0 = MSB): the kernel's bit ranges
        # [0,8) / [7,15) / [9,17) are wires [16,24) / [9,17) / [7,15).
        x = kernels.apply_matrix_pair_ri(x, w0, list(range(16, 24)), N)
        x = kernels.apply_matrix_pair_ri(x, w1, list(range(9, 17)), N)
        x = kernels.apply_matrix_pair_ri(x, w2, list(range(7, 15)), N)
        return x

    got = np.asarray(jax.jit(f, device=dev())(x, w0, w1, w2))
    ref = np.asarray(jax.jit(ref_fn, device=dev())(x, w0, w1, w2))
    scale = np.abs(ref).max()
    print(f"chainlo acc: maxdiff {np.abs(got - ref).max() / scale:.3e} (rel)",
          flush=True)


# --------------------------------------------------------------------------
# chainhi: wires [16, 24) resident (rows); window [16,24) + diag(23, 0)
# --------------------------------------------------------------------------


def _chainhi_kernel(w_ref, d_ref, x_ref, o_ref):
    xr = x_ref[0]  # (256, LC)
    xi = x_ref[1]
    yr, yi = _kara(w_ref[0], w_ref[1], xr, xi)

    LC = xr.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (256, LC), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (256, LC), 1)
    hi = rows >= 128
    par = (lanes & 1) == 1
    pr = jnp.where(
        hi,
        jnp.where(par, d_ref[0, 3], d_ref[0, 2]),
        jnp.where(par, d_ref[0, 1], d_ref[0, 0]),
    )
    pi = jnp.where(
        hi,
        jnp.where(par, d_ref[1, 3], d_ref[1, 2]),
        jnp.where(par, d_ref[1, 1], d_ref[1, 0]),
    )
    o_ref[0] = pr * yr - pi * yi
    o_ref[1] = pr * yi + pi * yr


def _chainhi_call(LC=4096):
    from jax.experimental.pallas import tpu as pltpu

    w = w2_of(256, 4)
    theta = 0.731
    dc = np.array(
        [1.0, 1.0, np.exp(-0.5j * theta), np.exp(0.5j * theta)], np.complex64
    )
    d = jax.device_put(np.stack([dc.real, dc.imag]).astype(np.float32), dev())
    B = DIM // 256

    def f(x, w, d):
        xv = x.reshape(2, 256, B)
        y = pl.pallas_call(
            _chainhi_kernel,
            grid=(B // LC,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ib: (0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2, 256, LC), lambda ib: (0, 0, ib)),
            ],
            out_specs=pl.BlockSpec((2, 256, LC), lambda ib: (0, 0, ib)),
            out_shape=jax.ShapeDtypeStruct((2, 256, B), jnp.float32),
            compiler_params=_params(1),
        )(w, d, xv)
        return y.reshape(2, DIM)

    return f, (w, d)


def exp_chainhi(LC=4096):
    f, ws = _chainhi_call(LC)
    report(f"chainhi/LC{LC}", timeit(f, *ws))


def exp_chainhi_acc():
    from qml_essentials_tpu.ops import kernels

    f, (w, d) = _chainhi_call(4096)
    x = args_state()

    def ref_fn(x, w, d):
        # Kernel bit range [16,24) = wires [0,8); diag pattern index is
        # (b_wire0 << 1) | b_wire23, i.e. wires-list order [0, 23].
        x = kernels.apply_matrix_pair_ri(x, w, list(range(0, 8)), N)
        x = kernels.apply_diagonal_pair_ri(x, d, [0, 23], N)
        return x

    got = np.asarray(jax.jit(f, device=dev())(x, w, d))
    ref = np.asarray(jax.jit(ref_fn, device=dev())(x, w, d))
    scale = np.abs(ref).max()
    print(f"chainhi acc: maxdiff {np.abs(got - ref).max() / scale:.3e} (rel)",
          flush=True)


# --------------------------------------------------------------------------
# adjlo: fused adjoint-state backward of the chainlo pass
# --------------------------------------------------------------------------


def _adjlo_kernel(
    w0_ref, w1_ref, w2_ref, p_ref, l_ref, pp_ref, lp_ref, g0_ref, g1_ref, g2_ref
):
    GC = p_ref.shape[1]
    ia = pl.program_id(0)

    @pl.when(ia == 0)
    def _init():
        g0_ref[...] = jnp.zeros_like(g0_ref)
        g1_ref[...] = jnp.zeros_like(g1_ref)
        g2_ref[...] = jnp.zeros_like(g2_ref)

    pr = p_ref[0]
    pi = p_ref[1]
    lr = l_ref[0]
    li = l_ref[1]

    # --- window 2 ([9,17), leading-axis) in reverse ---
    # gram G0 = lam psi^dag on the window axes; undo both with W^dag.
    w2r, w2i = w2_ref[0], w2_ref[1]
    nr, ni, mr, mi = [], [], [], []
    s1a = s2a = s3a = None
    for c in range(GC):
        vr = pr[c].reshape(256, 512)
        vi = pi[c].reshape(256, 512)
        ur = lr[c].reshape(256, 512)
        ui = li[c].reshape(256, 512)
        s1 = _dotp(ur, vr.T)
        s2 = _dotp(ui, vi.T)
        s3 = _dotp(ur + ui, (vr - vi).T)
        s1a = s1 if s1a is None else s1a + s1
        s2a = s2 if s2a is None else s2a + s2
        s3a = s3 if s3a is None else s3a + s3
        t1 = _dotp(w2r.T, vr)
        t2 = _dotp(-w2i.T, vi)
        t3 = _dotp(w2r.T - w2i.T, vr + vi)
        nr.append((t1 - t2).reshape(1024, 128))
        ni.append((t3 - t1 - t2).reshape(1024, 128))
        u1 = _dotp(w2r.T, ur)
        u2 = _dotp(-w2i.T, ui)
        u3 = _dotp(w2r.T - w2i.T, ur + ui)
        mr.append((u1 - u2).reshape(1024, 128))
        mi.append((u3 - u1 - u2).reshape(1024, 128))
    g2_ref[0] += s1a + s2a
    g2_ref[1] += s3a - s1a + s2a
    pr = jnp.stack(nr)
    pi = jnp.stack(ni)
    lr = jnp.stack(mr)
    li = jnp.stack(mi)

    # --- window 1 ([7,15), row-slice) in reverse ---
    w1r, w1i = w1_ref[0], w1_ref[1]
    nr, ni, mr, mi = [], [], [], []
    s1a = s2a = s3a = None
    for c in range(GC):
        vr = pr[c].reshape(4, 256, 128)
        vi = pi[c].reshape(4, 256, 128)
        ur = lr[c].reshape(4, 256, 128)
        ui = li[c].reshape(4, 256, 128)
        rs, is_, ms, mis = [], [], [], []
        for q in range(4):
            s1 = _dotp(ur[q], vr[q].T)
            s2 = _dotp(ui[q], vi[q].T)
            s3 = _dotp(ur[q] + ui[q], (vr[q] - vi[q]).T)
            s1a = s1 if s1a is None else s1a + s1
            s2a = s2 if s2a is None else s2a + s2
            s3a = s3 if s3a is None else s3a + s3
            t1 = _dotp(w1r.T, vr[q])
            t2 = _dotp(-w1i.T, vi[q])
            t3 = _dotp(w1r.T - w1i.T, vr[q] + vi[q])
            rs.append(t1 - t2)
            is_.append(t3 - t1 - t2)
            u1 = _dotp(w1r.T, ur[q])
            u2 = _dotp(-w1i.T, ui[q])
            u3 = _dotp(w1r.T - w1i.T, ur[q] + ui[q])
            ms.append(u1 - u2)
            mis.append(u3 - u1 - u2)
        nr.append(jnp.stack(rs).reshape(1024, 128))
        ni.append(jnp.stack(is_).reshape(1024, 128))
        mr.append(jnp.stack(ms).reshape(1024, 128))
        mi.append(jnp.stack(mis).reshape(1024, 128))
    g1_ref[0] += s1a + s2a
    g1_ref[1] += s3a - s1a + s2a
    pr = jnp.stack(nr)
    pi = jnp.stack(ni)
    lr = jnp.stack(mr)
    li = jnp.stack(mi)

    # --- window 0 ([0,8), minor-collapse) in reverse ---
    w0r, w0i = w0_ref[0], w0_ref[1]
    vr = pr.reshape(GC * 512, 256)
    vi = pi.reshape(GC * 512, 256)
    ur = lr.reshape(GC * 512, 256)
    ui = li.reshape(GC * 512, 256)
    s1 = _dotp(ur.T, vr)
    s2 = _dotp(ui.T, vi)
    s3 = _dotp((ur + ui).T, vr - vi)
    g0_ref[0] += s1 + s2
    g0_ref[1] += s3 - s1 + s2
    t1 = _dotp(vr, w0r)
    t2 = _dotp(vi, -w0i)
    t3 = _dotp(vr + vi, w0r - w0i)
    pp_ref[0] = (t1 - t2).reshape(GC, 1024, 128)
    pp_ref[1] = (t3 - t1 - t2).reshape(GC, 1024, 128)
    u1 = _dotp(ur, w0r)
    u2 = _dotp(ui, -w0i)
    u3 = _dotp(ur + ui, w0r - w0i)
    lp_ref[0] = (u1 - u2).reshape(GC, 1024, 128)
    lp_ref[1] = (u3 - u1 - u2).reshape(GC, 1024, 128)


def _adjlo_call(GC=4):
    w0 = w2_of(256, 1)
    w1 = w2_of(256, 2)
    w2 = w2_of(256, 3)
    A = DIM // (1024 * 128)

    def f(x, w0, w1, w2):
        xv = x.reshape(2, A, 1024, 128)
        lv = (x * 0.5).reshape(2, A, 1024, 128)
        pp, lp, g0, g1, g2 = pl.pallas_call(
            _adjlo_kernel,
            grid=(A // GC,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, GC, 1024, 128), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, GC, 1024, 128), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((2, GC, 1024, 128), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, GC, 1024, 128), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2, A, 1024, 128), jnp.float32),
                jax.ShapeDtypeStruct((2, A, 1024, 128), jnp.float32),
                jax.ShapeDtypeStruct((2, 256, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, 256, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, 256, 256), jnp.float32),
            ],
            compiler_params=_params(1),
        )(w0, w1, w2, xv, lv)
        return pp.reshape(2, DIM) + lp.reshape(2, DIM) * 0 + g0[0, 0, 0] * 0

    return f, (w0, w1, w2)


def exp_adjlo(GC=4):
    f, ws = _adjlo_call(GC)
    report(f"adjlo/GC{GC}", timeit(f, *ws), "(2R+2W: x2 the bytes)")


EXPS = {
    "chainlo": lambda: exp_chainlo(4),
    "chainlo2": lambda: exp_chainlo(2),
    "chainlo8": lambda: exp_chainlo(8),
    "chainlo_acc": exp_chainlo_acc,
    "chainhi": lambda: exp_chainhi(4096),
    "chainhi2": lambda: exp_chainhi(2048),
    "chainhi8": lambda: exp_chainhi(8192),
    "chainhi_acc": exp_chainhi_acc,
    "adjlo": lambda: exp_adjlo(4),
    "adjlo2": lambda: exp_adjlo(2),
}


def main():
    names = sys.argv[1:] or list(EXPS)
    import qml_essentials_tpu  # noqa: F401

    for nm in names:
        try:
            EXPS[nm]()
        except Exception as e:
            print(f"{nm:12s} FAILED: {type(e).__name__}: {e!r}", flush=True)


# --------------------------------------------------------------------------
# v2: axis-aligned chainlo — block (2, GC, 512, 256), lanes = bits [0,8),
# rows = bits [8,17).  Windows land on native axes (no relayouts); straddle
# gates are 4-slice VPU mixes.
# --------------------------------------------------------------------------


def _dotpT(a, b):
    """split3 a^T @ b (contraction over axis 0 of both, no transpose op)."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    d = lambda x, y: jax.lax.dot_general(
        x, y, dn, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _mix4(slices_r, slices_i, mr, mi):
    """Generic 4x4 complex mix of 4 (re, im) slice pairs.

    mr/mi: (4, 4) scalars-readable refs (VMEM constants)."""
    outs_r, outs_i = [], []
    for i in range(4):
        o_r = None
        o_i = None
        for j in range(4):
            a = mr[i, j]
            b = mi[i, j]
            tr = a * slices_r[j] - b * slices_i[j]
            ti = a * slices_i[j] + b * slices_r[j]
            o_r = tr if o_r is None else o_r + tr
            o_i = ti if o_i is None else o_i + ti
        outs_r.append(o_r)
        outs_i.append(o_i)
    return outs_r, outs_i


def _chainlo2_kernel(w0_ref, m1_ref, w1_ref, m2_ref, x_ref, o_ref):
    GC = x_ref.shape[1]
    xr = x_ref[0]  # (GC, 512, 256)
    xi = x_ref[1]

    # W0 on bits [0,8): pure minor matmul (leading-dim collapse is free).
    br = xr.reshape(GC * 512, 256)
    bi = xi.reshape(GC * 512, 256)
    br, bi = _karaT(br, bi, w0_ref[0], w0_ref[1])

    # m1 on bits (8, 7): row-parity x lane-half slices.
    v_r = br.reshape(GC * 256, 2, 256)
    v_i = bi.reshape(GC * 256, 2, 256)
    sl_r = [v_r[:, 0, 0:128], v_r[:, 0, 128:256],
            v_r[:, 1, 0:128], v_r[:, 1, 128:256]]
    sl_i = [v_i[:, 0, 0:128], v_i[:, 0, 128:256],
            v_i[:, 1, 0:128], v_i[:, 1, 128:256]]
    # index (bit8, bit7): slot = 2*b8 + b7
    o_r4, o_i4 = _mix4(sl_r, sl_i, m1_ref[0], m1_ref[1])
    br = jnp.stack(
        [jnp.concatenate([o_r4[0], o_r4[1]], axis=-1),
         jnp.concatenate([o_r4[2], o_r4[3]], axis=-1)], axis=1
    ).reshape(GC, 512, 256)
    bi = jnp.stack(
        [jnp.concatenate([o_i4[0], o_i4[1]], axis=-1),
         jnp.concatenate([o_i4[2], o_i4[3]], axis=-1)], axis=1
    ).reshape(GC, 512, 256)

    # W1 on bits [8,16): row-slice leading-axis dots.
    outs_r, outs_i = [], []
    for c in range(GC):
        rs, is_ = [], []
        for p in range(2):
            sl = slice(p * 256, (p + 1) * 256)
            t1, t2 = _kara(w1_ref[0], w1_ref[1], br[c, sl, :], bi[c, sl, :])
            rs.append(t1)
            is_.append(t2)
        outs_r.append(jnp.concatenate(rs, axis=0))
        outs_i.append(jnp.concatenate(is_, axis=0))
    br = jnp.stack(outs_r)  # (GC, 512, 256)
    bi = jnp.stack(outs_i)

    # m2 on bits (16, 15): row-half x row-bit-7 slices.
    v_r = br.reshape(GC, 2, 2, 128, 256)
    v_i = bi.reshape(GC, 2, 2, 128, 256)
    sl_r = [v_r[:, 0, 0], v_r[:, 0, 1], v_r[:, 1, 0], v_r[:, 1, 1]]
    sl_i = [v_i[:, 0, 0], v_i[:, 0, 1], v_i[:, 1, 0], v_i[:, 1, 1]]
    o_r4, o_i4 = _mix4(sl_r, sl_i, m2_ref[0], m2_ref[1])
    o_ref[0] = jnp.stack(
        [jnp.stack([o_r4[0], o_r4[1]], axis=1),
         jnp.stack([o_r4[2], o_r4[3]], axis=1)], axis=1
    ).reshape(GC, 512, 256)
    o_ref[1] = jnp.stack(
        [jnp.stack([o_i4[0], o_i4[1]], axis=1),
         jnp.stack([o_i4[2], o_i4[3]], axis=1)], axis=1
    ).reshape(GC, 512, 256)


def _u4():
    u = rand_unitary(4, 7)
    return jax.device_put(np.stack([u.real, u.imag]).astype(np.float32), dev())


def _chainlo2_call(GC=4):
    w0 = w2_of(256, 1)
    w1 = w2_of(256, 2)
    m1 = _u4()
    m2 = jax.device_put(np.asarray(_u4()) * 1.0, dev())
    A = DIM // (512 * 256)  # 128

    def f(x, w0, m1, w1, m2):
        xv = x.reshape(2, A, 512, 256)
        y = pl.pallas_call(
            _chainlo2_kernel,
            grid=(A // GC,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 4, 4), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 4, 4), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, A, 512, 256), jnp.float32),
            compiler_params=_params(1),
        )(w0, m1, w1, m2, xv)
        return y.reshape(2, DIM)

    return f, (w0, m1, w1, m2)


def exp_chainlo2(GC=4):
    f, ws = _chainlo2_call(GC)
    report(f"chainlo2/GC{GC}", timeit(f, *ws))


def exp_chainlo2_acc():
    from qml_essentials_tpu.ops import kernels

    f, (w0, m1, w1, m2) = _chainlo2_call(4)
    x = args_state()

    def ref_fn(x, w0, m1, w1, m2):
        # big-endian: bits [0,8)=wires [16,24); (8,7)=wires (15,16);
        # [8,16)=wires [8,16); (16,15)=wires (7,8)
        x = kernels.apply_matrix_pair_ri(x, w0, list(range(16, 24)), N)
        x = kernels.apply_matrix_pair_ri(x, m1, [15, 16], N)
        x = kernels.apply_matrix_pair_ri(x, w1, list(range(8, 16)), N)
        x = kernels.apply_matrix_pair_ri(x, m2, [7, 8], N)
        return x

    got = np.asarray(jax.jit(f, device=dev())(x, w0, m1, w1, m2))
    ref = np.asarray(jax.jit(ref_fn, device=dev())(x, w0, m1, w1, m2))
    scale = np.abs(ref).max()
    print(f"chainlo2 acc: maxdiff {np.abs(got - ref).max() / scale:.3e} (rel)",
          flush=True)


def _adjlo2_kernel(w0_ref, w1_ref, p_ref, l_ref, pp_ref, lp_ref,
                   g0_ref, g1_ref):
    """Adjoint of (W0 bits [0,8); W1 bits [8,16)) — mixes omitted (their
    undo/gram cost is VPU noise; this measures the matmul+DMA shape)."""
    GC = p_ref.shape[1]
    ia = pl.program_id(0)

    @pl.when(ia == 0)
    def _init():
        g0_ref[...] = jnp.zeros_like(g0_ref)
        g1_ref[...] = jnp.zeros_like(g1_ref)

    pr = p_ref[0]
    pi = p_ref[1]
    lr = l_ref[0]
    li = l_ref[1]

    # --- W1 (rows) reversed: gram then undo both ---
    w1r, w1i = w1_ref[0], w1_ref[1]
    s1a = s2a = s3a = None
    nr, ni, mr_, mi_ = [], [], [], []
    for c in range(GC):
        rs, is_, ms, mis = [], [], [], []
        for p in range(2):
            sl = slice(p * 256, (p + 1) * 256)
            vr, vi = pr[c, sl, :], pi[c, sl, :]
            ur, ui = lr[c, sl, :], li[c, sl, :]
            # gram G0 += lam psi^dag : (256, 256) over lane axis
            s1 = _dotp(ur, vr.T)
            s2 = _dotp(ui, vi.T)
            s3 = _dotp(ur + ui, (vr - vi).T)
            s1a = s1 if s1a is None else s1a + s1
            s2a = s2 if s2a is None else s2a + s2
            s3a = s3 if s3a is None else s3a + s3
            # undo psi and lam with W1^dag
            t1 = _dotpT(w1r, vr)
            t2 = _dotpT(-w1i, vi) * (-1.0) * (-1.0)
            t2 = _dotpT(w1i, vi) * (-1.0)
            t3 = _dotpT(w1r - w1i, vr + vi)
            rs.append(t1 - t2)
            is_.append(t3 - t1 - t2)
            u1 = _dotpT(w1r, ur)
            u2 = _dotpT(w1i, ui) * (-1.0)
            u3 = _dotpT(w1r - w1i, ur + ui)
            ms.append(u1 - u2)
            mis.append(u3 - u1 - u2)
        nr.append(jnp.concatenate(rs, axis=0))
        ni.append(jnp.concatenate(is_, axis=0))
        mr_.append(jnp.concatenate(ms, axis=0))
        mi_.append(jnp.concatenate(mis, axis=0))
    g1_ref[0] += s1a + s2a
    g1_ref[1] += s3a - s1a + s2a
    pr = jnp.stack(nr).reshape(GC * 512, 256)
    pi = jnp.stack(ni).reshape(GC * 512, 256)
    lr = jnp.stack(mr_).reshape(GC * 512, 256)
    li = jnp.stack(mi_).reshape(GC * 512, 256)

    # --- W0 (minor) reversed ---
    w0r, w0i = w0_ref[0], w0_ref[1]
    s1 = _dotpT(lr, pr)
    s2 = _dotpT(li, pi)
    s3 = _dotpT(lr + li, pr - pi)
    g0_ref[0] += s1 + s2
    g0_ref[1] += s3 - s1 + s2
    t1 = _dotp(pr, w0r)
    t2 = _dotp(pi, w0i) * (-1.0)
    t3 = _dotp(pr + pi, w0r - w0i)
    pp_ref[0] = (t1 - t2).reshape(GC, 512, 256)
    pp_ref[1] = (t3 - t1 - t2).reshape(GC, 512, 256)
    u1 = _dotp(lr, w0r)
    u2 = _dotp(li, w0i) * (-1.0)
    u3 = _dotp(lr + li, w0r - w0i)
    lp_ref[0] = (u1 - u2).reshape(GC, 512, 256)
    lp_ref[1] = (u3 - u1 - u2).reshape(GC, 512, 256)


def _adjlo2_call(GC=2):
    w0 = w2_of(256, 1)
    w1 = w2_of(256, 2)
    A = DIM // (512 * 256)

    def f(x, w0, w1):
        xv = x.reshape(2, A, 512, 256)
        lv = (x * 0.5).reshape(2, A, 512, 256)
        pp, lp, g0, g1 = pl.pallas_call(
            _adjlo2_kernel,
            grid=(A // GC,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2, A, 512, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, A, 512, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, 256, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, 256, 256), jnp.float32),
            ],
            compiler_params=_params(1),
        )(w0, w1, xv, lv)
        return pp.reshape(2, DIM) + lp.reshape(2, DIM) * 0 + g0[0, 0, 0] * 0

    return f, (w0, w1)


def exp_adjlo2(GC=2):
    f, ws = _adjlo2_call(GC)
    report(f"adjlo2/GC{GC}", timeit(f, *ws), "(2R+2W: x2 the bytes)")


EXPS.update({
    "chainlo2": lambda: exp_chainlo2(4),
    "chainlo2_g2": lambda: exp_chainlo2(2),
    "chainlo2_g8": lambda: exp_chainlo2(8),
    "chainlo2_acc": exp_chainlo2_acc,
    "adjlo2": lambda: exp_adjlo2(2),
    "adjlo2_g4": lambda: exp_adjlo2(4),
    "adjlo2_g1": lambda: exp_adjlo2(1),
})



def exp_chainlo_g1():
    f, ws = _chainlo_call(1)
    report("chainlo/GC1", timeit(f, *ws))


def _chainlo_vmem_call(GC, vmem):
    from jax.experimental.pallas import tpu as pltpu

    w0 = w2_of(256, 1)
    w1 = w2_of(256, 2)
    w2 = w2_of(256, 3)
    A = DIM // (1024 * 128)

    def f(x, w0, w1, w2):
        xv = x.reshape(2, A, 1024, 128)
        y = pl.pallas_call(
            _chainlo_kernel,
            grid=(A // GC,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, GC, 1024, 128), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=pl.BlockSpec((2, GC, 1024, 128), lambda ia: (0, ia, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, A, 1024, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem * 1024 * 1024,
                dimension_semantics=("arbitrary",),
            ),
        )(w0, w1, w2, xv)
        return y.reshape(2, DIM)

    return f, (w0, w1, w2)


def exp_chainlo_vm(GC=2, vmem=127):
    f, ws = _chainlo_vmem_call(GC, vmem)
    report(f"chainlo/GC{GC}/vm{vmem}", timeit(f, *ws))


EXPS.update({
    "chainlo_g1": exp_chainlo_g1,
    "chainlo_vm127": lambda: exp_chainlo_vm(2, 127),
    "chainlo_vm127g1": lambda: exp_chainlo_vm(1, 127),
    "chainlo_vm127g4": lambda: exp_chainlo_vm(4, 127),
    "chainhi_lc1k": lambda: exp_chainhi(1024),
    "chainhi_lc2k": lambda: exp_chainhi(2048),
})


def _adjlo2_vm_call(GC=1, vmem=127):
    w0 = w2_of(256, 1)
    w1 = w2_of(256, 2)
    A = DIM // (512 * 256)

    def f(x, w0, w1):
        xv = x.reshape(2, A, 512, 256)
        lv = (x * 0.5).reshape(2, A, 512, 256)
        pp, lp, g0, g1 = pl.pallas_call(
            _adjlo2_kernel,
            grid=(A // GC,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2, A, 512, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, A, 512, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, 256, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, 256, 256), jnp.float32),
            ],
            compiler_params=_params(1, vmem),
        )(w0, w1, xv, lv)
        return pp.reshape(2, DIM) + lp.reshape(2, DIM) * 0 + g0[0, 0, 0] * 0

    return f, (w0, w1)


def exp_adjlo2_vm(GC=1, vmem=127):
    f, ws = _adjlo2_vm_call(GC, vmem)
    report(f"adjlo2/GC{GC}/vm{vmem}", timeit(f, *ws), "(2R+2W)")


EXPS.update({
    "adjlo2_vm": lambda: exp_adjlo2_vm(1, 127),
    "adjlo2_vm_g2": lambda: exp_adjlo2_vm(2, 127),
    "chainhi_vm": lambda: None,
})


def _adjlo2_ng_kernel(w0_ref, w1_ref, p_ref, l_ref, pp_ref, lp_ref):
    """Undo-only adjoint (no gram accumulators): pipelining probe."""
    GC = p_ref.shape[1]
    pr = p_ref[0]
    pi = p_ref[1]
    lr = l_ref[0]
    li = l_ref[1]
    w1r, w1i = w1_ref[0], w1_ref[1]
    nr, ni, mr_, mi_ = [], [], [], []
    for c in range(GC):
        rs, is_, ms, mis = [], [], [], []
        for p in range(2):
            sl = slice(p * 256, (p + 1) * 256)
            vr, vi = pr[c, sl, :], pi[c, sl, :]
            ur, ui = lr[c, sl, :], li[c, sl, :]
            t1 = _dotpT(w1r, vr)
            t2 = _dotpT(w1i, vi) * (-1.0)
            t3 = _dotpT(w1r - w1i, vr + vi)
            rs.append(t1 - t2)
            is_.append(t3 - t1 - t2)
            u1 = _dotpT(w1r, ur)
            u2 = _dotpT(w1i, ui) * (-1.0)
            u3 = _dotpT(w1r - w1i, ur + ui)
            ms.append(u1 - u2)
            mis.append(u3 - u1 - u2)
        nr.append(jnp.concatenate(rs, axis=0))
        ni.append(jnp.concatenate(is_, axis=0))
        mr_.append(jnp.concatenate(ms, axis=0))
        mi_.append(jnp.concatenate(mis, axis=0))
    pr = jnp.stack(nr).reshape(GC * 512, 256)
    pi = jnp.stack(ni).reshape(GC * 512, 256)
    lr = jnp.stack(mr_).reshape(GC * 512, 256)
    li = jnp.stack(mi_).reshape(GC * 512, 256)
    w0r, w0i = w0_ref[0], w0_ref[1]
    t1 = _dotp(pr, w0r)
    t2 = _dotp(pi, w0i) * (-1.0)
    t3 = _dotp(pr + pi, w0r - w0i)
    pp_ref[0] = (t1 - t2).reshape(GC, 512, 256)
    pp_ref[1] = (t3 - t1 - t2).reshape(GC, 512, 256)
    u1 = _dotp(lr, w0r)
    u2 = _dotp(li, w0i) * (-1.0)
    u3 = _dotp(lr + li, w0r - w0i)
    lp_ref[0] = (u1 - u2).reshape(GC, 512, 256)
    lp_ref[1] = (u3 - u1 - u2).reshape(GC, 512, 256)


def exp_adjlo2_ng(GC=1, vmem=127):
    w0 = w2_of(256, 1)
    w1 = w2_of(256, 2)
    A = DIM // (512 * 256)

    def f(x, w0, w1):
        xv = x.reshape(2, A, 512, 256)
        lv = (x * 0.5).reshape(2, A, 512, 256)
        pp, lp = pl.pallas_call(
            _adjlo2_ng_kernel,
            grid=(A // GC,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2, A, 512, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, A, 512, 256), jnp.float32),
            ],
            compiler_params=_params(1, vmem),
        )(w0, w1, xv, lv)
        return pp.reshape(2, DIM) + lp.reshape(2, DIM) * 0

    report(f"adjlo2ng/GC{GC}/vm{vmem}", timeit(f, w0, w1), "(2R+2W)")


def _adjlo2_sc_kernel(w0_ref, w1_ref, p_ref, l_ref, pp_ref, lp_ref,
                      g0_ref, g1_ref, a0, a1):
    """Grams accumulated in VMEM scratch; output written on the last step."""
    GC = p_ref.shape[1]
    ia = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(ia == 0)
    def _init():
        a0[...] = jnp.zeros_like(a0)
        a1[...] = jnp.zeros_like(a1)

    pr = p_ref[0]
    pi = p_ref[1]
    lr = l_ref[0]
    li = l_ref[1]
    w1r, w1i = w1_ref[0], w1_ref[1]
    s1a = s2a = s3a = None
    nr, ni, mr_, mi_ = [], [], [], []
    for c in range(GC):
        rs, is_, ms, mis = [], [], [], []
        for p in range(2):
            sl = slice(p * 256, (p + 1) * 256)
            vr, vi = pr[c, sl, :], pi[c, sl, :]
            ur, ui = lr[c, sl, :], li[c, sl, :]
            s1 = _dotp(ur, vr.T)
            s2 = _dotp(ui, vi.T)
            s3 = _dotp(ur + ui, (vr - vi).T)
            s1a = s1 if s1a is None else s1a + s1
            s2a = s2 if s2a is None else s2a + s2
            s3a = s3 if s3a is None else s3a + s3
            t1 = _dotpT(w1r, vr)
            t2 = _dotpT(w1i, vi) * (-1.0)
            t3 = _dotpT(w1r - w1i, vr + vi)
            rs.append(t1 - t2)
            is_.append(t3 - t1 - t2)
            u1 = _dotpT(w1r, ur)
            u2 = _dotpT(w1i, ui) * (-1.0)
            u3 = _dotpT(w1r - w1i, ur + ui)
            ms.append(u1 - u2)
            mis.append(u3 - u1 - u2)
        nr.append(jnp.concatenate(rs, axis=0))
        ni.append(jnp.concatenate(is_, axis=0))
        mr_.append(jnp.concatenate(ms, axis=0))
        mi_.append(jnp.concatenate(mis, axis=0))
    a1[0] += s1a + s2a
    a1[1] += s3a - s1a + s2a
    pr = jnp.stack(nr).reshape(GC * 512, 256)
    pi = jnp.stack(ni).reshape(GC * 512, 256)
    lr = jnp.stack(mr_).reshape(GC * 512, 256)
    li = jnp.stack(mi_).reshape(GC * 512, 256)
    w0r, w0i = w0_ref[0], w0_ref[1]
    s1 = _dotpT(lr, pr)
    s2 = _dotpT(li, pi)
    s3 = _dotpT(lr + li, pr - pi)
    a0[0] += s1 + s2
    a0[1] += s3 - s1 + s2
    t1 = _dotp(pr, w0r)
    t2 = _dotp(pi, w0i) * (-1.0)
    t3 = _dotp(pr + pi, w0r - w0i)
    pp_ref[0] = (t1 - t2).reshape(GC, 512, 256)
    pp_ref[1] = (t3 - t1 - t2).reshape(GC, 512, 256)
    u1 = _dotp(lr, w0r)
    u2 = _dotp(li, w0i) * (-1.0)
    u3 = _dotp(lr + li, w0r - w0i)
    lp_ref[0] = (u1 - u2).reshape(GC, 512, 256)
    lp_ref[1] = (u3 - u1 - u2).reshape(GC, 512, 256)

    @pl.when(ia == nsteps - 1)
    def _flush():
        g0_ref[...] = a0[...]
        g1_ref[...] = a1[...]


def exp_adjlo2_sc(GC=1, vmem=127):
    from jax.experimental.pallas import tpu as pltpu

    w0 = w2_of(256, 1)
    w1 = w2_of(256, 2)
    A = DIM // (512 * 256)

    def f(x, w0, w1):
        xv = x.reshape(2, A, 512, 256)
        lv = (x * 0.5).reshape(2, A, 512, 256)
        pp, lp, g0, g1 = pl.pallas_call(
            _adjlo2_sc_kernel,
            grid=(A // GC,),
            in_specs=[
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, GC, 512, 256), lambda ia: (0, ia, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
                pl.BlockSpec((2, 256, 256), lambda ia: (0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((2, A, 512, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, A, 512, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, 256, 256), jnp.float32),
                jax.ShapeDtypeStruct((2, 256, 256), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 256, 256), jnp.float32),
                pltpu.VMEM((2, 256, 256), jnp.float32),
            ],
            compiler_params=_params(1, vmem),
        )(w0, w1, xv, lv)
        return pp.reshape(2, DIM) + lp.reshape(2, DIM) * 0 + g0[0, 0, 0] * 0 + g1[0, 0, 0] * 0

    report(f"adjlo2sc/GC{GC}/vm{vmem}", timeit(f, w0, w1), "(2R+2W)")


EXPS.update({
    "adjlo2_ng": lambda: exp_adjlo2_ng(1, 127),
    "adjlo2_ng_g2": lambda: exp_adjlo2_ng(2, 127),
    "adjlo2_sc": lambda: exp_adjlo2_sc(1, 127),
    "adjlo2_sc_g2": lambda: exp_adjlo2_sc(2, 127),
})


def _mdma_chain_call(S=4, NCH=128):
    """Manual-DMA pipelined 3-window chain (chainlo content, v1 geometry).

    Explicit HBM->VMEM / VMEM->HBM async copies with S in-flight slots; the
    per-slot compute is the full 3-window chain.  Measures whether manual
    pipelining hides multi-window MXU where the auto-pipelined grid
    serialises it."""
    from jax.experimental.pallas import tpu as pltpu

    R, LN = 1024, 128
    A = DIM // (R * LN)  # 128 row-groups
    TA = A // NCH        # row-groups per chunk
    w0 = w2_of(256, 1)
    w1 = w2_of(256, 2)
    w2 = w2_of(256, 3)

    def compute(xr, xi, w0buf, w1buf, w2buf):
        # xr: (TA, R, LN)
        br = xr.reshape(TA * 512, 256)
        bi = xi.reshape(TA * 512, 256)
        br, bi = _karaT(br, bi, w0buf[0], w0buf[1])
        xr = br.reshape(TA, R, LN)
        xi = bi.reshape(TA, R, LN)
        outs_r, outs_i = [], []
        for c in range(TA):
            vr = xr[c].reshape(4, 256, 128)
            vi = xi[c].reshape(4, 256, 128)
            rs, is_ = [], []
            for p in range(4):
                t1, t2 = _kara(w1buf[0], w1buf[1], vr[p], vi[p])
                rs.append(t1)
                is_.append(t2)
            outs_r.append(jnp.stack(rs).reshape(R, LN))
            outs_i.append(jnp.stack(is_).reshape(R, LN))
        xr = jnp.stack(outs_r)
        xi = jnp.stack(outs_i)
        outs_r, outs_i = [], []
        for c in range(TA):
            vr = xr[c].reshape(256, 512)
            vi = xi[c].reshape(256, 512)
            t1, t2 = _kara(w2buf[0], w2buf[1], vr, vi)
            outs_r.append(t1.reshape(R, LN))
            outs_i.append(t2.reshape(R, LN))
        return jnp.stack(outs_r), jnp.stack(outs_i)

    def kern(w0_ref, w1_ref, w2_ref, x_ref, o_ref,
             w0buf, w1buf, w2buf, xbuf, ybuf, wsems, isems, osems):
        for i, (wr, wb) in enumerate(
            ((w0_ref, w0buf), (w1_ref, w1buf), (w2_ref, w2buf))
        ):
            pltpu.make_async_copy(wr, wb, wsems.at[i]).start()
        for i, (wr, wb) in enumerate(
            ((w0_ref, w0buf), (w1_ref, w1buf), (w2_ref, w2buf))
        ):
            pltpu.make_async_copy(wr, wb, wsems.at[i]).wait()
        for s_ in range(min(S, NCH)):
            pltpu.make_async_copy(
                x_ref.at[:, pl.ds(s_ * TA, TA)], xbuf.at[s_], isems.at[s_]
            ).start()
        for c in range(NCH):
            s_ = c % S
            pltpu.make_async_copy(
                x_ref.at[:, pl.ds(c * TA, TA)], xbuf.at[s_], isems.at[s_]
            ).wait()
            if c >= S:
                pltpu.make_async_copy(
                    o_ref.at[:, pl.ds((c - S) * TA, TA)],
                    ybuf.at[s_],
                    osems.at[s_],
                ).wait()
            yr, yi = compute(xbuf[s_, 0], xbuf[s_, 1], w0buf, w1buf, w2buf)
            ybuf[s_, 0] = yr
            ybuf[s_, 1] = yi
            pltpu.make_async_copy(
                ybuf.at[s_], o_ref.at[:, pl.ds(c * TA, TA)], osems.at[s_]
            ).start()
            if c + S < NCH:
                pltpu.make_async_copy(
                    x_ref.at[:, pl.ds((c + S) * TA, TA)],
                    xbuf.at[s_],
                    isems.at[s_],
                ).start()
        for c in range(max(0, NCH - S), NCH):
            s_ = c % S
            pltpu.make_async_copy(
                ybuf.at[s_], o_ref.at[:, pl.ds(c * TA, TA)], osems.at[s_]
            ).wait()

    def f(x, w0, w1, w2):
        y = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((2, A, R, LN), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 256, 256), jnp.float32),
                pltpu.VMEM((2, 256, 256), jnp.float32),
                pltpu.VMEM((2, 256, 256), jnp.float32),
                pltpu.VMEM((S, 2, TA, R, LN), jnp.float32),
                pltpu.VMEM((S, 2, TA, R, LN), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((S,)),
                pltpu.SemaphoreType.DMA((S,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
        )(w0, w1, w2, x.reshape(2, A, R, LN))
        return y.reshape(2, DIM)

    return f, (w0, w1, w2)


def exp_mdma_chain(S=4, NCH=128):
    f, ws = _mdma_chain_call(S, NCH)
    report(f"mdma_chain/S{S}/N{NCH}", timeit(f, *ws))


def exp_mdma_chain_acc():
    from qml_essentials_tpu.ops import kernels

    f, (w0, w1, w2) = _mdma_chain_call(4, 128)
    x = args_state()

    def ref_fn(x, w0, w1, w2):
        x = kernels.apply_matrix_pair_ri(x, w0, list(range(16, 24)), N)
        x = kernels.apply_matrix_pair_ri(x, w1, list(range(9, 17)), N)
        x = kernels.apply_matrix_pair_ri(x, w2, list(range(7, 15)), N)
        return x

    got = np.asarray(jax.jit(f, device=dev())(x, w0, w1, w2))
    ref = np.asarray(jax.jit(ref_fn, device=dev())(x, w0, w1, w2))
    scale = np.abs(ref).max()
    print(f"mdma_chain acc: maxdiff {np.abs(got-ref).max()/scale:.3e}", flush=True)


EXPS.update({
    "mdma_chain": lambda: exp_mdma_chain(4, 128),
    "mdma_chain8": lambda: exp_mdma_chain(8, 128),
    "mdma_chain_s2": lambda: exp_mdma_chain(2, 64),
    "mdma_chain_n64": lambda: exp_mdma_chain(4, 64),
    "mdma_chain_acc": exp_mdma_chain_acc,
})

if __name__ == "__main__":
    main()
