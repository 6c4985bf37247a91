"""Pallas TPU kernels for the statevector hot path.

Why these exist
---------------

For states that fit in VMEM (n <= ~21 at float32) XLA keeps the whole
gate-application chain on-chip and the einsum path in
:mod:`qml_essentials_tpu.ops.kernels` runs at (or above) HBM roofline.
Beyond that, XLA materialises every intermediate of the real-split complex
product through HBM: a fused window application that *needs* one state
read + one state write (~270 MB at 24 qubits) was measured moving ~1 GB.

``window_apply_ri`` performs the whole complex contraction in one pass:
each grid step DMAs one ``(2, 1, K, TB)`` block of the state into VMEM,
applies the Karatsuba 3-multiply complex product on the MXU at float32
precision, and writes the block back.  A ``jax.custom_vjp`` provides the
adjoint: the backward pass applies the conjugate transpose through the same
kernel and reduces the matrix cotangent with plain XLA einsums (pure
reductions, which XLA already runs at roofline).

The kernel is only selected on TPU-like backends (see
:func:`qml_essentials_tpu.runtime.configure`) and only for states too large
for VMEM residency (``n >= PALLAS_MIN_N``); everywhere else the einsum path
wins.  Reference parity: this replaces the per-gate einsum loop of
qml_essentials/simulation.py:91-104 at large qubit counts.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Populated lazily; pallas import kept out of module import time so CPU-only
# environments never touch Mosaic.
_pl = None


def _pallas():
    global _pl
    if _pl is None:
        from jax.experimental import pallas as pl

        _pl = pl
    return _pl


def _compiler_params(ngrid: int = 2):
    """Raise the scoped-VMEM budget: K=256 adjoint blocks need ~32 MB.

    All grid dimensions are marked ``arbitrary``: measured on the v5e
    tunnel chip, sequential-semantics pipelining streams window blocks at
    ~260 GB/s vs ~210 for the default/parallel semantics (tools/
    exp_r3_micro.py ``bbarb*`` probes).
    """
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        vmem_limit_bytes=96 * 1024 * 1024,
        dimension_semantics=("arbitrary",) * ngrid,
    )


def _ac_of(A: int, K: int, TB: int) -> int:
    """Outer-index group per block so each DMA chunk is ~2 MB.

    Measured (``bigblk`` probes): 0.5 MB chunks stream ~215 GB/s, 2 MB
    chunks ~260 GB/s with arbitrary semantics; bigger regresses.
    """
    target = max(1, (2 * 1024 * 1024) // (K * TB * 4))
    ac = 1
    while ac * 2 <= min(A, target):
        ac *= 2
    return ac


# Enabled by runtime.configure() when the accelerator is a real TPU (or the
# axon tunnel).  CPU test sessions leave it False and use interpret mode in
# the dedicated kernel tests.
ENABLED: bool = False

# Below this qubit count the XLA einsum path is VMEM-resident and faster.
PALLAS_MIN_N: int = 22

# Lane-dimension tile of the state blocks.
_TB = 1024

# Row tile of top-window blocks (2 MB/component chunks at K=256).
_TA_TOP = 1024

# Transpose tiles of the fused rotation kernel.
_ROT_TX = 512
_ROT_TY = 512

_HI = jax.lax.Precision.HIGHEST

# MXU precision mode for the in-kernel contractions:
#   "split3"  — manual (hi, lo) bf16 decomposition, 3 one-pass bf16 dots per
#               product (~9e-6 max relative error per window apply, measured
#               against an f64 oracle).  Mosaic's f32 HIGHEST costs 6 bf16
#               passes; at K >= 128 the MXU time stops hiding under the DMA
#               stream, so split3 is the large-window default.
#   "highest" — Mosaic's 6-pass f32 emulation (~f32-exact).
PRECISION_MODE: str = "split3"


def set_precision_mode(mode: str) -> None:
    """Select the in-kernel MXU precision ("split3" | "highest")."""
    global PRECISION_MODE
    if mode not in ("split3", "highest"):
        raise ValueError(f"Unknown pallas precision mode {mode!r}")
    PRECISION_MODE = mode


def _dotp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Kernel-internal f32 matmul at the configured precision."""
    if PRECISION_MODE == "highest":
        return jnp.dot(a, b, precision=_HI)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot(
            x, y, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _win_kernel(w_ref, x_ref, o_ref):
    """One (2, AC, K, TB) state block x (2, K, K) gate -> same-shape block.

    Karatsuba complex product: 3 MXU contractions per outer slice; the
    AC-grouped block turns AC small DMA chunks into one ~2 MB chunk.
    """
    wr = w_ref[0]
    wi = w_ref[1]
    for c in range(x_ref.shape[1]):
        xr = x_ref[0, c]
        xi = x_ref[1, c]
        t1 = _dotp(wr, xr)
        t2 = _dotp(wi, xi)
        t3 = _dotp(wr + wi, xr + xi)
        o_ref[0, c] = t1 - t2
        o_ref[1, c] = t3 - t1 - t2


def _tb_of(K: int, B: int) -> int:
    """Lane tile of the state blocks: the tuned ``_TB`` for windows up to
    K=512; narrower for K=1024 so a block stays ~2 MB per component."""
    return min(_TB if K <= 512 else 256, B)


def _apply(w2: jnp.ndarray, psi2: jnp.ndarray, a: int, k: int, n: int,
           interpret: bool = False) -> jnp.ndarray:
    """Raw kernel launch: contiguous support ``[a, a+k)``, ``B >= 128``."""
    pl = _pallas()
    K = 2**k
    A = 2**a
    B = (2**n) // (A * K)
    TB = _tb_of(K, B)
    AC = _ac_of(A, K, TB)
    x = psi2.reshape(2, A, K, B)
    y = pl.pallas_call(
        _win_kernel,
        grid=(A // AC, B // TB),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ia, ib: (0, 0, 0)),
            pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
        ],
        out_specs=pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
        out_shape=jax.ShapeDtypeStruct((2, A, K, B), psi2.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(w2, x)
    return y.reshape(psi2.shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def window_apply_ri(psi2, w2, a, k, n, interpret=False):
    """Fused complex window application on a real-split flat state.

    ``psi2``: (2, 2**n) float pair; ``w2``: (2, K, K) stacked Re/Im of the
    window unitary; support is the contiguous range ``[a, a+k)`` with a
    minor block ``B = 2**(n-a-k) >= 128``.
    """
    return _apply(w2, psi2, a, k, n, interpret)


def _bwd_kernel(w_ref, g_ref, x_ref, gp_ref, gw_ref):
    """Fused adjoint: one pass over (g, x) blocks.

    Writes the state cotangent ``U† g`` and accumulates the matrix
    cotangent ``g x†`` (complex, via the conjugate-Karatsuba 3-multiply)
    into a VMEM-resident (2, K, K) block (constant index_map => the
    accumulator persists across the whole sequential TPU grid).
    """
    pl = _pallas()
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

        # State cotangent: (wr - i wi)^T (gr + i gi), Karatsuba.
        t1 = _dotp(wrT, gr)
        t2 = _dotp(-wiT, gi)
        t3 = _dotp(wrT - wiT, gr + gi)
        gp_ref[0, c] = t1 - t2
        gp_ref[1, c] = t3 - t1 - t2

        # Matrix cotangent: g·conj(x)^T over this block's (TB) columns.
        # Conjugate Karatsuba: s1=gr xr^T, s2=gi xi^T, s3=(gr+gi)(xr-xi)^T
        # => Re += s1+s2, Im += s3-s1+s2.
        s1 = _dotp(gr, xr.T)
        s2 = _dotp(gi, xi.T)
        s3 = _dotp(gr + gi, (xr - xi).T)
        gw_ref[0] += s1 + s2
        gw_ref[1] += s3 - s1 + s2


def _apply_bwd(w2, g, psi2, a: int, k: int, n: int, interpret: bool = False):
    pl = _pallas()
    K = 2**k
    A = 2**a
    B = (2**n) // (A * K)
    TB = _tb_of(K, B)
    AC = _ac_of(A, K, TB)
    gv = g.reshape(2, A, K, B)
    xv = psi2.reshape(2, A, K, B)
    g_psi, gw2 = pl.pallas_call(
        _bwd_kernel,
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
            jax.ShapeDtypeStruct((2, K, K), g.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(w2, gv, xv)
    return g_psi.reshape(g.shape), gw2


def _fwd(psi2, w2, a, k, n, interpret):
    return _apply(w2, psi2, a, k, n, interpret), (psi2, w2)


def _bwd(a, k, n, interpret, res, g):
    psi2, w2 = res
    g_psi, gw2 = _apply_bwd(w2, g, psi2, a, k, n, interpret)
    return g_psi, gw2


window_apply_ri.defvjp(_fwd, _bwd)


def _adj_kernel(w_ref, p_ref, l_ref, pp_ref, lp_ref, gw_ref):
    """One fused adjoint-state backward step on a (2, 1, K, TB) block pair.

    Given the step's *output* state block ψ_j and cotangent block λ_j,
    computes in one HBM pass (9 Karatsuba MXU contractions):

      ψ_{j-1} = U† ψ_j        (unitarity: recompute instead of residuals)
      λ_{j-1} = U† λ_j        (cotangent pullback)
      gw     += λ_j ψ_{j-1}†  (matrix cotangent, VMEM-resident accumulator)
    """
    pl = _pallas()
    wr = w_ref[0]
    wi = w_ref[1]
    wrT = wr.T
    wiT = wi.T

    ia = pl.program_id(0)
    ib = pl.program_id(1)

    @pl.when(jnp.logical_and(ia == 0, ib == 0))
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    for c in range(p_ref.shape[1]):
        pr = p_ref[0, c]
        pi = p_ref[1, c]
        lr = l_ref[0, c]
        li = l_ref[1, c]

        # ψ_prev = U† ψ = (wrT + i·(-wiT)) (pr + i pi), Karatsuba.
        t1 = _dotp(wrT, pr)
        t2 = _dotp(-wiT, pi)
        t3 = _dotp(wrT - wiT, pr + pi)
        xpr = t1 - t2
        xpi = t3 - t1 - t2
        pp_ref[0, c] = xpr
        pp_ref[1, c] = xpi

        # λ_prev = U† λ.
        u1 = _dotp(wrT, lr)
        u2 = _dotp(-wiT, li)
        u3 = _dotp(wrT - wiT, lr + li)
        lp_ref[0, c] = u1 - u2
        lp_ref[1, c] = u3 - u1 - u2

        # Accumulate G0 = λ ψ† on the step's OUTPUT state instead of
        # gw = λ ψ_prev†: the caller post-multiplies the tiny (K, K)
        # block by U (gw = λ ψ† U since ψ_prev = U† ψ), which breaks the
        # undo → gram dependency chain so all three Karatsuba groups
        # pipeline independently on the MXU.
        s1 = _dotp(lr, pr.T)
        s2 = _dotp(li, pi.T)
        s3 = _dotp(lr + li, (pr - pi).T)
        gw_ref[0] += s1 + s2
        gw_ref[1] += s3 - s1 + s2


def adjoint_step_ri(
    psi2: jnp.ndarray,
    lam2: jnp.ndarray,
    w2: jnp.ndarray,
    a: int,
    k: int,
    n: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused adjoint-state backward step (see :func:`_adj_kernel`).

    Returns ``(psi_prev2, lam_prev2, gw2)`` for a contiguous support
    ``[a, a+k)``.  Traffic: 2 state reads + 2 state writes — the minimum
    for a residual-free backward step.
    """
    pl = _pallas()
    K = 2**k
    A = 2**a
    B = (2**n) // (A * K)
    TB = _tb_of(K, B)
    AC = _ac_of(A, K, TB)
    pv = psi2.reshape(2, A, K, B)
    lv = lam2.reshape(2, A, K, B)
    pp, lp, gw2 = pl.pallas_call(
        _adj_kernel,
        grid=(A // AC, B // TB),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ia, ib: (0, 0, 0)),
            pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
            pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
        ],
        out_specs=[
            pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
            pl.BlockSpec((2, AC, K, TB), lambda ia, ib: (0, ia, 0, ib)),
            pl.BlockSpec((2, K, K), lambda ia, ib: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, A, K, B), psi2.dtype),
            jax.ShapeDtypeStruct((2, A, K, B), lam2.dtype),
            jax.ShapeDtypeStruct((2, K, K), psi2.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(w2, pv, lv)
    # gw = G0 U (kernel accumulates G0 = λ ψ†; ψ_prev = U† ψ).
    g0r, g0i = gw2[0], gw2[1]
    wr, wi = w2[0], w2[1]
    gw = jnp.stack(
        [
            jnp.matmul(g0r, wr, precision=_HI) - jnp.matmul(g0i, wi, precision=_HI),
            jnp.matmul(g0r, wi, precision=_HI) + jnp.matmul(g0i, wr, precision=_HI),
        ]
    )
    return pp.reshape(psi2.shape), lp.reshape(lam2.shape), gw


# ---------------------------------------------------------------------------
# Top-of-register windows (support [n-k, n), minor block B = 1)
#
# These previously forced a recentering rotation pair (2 extra state passes).
# With the window axis as the LANE dimension the contraction is a plain
# X @ W^T with M = 2**(n-k) rows — a perfectly tiled MXU shape — so top
# windows now cost exactly one pass, and the layout scheduler treats top
# placements as free.
# ---------------------------------------------------------------------------


def _top_kernel(w_ref, x_ref, o_ref):
    """One (2, TA, K) state block x (2, K, K) gate -> same-shape block.

    Row-vector convention: y = x @ W^T (K is the lane axis).
    """
    wrT = w_ref[0].T
    wiT = w_ref[1].T
    xr = x_ref[0]
    xi = x_ref[1]
    t1 = _dotp(xr, wrT)
    t2 = _dotp(xi, wiT)
    t3 = _dotp(xr + xi, wrT + wiT)
    o_ref[0] = t1 - t2
    o_ref[1] = t3 - t1 - t2


def _apply_top(w2: jnp.ndarray, psi2: jnp.ndarray, k: int, n: int,
               interpret: bool = False) -> jnp.ndarray:
    """Raw launch for a window on ``[n-k, n)``."""
    pl = _pallas()
    K = 2**k
    A = (2**n) // K
    TA = min(_TA_TOP, A)
    x = psi2.reshape(2, A, K)
    y = pl.pallas_call(
        _top_kernel,
        grid=(A // TA,),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ia: (0, 0, 0)),
            pl.BlockSpec((2, TA, K), lambda ia: (0, ia, 0)),
        ],
        out_specs=pl.BlockSpec((2, TA, K), lambda ia: (0, ia, 0)),
        out_shape=jax.ShapeDtypeStruct((2, A, K), psi2.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(1),
    )(w2, x)
    return y.reshape(psi2.shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def window_apply_top_ri(psi2, w2, k, n, interpret=False):
    """Fused window application for a support ending at the register top."""
    return _apply_top(w2, psi2, k, n, interpret)


def _top_bwd_kernel(w_ref, g_ref, x_ref, gp_ref, gw_ref):
    """Backward of the top window: gp = g @ conj(W), gw += g^T conj(x)."""
    pl = _pallas()
    wr = w_ref[0]
    wi = w_ref[1]
    gr = g_ref[0]
    gi = g_ref[1]
    xr = x_ref[0]
    xi = x_ref[1]

    # State cotangent: y = x W^T  =>  gp = g conj(W)
    # (real: gr wr + gi wi; imag: gi wr - gr wi), Karatsuba.
    t1 = _dotp(gr, wr)
    t2 = _dotp(gi, wi)
    t3 = _dotp(gr + gi, wr - wi)
    gp_ref[0] = t1 + t2
    gp_ref[1] = t3 - t1 + t2

    # Matrix cotangent: gw[i, j] += sum_t g[t, i] conj(x)[t, j].
    s1 = _dotp(gr.T, xr)
    s2 = _dotp(gi.T, xi)
    s3 = _dotp((gr + gi).T, xr - xi)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gw_ref[0] += s1 + s2
    gw_ref[1] += s3 - s1 + s2


def _apply_top_bwd(w2, g, psi2, k: int, n: int, interpret: bool = False):
    pl = _pallas()
    K = 2**k
    A = (2**n) // K
    TA = min(_TA_TOP, A)
    gv = g.reshape(2, A, K)
    xv = psi2.reshape(2, A, K)
    g_psi, gw2 = pl.pallas_call(
        _top_bwd_kernel,
        grid=(A // TA,),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ia: (0, 0, 0)),
            pl.BlockSpec((2, TA, K), lambda ia: (0, ia, 0)),
            pl.BlockSpec((2, TA, K), lambda ia: (0, ia, 0)),
        ],
        out_specs=[
            pl.BlockSpec((2, TA, K), lambda ia: (0, ia, 0)),
            pl.BlockSpec((2, K, K), lambda ia: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, A, K), g.dtype),
            jax.ShapeDtypeStruct((2, K, K), g.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(1),
    )(w2, gv, xv)
    return g_psi.reshape(g.shape), gw2


def _top_fwd(psi2, w2, k, n, interpret):
    return _apply_top(w2, psi2, k, n, interpret), (psi2, w2)


def _top_bwd(k, n, interpret, res, g):
    psi2, w2 = res
    g_psi, gw2 = _apply_top_bwd(w2, g, psi2, k, n, interpret)
    return g_psi, gw2


window_apply_top_ri.defvjp(_top_fwd, _top_bwd)


def _adj_top_kernel(w_ref, p_ref, l_ref, pp_ref, lp_ref, gw_ref):
    """Fused adjoint-state backward step for a top window.

    Row-vector forward y = x W^T, so the undo is a right-multiply by
    conj(W): psi_prev = psi conj(W), lam_prev = lam conj(W),
    gw += lam^T conj(psi_prev).
    """
    pl = _pallas()
    wr = w_ref[0]
    wi = w_ref[1]
    pr = p_ref[0]
    pi = p_ref[1]
    lr = l_ref[0]
    li = l_ref[1]

    # (pr + i pi)(wr - i wi): real = pr wr + pi wi, imag = pi wr - pr wi.
    t1 = _dotp(pr, wr)
    t2 = _dotp(pi, wi)
    t3 = _dotp(pr + pi, wr - wi)
    xpr = t1 + t2
    xpi = t3 - t1 + t2
    pp_ref[0] = xpr
    pp_ref[1] = xpi

    u1 = _dotp(lr, wr)
    u2 = _dotp(li, wi)
    u3 = _dotp(lr + li, wr - wi)
    lp_ref[0] = u1 + u2
    lp_ref[1] = u3 - u1 + u2

    # Accumulate G0 = λ^T conj(ψ) on the step's OUTPUT state; the caller
    # post-multiplies by W (gw = λ^T conj(ψ_prev) = G0 W since
    # conj(ψ_prev) = conj(ψ) W) — breaks the undo → gram chain.
    s1 = _dotp(lr.T, pr)
    s2 = _dotp(li.T, pi)
    s3 = _dotp((lr + li).T, pr - pi)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gw_ref[0] += s1 + s2
    gw_ref[1] += s3 - s1 + s2


def adjoint_step_top_ri(
    psi2: jnp.ndarray,
    lam2: jnp.ndarray,
    w2: jnp.ndarray,
    k: int,
    n: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused adjoint-state backward step for a window on ``[n-k, n)``."""
    pl = _pallas()
    K = 2**k
    A = (2**n) // K
    TA = min(_TA_TOP, A)
    pv = psi2.reshape(2, A, K)
    lv = lam2.reshape(2, A, K)
    pp, lp, gw2 = pl.pallas_call(
        _adj_top_kernel,
        grid=(A // TA,),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ia: (0, 0, 0)),
            pl.BlockSpec((2, TA, K), lambda ia: (0, ia, 0)),
            pl.BlockSpec((2, TA, K), lambda ia: (0, ia, 0)),
        ],
        out_specs=[
            pl.BlockSpec((2, TA, K), lambda ia: (0, ia, 0)),
            pl.BlockSpec((2, TA, K), lambda ia: (0, ia, 0)),
            pl.BlockSpec((2, K, K), lambda ia: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, A, K), psi2.dtype),
            jax.ShapeDtypeStruct((2, A, K), lam2.dtype),
            jax.ShapeDtypeStruct((2, K, K), psi2.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(1),
    )(w2, pv, lv)
    # gw = G0 W (kernel accumulates G0 = λ^T conj(ψ)).
    g0r, g0i = gw2[0], gw2[1]
    wr, wi = w2[0], w2[1]
    gw = jnp.stack(
        [
            jnp.matmul(g0r, wr, precision=_HI) - jnp.matmul(g0i, wi, precision=_HI),
            jnp.matmul(g0r, wi, precision=_HI) + jnp.matmul(g0i, wr, precision=_HI),
        ]
    )
    return pp.reshape(psi2.shape), lp.reshape(lam2.shape), gw


def usable_top(a: int, k: int, n: int) -> bool:
    """True when the top-window kernel applies: support ends at the register
    top with a full lane tile (K >= 128; pad smaller windows to reach it)."""
    if not ENABLED or n < PALLAS_MIN_N:
        return False
    return a + k == n and 128 <= 2**k <= 256


def _rot_kernel(x_ref, o_ref):
    """(2, TX, TY) block -> transposed (2, TY, TX) block."""
    o_ref[...] = jnp.transpose(x_ref[...], (0, 2, 1))


def _rotate(psi2: jnp.ndarray, r: int, n: int, interpret: bool = False):
    """Cyclic qubit rotation q -> (q + r) % n as a tiled 2D transpose."""
    pl = _pallas()
    dim = 2**n
    R = 2**r
    X = dim // R  # rows before transpose
    TX = min(_ROT_TX, X)
    TY = min(_ROT_TY, R)
    x = psi2.reshape(2, X, R)
    y = pl.pallas_call(
        _rot_kernel,
        grid=(X // TX, R // TY),
        in_specs=[pl.BlockSpec((2, TX, TY), lambda i, j: (0, i, j))],
        out_specs=pl.BlockSpec((2, TY, TX), lambda i, j: (0, j, i)),
        out_shape=jax.ShapeDtypeStruct((2, R, X), psi2.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(x)
    return y.reshape(psi2.shape)


def _rot_pair_kernel(x_ref, y_ref, ox_ref, oy_ref):
    """Two (2, TX, TY) blocks -> transposed (2, TY, TX) blocks."""
    ox_ref[...] = jnp.transpose(x_ref[...], (0, 2, 1))
    oy_ref[...] = jnp.transpose(y_ref[...], (0, 2, 1))


def rotate_pair_ri(
    psi2: jnp.ndarray, lam2: jnp.ndarray, r: int, n: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cyclic qubit rotation of a (state, cotangent) pair in one launch.

    The adjoint backward rotates BOTH arrays at every layout change; one
    kernel with interleaved DMA streams beats two sequential transposes.
    """
    pl = _pallas()
    dim = 2**n
    R = 2**r
    X = dim // R
    TX = min(_ROT_TX, X)
    TY = min(_ROT_TY, R)
    x = psi2.reshape(2, X, R)
    y = lam2.reshape(2, X, R)
    xo, yo = pl.pallas_call(
        _rot_pair_kernel,
        grid=(X // TX, R // TY),
        in_specs=[
            pl.BlockSpec((2, TX, TY), lambda i, j: (0, i, j)),
            pl.BlockSpec((2, TX, TY), lambda i, j: (0, i, j)),
        ],
        out_specs=[
            pl.BlockSpec((2, TY, TX), lambda i, j: (0, j, i)),
            pl.BlockSpec((2, TY, TX), lambda i, j: (0, j, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, R, X), psi2.dtype),
            jax.ShapeDtypeStruct((2, R, X), lam2.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(x, y)
    return xo.reshape(psi2.shape), yo.reshape(lam2.shape)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def rotate_ri(psi2, r, n, interpret=False):
    """Differentiable fused cyclic rotation (see :func:`_rotate`)."""
    return _rotate(psi2, r, n, interpret)


def _rot_fwd(psi2, r, n, interpret):
    return _rotate(psi2, r, n, interpret), None


def _rot_bwd(r, n, interpret, _res, g):
    return (_rotate(g, (n - r) % n, n, interpret),)


rotate_ri.defvjp(_rot_fwd, _rot_bwd)


def rotate_usable(r: int, n: int) -> bool:
    """Fused rotation applies on enabled backends for large states with
    both transpose blocks >= one lane tile."""
    if not ENABLED or n < PALLAS_MIN_N:
        return False
    r = r % n
    return 7 <= r <= n - 7


# ---------------------------------------------------------------------------
# Rotation-fused windows
#
# The layout scheduler emits explicit cyclic rotations (2D transposes of the
# flat state); two adjacent (rotation, window) patterns admit a single-pass
# fusion because the window axis coincides exactly with a transpose axis:
#
#   rotmat — rot ``r`` followed by a window on the rotated-in wires [0, r):
#            the post-rotation state viewed (K, X) is the transpose of the
#            pre-rotation (X, K) view, so  y = W @ x_pre^T  in one kernel.
#   matrot — a window on [0, k) followed by rot ``n - k``: the rotation's
#            minor axis is exactly the window axis, so  y = (W @ x_pre)^T.
#
# Each fusion replaces one rotation pass + one window pass with a single
# pass, and the fused adjoint replaces a pair rotation + an adjoint step
# (4 state passes -> 2).  See simulation.fuse_layout_rotations for the
# plan-level peephole that emits these steps.
# ---------------------------------------------------------------------------

# Row tile of the fused-rotation window blocks (1 MB DMA chunks at K=256).
_TB_FUSE = 1024


def _rotmat_kernel(w_ref, x_ref, o_ref):
    """(2, TB, K) pre-rotation block -> (2, K, TB) rotated+windowed block."""
    wr = w_ref[0]
    wi = w_ref[1]
    xr = x_ref[0].T  # (K, TB): this block's slice of the rotated state
    xi = x_ref[1].T
    t1 = _dotp(wr, xr)
    t2 = _dotp(wi, xi)
    t3 = _dotp(wr + wi, xr + xi)
    o_ref[0] = t1 - t2
    o_ref[1] = t3 - t1 - t2


def _rotmat_apply(w2, psi2, r: int, n: int, interpret: bool = False):
    pl = _pallas()
    K = 2**r
    X = (2**n) // K
    TB = min(_TB_FUSE, X)
    x = psi2.reshape(2, X, K)
    y = pl.pallas_call(
        _rotmat_kernel,
        grid=(X // TB,),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ib: (0, 0, 0)),
            pl.BlockSpec((2, TB, K), lambda ib: (0, ib, 0)),
        ],
        out_specs=pl.BlockSpec((2, K, TB), lambda ib: (0, 0, ib)),
        out_shape=jax.ShapeDtypeStruct((2, K, X), psi2.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(1),
    )(w2, x)
    return y.reshape(psi2.shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def rotmat_apply_ri(psi2, w2, r, n, interpret=False):
    """Fused (cyclic rotation by ``r``, window on ``[0, r)``) in one pass."""
    return _rotmat_apply(w2, psi2, r, n, interpret)


def _rotmat_bwd_kernel(w_ref, g_ref, x_ref, gp_ref, gw_ref):
    """Backward of rotmat: gp = rot^{-1}(W† g), gw += g (rot x)†."""
    pl = _pallas()
    wrT = w_ref[0].T
    wiT = w_ref[1].T
    gr = g_ref[0]  # (K, TB) post-layout cotangent block
    gi = g_ref[1]
    xr = x_ref[0]  # (TB, K) pre-layout primal block
    xi = x_ref[1]

    # State cotangent: W† g, then written in pre-rotation layout.
    t1 = _dotp(wrT, gr)
    t2 = _dotp(-wiT, gi)
    t3 = _dotp(wrT - wiT, gr + gi)
    gp_ref[0] = (t1 - t2).T
    gp_ref[1] = (t3 - t1 - t2).T

    # Matrix cotangent: gw[i, j] += sum_t g[i, t] conj(x)[t, j].
    s1 = _dotp(gr, xr)
    s2 = _dotp(gi, xi)
    s3 = _dotp(gr + gi, xr - xi)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gw_ref[0] += s1 + s2
    gw_ref[1] += s3 - s1 + s2


def _rotmat_apply_bwd(w2, g, psi2, r: int, n: int, interpret: bool = False):
    pl = _pallas()
    K = 2**r
    X = (2**n) // K
    TB = min(_TB_FUSE, X)
    gv = g.reshape(2, K, X)
    xv = psi2.reshape(2, X, K)
    g_psi, gw2 = pl.pallas_call(
        _rotmat_bwd_kernel,
        grid=(X // TB,),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ib: (0, 0, 0)),
            pl.BlockSpec((2, K, TB), lambda ib: (0, 0, ib)),
            pl.BlockSpec((2, TB, K), lambda ib: (0, ib, 0)),
        ],
        out_specs=[
            pl.BlockSpec((2, TB, K), lambda ib: (0, ib, 0)),
            pl.BlockSpec((2, K, K), lambda ib: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, X, K), g.dtype),
            jax.ShapeDtypeStruct((2, K, K), g.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(1),
    )(w2, gv, xv)
    return g_psi.reshape(g.shape), gw2


def _rotmat_fwd(psi2, w2, r, n, interpret):
    return _rotmat_apply(w2, psi2, r, n, interpret), (psi2, w2)


def _rotmat_bwd(r, n, interpret, res, g):
    psi2, w2 = res
    return _rotmat_apply_bwd(w2, g, psi2, r, n, interpret)


rotmat_apply_ri.defvjp(_rotmat_fwd, _rotmat_bwd)


def _adj_rotmat_kernel(w_ref, p_ref, l_ref, pp_ref, lp_ref, gw_ref):
    """Fused adjoint-state backward of a rotmat step.

    Reads (2, K, TB) post-layout blocks of ψ_out and λ_out; writes the
    inverse-rotated undo ψ_in = rot^{-1}(W† ψ_out) and λ_in likewise as
    (2, TB, K) pre-layout blocks; accumulates G0 = λ ψ† (the caller
    post-multiplies by W: gw = λ ψ_mid† = G0 W)."""
    pl = _pallas()
    wrT = w_ref[0].T
    wiT = w_ref[1].T
    pr = p_ref[0]
    pi = p_ref[1]
    lr = l_ref[0]
    li = l_ref[1]

    t1 = _dotp(wrT, pr)
    t2 = _dotp(-wiT, pi)
    t3 = _dotp(wrT - wiT, pr + pi)
    pp_ref[0] = (t1 - t2).T
    pp_ref[1] = (t3 - t1 - t2).T

    u1 = _dotp(wrT, lr)
    u2 = _dotp(-wiT, li)
    u3 = _dotp(wrT - wiT, lr + li)
    lp_ref[0] = (u1 - u2).T
    lp_ref[1] = (u3 - u1 - u2).T

    s1 = _dotp(lr, pr.T)
    s2 = _dotp(li, pi.T)
    s3 = _dotp(lr + li, (pr - pi).T)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gw_ref[0] += s1 + s2
    gw_ref[1] += s3 - s1 + s2


def adjoint_rotmat_ri(
    psi2: jnp.ndarray,
    lam2: jnp.ndarray,
    w2: jnp.ndarray,
    r: int,
    n: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused adjoint-state backward step of a rotmat plan step.

    Undoes the window AND the rotation on both the state and the cotangent
    in one pass (2 reads + 2 writes), replacing a pair rotation plus an
    adjoint window step (4 passes)."""
    pl = _pallas()
    K = 2**r
    X = (2**n) // K
    TB = min(_TB_FUSE, X)
    pv = psi2.reshape(2, K, X)
    lv = lam2.reshape(2, K, X)
    pp, lp, gw2 = pl.pallas_call(
        _adj_rotmat_kernel,
        grid=(X // TB,),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ib: (0, 0, 0)),
            pl.BlockSpec((2, K, TB), lambda ib: (0, 0, ib)),
            pl.BlockSpec((2, K, TB), lambda ib: (0, 0, ib)),
        ],
        out_specs=[
            pl.BlockSpec((2, TB, K), lambda ib: (0, ib, 0)),
            pl.BlockSpec((2, TB, K), lambda ib: (0, ib, 0)),
            pl.BlockSpec((2, K, K), lambda ib: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, X, K), psi2.dtype),
            jax.ShapeDtypeStruct((2, X, K), lam2.dtype),
            jax.ShapeDtypeStruct((2, K, K), psi2.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(1),
    )(w2, pv, lv)
    # gw = G0 W (kernel accumulates G0 = λ ψ†; ψ_mid = W† ψ).
    g0r, g0i = gw2[0], gw2[1]
    wr, wi = w2[0], w2[1]
    gw = jnp.stack(
        [
            jnp.matmul(g0r, wr, precision=_HI) - jnp.matmul(g0i, wi, precision=_HI),
            jnp.matmul(g0r, wi, precision=_HI) + jnp.matmul(g0i, wr, precision=_HI),
        ]
    )
    return pp.reshape(psi2.shape), lp.reshape(lam2.shape), gw


def _matrot_kernel(w_ref, x_ref, o_ref):
    """(2, K, TB) pre-layout block -> (2, TB, K) windowed+rotated block."""
    wr = w_ref[0]
    wi = w_ref[1]
    xr = x_ref[0]  # (K, TB)
    xi = x_ref[1]
    t1 = _dotp(wr, xr)
    t2 = _dotp(wi, xi)
    t3 = _dotp(wr + wi, xr + xi)
    o_ref[0] = (t1 - t2).T
    o_ref[1] = (t3 - t1 - t2).T


def _matrot_apply(w2, psi2, r: int, n: int, interpret: bool = False):
    pl = _pallas()
    k = n - r
    K = 2**k
    B = 2**r
    TB = min(_TB_FUSE, B)
    x = psi2.reshape(2, K, B)
    y = pl.pallas_call(
        _matrot_kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ib: (0, 0, 0)),
            pl.BlockSpec((2, K, TB), lambda ib: (0, 0, ib)),
        ],
        out_specs=pl.BlockSpec((2, TB, K), lambda ib: (0, ib, 0)),
        out_shape=jax.ShapeDtypeStruct((2, B, K), psi2.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(1),
    )(w2, x)
    return y.reshape(psi2.shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def matrot_apply_ri(psi2, w2, r, n, interpret=False):
    """Fused (window on ``[0, n-r)``, cyclic rotation by ``r``) in one pass."""
    return _matrot_apply(w2, psi2, r, n, interpret)


def _matrot_bwd_kernel(w_ref, g_ref, x_ref, gp_ref, gw_ref):
    """Backward of matrot: gp = W† rot^{-1}(g), gw += rot^{-1}(g) x†."""
    pl = _pallas()
    wrT = w_ref[0].T
    wiT = w_ref[1].T
    gr = g_ref[0].T  # (K, TB): this block's slice of rot^{-1}(g)
    gi = g_ref[1].T
    xr = x_ref[0]  # (K, TB) pre-layout primal block
    xi = x_ref[1]

    t1 = _dotp(wrT, gr)
    t2 = _dotp(-wiT, gi)
    t3 = _dotp(wrT - wiT, gr + gi)
    gp_ref[0] = t1 - t2
    gp_ref[1] = t3 - t1 - t2

    # gw[i, j] += sum_t g_mid[i, t] conj(W x)[j, t] with (W x) = x_out of
    # the window — but the residual here is x_in, so accumulate against
    # x_in directly: gw = g_mid x_in†.
    s1 = _dotp(gr, xr.T)
    s2 = _dotp(gi, xi.T)
    s3 = _dotp(gr + gi, (xr - xi).T)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gw_ref[0] += s1 + s2
    gw_ref[1] += s3 - s1 + s2


def _matrot_apply_bwd(w2, g, psi2, r: int, n: int, interpret: bool = False):
    pl = _pallas()
    k = n - r
    K = 2**k
    B = 2**r
    TB = min(_TB_FUSE, B)
    gv = g.reshape(2, B, K)
    xv = psi2.reshape(2, K, B)
    g_psi, gw2 = pl.pallas_call(
        _matrot_bwd_kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ib: (0, 0, 0)),
            pl.BlockSpec((2, TB, K), lambda ib: (0, ib, 0)),
            pl.BlockSpec((2, K, TB), lambda ib: (0, 0, ib)),
        ],
        out_specs=[
            pl.BlockSpec((2, K, TB), lambda ib: (0, 0, ib)),
            pl.BlockSpec((2, K, K), lambda ib: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, K, B), g.dtype),
            jax.ShapeDtypeStruct((2, K, K), g.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(1),
    )(w2, gv, xv)
    return g_psi.reshape(g.shape), gw2


def _matrot_fwd(psi2, w2, r, n, interpret):
    return _matrot_apply(w2, psi2, r, n, interpret), (psi2, w2)


def _matrot_bwd(r, n, interpret, res, g):
    psi2, w2 = res
    return _matrot_apply_bwd(w2, g, psi2, r, n, interpret)


matrot_apply_ri.defvjp(_matrot_fwd, _matrot_bwd)


def _adj_matrot_kernel(w_ref, p_ref, l_ref, pp_ref, lp_ref, gw_ref):
    """Fused adjoint-state backward of a matrot step.

    Reads (2, TB, K) post-layout blocks; inverse-rotates them in VMEM,
    undoes the window (ψ_in = W† ψ_mid), writes (2, K, TB) pre-layout
    blocks; accumulates G0 = λ_mid ψ_mid† (caller multiplies: gw = G0 W)."""
    pl = _pallas()
    wrT = w_ref[0].T
    wiT = w_ref[1].T
    pr = p_ref[0].T  # (K, TB): mid-layout (pre-rotation) primal block
    pi = p_ref[1].T
    lr = l_ref[0].T
    li = l_ref[1].T

    t1 = _dotp(wrT, pr)
    t2 = _dotp(-wiT, pi)
    t3 = _dotp(wrT - wiT, pr + pi)
    pp_ref[0] = t1 - t2
    pp_ref[1] = t3 - t1 - t2

    u1 = _dotp(wrT, lr)
    u2 = _dotp(-wiT, li)
    u3 = _dotp(wrT - wiT, lr + li)
    lp_ref[0] = u1 - u2
    lp_ref[1] = u3 - u1 - u2

    s1 = _dotp(lr, pr.T)
    s2 = _dotp(li, pi.T)
    s3 = _dotp(lr + li, (pr - pi).T)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gw_ref[0] += s1 + s2
    gw_ref[1] += s3 - s1 + s2


def adjoint_matrot_ri(
    psi2: jnp.ndarray,
    lam2: jnp.ndarray,
    w2: jnp.ndarray,
    r: int,
    n: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused adjoint-state backward step of a matrot plan step."""
    pl = _pallas()
    k = n - r
    K = 2**k
    B = 2**r
    TB = min(_TB_FUSE, B)
    pv = psi2.reshape(2, B, K)
    lv = lam2.reshape(2, B, K)
    pp, lp, gw2 = pl.pallas_call(
        _adj_matrot_kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((2, K, K), lambda ib: (0, 0, 0)),
            pl.BlockSpec((2, TB, K), lambda ib: (0, ib, 0)),
            pl.BlockSpec((2, TB, K), lambda ib: (0, ib, 0)),
        ],
        out_specs=[
            pl.BlockSpec((2, K, TB), lambda ib: (0, 0, ib)),
            pl.BlockSpec((2, K, TB), lambda ib: (0, 0, ib)),
            pl.BlockSpec((2, K, K), lambda ib: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, K, B), psi2.dtype),
            jax.ShapeDtypeStruct((2, K, B), lam2.dtype),
            jax.ShapeDtypeStruct((2, K, K), psi2.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(1),
    )(w2, pv, lv)
    g0r, g0i = gw2[0], gw2[1]
    wr, wi = w2[0], w2[1]
    gw = jnp.stack(
        [
            jnp.matmul(g0r, wr, precision=_HI) - jnp.matmul(g0i, wi, precision=_HI),
            jnp.matmul(g0r, wi, precision=_HI) + jnp.matmul(g0i, wr, precision=_HI),
        ]
    )
    return pp.reshape(psi2.shape), lp.reshape(lam2.shape), gw


def rot_fusable(r: int, k: int, n: int) -> bool:
    """Shape eligibility of a (rotation, window) fusion — backend-agnostic.

    ``rotmat`` needs the window exactly on the rotated-in wires (k == r);
    ``matrot`` needs it exactly on the rotation's minor axis (k == n - r).
    Both need a full-lane window (K in {256, 512}) and a sublane-tileable
    complement."""
    if k != r and k != n - r:
        return False
    return 2**k in (256, 512) and min(r, n - r) >= 7


def rotmat_usable(r: int, n: int) -> bool:
    """True when the fused rotmat kernel applies at runtime."""
    if not ENABLED or n < PALLAS_MIN_N:
        return False
    return rot_fusable(r, r, n)


def matrot_usable(r: int, n: int) -> bool:
    """True when the fused matrot kernel applies at runtime."""
    if not ENABLED or n < PALLAS_MIN_N:
        return False
    return rot_fusable(r, n - r, n)


def usable(a: int, k: int, n: int) -> bool:
    """True when the fused kernel applies: enabled backend, large state,
    contiguous support with a full lane block and >= one sublane tile.

    K up to 512 admits the post-layout re-fused windows
    (:func:`qml_essentials_tpu.ops.simulation.refuse_windows`); the K=512
    contraction still pipelines under the kernel's DMA stream."""
    if not ENABLED or n < PALLAS_MIN_N:
        return False
    B = 2 ** (n - a - k)
    return B >= 128 and 8 <= 2**k <= 1024
