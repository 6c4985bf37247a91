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


# Precision of the gram (matrix-cotangent) contractions in the backward
# kernels.  The gram reduces over the whole non-window state axis (2**16
# columns at 24 qubits), f32-accumulated on the MXU, and feeds only the
# *parameter* gradients — one further trace-reduction away — so bf16 input
# truncation largely averages out.  A raw-bf16 gram is 1 MXU pass per
# product instead of split3's 3, turning the backward step from MXU-bound
# (18 passes vs the forward's 9) into DMA-bound (12).  "split3" restores
# full precision (e.g. for the f64-oracle golden tests).
GRAM_MODE: str = "bf16"


def set_gram_mode(mode: str) -> None:
    """Select the backward gram precision ("bf16" | "split3")."""
    global GRAM_MODE
    if mode not in ("bf16", "split3"):
        raise ValueError(f"Unknown gram mode {mode!r}")
    GRAM_MODE = mode


def _dotg(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Gram-contraction matmul: raw bf16 unless GRAM_MODE/"highest" says no."""
    if GRAM_MODE == "split3" or PRECISION_MODE == "highest":
        return _dotp(a, b)
    return jax.lax.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _dotl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pullback matmul, cotangent-dtype aware.

    The saved-mode backward (:mod:`qml_essentials_tpu.ops.saved`) stores the
    inter-step cotangent in bfloat16; a bf16 operand carries no low split,
    so only the f32 gate operand needs the (hi, lo) decomposition — 2 MXU
    passes instead of split3's 3 (or 1 when both sides are bf16).  Full-f32
    operands fall back to :func:`_dotp`.
    """
    a16 = a.dtype == jnp.bfloat16
    b16 = b.dtype == jnp.bfloat16
    if not (a16 or b16):
        return _dotp(a, b)

    def d(x, y):
        return jax.lax.dot(
            x, y, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    if a16 and b16:
        return d(a, b)
    if a16:
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        return d(a, bh) + d(a, bl)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return d(ah, b) + d(al, b)


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
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(),
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
        t1 = _dotl(wrT, gr)
        t2 = _dotl(-wiT, gi)
        t3 = _dotl(wrT - wiT, gr + gi)
        gp_ref[0, c] = (t1 - t2).astype(gp_ref.dtype)
        gp_ref[1, c] = (t3 - t1 - t2).astype(gp_ref.dtype)

        # Matrix cotangent: g·conj(x)^T over this block's (TB) columns.
        # Conjugate Karatsuba: s1=gr xr^T, s2=gi xi^T, s3=(gr+gi)(xr-xi)^T
        # => Re += s1+s2, Im += s3-s1+s2.
        s1 = _dotg(gr, xr.T)
        s2 = _dotg(gi, xi.T)
        s3 = _dotg(gr + gi, (xr - xi).T)
        gw_ref[0] += s1 + s2
        gw_ref[1] += s3 - s1 + s2


def _apply_bwd(w2, g, psi2, a: int, k: int, n: int, interpret: bool = False,
               out_dtype=None):
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
            jax.ShapeDtypeStruct((2, A, K, B), out_dtype or g.dtype),
            jax.ShapeDtypeStruct((2, K, K), jnp.float32),
        ],
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(),
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

        # λ_prev = U† λ (cotangent-dtype aware: bf16 λ needs no low split).
        u1 = _dotl(wrT, lr)
        u2 = _dotl(-wiT, li)
        u3 = _dotl(wrT - wiT, lr + li)
        lp_ref[0, c] = (u1 - u2).astype(lp_ref.dtype)
        lp_ref[1, c] = (u3 - u1 - u2).astype(lp_ref.dtype)

        # Accumulate G0 = λ ψ† on the step's OUTPUT state instead of
        # gw = λ ψ_prev†: the caller post-multiplies the tiny (K, K)
        # block by U (gw = λ ψ† U since ψ_prev = U† ψ), which breaks the
        # undo → gram dependency chain so all three Karatsuba groups
        # pipeline independently on the MXU.
        s1 = _dotg(lr, pr.T)
        s2 = _dotg(li, pi.T)
        s3 = _dotg(lr + li, (pr - pi).T)
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
    lam_dtype=None,
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
            jax.ShapeDtypeStruct((2, A, K, B), lam_dtype or lam2.dtype),
            jax.ShapeDtypeStruct((2, K, K), psi2.dtype),
        ],
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(),
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
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
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
    t1 = _dotl(gr, wr)
    t2 = _dotl(gi, wi)
    t3 = _dotl(gr + gi, wr - wi)
    gp_ref[0] = (t1 + t2).astype(gp_ref.dtype)
    gp_ref[1] = (t3 - t1 + t2).astype(gp_ref.dtype)

    # Matrix cotangent: gw[i, j] += sum_t g[t, i] conj(x)[t, j].
    s1 = _dotg(gr.T, xr)
    s2 = _dotg(gi.T, xi)
    s3 = _dotg((gr + gi).T, xr - xi)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gw_ref[0] += s1 + s2
    gw_ref[1] += s3 - s1 + s2


def _apply_top_bwd(w2, g, psi2, k: int, n: int, interpret: bool = False,
                   out_dtype=None):
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
            jax.ShapeDtypeStruct((2, A, K), out_dtype or g.dtype),
            jax.ShapeDtypeStruct((2, K, K), jnp.float32),
        ],
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
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

    u1 = _dotl(lr, wr)
    u2 = _dotl(li, wi)
    u3 = _dotl(lr + li, wr - wi)
    lp_ref[0] = (u1 + u2).astype(lp_ref.dtype)
    lp_ref[1] = (u3 - u1 + u2).astype(lp_ref.dtype)

    # Accumulate G0 = λ^T conj(ψ) on the step's OUTPUT state; the caller
    # post-multiplies by W (gw = λ^T conj(ψ_prev) = G0 W since
    # conj(ψ_prev) = conj(ψ) W) — breaks the undo → gram chain.
    s1 = _dotg(lr.T, pr)
    s2 = _dotg(li.T, pi)
    s3 = _dotg((lr + li).T, pr - pi)

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
    lam_dtype=None,
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
            jax.ShapeDtypeStruct((2, A, K), lam_dtype or lam2.dtype),
            jax.ShapeDtypeStruct((2, K, K), psi2.dtype),
        ],
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
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
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(),
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
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(),
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
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
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
    t1 = _dotl(wrT, gr)
    t2 = _dotl(-wiT, gi)
    t3 = _dotl(wrT - wiT, gr + gi)
    gp_ref[0] = (t1 - t2).T.astype(gp_ref.dtype)
    gp_ref[1] = (t3 - t1 - t2).T.astype(gp_ref.dtype)

    # Matrix cotangent: gw[i, j] += sum_t g[i, t] conj(x)[t, j].
    s1 = _dotg(gr, xr)
    s2 = _dotg(gi, xi)
    s3 = _dotg(gr + gi, xr - xi)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gw_ref[0] += s1 + s2
    gw_ref[1] += s3 - s1 + s2


def _rotmat_apply_bwd(w2, g, psi2, r: int, n: int, interpret: bool = False,
                      out_dtype=None):
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
            jax.ShapeDtypeStruct((2, X, K), out_dtype or g.dtype),
            jax.ShapeDtypeStruct((2, K, K), jnp.float32),
        ],
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
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

    u1 = _dotl(wrT, lr)
    u2 = _dotl(-wiT, li)
    u3 = _dotl(wrT - wiT, lr + li)
    lp_ref[0] = (u1 - u2).T.astype(lp_ref.dtype)
    lp_ref[1] = (u3 - u1 - u2).T.astype(lp_ref.dtype)

    s1 = _dotg(lr, pr.T)
    s2 = _dotg(li, pi.T)
    s3 = _dotg(lr + li, (pr - pi).T)

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
    lam_dtype=None,
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
            jax.ShapeDtypeStruct((2, X, K), lam_dtype or lam2.dtype),
            jax.ShapeDtypeStruct((2, K, K), psi2.dtype),
        ],
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
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
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
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

    t1 = _dotl(wrT, gr)
    t2 = _dotl(-wiT, gi)
    t3 = _dotl(wrT - wiT, gr + gi)
    gp_ref[0] = (t1 - t2).astype(gp_ref.dtype)
    gp_ref[1] = (t3 - t1 - t2).astype(gp_ref.dtype)

    # gw[i, j] += sum_t g_mid[i, t] conj(W x)[j, t] with (W x) = x_out of
    # the window — but the residual here is x_in, so accumulate against
    # x_in directly: gw = g_mid x_in†.
    s1 = _dotg(gr, xr.T)
    s2 = _dotg(gi, xi.T)
    s3 = _dotg(gr + gi, (xr - xi).T)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gw_ref[0] += s1 + s2
    gw_ref[1] += s3 - s1 + s2


def _matrot_apply_bwd(w2, g, psi2, r: int, n: int, interpret: bool = False,
                      out_dtype=None):
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
            jax.ShapeDtypeStruct((2, K, B), out_dtype or g.dtype),
            jax.ShapeDtypeStruct((2, K, K), jnp.float32),
        ],
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
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

    u1 = _dotl(wrT, lr)
    u2 = _dotl(-wiT, li)
    u3 = _dotl(wrT - wiT, lr + li)
    lp_ref[0] = (u1 - u2).astype(lp_ref.dtype)
    lp_ref[1] = (u3 - u1 - u2).astype(lp_ref.dtype)

    s1 = _dotg(lr, pr.T)
    s2 = _dotg(li, pi.T)
    s3 = _dotg(lr + li, (pr - pi).T)

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
    lam_dtype=None,
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
            jax.ShapeDtypeStruct((2, K, B), lam_dtype or lam2.dtype),
            jax.ShapeDtypeStruct((2, K, K), psi2.dtype),
        ],
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
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


def rot_prefix_fusable(r: int, k: int, n: int) -> bool:
    """Shape eligibility of (rotation r, window on [0, k)) with k >= r.

    ``k == r`` is the plain rotmat transpose; ``k = r + e`` (e <= 2) adds
    the pre-rotation top ``e`` bits to the window axis (rotwin kernel:
    the post-layout window [0, k) reads pre bits [n-r, n) followed by
    [0, e))."""
    if k == r:
        return rot_fusable(r, r, n)
    e = k - r
    return (
        1 <= e <= 2
        and r >= 7
        and 2**k <= 1024
        and 2 ** (n - k) >= 128
    )


def rotmat_usable(r: int, n: int) -> bool:
    """True when the fused rotmat kernel applies at runtime."""
    if not ENABLED or n < PALLAS_MIN_N:
        return False
    return rot_fusable(r, r, n)


# ---------------------------------------------------------------------------
# rotwin: generalized (rotation r, window on [0, k)) fusion with k > r.
#
# Layout semantics (wire i -> wire (i + r) % n; wire = flat bit, MSB first):
# post wires [0, r) come from the pre LSB bits [n-r, n) and post wires
# [r, k) from the pre MSB bits [0, e).  The pre state is viewed
# (2, A, X, L) with A = 2**e (pre MSBs), X = 2**(n-k), L = 2**r (pre
# LSBs); the output is written in post layout (2, L, A, X).  The window
# matrix is host-permuted to (2, A, K, L): columns grouped by their pre-MSB
# part (column w' = l'*A + a').
# ---------------------------------------------------------------------------


def _rotwin_wperm(w2: jnp.ndarray, r: int, k: int) -> jnp.ndarray:
    """(2, K, K) -> (2, A, K, L): columns grouped by the pre-MSB part."""
    K = 2**k
    L = 2**r
    A = K // L
    return jnp.transpose(w2.reshape(2, K, L, A), (0, 3, 1, 2))


def _rotwin_wunperm(wp: jnp.ndarray, r: int, k: int) -> jnp.ndarray:
    """(2, A, K, L) -> (2, K, K): inverse of :func:`_rotwin_wperm`."""
    K = 2**k
    return jnp.transpose(wp, (0, 2, 3, 1)).reshape(2, K, K)


def _rotwin_kernel(w_ref, x_ref, o_ref):
    """x block (2, A, TX, L) pre-layout -> o block (2, L, A, TX) post."""
    A = x_ref.shape[1]
    TX = x_ref.shape[2]
    L = x_ref.shape[3]
    K = w_ref.shape[2]
    yr = yi = None
    for a in range(A):
        xr = x_ref[0, a].T  # (L, TX)
        xi = x_ref[1, a].T
        wr = w_ref[0, a]  # (K, L)
        wi = w_ref[1, a]
        t1 = _dotp(wr, xr)
        t2 = _dotp(wi, xi)
        t3 = _dotp(wr + wi, xr + xi)
        ar = t1 - t2
        ai = t3 - t1 - t2
        yr = ar if yr is None else yr + ar
        yi = ai if yi is None else yi + ai
    o_ref[0] = yr.reshape(L, A, TX)
    o_ref[1] = yi.reshape(L, A, TX)


def _rotwin_apply(w2, psi2, r: int, k: int, n: int, interpret: bool = False):
    pl = _pallas()
    K = 2**k
    L = 2**r
    A = K // L
    X = (2**n) // K
    TX = min(_TB_FUSE, X)
    wp = _rotwin_wperm(w2, r, k)
    x = psi2.reshape(2, A, X, L)
    y = pl.pallas_call(
        _rotwin_kernel,
        grid=(X // TX,),
        in_specs=[
            pl.BlockSpec((2, A, K, L), lambda ix: (0, 0, 0, 0)),
            pl.BlockSpec((2, A, TX, L), lambda ix: (0, 0, ix, 0)),
        ],
        out_specs=pl.BlockSpec((2, L, A, TX), lambda ix: (0, 0, 0, ix)),
        out_shape=jax.ShapeDtypeStruct((2, L, A, X), psi2.dtype),
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
    )(wp, x)
    return y.reshape(psi2.shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def rotwin_apply_ri(psi2, w2, r, k, n, interpret=False):
    """Fused (cyclic rotation by ``r``, window on ``[0, k)``), ``k > r``."""
    return _rotwin_apply(w2, psi2, r, k, n, interpret)


def _rotwin_bwd_kernel(w_ref, g_ref, x_ref, gp_ref, gw_ref):
    """Backward of rotwin: gp = rot^{-1}(W† g); gw_a += g (x_a)†."""
    pl = _pallas()
    A = x_ref.shape[1]
    TX = x_ref.shape[2]
    L = x_ref.shape[3]
    gr = g_ref[0].reshape(-1, TX)  # (K, TX): post-layout cotangent block
    gi = g_ref[1].reshape(-1, TX)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    for a in range(A):
        wrT = w_ref[0, a].T  # (L, K)
        wiT = w_ref[1, a].T
        # State cotangent slice for this a: (W_a)† g.
        t1 = _dotl(wrT, gr)
        t2 = _dotl(-wiT, gi)
        t3 = _dotl(wrT - wiT, gr + gi)
        gp_ref[0, a] = (t1 - t2).T.astype(gp_ref.dtype)
        gp_ref[1, a] = (t3 - t1 - t2).T.astype(gp_ref.dtype)

        # Gram slice: gw_a += g conj(x_a)† with x_a already (TX, L).
        xr = x_ref[0, a]
        xi = x_ref[1, a]
        s1 = _dotg(gr, xr)
        s2 = _dotg(gi, xi)
        s3 = _dotg(gr + gi, xr - xi)
        gw_ref[0, a] += s1 + s2
        gw_ref[1, a] += s3 - s1 + s2


def _rotwin_apply_bwd(w2, g, psi2, r: int, k: int, n: int,
                      interpret: bool = False, out_dtype=None):
    pl = _pallas()
    K = 2**k
    L = 2**r
    A = K // L
    X = (2**n) // K
    TX = min(_TB_FUSE, X)
    wp = _rotwin_wperm(w2, r, k)
    gv = g.reshape(2, L, A, X)
    xv = psi2.reshape(2, A, X, L)
    g_psi, gw_acc = pl.pallas_call(
        _rotwin_bwd_kernel,
        grid=(X // TX,),
        in_specs=[
            pl.BlockSpec((2, A, K, L), lambda ix: (0, 0, 0, 0)),
            pl.BlockSpec((2, L, A, TX), lambda ix: (0, 0, 0, ix)),
            pl.BlockSpec((2, A, TX, L), lambda ix: (0, 0, ix, 0)),
        ],
        out_specs=[
            pl.BlockSpec((2, A, TX, L), lambda ix: (0, 0, ix, 0)),
            pl.BlockSpec((2, A, K, L), lambda ix: (0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, A, X, L), out_dtype or g.dtype),
            jax.ShapeDtypeStruct((2, A, K, L), jnp.float32),
        ],
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _compiler_params(1),
    )(wp, gv, xv)
    return g_psi.reshape(g.shape), _rotwin_wunperm(gw_acc, r, k)


def _rotwin_fwd(psi2, w2, r, k, n, interpret):
    return _rotwin_apply(w2, psi2, r, k, n, interpret), (psi2, w2)


def _rotwin_bwd(r, k, n, interpret, res, g):
    psi2, w2 = res
    return _rotwin_apply_bwd(w2, g, psi2, r, k, n, interpret)


rotwin_apply_ri.defvjp(_rotwin_fwd, _rotwin_bwd)


def rotwin_usable(r: int, k: int, n: int) -> bool:
    """True when the generalized rotwin kernel applies at runtime."""
    if not ENABLED or n < PALLAS_MIN_N:
        return False
    return k > r and rot_prefix_fusable(r, k, n)


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


# ---------------------------------------------------------------------------
# Chain kernels: one HBM pass applies a whole group of windows + diagonals
#
# Step descriptors come from ops/chains.py (bit coordinates, big-endian):
#   ("win", lo, hi)  — matmul window on bits [lo, hi).  Geometry "L":
#                      lo == 0 -> minor-axis matmul (K = 256/512);
#                      lo >= 8 -> row-slice matmuls.  Geometry "H": rows.
#   ("diag", bits)   — elementwise pattern multiply; bits tuple is
#                      MSB-first; any bit reachable (rows / lanes via iota,
#                      grid bits via program_id).
#
# The fused adjoint walks the descriptors in reverse on a (state, cotangent)
# block pair, accumulating per-window gram blocks and per-diagonal masked
# partials in VMEM — one pass (2 reads + 2 writes) for the whole group.
# ---------------------------------------------------------------------------

# Grid-group rows per L-geometry block (fwd / adjoint).
CHAIN_GC_FWD = 1
CHAIN_GC_ADJ = 1

# Interpret-mode override for the chain kernels (CPU test sessions force
# the chain path without Mosaic; see tests/test_chains.py).
INTERPRET: bool = False

# Lane-chunk width of H-geometry blocks (16 KB contiguous runs); the
# adjoint holds four block arrays plus gram temporaries in VMEM, so it
# uses a narrower chunk.
CHAIN_LC = 2048
CHAIN_LC_ADJ = 1024


def chain_usable(geom, descs, n: int) -> bool:
    """Chain kernels apply on enabled backends in the large-state regime."""
    if not ENABLED or n < PALLAS_MIN_N:
        return False
    kind, span = geom
    if kind == "L":
        return 10 <= span < n
    return span == 8 and n - span >= 7  # >= one full lane tile per chunk


def _dotT(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """split3 / highest ``a^T @ b`` (contraction over axis 0 of both)."""
    dn = (((0,), (0,)), ((), ()))
    if PRECISION_MODE == "highest":
        return jax.lax.dot_general(a, b, dn, precision=_HI)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dn, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _kara_right(xr, xi, wr, wi):
    """y = x @ W^T (window on the minor axis), Karatsuba."""
    t1 = _dotp(xr, wr.T)
    t2 = _dotp(xi, wi.T)
    t3 = _dotp(xr + xi, (wr + wi).T)
    return t1 - t2, t3 - t1 - t2


def _kara_right_conj(xr, xi, wr, wi):
    """y = x @ conj(W) (minor-axis undo: inverse of x @ W^T)."""
    t1 = _dotp(xr, wr)
    t2 = -_dotp(xi, wi)
    t3 = _dotp(xr + xi, wr - wi)
    return t1 - t2, t3 - t1 - t2


def _kara_left(xr, xi, wr, wi):
    """y = W @ x (window on the leading axis), Karatsuba."""
    t1 = _dotp(wr, xr)
    t2 = _dotp(wi, xi)
    t3 = _dotp(wr + wi, xr + xi)
    return t1 - t2, t3 - t1 - t2


def _kara_left_dag(xr, xi, wr, wi):
    """y = W^dag @ x (leading-axis undo), transposed-lhs split3 dots."""
    t1 = _dotT(wr, xr)
    t2 = -_dotT(wi, xi)
    t3 = _dotT(wr - wi, xr + xi)
    return t1 - t2, t3 - t1 - t2


def _chain_geom_view(geom, n: int, psi2: jnp.ndarray, gc: int, lc: int = None):
    """Reshape a flat (2, 2**n) pair into the geometry's block array."""
    kind, span = geom
    if kind == "L":
        R = 2 ** (span - 7)
        G = 2 ** (n - span)
        GC = min(gc, G)
        return psi2.reshape(2, G, R, 128), (G // GC,), (2, GC, R, 128)
    rows = 2**span
    B = 2 ** (n - span)
    LC = min(CHAIN_LC if lc is None else lc, B)
    return psi2.reshape(2, rows, B), (B // LC,), (2, rows, LC)


def _chain_state_spec(geom, blk):
    pl = _pallas()
    if geom[0] == "L":
        return pl.BlockSpec(blk, lambda ia: (0, ia, 0, 0))
    return pl.BlockSpec(blk, lambda ib: (0, 0, ib))


def _payload_spec(desc):
    pl = _pallas()
    from jax.experimental.pallas import tpu as pltpu

    if desc[0] == "win":
        K = 2 ** (desc[2] - desc[1])
        return pl.BlockSpec((2, K, K), lambda *_: (0, 0, 0))
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _bitval(geom, desc_bit, n, shape, cidx, pid):
    """0/1 int32 array (or scalar) for one state bit over a block value.

    ``shape`` is the in-kernel block value shape: (GC, R, 256) for L,
    (rows, LC) for H.  ``cidx`` is a prebuilt iota over the leading GC axis
    (L geometry); ``pid`` the grid index.
    """
    kind, span = geom
    b = desc_bit
    if kind == "L":
        GC, R, LN = shape
        if b < 7:
            lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
            return (lane >> b) & 1
        if b < span:
            row = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            return (row >> (b - 7)) & 1
        g = pid * GC + cidx
        return (g >> (b - span)) & 1
    rows, LC = shape
    base = n - span
    if b >= base:
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        return (row >> (b - base)) & 1
    lc_bits = int(np.log2(LC))
    if b < lc_bits:
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return (lane >> b) & 1
    return (pid >> (b - lc_bits)) & 1


def _diag_pattern(geom, bits, d_ref, n, shape, pid):
    """(pr, pi) pattern arrays for a diagonal on ``bits`` (MSB first)."""
    if geom[0] == "L":
        cidx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    else:
        cidx = None
    idx = None
    for b in bits:
        v = _bitval(geom, b, n, shape, cidx, pid)
        idx = v if idx is None else idx * 2 + v
    if not isinstance(idx, jnp.ndarray):
        idx = jnp.full(shape, idx, jnp.int32)
    K = 2 ** len(bits)
    pr = jnp.full(shape, d_ref[0, 0])
    pi = jnp.full(shape, d_ref[1, 0])
    for v in range(1, K):
        m = idx == v
        pr = jnp.where(m, d_ref[0, v], pr)
        pi = jnp.where(m, d_ref[1, v], pi)
    return pr, pi


def _win_rows_apply(xr, xi, wr, wi, lo, hi, base, dag=False):
    """Row-axis window on bits [lo, hi) of a (..., ROWS, LN) value.

    The sub-window axes (Q, LN) are adjacent in layout, so they collapse
    into one minor dimension: each (lead, P) slice is a single
    ``(K, K) @ (K, Q*LN)`` contraction — wide, MXU-friendly dots instead
    of Q*LN-fragmented ones."""
    lead = xr.shape[:-2]
    ROWS, LN = xr.shape[-2], xr.shape[-1]
    K = 2 ** (hi - lo)
    Q = 2 ** (lo - base)
    P = ROWS // (K * Q)
    apply = _kara_left_dag if dag else _kara_left
    n_lead = int(np.prod(lead)) if lead else 1
    M = n_lead * P
    fr = xr.reshape((M, K, Q * LN))
    fi = xi.reshape((M, K, Q * LN))
    outs_r, outs_i = [], []
    for m in range(M):
        t1, t2 = apply(fr[m], fi[m], wr, wi)
        outs_r.append(t1)
        outs_i.append(t2)
    yr = jnp.stack(outs_r) if M > 1 else outs_r[0][None]
    yi = jnp.stack(outs_i) if M > 1 else outs_i[0][None]
    return yr.reshape(xr.shape), yi.reshape(xi.shape)


def _win_rows_gram(pr, pi, lr, li, lo, hi, base):
    """Window-axis gram G0 = lam psi^dag for a rows window; returns the
    (re, im) pair of (K, K) accumulators summed over this block."""
    lead = pr.shape[:-2]
    ROWS, LN = pr.shape[-2], pr.shape[-1]
    K = 2 ** (hi - lo)
    Q = 2 ** (lo - base)
    P = ROWS // (K * Q)
    n_lead = int(np.prod(lead)) if lead else 1
    M = n_lead * P
    fr = pr.reshape((M, K, Q * LN))
    fi = pi.reshape((M, K, Q * LN))
    gr = lr.reshape((M, K, Q * LN))
    gi = li.reshape((M, K, Q * LN))
    s1 = s2 = s3 = None
    for m in range(M):
        vr, vi = fr[m], fi[m]
        ur, ui = gr[m], gi[m]
        a1 = _dotp(ur, vr.T)
        a2 = _dotp(ui, vi.T)
        a3 = _dotp(ur + ui, (vr - vi).T)
        s1 = a1 if s1 is None else s1 + a1
        s2 = a2 if s2 is None else s2 + a2
        s3 = a3 if s3 is None else s3 + a3
    return s1 + s2, s3 - s1 + s2


def _make_chain_fwd_kernel(geom, descs, n):
    pl = _pallas()
    kind, span = geom

    def kern(*refs):
        x_ref = refs[-2]
        o_ref = refs[-1]
        prefs = refs[: len(descs)]
        pid = pl.program_id(0)
        xr = x_ref[0]
        xi = x_ref[1]
        shape = xr.shape
        for d, pref in zip(descs, prefs):
            if d[0] == "win":
                lo, hi = d[1], d[2]
                wr, wi = pref[0], pref[1]
                if kind == "L" and lo == 0:
                    K = 2**hi
                    M = int(np.prod(shape)) // K
                    br, bi = _kara_right(
                        xr.reshape(M, K), xi.reshape(M, K), wr, wi
                    )
                    xr, xi = br.reshape(shape), bi.reshape(shape)
                else:
                    base = 7 if kind == "L" else n - span
                    xr, xi = _win_rows_apply(xr, xi, wr, wi, lo, hi, base)
            else:
                pr, pi = _diag_pattern(geom, d[1], pref, n, shape, pid)
                xr, xi = pr * xr - pi * xi, pr * xi + pi * xr
        o_ref[0] = xr
        o_ref[1] = xi

    return kern


def _chain_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        vmem_limit_bytes=127 * 1024 * 1024,
        dimension_semantics=("arbitrary",),
    )


def chain_apply_ri(psi2, payloads, geom, descs, n, interpret=False):
    """Apply a whole chain group in one pass (see ops/chains.py)."""
    pl = _pallas()
    interpret = interpret or INTERPRET
    x, grid, blk = _chain_geom_view(geom, n, psi2, CHAIN_GC_FWD)
    in_specs = [_payload_spec(d) for d in descs] + [_chain_state_spec(geom, blk)]
    y = pl.pallas_call(
        _make_chain_fwd_kernel(geom, descs, n),
        grid=grid,
        in_specs=in_specs,
        out_specs=_chain_state_spec(geom, blk),
        out_shape=jax.ShapeDtypeStruct(x.shape, psi2.dtype),
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _chain_params(),
    )(*payloads, x)
    return y.reshape(psi2.shape)


def _make_chain_adj_kernel(geom, descs, n):
    pl = _pallas()
    kind, span = geom
    nd = len(descs)

    def kern(*refs):
        prefs = refs[:nd]
        p_ref = refs[nd]
        l_ref = refs[nd + 1]
        pp_ref = refs[nd + 2]
        lp_ref = refs[nd + 3]
        grefs = refs[nd + 4 :]
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            for g in grefs:
                g[...] = jnp.zeros_like(g)

        xr = p_ref[0]
        xi = p_ref[1]
        lr = l_ref[0]
        li = l_ref[1]
        shape = xr.shape
        for j in range(nd - 1, -1, -1):
            d = descs[j]
            pref = prefs[j]
            gref = grefs[j]
            if d[0] == "win":
                lo, hi = d[1], d[2]
                wr, wi = pref[0], pref[1]
                if kind == "L" and lo == 0:
                    K = 2**hi
                    M = int(np.prod(shape)) // K
                    vr, vi = xr.reshape(M, K), xi.reshape(M, K)
                    ur, ui = lr.reshape(M, K), li.reshape(M, K)
                    # G0 = lam^T conj(psi) on the minor window axis.
                    s1 = _dotT(ur, vr)
                    s2 = _dotT(ui, vi)
                    s3 = _dotT(ur + ui, vr - vi)
                    gref[0] += s1 + s2
                    gref[1] += s3 - s1 + s2
                    vr, vi = _kara_right_conj(vr, vi, wr, wi)
                    ur, ui = _kara_right_conj(ur, ui, wr, wi)
                    xr, xi = vr.reshape(shape), vi.reshape(shape)
                    lr, li = ur.reshape(shape), ui.reshape(shape)
                else:
                    base = 7 if kind == "L" else n - span
                    g_re, g_im = _win_rows_gram(xr, xi, lr, li, lo, hi, base)
                    gref[0] += g_re
                    gref[1] += g_im
                    xr, xi = _win_rows_apply(
                        xr, xi, wr, wi, lo, hi, base, dag=True
                    )
                    lr, li = _win_rows_apply(
                        lr, li, wr, wi, lo, hi, base, dag=True
                    )
            else:
                bits = d[1]
                pr, pi = _diag_pattern(geom, bits, pref, n, shape, pid)
                # Masked partials of G0 = lam conj(psi), lanes kept.
                m_r = lr * xr + li * xi
                m_i = li * xr - lr * xi
                cidx = (
                    jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                    if kind == "L"
                    else None
                )
                idx = None
                for b in bits:
                    v = _bitval(geom, b, n, shape, cidx, pid)
                    idx = v if idx is None else idx * 2 + v
                if not isinstance(idx, jnp.ndarray):
                    idx = jnp.full(shape, idx, jnp.int32)
                red_axes = tuple(range(len(shape) - 1))
                for v in range(2 ** len(bits)):
                    m = (idx == v).astype(jnp.float32)
                    gref[0, v] += jnp.sum(m_r * m, axis=red_axes)
                    gref[1, v] += jnp.sum(m_i * m, axis=red_axes)
                # Undo: multiply by the conjugate pattern.
                xr, xi = pr * xr + pi * xi, pr * xi - pi * xr
                lr, li = pr * lr + pi * li, pr * li - pi * lr
        pp_ref[0] = xr
        pp_ref[1] = xi
        lp_ref[0] = lr
        lp_ref[1] = li

    return kern


def adjoint_chain_ri(psi2, lam2, payloads, geom, descs, n, interpret=False):
    """Fused adjoint-state backward of a chain step.

    Returns ``(psi_prev2, lam_prev2, grads)`` with one gradient per
    descriptor: window cotangents ``gw = G0 W`` as (2, K, K) pairs and
    diagonal cotangents ``gd[v] = d[v] * G0[v]`` as (2, 2**k) pairs.
    """
    pl = _pallas()
    interpret = interpret or INTERPRET
    x, grid, blk = _chain_geom_view(geom, n, psi2, CHAIN_GC_ADJ, CHAIN_LC_ADJ)
    lam = lam2.reshape(x.shape)
    lanes = blk[-1]
    out_specs = [_chain_state_spec(geom, blk), _chain_state_spec(geom, blk)]
    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, psi2.dtype),
        jax.ShapeDtypeStruct(x.shape, lam2.dtype),
    ]
    for d in descs:
        if d[0] == "win":
            K = 2 ** (d[2] - d[1])
            out_specs.append(pl.BlockSpec((2, K, K), lambda *_: (0, 0, 0)))
            out_shapes.append(jax.ShapeDtypeStruct((2, K, K), psi2.dtype))
        else:
            V = 2 ** len(d[1])
            out_specs.append(
                pl.BlockSpec((2, V, lanes), lambda *_: (0, 0, 0))
            )
            out_shapes.append(jax.ShapeDtypeStruct((2, V, lanes), psi2.dtype))
    in_specs = [_payload_spec(d) for d in descs] + [
        _chain_state_spec(geom, blk),
        _chain_state_spec(geom, blk),
    ]
    outs = pl.pallas_call(
        _make_chain_adj_kernel(geom, descs, n),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret or INTERPRET,
        compiler_params=None if (interpret or INTERPRET) else _chain_params(),
    )(*payloads, x, lam)
    pp, lp = outs[0], outs[1]
    grads = []
    for d, g0, w2 in zip(descs, outs[2:], payloads):
        if d[0] == "win":
            g0r, g0i = g0[0], g0[1]
            wr, wi = w2[0], w2[1]
            grads.append(
                jnp.stack(
                    [
                        jnp.matmul(g0r, wr, precision=_HI)
                        - jnp.matmul(g0i, wi, precision=_HI),
                        jnp.matmul(g0r, wi, precision=_HI)
                        + jnp.matmul(g0i, wr, precision=_HI),
                    ]
                )
            )
        else:
            g0v = g0.sum(axis=-1)  # (2, V)
            dr, di = w2[0], w2[1]
            grads.append(
                jnp.stack(
                    [dr * g0v[0] - di * g0v[1], dr * g0v[1] + di * g0v[0]]
                )
            )
    return pp.reshape(psi2.shape), lp.reshape(lam2.shape), tuple(grads)
