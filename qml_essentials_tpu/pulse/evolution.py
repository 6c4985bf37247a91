"""Hamiltonian time evolution: ``dU/dt = -i H(t) U`` as a gate factory.

TPU-first design
----------------

The default integrator is the **commutator-free Magnus** family (2nd order
midpoint / 4th order CFM4:2, Blanes & Moan 2006) on a fixed step grid driven
by ``jax.lax.scan`` — static trip counts, unitarity to machine precision,
and a single fused XLA program, which is exactly what the TPU compilation
model wants.  Two adaptive integrators (implemented from scratch — this
build has no diffrax) are available for rough, non-smooth drives, both as
``lax.while_loop`` programs with a PI step controller and real-split
arithmetic: the embedded Dormand–Prince 5(4) pair (``"dopri5"``) and
Hairer's 12-stage DOP853 (``"dopri8"``: 8th-order propagation with the
stabilised 7th-order error norm combining the 5th/3rd-order estimators).

Solver programs are cached per (coefficient-function code objects, dim,
tolerances, solver) so pulse-heavy circuits compile O(#pulse shapes) XLA
programs, not O(#gates).

Reference parity: qml_essentials/evolution.py (solver cache 31-166, Magnus
168-237, adaptive solver 239-319, evolve dispatch 322-570).
"""

from __future__ import annotations

import math
import threading
from typing import Any, Callable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from qml_essentials_tpu.ops.operations import (
    Hermitian,
    Operation,
    ParametrizedHamiltonian,
)
from qml_essentials_tpu.pulse import _dop853_tableau as _dp8

# Dormand–Prince 5(4) Butcher tableau.
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (
    5179 / 57600,
    0.0,
    7571 / 16695,
    393 / 640,
    -92097 / 339200,
    187 / 2100,
    1 / 40,
)


class Evolution:
    """Gate factory engine for static and time-dependent Hamiltonians."""

    _evolve_solver_cache: dict = {}
    _evolve_solver_cache_lock = threading.Lock()

    # TPU-native default: fixed-grid Magnus (static shapes, no
    # data-dependent trip count inside jit).  The reference defaults to an
    # adaptive solver (qml_essentials/evolution.py:77-82), which is a poor
    # fit for the XLA compilation model.
    _solver_defaults: dict = {
        "max_steps": 2**13,
        "throw": True,
        "solver": "magnus4",
        "magnus_steps": 256,
    }
    _valid_solvers = ("dopri8", "dopri5", "magnus2", "magnus4")

    # Coercions applied to each default on write.
    _DEFAULT_COERCE = {
        "max_steps": int,
        "throw": bool,
        "solver": str,
        "magnus_steps": int,
    }

    # ------------------------------------------------------------- defaults
    @classmethod
    def set_solver_defaults(cls, **overrides) -> dict:
        """Update class-level solver defaults; returns the previous values.

        Accepts any subset of ``max_steps``, ``throw``, ``solver``,
        ``magnus_steps``; ``None`` values are ignored so the return value
        round-trips through a second call to restore.
        """
        prev: dict = {}
        for knob, value in overrides.items():
            if value is None:
                continue
            coerce = cls._DEFAULT_COERCE.get(knob)
            if coerce is None:
                raise TypeError(f"Unknown solver default {knob!r}")
            if knob == "solver" and value not in cls._valid_solvers:
                raise ValueError(
                    f"Unknown solver {value!r}; expected one of {cls._valid_solvers}"
                )
            prev[knob] = cls._solver_defaults[knob]
            cls._solver_defaults[knob] = coerce(value)
        return prev

    @classmethod
    def _store_evolve_solver(cls, cache_key: tuple, solve: Callable) -> Callable:
        with cls._evolve_solver_cache_lock:
            existing = cls._evolve_solver_cache.get(cache_key)
            if existing is not None:
                return existing
            cls._evolve_solver_cache[cache_key] = solve
        return solve

    @classmethod
    def clear_evolve_solver_cache(cls) -> None:
        """Evict every cached compiled solver (call after coeff-fn rebuilds)."""
        with cls._evolve_solver_cache_lock:
            cls._evolve_solver_cache.clear()

    @classmethod
    def _parse_evolve_solver_options(cls, odeint_kwargs: dict) -> tuple:
        default_tol = 1.0e-10 if jax.config.x64_enabled else 1.4e-8
        atol = odeint_kwargs.pop("atol", default_tol)
        rtol = odeint_kwargs.pop("rtol", default_tol)
        picked = {
            knob: coerce(odeint_kwargs.pop(knob, cls._solver_defaults[knob]))
            for knob, coerce in cls._DEFAULT_COERCE.items()
        }
        if picked["solver"] not in cls._valid_solvers:
            raise ValueError(
                f"Unknown solver {picked['solver']!r}; expected one of "
                f"{cls._valid_solvers}"
            )
        return (
            atol,
            rtol,
            picked["max_steps"],
            picked["throw"],
            picked["solver"],
            picked["magnus_steps"],
        )

    # ------------------------------------------------------------- builders
    @classmethod
    def _build_magnus_evolve_solver(
        cls,
        cache_key: tuple,
        coeff_fns: Tuple[Callable, ...],
        n_terms: int,
        dim: int,
        solver_name: str,
        magnus_steps: int,
    ) -> Callable:
        """Fixed-grid commutator-free Magnus integrator (scan of expm)."""
        cdt = jnp.complex128 if jax.config.x64_enabled else jnp.complex64
        n_steps = magnus_steps

        @jax.jit
        def _solve(neg_iH_split, params, t0, t1):
            neg_iH = (neg_iH_split[:, 0] + 1j * neg_iH_split[:, 1]).astype(cdt)
            h = (t1 - t0) / n_steps

            def A_at(t):
                c = jnp.stack(
                    [
                        jnp.asarray(coeff_fns[i](params[i], t)).reshape(())
                        for i in range(n_terms)
                    ]
                ).astype(cdt)
                return jnp.tensordot(c, neg_iH, axes=1)

            if solver_name == "magnus2":

                def step(U, n):
                    tn = t0 + n * h
                    return jax.scipy.linalg.expm(h * A_at(tn + 0.5 * h)) @ U, None

            else:  # magnus4: CFM4:2 (Blanes & Moan 2006, Table II)
                sqrt3 = math.sqrt(3.0)
                c1 = 0.5 - sqrt3 / 6.0
                c2 = 0.5 + sqrt3 / 6.0
                a1 = 0.25 + sqrt3 / 6.0
                a2 = 0.25 - sqrt3 / 6.0

                def step(U, n):
                    tn = t0 + n * h
                    A1 = A_at(tn + c1 * h)
                    A2 = A_at(tn + c2 * h)
                    Ua = jax.scipy.linalg.expm(h * (a1 * A1 + a2 * A2))
                    Ub = jax.scipy.linalg.expm(h * (a2 * A1 + a1 * A2))
                    return Ub @ Ua @ U, None

            U0 = jnp.eye(dim, dtype=cdt)
            U_final, _ = jax.lax.scan(step, U0, jnp.arange(n_steps))
            return U_final

        return cls._store_evolve_solver(cache_key, _solve)

    @classmethod
    def _build_adaptive_evolve_solver(
        cls,
        cache_key: tuple,
        coeff_fns: Tuple[Callable, ...],
        n_terms: int,
        dim: int,
        atol: float,
        rtol: float,
        max_steps: int,
        throw: bool,
        rdt,
        solver_name: str = "dopri5",
    ) -> Callable:
        """Adaptive Runge–Kutta with a PI controller (real-split).

        ``dopri5``: embedded Dormand–Prince 5(4).  ``dopri8``: Hairer's
        DOP853 — 12 propagation stages plus the FSAL-style evaluation at
        ``(t + h, y_new)``, with the stabilised error norm combining the
        5th/3rd-order estimators (matches the published algorithm; tableau
        in ``_dop853_tableau``).
        """
        # Clamp tolerances to what the working precision can represent —
        # otherwise the controller rejects every step (f32 cannot reach the
        # reference's 1.4e-8 default) and the solve returns NaNs.
        eps = float(jnp.finfo(rdt).eps)
        atol = max(atol, 30 * eps)
        rtol = max(rtol, 30 * eps)
        # Error-estimator order + 1: the step-size exponent of the method.
        q = 8.0 if solver_name == "dopri8" else 5.0

        @jax.jit
        def _solve(neg_iH_split, params, t0, t1):
            A_all = neg_iH_split[:, 0]
            B_all = neg_iH_split[:, 1]

            def rhs(t, y):
                c = jnp.stack(
                    [
                        jnp.asarray(coeff_fns[i](params[i], t)).reshape(())
                        for i in range(n_terms)
                    ]
                ).astype(rdt)
                A_eff = jnp.tensordot(c, A_all, axes=1)
                B_eff = jnp.tensordot(c, B_all, axes=1)
                du_re = A_eff @ y[0] - B_eff @ y[1]
                du_im = A_eff @ y[1] + B_eff @ y[0]
                return jnp.stack([du_re, du_im])

            y0 = jnp.stack(
                [jnp.eye(dim, dtype=rdt), jnp.zeros((dim, dim), dtype=rdt)]
            )
            t0r = jnp.asarray(t0, dtype=rdt)
            t1r = jnp.asarray(t1, dtype=rdt)
            span = t1r - t0r
            h0 = span / 100.0

            def stages(t, y, h, tab_c, tab_a):
                ks = []
                for ci, arow in zip(tab_c, tab_a):
                    yi = y
                    for aij, k in zip(arow, ks):
                        if aij != 0.0:
                            yi = yi + (h * aij) * k
                    ks.append(rhs(t + ci * h, yi))
                return ks

            if solver_name == "dopri8":

                def step_once(t, y, h):
                    ks = stages(t, y, h, _dp8.C, _dp8.A)
                    y_new = y
                    for bi, k in zip(_dp8.B, ks):
                        if bi != 0.0:
                            y_new = y_new + (h * bi) * k
                    ks.append(rhs(t + h, y_new))  # FSAL-style 13th row
                    scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
                    err5 = sum((e * k for e, k in zip(_dp8.E5, ks) if e != 0.0),
                               jnp.zeros_like(y)) / scale
                    err3 = sum((e * k for e, k in zip(_dp8.E3, ks) if e != 0.0),
                               jnp.zeros_like(y)) / scale
                    n5 = jnp.sum(err5**2)
                    n3 = jnp.sum(err3**2)
                    denom = jnp.maximum(n5 + 0.01 * n3, jnp.finfo(rdt).tiny)
                    err_norm = jnp.abs(h) * n5 / jnp.sqrt(denom * y.size)
                    return y_new, err_norm

            else:

                def step_once(t, y, h):
                    ks = stages(t, y, h, _DP_C, _DP_A)
                    y5 = y
                    y4 = y
                    for i in range(7):
                        y5 = y5 + h * _DP_B5[i] * ks[i]
                        y4 = y4 + h * _DP_B4[i] * ks[i]
                    err = y5 - y4
                    scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y5))
                    err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
                    return y5, err_norm

            def cond(state):
                t, y, h, n, _ = state
                return jnp.logical_and(t < t1r, n < max_steps)

            def body(state):
                t, y, h, n, prev_err = state
                h = jnp.minimum(h, t1r - t)
                y_new, err_norm = step_once(t, y, h)
                accept = err_norm <= 1.0
                # PI controller: beta trade-off for stability at order q.
                err_norm = jnp.maximum(err_norm, 1e-10)
                factor = 0.9 * err_norm ** (-0.7 / q) * prev_err ** (0.4 / q)
                factor = jnp.clip(factor, 0.2, 5.0)
                h_next = h * factor
                t = jnp.where(accept, t + h, t)
                y = jnp.where(accept, y_new, y)
                prev_err = jnp.where(accept, err_norm, prev_err)
                return (t, y, h_next, n + 1, prev_err)

            t_f, y_f, _, n_f, _ = jax.lax.while_loop(
                cond, body, (t0r, y0, h0, jnp.asarray(0), jnp.asarray(1.0, dtype=rdt))
            )
            U = (y_f[0] + 1j * y_f[1]).astype(
                jnp.complex128 if jax.config.x64_enabled else jnp.complex64
            )
            # Non-convergence (step budget exhausted before reaching t1)
            # yields NaNs so optimisers can reject the candidate, matching
            # the reference's throw=False semantics.
            failed = t_f < t1r
            return jnp.where(failed, jnp.full_like(U, jnp.nan), U)

        return cls._store_evolve_solver(cache_key, _solve)

    # ---------------------------------------------------------------- evolve
    @classmethod
    def evolve(
        cls,
        hamiltonian: Union["Hermitian", "ParametrizedHamiltonian"],
        name: Optional[str] = None,
        **odeint_kwargs: Any,
    ) -> Callable:
        """Gate factory dispatch: static ``exp(-itH)`` or time-dependent ODE.

        Static::

            gate = Hermitian(H_mat, wires=0).evolve()
            gate(t=0.5)                    # U = exp(-0.5j * H)

        Time-dependent::

            H_td = coeff_fn * Hermitian(H_mat, wires=0)
            H_td.evolve()([params], T)     # dU/dt = -i f(p,t) H U
        """
        if isinstance(hamiltonian, Hermitian):
            return cls._evolve_static(hamiltonian, name=name)
        if isinstance(hamiltonian, ParametrizedHamiltonian):
            return cls._evolve_parametrized(hamiltonian, name=name, **odeint_kwargs)
        raise TypeError(
            f"evolve() expects a Hermitian or ParametrizedHamiltonian, "
            f"got {type(hamiltonian)}"
        )

    @staticmethod
    def _evolve_static(hermitian: Hermitian, name: Optional[str] = None) -> Callable:
        H_mat = hermitian.matrix

        def _apply(t: float, wires: Union[int, List[int]] = 0) -> Operation:
            U = jax.scipy.linalg.expm(-1j * t * H_mat)
            return Operation(wires=wires, matrix=U, name=name)

        return _apply

    @classmethod
    def _evolve_parametrized(
        cls,
        ph: ParametrizedHamiltonian,
        name: Optional[str] = None,
        **odeint_kwargs: Any,
    ) -> Callable:
        """Gate factory solving the (multi-term) time-dependent Schrödinger ODE.

        ``-i H_i`` is precomputed per term and split into (Re, Im) so the
        adaptive path runs in real arithmetic; solvers are cached on the
        coefficient functions' code objects + dim + tolerances.
        """
        coeff_fns = ph.coeff_fns
        H_mats = ph.H_mats
        wires = ph.wires
        n_terms = ph.n_terms
        dim = H_mats[0].shape[0]

        neg_iH_split = jnp.stack(
            [
                jnp.stack([jnp.real(-1j * H), jnp.imag(-1j * H)], axis=0)
                for H in H_mats
            ],
            axis=0,
        )
        rdt = jnp.float64 if jax.config.x64_enabled else jnp.float32

        atol, rtol, max_steps, throw, solver_name, magnus_steps = (
            cls._parse_evolve_solver_options(odeint_kwargs)
        )

        cache_key = (
            tuple(fn.__code__ for fn in coeff_fns),
            dim,
            atol,
            rtol,
            max_steps,
            throw,
            solver_name,
            magnus_steps,
            bool(jax.config.x64_enabled),  # dtype changes the compiled program
        )

        with cls._evolve_solver_cache_lock:
            _solve = cls._evolve_solver_cache.get(cache_key)
        if _solve is None:
            if solver_name in ("magnus2", "magnus4"):
                _solve = cls._build_magnus_evolve_solver(
                    cache_key, coeff_fns, n_terms, dim, solver_name, magnus_steps
                )
            else:
                _solve = cls._build_adaptive_evolve_solver(
                    cache_key,
                    coeff_fns,
                    n_terms,
                    dim,
                    atol,
                    rtol,
                    max_steps,
                    throw,
                    rdt,
                    solver_name=solver_name,
                )

        def _apply(coeff_args, T) -> Operation:
            params = (
                tuple(coeff_args)
                if isinstance(coeff_args, (list, tuple))
                else (coeff_args,)
            )
            if len(params) != n_terms:
                raise ValueError(
                    f"Expected {n_terms} parameter set(s) for a "
                    f"{n_terms}-term ParametrizedHamiltonian, got {len(params)}."
                )
            T_arr = jnp.asarray(T, dtype=rdt)
            if T_arr.ndim == 0:
                t0, t1 = rdt(0.0), T_arr
            else:
                t0, t1 = T_arr[0], T_arr[1]
            U = _solve(neg_iH_split, params, t0, t1)
            return Operation(wires=wires, matrix=U, name=name)

        return _apply
