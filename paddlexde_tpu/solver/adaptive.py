"""Adaptive embedded Runge–Kutta engine under ``jit``.

TPU-native rebuild of the reference's ``AdaptiveRKSolver``
(``paddlexde/solver/base_adaptive_solver_rk.py`` in DrownFish19/PaddleXDE).
The reference's Python ``while next_t > rk_state.t1`` with per-stage
``PaddleAssign`` buffer writes becomes a ``lax.while_loop`` whose carry is the
:class:`RKState` pytree, wrapped in a ``lax.scan`` over requested output times —
the whole solve is one compiled XLA program with data-dependent trip counts but
static shapes.

Deliberate improvements over the reference (each flagged in SURVEY §2.11):
- Python asserts on dt-underflow / non-finite state (``:200-203``) become status
  flags carried in :class:`RKState` and returned as :class:`AdaptiveStats`.
- The ``jump_t`` discontinuity path re-evaluates through ``move`` (the reference
  crashes on a nonexistent ``self.func``, §2.11-6).
- The stage buffer keeps stages on a LEADING axis (``[S, ...state]``) so stage
  combinations are clean tensordots over axis 0 — the reference's trailing
  ``k[..., i]`` layout would put a size-7 axis in the lane dimension, which XLA
  tiles poorly on TPU.
- An NFE counter rides in the carry for free (SURVEY §5 tracing note).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.norms import rms_norm
from ..utils.ode_utils import (
    compute_error_ratio,
    interp_evaluate,
    interp_fit,
    optimal_step_size,
    select_initial_step,
    sort_tvals,
)
from ..xde.term import XDETerm
from .tableaus import TABLEAUS, ButcherTableau

__all__ = ["solve_adaptive", "AdaptiveStats", "RKState", "make_rk_core"]

# status bit flags (GRID_OVERFLOW matches solver/sde_adaptive.py's value)
OK = 0
DT_UNDERFLOW = 1
NON_FINITE = 2
MAX_STEPS_EXCEEDED = 4
GRID_OVERFLOW = 8


class RKState(NamedTuple):
    """Mirror of the reference's ``_RungeKuttaState`` namedtuple
    (``base_adaptive_solver_rk.py:22-24``), as a while_loop carry."""

    y1: Any  # state at t1
    f1: Any  # derivative at t1
    t0: jax.Array
    t1: jax.Array
    dt: jax.Array  # proposed next step size
    interp_coeff: Any  # 5-list of state pytrees (quartic dense output)
    next_step_index: jax.Array
    next_jump_index: jax.Array
    nfe: jax.Array
    n_accept: jax.Array
    n_reject: jax.Array
    status: jax.Array


class AdaptiveStats(NamedTuple):
    nfe: jax.Array
    n_accept: jax.Array
    n_reject: jax.Array
    status: jax.Array  # 0 = OK; bit flags above


def _combine(k, coeffs, dt, y0=None):
    """y0 + dt * sum_i coeffs[i] * k[i], per leaf (stages on leading axis)."""
    coeffs = jnp.asarray(coeffs)

    def leaf(kl, y0l=None):
        c = coeffs.astype(kl.dtype)
        dd = jnp.asarray(dt, kl.dtype)
        contrib = jnp.tensordot(c, kl, axes=(0, 0)) * dd
        return contrib if y0l is None else y0l + contrib

    if y0 is None:
        return jax.tree.map(leaf, k)
    return jax.tree.map(lambda kl, yl: leaf(kl, yl), k, y0)


def _error_combine(k, coeffs, dt):
    """dt * Σ e_i k_i via the ANCHORED form dt * Σ e_i (k_i − k_0).

    Every embedded pair has Σ e_i = Σ(b_i − b̂_i) = 0, so the two are equal
    in exact arithmetic — but the raw combination cancels O(1) stage values
    to read an O(hᵖ) signal, and for tableaus with large error weights
    (sdirk4's forced ±4 direction: the order-3 conditions pin e to a 1-D
    nullspace, so recalibrating b̂ only rescales the estimator — it cannot
    change the cancellation SNR) the f32 rounding of those products sets a
    noise floor (~ε·Σ|e_i|·|k|) that destabilizes tight tolerances. The
    anchored form never multiplies an O(|k|) value: every product is
    e_i·(k_i − k_0) with differences O(h·y″), so the floor drops by ~1/h in
    the accuracy-limited regime (and a constant stage field gives EXACTLY
    zero, any rounding of the weights notwithstanding — the anchor is
    subtracted before multiplication, so the weights' rounded sum never
    enters). MEASURED (Robertson [0,100], sdirk4, f32, CPU): raw floors at
    rtol 3e-8 (MAX_STEPS after 60k attempts, 75% rejections, 73% error);
    anchored runs clean through rtol 1e-8 (status 0, relerr ~5e-5 — the f32
    stage-arithmetic saturation). Pinned in
    tests/solver/test_error_combine.py.
    """
    coeffs = jnp.asarray(coeffs)

    def leaf(kl):
        c = coeffs.astype(kl.dtype)
        dd = jnp.asarray(dt, kl.dtype)
        return jnp.tensordot(c, kl - kl[0], axes=(0, 0)) * dd

    return jax.tree.map(leaf, k)


def make_rk_core(term, tableau, newton_iters: int = 6):
    """The pure single-step math of the adaptive engine, factored out so the
    recorded-grid replay (``adaptive_autodiff.py``) steps BIT-EQUALLY to the
    engine: returns ``runge_kutta_step(y0, f0, t0, dt, t1) -> (y1, f1,
    y1_error, k)`` and ``interp_fit_step(y0, y1, k, dt, f0) -> coeff``.
    """
    n_stages = tableau.n_stages
    implicit = tableau.implicit

    def explicit_rk_stages(y0_, f0_, t0_, dt_, t1_):
        k = jax.tree.map(
            lambda f: jnp.zeros((n_stages,) + f.shape, f.dtype).at[0].set(f), f0_
        )
        yi = y0_
        for i in range(n_stages - 1):
            alpha_i = float(tableau.alpha[i])
            ti = t1_ if alpha_i == 1.0 else t0_ + alpha_i * dt_
            yi = _combine(k, tableau.beta[i], dt_, y0_)
            f = term.move(ti, dt_, yi)
            k = jax.tree.map(lambda kl, fl, i=i: kl.at[i + 1].set(fl), k, f)
        return k, yi

    def dirk_stages(y0_, f0_, t0_, dt_, t1_):
        """(E)SDIRK stage loop: Y_i = y0 + dt*(beta_i . k) + dt*g_i f(t_i, Y_i),
        stage derivative recovered exactly from the solved stage equation as
        f_i = (Y_i - base_i)/(dt*g_i) — no extra vector-field call."""
        from jax.flatten_util import ravel_pytree

        from .implicit import _stage_newton_solve

        k = jax.tree.map(
            lambda f: jnp.zeros((n_stages,) + f.shape, f.dtype), f0_
        )
        g0 = float(tableau.diag[0])
        if g0 == 0.0:
            # ESDIRK: explicit first stage reuses the step-entry derivative
            k = jax.tree.map(lambda kl, fl: kl.at[0].set(fl), k, f0_)
        else:
            # SDIRK (implicit FIRST stage, e.g. Hairer–Wanner's sdirk4):
            # Y_0 = y0 + dt*g0*f(t0 + c1*dt, Y_0) with c1 = a11 = g0 (the
            # row-sum convention); f0_ is not a stage derivative here
            y0_flat, unravel0 = ravel_pytree(y0_)
            ti0 = t0_ + g0 * dt_
            gdt0 = jnp.asarray(g0, y0_flat.dtype) * jnp.asarray(
                dt_, y0_flat.dtype
            )

            def f_at0(y_flat, unravel0=unravel0):
                return ravel_pytree(term.move(ti0, dt_, unravel0(y_flat)))[0]

            yf0 = _stage_newton_solve(f_at0, y0_flat, gdt0, y0_flat, newton_iters)
            safe0 = jnp.where(gdt0 == 0, jnp.ones_like(gdt0), gdt0)
            k = jax.tree.map(
                lambda kl, fl: kl.at[0].set(fl), k,
                unravel0((yf0 - y0_flat) / safe0),
            )
        yi = y0_
        for i in range(n_stages - 1):
            alpha_i = float(tableau.alpha[i])
            gamma_i = float(tableau.diag[i + 1])
            ti = t1_ if alpha_i == 1.0 else t0_ + alpha_i * dt_
            base = _combine(k, tableau.beta[i], dt_, y0_)
            base_flat, unravel = ravel_pytree(base)
            gdt = jnp.asarray(gamma_i, base_flat.dtype) * jnp.asarray(
                dt_, base_flat.dtype
            )

            def f_at(y_flat, ti=ti, unravel=unravel):
                return ravel_pytree(term.move(ti, dt_, unravel(y_flat)))[0]

            y_flat = _stage_newton_solve(
                f_at, base_flat, gdt, base_flat, newton_iters
            )
            safe = jnp.where(gdt == 0, jnp.ones_like(gdt), gdt)
            f_flat = (y_flat - base_flat) / safe
            f = unravel(f_flat)
            yi = unravel(y_flat)
            k = jax.tree.map(lambda kl, fl, i=i: kl.at[i + 1].set(fl), k, f)
        return k, yi

    def runge_kutta_step(y0_, f0_, t0_, dt_, t1_):
        k, yi = (dirk_stages if implicit else explicit_rk_stages)(
            y0_, f0_, t0_, dt_, t1_
        )
        if tableau.fsal:
            y1_ = yi  # Dormand-Prince: last stage input is the solution
        else:
            y1_ = _combine(k, tableau.c_sol, dt_, y0_)
        f1_ = jax.tree.map(lambda kl: kl[-1], k)
        y1_error = _error_combine(k, tableau.c_error, dt_)
        return y1_, f1_, y1_error, k

    def interp_fit_step(y0_, y1_, k, dt_, f0_):
        """Quartic dense-output fit. The LEFT-endpoint slope is the step's
        entry derivative f(t0, y0) — NOT k[0]: for an implicit-first-stage
        tableau (sdirk4) k[0] = f(t0 + c1·dt, Y0), an O(h)-wrong endpoint
        slope that silently degrades the interpolant (review find). For
        explicit/ESDIRK tableaus f0_ == k[0] and nothing changes."""
        y_mid = _combine(k, tableau.c_mid, dt_, y0_)
        f1_ = jax.tree.map(lambda kl: kl[-1], k)
        return interp_fit(y0_, y1_, y_mid, f0_, f1_, dt_)

    return runge_kutta_step, interp_fit_step


def make_adaptive_step(
    term, tableau, rtol, atol, norm, safety_a, ifactor_a, dfactor_a,
    min_step_a, max_step_a, step_t_a, jump_t_a, time_dtype,
    newton_iters: int = 6,
):
    """Build the branchless ``RKState -> RKState`` step (reference
    ``_adaptive_step``, ``base_adaptive_solver_rk.py:183-284``). Shared by the
    per-output-time engine below and the buffered-dense engine
    (``adaptive_dense.py``).

    Implicit (E)SDIRK tableaus (``tableau.diag`` set) route each diagonal
    stage through a Newton solve (``newton_iters`` iterations, dense Jacobian
    via ``jax.linearize``) — the error control, dense output, step_t/jump_t
    and status machinery are scheme-agnostic, so stiff problems get the same
    adaptive dt the explicit zoo enjoys.
    """
    order = tableau.order
    has_step_t = step_t_a is not None
    has_jump_t = jump_t_a is not None
    n_stages = tableau.n_stages
    implicit = tableau.implicit
    runge_kutta_step, interp_fit_step = make_rk_core(term, tableau, newton_iters)

    def adaptive_step(s: RKState) -> RKState:
        y0_, f0_, t0_, dt_ = s.y1, s.f1, s.t1, s.dt
        t1_ = t0_ + dt_

        underflow = t1_ <= t0_
        finite = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(y0_)])
        )
        status = s.status | jnp.where(underflow, DT_UNDERFLOW, 0) | jnp.where(
            finite, 0, NON_FINITE
        )

        on_step_t = jnp.zeros((), bool)
        on_jump_t = jnp.zeros((), bool)
        if has_step_t:
            nst = step_t_a[s.next_step_index]
            on_step_t = (t0_ < nst) & (nst < t1_)
            t1_ = jnp.where(on_step_t, nst, t1_)
            dt_ = t1_ - t0_
        if has_jump_t:
            njt = jump_t_a[s.next_jump_index]
            on_jump_t = (t0_ < njt) & (njt < t1_)
            on_step_t = on_step_t & ~on_jump_t
            t1_ = jnp.where(on_jump_t, njt, t1_)
            dt_ = t1_ - t0_

        y1_, f1_, y1_error, k = runge_kutta_step(y0_, f0_, t0_, dt_, t1_)

        error_ratio = compute_error_ratio(y1_error, rtol, atol, y0_, y1_, norm)
        accept = error_ratio <= 1.0
        accept = jnp.where(dt_ > max_step_a, False, accept)
        accept = jnp.where(dt_ <= min_step_a, True, accept)

        coeff_new = interp_fit_step(y0_, y1_, k, dt_, f0_)

        sel = lambda a, b: jax.tree.map(lambda x, y: jnp.where(accept, x, y), a, b)
        y_next = sel(y1_, y0_)
        t_next = jnp.where(accept, t1_, t0_)
        coeff = sel(coeff_new, s.interp_coeff)

        nfe_extra = jnp.zeros((), jnp.int32)
        if has_jump_t:
            do_refresh = accept & on_jump_t
            f_refreshed = term.move(t_next, jnp.zeros((), time_dtype), y_next)
            f1_ = jax.tree.map(
                lambda fr, f: jnp.where(do_refresh, fr, f), f_refreshed, f1_
            )
            nfe_extra = jnp.where(do_refresh, 1, 0).astype(jnp.int32)
        f_next = sel(f1_, f0_)

        next_step_index = s.next_step_index
        next_jump_index = s.next_jump_index
        if has_step_t:
            bump = accept & on_step_t & (s.next_step_index < step_t_a.shape[0] - 1)
            next_step_index = next_step_index + bump.astype(jnp.int32)
        if has_jump_t:
            bump = accept & on_jump_t & (s.next_jump_index < jump_t_a.shape[0] - 1)
            next_jump_index = next_jump_index + bump.astype(jnp.int32)

        dt_next = optimal_step_size(
            dt_, error_ratio, safety_a, ifactor_a, dfactor_a, order
        )
        dt_next = jnp.clip(dt_next, min_step_a, max_step_a)

        return RKState(
            y1=y_next,
            f1=f_next,
            t0=t0_,
            t1=t_next,
            dt=dt_next,
            interp_coeff=coeff,
            next_step_index=next_step_index,
            next_jump_index=next_jump_index,
            # implicit FIRST stage (sdirk4) costs its own Newton solve
            nfe=s.nfe
            + (n_stages - 1 + (1 if implicit and float(tableau.diag[0]) != 0.0 else 0))
            * (newton_iters if implicit else 1)
            + nfe_extra,
            n_accept=s.n_accept + accept.astype(jnp.int32),
            n_reject=s.n_reject + (~accept).astype(jnp.int32),
            status=status,
        )

    return adaptive_step


def solve_adaptive(
    term: XDETerm,
    y0,
    t_span,
    *,
    method: str = "dopri5",
    rtol=1e-7,
    atol=1e-9,
    norm: Callable = rms_norm,
    first_step=None,
    safety=0.9,
    ifactor=10.0,
    dfactor=0.2,
    min_step=0.0,
    max_step=float("inf"),
    max_num_steps: int = 2**31 - 1,
    step_t=None,
    jump_t=None,
    return_stats: bool = False,
    time_dtype=None,
    newton_iters: int = 6,
    _record_grid: Optional[int] = None,
):
    """Integrate ``term`` over ``t_span`` (strictly increasing), adaptively.

    Returns a time-first ``[T, ...]`` pytree (plus :class:`AdaptiveStats` when
    ``return_stats``). Call-graph parity: reference §3.2
    (``base_adaptive_solver.py:24-31`` outer loop, ``base_adaptive_solver_rk.py``
    stepping) — but fully traced.

    ``_record_grid`` (internal — the direct-gradient wrapper,
    ``adaptive_autodiff.py``): an int capacity; the accepted-step endpoint
    grid is recorded into a ``[cap+1]`` buffer (``grid[0] = t0``, entry ``i``
    = the i-th accepted ``t1``; on overflow the write index clamps at ``cap``
    so the last slot tracks the FINAL t1 — the recorded grid stays a valid,
    monotone integration grid whose tail step is coarser than the true one —
    and the GRID_OVERFLOW status bit is set). The return becomes
    ``(solution, stats, grid, n_recorded)`` regardless of ``return_stats``.
    Recording never changes the solve's arithmetic (buffer writes only).
    """
    tableau: ButcherTableau = TABLEAUS[method] if isinstance(method, str) else method
    n_stages = tableau.n_stages
    order = tableau.order

    t_span = jnp.asarray(t_span)
    if time_dtype is None:
        time_dtype = jnp.result_type(t_span.dtype, jnp.float32)
    t_span = t_span.astype(time_dtype)
    t0 = t_span[0]

    y0 = jax.tree.map(jnp.asarray, y0)
    rtol = jnp.asarray(rtol, time_dtype)
    atol = jnp.asarray(atol, time_dtype)
    min_step_a = jnp.asarray(min_step, time_dtype)
    max_step_a = jnp.asarray(max_step, time_dtype)
    safety_a = jnp.asarray(safety, time_dtype)
    ifactor_a = jnp.asarray(ifactor, time_dtype)
    dfactor_a = jnp.asarray(dfactor, time_dtype)

    has_step_t = step_t is not None and np.size(step_t) > 0
    has_jump_t = jump_t is not None and np.size(jump_t) > 0
    step_t_a = sort_tvals(jnp.asarray(step_t, time_dtype), t0) if has_step_t else None
    jump_t_a = sort_tvals(jnp.asarray(jump_t, time_dtype), t0) if has_jump_t else None

    f0 = term.move(t0, t_span[-1] - t0, y0)
    if first_step is None:
        dt0 = select_initial_step(
            term.move, t0, y0, order - 1, rtol, atol, norm=norm, f0=f0
        )
    else:
        dt0 = jnp.asarray(first_step, time_dtype)

    zero_coeff = [y0] + [jax.tree.map(jnp.zeros_like, y0)] * 4

    def idx_init(grid):
        # first element strictly greater than t0, clipped to len-1
        return jnp.minimum(
            jnp.searchsorted(grid, t0, side="right"), grid.shape[0] - 1
        ).astype(jnp.int32)

    state = RKState(
        y1=y0,
        f1=f0,
        t0=t0,
        t1=t0,
        dt=dt0.astype(time_dtype),
        interp_coeff=zero_coeff,
        next_step_index=idx_init(step_t_a) if has_step_t else jnp.zeros((), jnp.int32),
        next_jump_index=idx_init(jump_t_a) if has_jump_t else jnp.zeros((), jnp.int32),
        nfe=jnp.ones((), jnp.int32),
        n_accept=jnp.zeros((), jnp.int32),
        n_reject=jnp.zeros((), jnp.int32),
        status=jnp.zeros((), jnp.int32),
    )

    adaptive_step = make_adaptive_step(
        term, tableau, rtol, atol, norm, safety_a, ifactor_a, dfactor_a,
        min_step_a, max_step_a, step_t_a if has_step_t else None,
        jump_t_a if has_jump_t else None, time_dtype,
        newton_iters=newton_iters,
    )

    max_steps_arr = jnp.asarray(max_num_steps, jnp.int32)

    record = _record_grid is not None
    cap = int(_record_grid) if record else 0
    buf0 = jnp.full((cap + 1,), t0, time_dtype)

    def output_one(carry, next_t):
        """Advance until t1 covers next_t, then dense-output evaluate
        (reference ``step`` :116-127)."""
        s, buf = carry

        def cond(c):
            s_, n_, _ = c
            return (next_t > s_.t1) & (n_ < max_steps_arr) & (s_.status == 0)

        def body(c):
            s_, n_, b_ = c
            s2 = adaptive_step(s_)
            if record:
                # idempotent on rejects (same index, same t1); on overflow
                # the index clamps at cap, so the last slot tracks the final
                # t1 — a monotone grid with one coarse merged tail step
                b_ = b_.at[jnp.minimum(s2.n_accept, cap)].set(s2.t1)
            return s2, n_ + 1, b_

        s, n_taken, buf = jax.lax.while_loop(
            cond, body, (s, jnp.zeros((), jnp.int32), buf)
        )
        hit_cap = (next_t > s.t1) & (n_taken >= max_steps_arr)
        s = s._replace(status=s.status | jnp.where(hit_cap, MAX_STEPS_EXCEEDED, 0))
        t_eval = jnp.clip(next_t, s.t0, s.t1)
        y_out = interp_evaluate(s.interp_coeff, s.t0, s.t1, t_eval)
        return (s, buf), y_out

    (final_state, grid_buf), ys = jax.lax.scan(output_one, (state, buf0), t_span[1:])

    solution = jax.tree.map(
        lambda y0l, ysl: jnp.concatenate([y0l[None].astype(ysl.dtype), ysl], axis=0),
        y0,
        ys,
    )
    if record:
        status = final_state.status | jnp.where(
            final_state.n_accept > cap, GRID_OVERFLOW, 0
        )
        stats = AdaptiveStats(
            nfe=final_state.nfe,
            n_accept=final_state.n_accept,
            n_reject=final_state.n_reject,
            status=status,
        )
        n_rec = jnp.minimum(final_state.n_accept, cap)
        return solution, stats, grid_buf, n_rec
    if return_stats:
        stats = AdaptiveStats(
            nfe=final_state.nfe,
            n_accept=final_state.n_accept,
            n_reject=final_state.n_reject,
            status=final_state.status,
        )
        return solution, stats
    return solution
