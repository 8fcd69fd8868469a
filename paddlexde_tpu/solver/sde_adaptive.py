"""Adaptive step-size control for SDE schemes via tree-consistent step doubling.

No counterpart exists in the reference (DrownFish19/PaddleXDE): its ``sdeint``
is a fixed-grid Euler loop (``paddlexde/functional/sdeint.py:9-37``), and
fixed grids are all that classical SDE libraries can offer cheaply, because
rejecting a step means re-sampling the SAME Brownian path on a finer grid —
with sequential increment generation that requires Rackauckas-Nie "rejection
sampling with memory" stacks (RSwM) to stay correct.

This repo's virtual Brownian tree removes that machinery entirely: any
``bm(s, t)`` query is a pure counter-based function of the interval, and the
chaining identities are exact (``brownian/virtual_tree.py``; pinned to 7e-18
including the (W, I10, K) triple). So the textbook step-doubling estimator is
path-consistent for free:

    y_full  = one step of the scheme over  [t, t+h]
    y_half  = two steps of the scheme over [t, t+h/2], [t+h/2, t+h]
    err     = || (y_full - y_half) / (atol + rtol * max|y|) ||

Both solves consume the SAME path (W(t,t+h) = W(t,t+h/2) + W(t+h/2,t+h)
bit-consistently, and likewise for the time integrals the higher-order schemes
need), so ``err`` measures the scheme's local truncation error on this path,
not Brownian resampling noise. Accept keeps the two-half-step composition
(the strictly more accurate value); the proposed dt follows the same
branchless controller as the ODE engine (``utils/ode_utils.optimal_step_size``)
with the scheme's LOCAL strong order as the exponent.

Engine shape mirrors ``solver/adaptive.py``: a ``lax.while_loop`` per output
interval inside a ``lax.scan`` over ``t_span`` — one compiled XLA program,
data-dependent trip counts, static shapes, status flags instead of Python
asserts. Each attempt costs 3 scheme steps (1 full + 2 half); that 3x is the
price of error control and is only worth paying when the problem has
localized stiffness or noise bursts — which is exactly when it wins
(see tests/functional/test_sdeint.py::TestAdaptiveSDE).

Gradients: reverse-mode through a ``lax.while_loop`` is not supported by JAX
(same limitation as every adaptive ODE solver here); differentiate via
``sdeint_adjoint(adaptive=True)`` — its two-pass design runs this engine
under stop_gradient with per-interval grid RECORDING (``grid_buffer``) and
replays the discrete-exact adjoint over the recorded grid.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.norms import rms_norm
from ..utils.ode_utils import compute_error_ratio, optimal_step_size
from ..xde.term import XDETerm
from .adaptive import DT_UNDERFLOW, MAX_STEPS_EXCEEDED, NON_FINITE, OK, AdaptiveStats

# an output interval accepted more steps than the grid_buffer could record:
# the replayed grid coarsens to one forced step over the unrecorded tail
GRID_OVERFLOW = 8

__all__ = ["solve_sde_adaptive", "AdaptiveStats", "GRID_OVERFLOW"]


class _SDEState(NamedTuple):
    t: jax.Array
    y: Any
    dt: jax.Array  # proposed next step size
    nfe: jax.Array
    n_accept: jax.Array
    n_reject: jax.Array
    status: jax.Array
    row: Any  # [grid_buffer] accepted sub-times of the CURRENT interval (or None)
    cnt: Any  # writes into row so far (or None)


def _step(term: XDETerm, t0, t1, y):
    """One scheme step over [t0, t1] through the term's move/fuse contract."""
    dt = t1 - t0
    return term.fuse(term.move(t0, dt, y), dt, y)


def _all_finite(y) -> jax.Array:
    flags = [jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(y)]
    out = flags[0]
    for f in flags[1:]:
        out = out & f
    return out


def solve_sde_adaptive(
    term: XDETerm,
    y0,
    t_span,
    *,
    rtol: float = 1e-3,
    atol: float = 1e-4,
    norm: Callable = rms_norm,
    first_step: Optional[float] = None,
    safety: float = 0.9,
    # growth cap 1.5 (vs the ODE engine's 5): the SDE local-error estimate
    # carries per-step Brownian noise, so aggressive growth after one lucky
    # step mostly buys rejections — MEASURED on GBM/milstein: ifactor 5 ->
    # 393 attempts for err 2.1e-3 at rtol 1e-4; ifactor 1.5 -> 348 attempts
    # for err 7.8e-4 (fewer attempts AND 2.7x less error)
    ifactor: float = 1.5,
    dfactor: float = 0.2,
    min_step: float = 0.0,
    max_step: float = float("inf"),
    max_num_steps: int = 2**31 - 1,
    error_order: float = 1.0,
    return_stats: bool = False,
    time_dtype=None,
    grid_buffer: Optional[int] = None,
):
    """Integrate an SDE term over ``t_span`` with adaptive dt.

    Args:
        term: an SDE ``XDETerm`` (any of ``functional/sdeint.py``'s scheme
            factories) whose Brownian queries go through a virtual-tree
            ``bm`` — interval additivity of the noise is what makes the
            step-doubling estimate meaningful.
        error_order: exponent for the dt controller — the scheme's LOCAL
            strong order (global strong order + 1/2): accepted/rejected
            steps rescale dt by ``err^(-1/error_order)`` (clipped).
        min_step: dt floor. A rejected step already at the floor is force-
            accepted with the DT_UNDERFLOW status bit set (no infinite loop).
        max_num_steps: cap on total step ATTEMPTS across the whole span
            (each attempt = 3 scheme evaluations); exceeding sets
            MAX_STEPS_EXCEEDED and freezes the state.
        grid_buffer: when set, also record the accepted sub-times of each
            output interval into a ``[T-1, grid_buffer]`` array (each accepted
            attempt contributes its midpoint AND endpoint — the kept value is
            the two-half-step composition, so replaying single scheme steps
            over the recorded times reproduces the adaptive solution
            BIT-EXACTLY; ``functional/sdeint_adjoint.py`` consumes this for
            adaptive-grid gradients). Rows are padded with the interval's end
            time (zero-length tail steps); an interval needing more than
            ``grid_buffer`` entries sets the GRID_OVERFLOW status bit and its
            replay coarsens to one forced step over the unrecorded tail.

    Returns:
        time-first solution pytree ``[T, ...]`` (t_span[0] row included);
        with ``return_stats`` and/or ``grid_buffer`` set, a tuple
        ``(solution[, AdaptiveStats][, grid_rows])`` in that order. ``nfe``
        counts scheme steps (3 per attempt).
    """
    t_span = jnp.asarray(t_span)
    if time_dtype is not None:
        t_span = t_span.astype(time_dtype)
    y0 = jax.tree.map(jnp.asarray, y0)
    t_dt = t_span.dtype

    span0 = t_span[1] - t_span[0]
    if first_step is None:
        # a zero-length FIRST interval (duplicate output time) must not
        # produce dt0 = 0: the controller scales multiplicatively and can
        # never grow off zero — fall back to the overall span
        span_tot = t_span[-1] - t_span[0]
        dt0 = jnp.where(
            span0 != 0, span0 / 8.0,
            jnp.where(span_tot != 0, span_tot / 64.0,
                      jnp.ones((), t_dt)),
        ).astype(t_dt)
    else:
        dt0 = jnp.asarray(first_step, t_dt)
    dt0 = jnp.clip(dt0, min_step, max_step)

    min_step_a = jnp.asarray(min_step, t_dt)
    max_step_a = jnp.asarray(max_step, t_dt)
    zero_i = jnp.zeros((), jnp.int32)

    def attempt(state: _SDEState, t_end):
        """One step attempt (branchless): try dt (clipped to the interval
        end), accept/reject, propose the next dt."""
        h = jnp.minimum(state.dt, t_end - state.t)
        h = jnp.maximum(h, jnp.zeros((), t_dt))
        t0 = state.t
        t1 = t0 + h
        tm = t0 + 0.5 * h

        y_full = _step(term, t0, t1, state.y)
        y_mid = _step(term, t0, tm, state.y)
        y_half = _step(term, tm, t1, y_mid)

        err_est = jax.tree.map(lambda a, b: a - b, y_full, y_half)
        ratio = compute_error_ratio(err_est, rtol, atol, state.y, y_half, norm)
        finite = _all_finite(y_half) & jnp.isfinite(ratio)
        accept = (ratio <= 1.0) & finite

        # rejected at the dt floor: force-accept + flag (matches the ODE
        # engine's DT_UNDERFLOW semantics — better a flagged coarse step
        # than a silent infinite loop)
        at_floor = h <= jnp.maximum(
            min_step_a, jnp.abs(t1) * jnp.finfo(t_dt).eps * 8.0
        )
        underflow = (~accept) & at_floor & finite
        accept = accept | underflow

        # propose from the controller's dt on ACCEPT (h == dt except at
        # output boundaries, where h is the boundary-clipped sliver — a
        # sliver's tiny error says nothing about the full-step optimum and
        # proposing from it would collapse dt at every output time, paying
        # ~log_ifactor(dt/sliver) re-growth accepts per interval); a REJECT
        # must shrink what was actually attempted, so it proposes from h
        dt_next = optimal_step_size(
            jnp.where(accept, state.dt, h), ratio, safety, ifactor, dfactor,
            error_order
        )
        dt_next = jnp.clip(dt_next, min_step_a, max_step_a)
        # a rejected step must actually shrink (optimal_step_size can return
        # dt unchanged when the clip binds); halve as the fallback
        dt_next = jnp.where(
            accept, dt_next, jnp.minimum(dt_next, 0.5 * h)
        )
        dt_next = jnp.maximum(dt_next, min_step_a)
        # hard positive floor (~16 ulp of the time scale): dt scales
        # multiplicatively, so a 0 must never propagate (it would spin at
        # zero progress until the step cap)
        dt_next = jnp.maximum(
            dt_next,
            jnp.finfo(t_dt).eps * 16.0 * jnp.maximum(jnp.abs(t_end), 1.0),
        )

        status = state.status
        status = status | jnp.where(~finite, NON_FINITE, OK).astype(status.dtype)
        status = status | jnp.where(underflow, DT_UNDERFLOW, OK).astype(status.dtype)
        stop = ~finite

        took = accept & ~stop
        new_t = jnp.where(took, t1, t0)
        new_y = jax.tree.map(
            lambda a, b: jnp.where(took, a, b), y_half, state.y
        )
        new_row, new_cnt = state.row, state.cnt
        if grid_buffer:
            # record (tm, t1) on accept: the kept value IS the two-half-step
            # composition, so a single-step replay over the recorded times is
            # bit-equal. .at[] clamps out-of-range writes under jit; the
            # GRID_OVERFLOW flag marks the (clobbered) truncation.
            written = state.row.at[state.cnt].set(tm).at[state.cnt + 1].set(t1)
            new_row = jnp.where(took, written, state.row)
            new_cnt = state.cnt + jnp.where(took, 2, 0).astype(jnp.int32)
            status = status | jnp.where(
                took & (state.cnt + 2 > grid_buffer), GRID_OVERFLOW, OK
            ).astype(status.dtype)
        return _SDEState(
            t=new_t,
            y=new_y,
            dt=dt_next,
            nfe=state.nfe + 3,
            n_accept=state.n_accept + jnp.where(took, 1, 0).astype(jnp.int32),
            n_reject=state.n_reject + jnp.where(accept | stop, 0, 1).astype(jnp.int32),
            status=status,
            row=new_row,
            cnt=new_cnt,
        )

    def advance_to(state: _SDEState, t_end):
        def cond(s):
            live = (s.status & (NON_FINITE | MAX_STEPS_EXCEEDED)) == 0
            return (s.t < t_end) & live

        def body(s):
            s = attempt(s, t_end)
            hit_cap = (s.n_accept + s.n_reject) >= max_num_steps
            status = s.status | jnp.where(
                hit_cap & (s.t < t_end), MAX_STEPS_EXCEEDED, OK
            ).astype(s.status.dtype)
            return s._replace(status=status)

        return jax.lax.while_loop(cond, body, state)

    init = _SDEState(
        t=t_span[0],
        y=y0,
        dt=dt0,
        nfe=zero_i,
        n_accept=zero_i,
        n_reject=zero_i,
        status=zero_i,
        row=jnp.zeros((grid_buffer,), t_dt) if grid_buffer else None,
        cnt=zero_i if grid_buffer else None,
    )

    def scan_body(state, t_end):
        if grid_buffer:
            # fresh per-interval recording buffer, padded with the interval
            # end (padding replays as zero-length steps)
            state = state._replace(
                row=jnp.full((grid_buffer,), t_end, t_dt), cnt=zero_i
            )
        state = advance_to(state, t_end)
        return state, (state.y, state.row) if grid_buffer else state.y

    final, outs = jax.lax.scan(scan_body, init, t_span[1:])
    ys, rows = outs if grid_buffer else (outs, None)
    sol = jax.tree.map(
        lambda y0l, ysl: jnp.concatenate([y0l[None], ysl], axis=0), y0, ys
    )
    result = (sol,)
    if return_stats:
        result += (AdaptiveStats(
            nfe=final.nfe,
            n_accept=final.n_accept,
            n_reject=final.n_reject,
            status=final.status,
        ),)
    if grid_buffer:
        result += (rows,)
    return result if len(result) > 1 else sol
