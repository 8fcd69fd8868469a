"""Buffered-dense adaptive solve: one integration pass, vectorized output.

The standard engine (``solver/adaptive.py``) mirrors the reference's control
flow — a while_loop per requested output time (``base_adaptive_solver.py:24-31``
in DrownFish19/PaddleXDE). When the output grid is much denser than the step
sequence (the spiral demo asks for 1000 outputs that dopri5 covers in ~45
steps), that serializes ~1000 tiny device iterations.

This engine integrates ONCE over the whole span inside a single
``lax.while_loop``, recording each accepted step's quartic dense-output
coefficients into a static ring buffer of ``max_steps`` slots, then evaluates
ALL requested times with one vectorized searchsorted + Horner pass. Same math,
same results; wall-clock scales with the number of solver steps instead of the
number of output points.

Opt in with ``options={"max_steps": N}`` (N = static buffer of accepted
steps; exceeded -> status flag MAX_STEPS_EXCEEDED). Memory: 5 coefficient
pytrees x state size x N.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.norms import rms_norm
from ..utils.ode_utils import select_initial_step
from ..xde.term import XDETerm
from .adaptive import (
    MAX_STEPS_EXCEEDED,
    RKState,
    AdaptiveStats,
    TABLEAUS,
)
from . import adaptive as _engine

__all__ = ["solve_adaptive_dense", "DenseSolution"]


@jax.tree_util.register_pytree_node_class
class DenseSolution:
    """Callable continuous solution from one buffered-dense adaptive solve.

    Wraps the recorded accepted-step boundaries and quartic dense-output
    coefficients; ``sol(t)`` evaluates the interpolant at ARBITRARY times
    (scalar or array) with one vectorized searchsorted + Horner pass, and
    ``sol.derivative(t)`` evaluates its exact time derivative (the quartic's
    derivative over the covering step — a 4th-order approximation of
    ``func(t, y(t))``). No reference counterpart (its dense output is a
    per-call interpolation helper, ``base_adaptive_solver.py:24-31`` in
    DrownFish19/PaddleXDE); the shape matches diffrax's ``SaveAt(dense=True)``.

    The object is a registered pytree: it crosses ``jit`` boundaries, vmaps,
    and differentiates THROUGH EVALUATION (``jax.grad(lambda t: sol(t))`` is
    the dense derivative). Gradients w.r.t. the vector field's parameters do
    not flow through the solve itself (the buffers come out of a
    ``lax.while_loop``; use :func:`~paddlexde_tpu.functional.odeint_adjoint`
    for parameter gradients at the output times). Times outside
    ``[t0, t_end]`` CLAMP to the boundary values.
    """

    def __init__(self, t_lo, t_end, buf_t0, buf_t1, buf_coeff, n_steps, y0,
                 sign: float = 1.0):
        self.t_lo = t_lo
        self.t_end = t_end
        self.buf_t0 = buf_t0
        self.buf_t1 = buf_t1
        self.buf_coeff = buf_coeff  # list of 5 pytrees, leading axis = slots
        self.n_steps = n_steps
        self.y0 = y0
        # −1.0 for a reversed-time solve: the buffers live in s = −t (the
        # t→−s canonicalization every engine uses); queries map through it
        self.sign = float(sign)

    @property
    def interval(self):
        # in USER time: (t at s_lo, t at s_end)
        return (self.sign * self.t_lo, self.sign * self.t_end)

    def tree_flatten(self):
        return (
            (self.t_lo, self.t_end, self.buf_t0, self.buf_t1,
             self.buf_coeff, self.n_steps, self.y0),
            self.sign,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, sign=aux)

    def _locate(self, t):
        tq = jnp.atleast_1d(
            self.sign * jnp.asarray(t, self.buf_t1.dtype)
        )
        idx = jnp.clip(
            jnp.searchsorted(self.buf_t1, tq, side="left"),
            0, jnp.maximum(self.n_steps - 1, 0),
        )
        seg_t0 = self.buf_t0[idx]
        seg_t1 = self.buf_t1[idx]
        # the final accepted step may overshoot t_end — clamp queries to the
        # REQUESTED domain, not the recorded step end. where-based clamp,
        # not jnp.clip: clip's max/min split the tie subgradient at an
        # exact boundary query (measured d/dt = 0.5 at t_lo), while
        # where's strict comparisons keep it 1 there.
        hi = jnp.minimum(seg_t1, jnp.asarray(self.t_end, tq.dtype))
        lo = jnp.asarray(self.t_lo, tq.dtype)
        t_eval = jnp.where(tq < lo, lo, jnp.where(tq > hi, hi, tq))
        span = seg_t1 - seg_t0
        x = jnp.where(span == 0, jnp.zeros_like(t_eval),
                      (t_eval - seg_t0) / jnp.where(span == 0, 1.0, span))
        x = jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))
        return tq, idx, x, span

    def __call__(self, t):
        scalar = jnp.ndim(t) == 0
        tq, idx, x, _ = self._locate(t)

        def horner(e, d, c, b, a):
            xx = x.reshape(x.shape + (1,) * (e.ndim - 1)).astype(e.dtype)
            return e + xx * (d + xx * (c + xx * (b + xx * a)))

        gathered = [
            jax.tree.map(lambda buf: buf[idx], self.buf_coeff[i])
            for i in range(5)
        ]
        sol = jax.tree.map(horner, *gathered)
        # exact left endpoint (x = 0 on the first slot evaluates its constant
        # term, which is y(t0) only after at least one accepted step). The
        # correction is applied under stop_gradient so d/dt at EXACTLY t_lo
        # stays the interpolant's derivative (a plain where() would zero the
        # tangent through the constant branch — review-caught, inconsistent
        # with .derivative(t_lo)).
        at_lo = tq == jnp.asarray(self.t_lo, tq.dtype)
        sol = jax.tree.map(
            lambda sl, y0l: sl + jax.lax.stop_gradient(
                jnp.where(
                    at_lo.reshape(at_lo.shape + (1,) * (sl.ndim - 1)),
                    y0l.astype(sl.dtype) - sl, jnp.zeros_like(sl),
                )
            ),
            sol, self.y0,
        )
        if scalar:
            sol = jax.tree.map(lambda sl: sl[0], sol)
        return sol

    def derivative(self, t):
        """d/dt of the interpolant (order-4 approximation of f(t, y(t)))."""
        scalar = jnp.ndim(t) == 0
        _, idx, x, span = self._locate(t)

        def dhorner(e, d, c, b, a):
            del e
            xx = x.reshape(x.shape + (1,) * (d.ndim - 1)).astype(d.dtype)
            sp = span.reshape(span.shape + (1,) * (d.ndim - 1)).astype(d.dtype)
            poly = d + xx * (2.0 * c + xx * (3.0 * b + xx * 4.0 * a))
            # d/dt = sign * d/ds (chain rule through the s = sign*t map)
            return self.sign * poly / jnp.where(sp == 0, jnp.ones_like(sp),
                                                sp)

        gathered = [
            jax.tree.map(lambda buf: buf[idx], self.buf_coeff[i])
            for i in range(5)
        ]
        out = jax.tree.map(dhorner, *gathered)
        if scalar:
            out = jax.tree.map(lambda o: o[0], out)
        return out


def solve_adaptive_dense(
    term: XDETerm,
    y0,
    t_span,
    *,
    method: str = "dopri5",
    rtol=1e-7,
    atol=1e-9,
    norm: Callable = rms_norm,
    max_steps: int = 512,
    first_step=None,
    safety=0.9,
    ifactor=10.0,
    dfactor=0.2,
    min_step=0.0,
    max_step=float("inf"),
    return_stats: bool = False,
    time_dtype=None,
    newton_iters: int = 6,
    return_dense: bool = False,
):
    """Adaptive solve with buffered dense output; returns ``[T, ...]``
    (or a callable :class:`DenseSolution` with ``return_dense=True``)."""
    tableau = TABLEAUS[method] if isinstance(method, str) else method

    t_span = jnp.asarray(t_span)
    if time_dtype is None:
        time_dtype = jnp.result_type(t_span.dtype, jnp.float32)
    t_span = t_span.astype(time_dtype)
    t0 = t_span[0]
    t_end = t_span[-1]

    y0 = jax.tree.map(jnp.asarray, y0)
    f0 = term.move(t0, t_end - t0, y0)
    if first_step is None:
        dt0 = select_initial_step(
            term.move, t0, y0, tableau.order - 1, rtol, atol, norm=norm, f0=f0
        )
    else:
        dt0 = jnp.asarray(first_step, time_dtype)

    zero_coeff = [y0] + [jax.tree.map(jnp.zeros_like, y0)] * 4
    state = RKState(
        y1=y0, f1=f0, t0=t0, t1=t0, dt=dt0.astype(time_dtype),
        interp_coeff=zero_coeff,
        next_step_index=jnp.zeros((), jnp.int32),
        next_jump_index=jnp.zeros((), jnp.int32),
        nfe=jnp.ones((), jnp.int32),
        n_accept=jnp.zeros((), jnp.int32),
        n_reject=jnp.zeros((), jnp.int32),
        status=jnp.zeros((), jnp.int32),
    )

    adaptive_step = _engine.make_adaptive_step(
        term, tableau, rtol, atol, norm,
        jnp.asarray(safety, time_dtype), jnp.asarray(ifactor, time_dtype),
        jnp.asarray(dfactor, time_dtype), jnp.asarray(min_step, time_dtype),
        jnp.asarray(max_step, time_dtype), None, None, time_dtype,
        newton_iters=newton_iters,
    )

    # step buffers: boundaries init to +inf so searchsorted skips unused slots
    buf_t0 = jnp.full((max_steps,), jnp.inf, time_dtype)
    buf_t1 = jnp.full((max_steps,), jnp.inf, time_dtype)
    buf_coeff = [
        jax.tree.map(lambda l: jnp.zeros((max_steps,) + l.shape, l.dtype), y0)
        for _ in range(5)
    ]

    def cond(carry):
        s, _, _, _, n = carry
        return (s.t1 < t_end) & (n < max_steps) & (s.status == 0)

    def body(carry):
        s, bt0, bt1, bc, n = carry
        s2 = adaptive_step(s)
        accepted = s2.t1 > s.t1
        # write the slot unconditionally with a per-slot select: one
        # dynamic-update-slice per buffer, which XLA keeps in place inside the
        # while body (a whole-buffer where() would copy all max_steps slots
        # every iteration)
        slot = jnp.where(accepted, n, jnp.maximum(n - 1, 0))
        bt0 = bt0.at[slot].set(jnp.where(accepted, s2.t0, bt0[slot]))
        bt1 = bt1.at[slot].set(jnp.where(accepted, s2.t1, bt1[slot]))
        bc = [
            jax.tree.map(
                lambda buf, c: buf.at[slot].set(
                    jnp.where(accepted, c, buf[slot])
                ),
                bc[i],
                s2.interp_coeff[i],
            )
            for i in range(5)
        ]
        return (s2, bt0, bt1, bc, n + accepted.astype(jnp.int32))

    final, buf_t0, buf_t1, buf_coeff, n_steps = jax.lax.while_loop(
        cond, body, (state, buf_t0, buf_t1, buf_coeff, jnp.zeros((), jnp.int32))
    )
    hit_cap = (final.t1 < t_end) & (n_steps >= max_steps)
    status = final.status | jnp.where(hit_cap, MAX_STEPS_EXCEEDED, 0)

    if return_dense:
        dense = DenseSolution(t0, t_end, buf_t0, buf_t1, buf_coeff,
                              n_steps, y0)
        if return_stats:
            return dense, AdaptiveStats(
                nfe=final.nfe, n_accept=final.n_accept,
                n_reject=final.n_reject, status=status,
            )
        return dense

    # vectorized dense output: locate each requested time's covering step
    idx = jnp.clip(
        jnp.searchsorted(buf_t1, t_span, side="left"), 0, jnp.maximum(n_steps - 1, 0)
    )
    seg_t0 = buf_t0[idx]
    seg_t1 = buf_t1[idx]
    t_eval = jnp.clip(t_span, t_span[0], seg_t1)
    x = jnp.where(seg_t1 == seg_t0, jnp.zeros_like(t_eval), (t_eval - seg_t0) / (seg_t1 - seg_t0))
    x = jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))

    def horner(e, d, c, b, a):
        xx = x.reshape(x.shape + (1,) * (e.ndim - 1)).astype(e.dtype)
        return e + xx * (d + xx * (c + xx * (b + xx * a)))

    gathered = [jax.tree.map(lambda buf: buf[idx], buf_coeff[i]) for i in range(5)]
    sol = jax.tree.map(horner, *gathered)
    # t == t0 exactly: coefficients of the first step evaluate to y(t0) at x=0
    # only if t0 == seg_t0; slot init guards handle the general case, but the
    # first output time is y0 by definition:
    sol = jax.tree.map(
        lambda sl, y0l: sl.at[0].set(y0l.astype(sl.dtype)), sol, y0
    )

    if return_stats:
        return sol, AdaptiveStats(
            nfe=final.nfe, n_accept=final.n_accept, n_reject=final.n_reject,
            status=status,
        )
    return sol
