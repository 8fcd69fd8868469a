"""sdeint_event: integrate an SDE until an event function crosses zero.

First-passage / barrier detection for ``dy = f dt + g dW``. No counterpart
exists in the reference (DrownFish19/PaddleXDE — its sdeint is a fixed-grid
Euler loop, ``paddlexde/functional/sdeint.py:9-37``) nor in fixed-grid SDE
practice generally, because locating a crossing INSIDE a step requires
re-querying the same Brownian path on sub-intervals — which a sequential
increment sampler cannot do without bridge bookkeeping.

The virtual tree makes the crossing search a PATH REFINEMENT instead of an
interpolation: march with fixed steps until ``event_fn`` changes sign, then
bisect the bracketing step where each probe takes one REAL scheme step over
``[t_lo, t_mid]`` with the tree's exact Brownian increment for that
sub-interval. Every halving both shrinks the bracket (2^-k) AND refines the
discretization near the crossing, so the located time converges to the
crossing of the actual sampled path — not of a linear interpolant between
coarse knots (for Brownian-driven states the path is ~h^{1/2}-rough inside a
step, so interpolation-based event times carry O(√h) error that refinement
removes).

Single-path semantics (state ``[D]``); batch by ``jax.vmap`` over per-path
keys — ``lax.while_loop`` batches correctly under vmap (completed paths
freeze), which is how the first-passage law test estimates E[τ] over 4096
paths in one program.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..solver.adaptive import MAX_STEPS_EXCEEDED
from .odeint_event import EventResult
from .sdeint import _default_bm_for_scheme
from .sde_schemes.registry import resolve_sde_scheme

__all__ = ["sdeint_event", "EventResult"]

# every PATHWISE sdeint scheme (weak2 is for expectations, not
# first-passage paths; reversible_heun's paired state does not fit the
# bracket refinement). General matrix-noise schemes take noise_dim= like
# sdeint.
# Pathwise schemes only (registry ``pathwise`` flag): weak2/weak2_general
# approximate the LAW, not the path (a "first passage" of a weak path is not
# the first passage of the SDE), and reversible_heun's (y, z) pair state
# does not fit the bracket refinement — all refused with a clear error.



def sdeint_event(
    drift,
    diffusion,
    y0,
    t0,
    event_fn: Callable,
    solver: str = "euler",
    *,
    t_max,
    step_size,
    bm=None,
    key=None,
    levy_area_approximation: str = "none",
    noise_dim=None,
    refine_iters: int = 24,
    max_num_steps: int = 10**6,
) -> EventResult:
    """Integrate until ``event_fn(t, y)`` crosses zero (first passage).

    Args:
        drift/diffusion: as :func:`sdeint` — the diagonal contract for the
            diagonal schemes, taylor15's scalar-channel contract, or the
            matrix contract ``G(t, y) -> [..., D, M]`` for the
            ``*_general`` / ``*_commutative`` schemes.
        y0: initial state (single array).
        t0: start time.
        event_fn: scalar function; the event fires at the first sign change
            relative to ``event_fn(t0, y0)`` (a zero at t0 fires at t0).
        solver: any pathwise sdeint scheme — euler / milstein / sra1 /
            sriw1 / heun_stratonovich / taylor15 / foster2, the matrix-
            noise ``*_general`` / ``*_commutative`` variants (pass
            ``noise_dim=M`` as in :func:`sdeint`), and the drift-implicit
            stiff family implicit_em / implicit_milstein / implicit_sra1 /
            implicit_foster2 (+ ``_general``) — first passage through
            stiff systems where an explicit march at the same h explodes.
            weak2 (distributional) and reversible_heun (paired state) are
            excluded.
        t_max: integration horizon (REQUIRED — a Brownian path may never
            cross; ``event_fired=False`` when the horizon is hit).
        step_size: the march step h. The event time's accuracy is NOT
            limited by h: the bracketing step is bisected with real
            path-refining scheme steps, so t* resolves to ~h·2^-refine_iters
            on the refined path.
        bm: explicit Brownian motion over at least [t0, t_max]; built from
            ``key`` when omitted.
        refine_iters: bisection depth inside the bracketing step.
        max_num_steps: cap on march steps (status MAX_STEPS on overflow).

    Returns:
        :class:`EventResult` — t_event, y_event, event_fired, status
        (0 OK; 4 = step budget exhausted before the horizon, matching the
        adaptive engine's MAX_STEPS_EXCEEDED bit).
    """
    solver_name = solver.lower() if isinstance(solver, str) else ""
    spec = resolve_sde_scheme(solver_name)
    if spec is None or not spec.pathwise:
        from .sde_schemes.registry import SDE_SCHEMES

        supported = sorted({n for n, sp in SDE_SCHEMES.items() if sp.pathwise})
        raise ValueError(
            f"sdeint_event supports the PATHWISE schemes {supported}; got "
            f"{solver!r}" + (
                " (weak schemes approximate the law, not the path; "
                "reversible_heun's pair state does not fit the bracket "
                "refinement)" if spec is not None else ""
            )
        )

    y0 = jnp.asarray(y0)
    t0 = jnp.asarray(t0)
    t_dt = jnp.result_type(t0.dtype, jnp.float32)
    t0 = t0.astype(t_dt)
    t_end = jnp.asarray(t_max, t_dt)
    h = jnp.asarray(step_size, t_dt)

    if bm is None:
        # shared helper = sdeint's exact per-scheme Lévy-mode/size rules
        bm = _default_bm_for_scheme(
            solver_name, y0, t0, t_end, key, levy_area_approximation,
            noise_dim,
        )

    if spec.levy == "area":
        # replicate sdeint's guards: without them a y0 [D] single-path call
        # builds a 1-D bm whose Lévy areas are silently ZERO
        # (virtual_tree returns zeros for ndim<=1) — the scheme would
        # degrade to its commutative variant with no signal
        if getattr(bm, "levy_area_approximation", "none") not in (
            "davie", "foster", "fourier"
        ):
            raise ValueError(
                f"{solver_name} needs full Lévy areas: construct the "
                "Brownian motion with levy_area_approximation='davie', "
                "'foster' or 'fourier'"
            )
        if len(getattr(bm, "shape", ())) < 2:
            raise ValueError(
                f"{solver_name} needs bm size [..., M] with at least a "
                "batch axis: a 1-D bm is treated as independent scalar "
                "Brownian motions whose Lévy area is zero (add a leading "
                "batch axis of 1 to y0)"
            )

    term = spec.build(drift, diffusion, bm)

    def step(t_lo, t_hi, y):
        dt = t_hi - t_lo
        return term.fuse(term.move(t_lo, dt, y), dt, y)

    v0 = jnp.asarray(event_fn(t0, y0))
    fired0 = v0 == 0

    # --- phase 1: march until the sign changes (bracket = one step) ---
    def cond(c):
        t_lo, y_lo, t_hi, y_hi, fired, n = c
        return (~fired) & (t_hi < t_end) & (n < max_num_steps)

    def body(c):
        _, _, t_lo, y_lo, fired, n = c
        t_hi = jnp.minimum(t_lo + h, t_end)
        y_hi = step(t_lo, t_hi, y_lo)
        v_hi = jnp.asarray(event_fn(t_hi, y_hi))
        fired = v_hi * v0 <= 0
        return (t_lo, y_lo, t_hi, y_hi, fired, n + 1)

    t_lo, y_lo, t_hi, y_hi, fired, n_steps = jax.lax.while_loop(
        cond, body, (t0, y0, t0, y0, fired0, jnp.zeros((), jnp.int32))
    )
    fired = fired | fired0

    # --- phase 2: bisect the bracket with REAL path-refining steps ---
    def refine(_, c):
        t_lo, y_lo, t_hi = c
        t_mid = 0.5 * (t_lo + t_hi)
        y_mid = step(t_lo, t_mid, y_lo)
        v_mid = jnp.asarray(event_fn(t_mid, y_mid))
        same_side = v_mid * v0 > 0
        t_lo_n = jnp.where(same_side, t_mid, t_lo)
        y_lo_n = jax.tree.map(
            lambda a, b: jnp.where(same_side, a, b), y_mid, y_lo
        )
        t_hi_n = jnp.where(same_side, t_hi, t_mid)
        return (t_lo_n, y_lo_n, t_hi_n)

    def do_refine(args):
        t_lo, y_lo, t_hi = jax.lax.fori_loop(
            0, refine_iters, refine, args
        )
        t_ev = 0.5 * (t_lo + t_hi)
        y_ev = step(t_lo, t_ev, y_lo)
        return t_ev, y_ev

    def no_refine(args):
        # no event: report the horizon state; event at t0: the bracket is
        # degenerate and refinement is a no-op on (t0, y0, t0)
        t_lo, y_lo, t_hi = args
        return t_hi, y_hi

    t_event, y_event = jax.lax.cond(
        fired & ~fired0, do_refine, no_refine, (t_lo, y_lo, t_hi)
    )
    t_event = jnp.where(fired0, t0, t_event)
    y_event = jax.tree.map(
        lambda a, b: jnp.where(fired0, a, b), y0, y_event
    )

    status = jnp.where(
        (~fired) & (n_steps >= max_num_steps),
        jnp.int32(MAX_STEPS_EXCEEDED), jnp.int32(0),
    )
    return EventResult(
        t_event=t_event, y_event=y_event, event_fired=fired, status=status
    )
