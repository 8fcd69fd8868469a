"""sdeint_adjoint: O(1)-memory SDE gradients, discrete-exact.

The reference's version is broken — its ``augmented_diffusion`` is a copy-paste
of the drift VJP that never differentiates the diffusion
(``paddlexde/functional/sdeint_adjoint.py:136-171`` in DrownFish19/PaddleXDE,
SURVEY §2.11-4). This implementation EXCEEDS parity and sidesteps the delicate
continuous-time Itô adjoint entirely:

because the virtual Brownian tree is stateless and bit-reproducible, every
forward Euler–Maruyama step can be RE-PLAYED exactly during the backward pass.
The custom_vjp backward scans the saved output states in reverse and takes the
``jax.vjp`` of each one-step map ``y_{i-1} -> y_i`` (re-running its sub-steps
forward from the saved left endpoint — gradient checkpointing at output
granularity). The result equals direct backprop through the scan EXACTLY (same
discrete path, same noise), at O(T_out) instead of O(T_out * steps) stored
activations and without storing solver internals.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..brownian.api import BrownianInterval
from ..solver.fixed import FIXED_STEP_FNS
from ..solver.registry import resolve_solver
from ..solver.sde_adaptive import solve_sde_adaptive
from .sdeint import (
    _SDE_ADAPTIVE_KEYS,
    _reversed_general_ito_fns,
    _reversed_ito_fns,
    _reversed_scalar_ito_fns,
    _reversed_stratonovich_fns,
    _span_bounds,
)
from .sde_schemes.registry import SDE_SCHEMES, resolve_sde_scheme
from .solve import _is_decreasing, format_solution

__all__ = ["sdeint_adjoint"]


def _substeps_from_step_size(t_span, h_max):
    """Uniform sub-steps per output interval for options={'step_size': h}
    (shared by the replay and reversible adjoints): ceil(max interval / h),
    static — so it needs a concrete t_span."""
    h_max = float(h_max)
    if h_max <= 0:
        raise ValueError("step_size must be positive")
    try:
        import numpy as _np

        dts = _np.abs(_np.diff(_np.asarray(t_span, dtype=_np.float64)))
        return max(1, int(_np.ceil(float(dts.max()) / h_max)))
    except (TypeError, jax.errors.TracerArrayConversionError) as exc:
        raise ValueError(
            "options={'step_size': ...} needs a concrete t_span (the "
            "sub-step count must be static under jit)"
        ) from exc


def sdeint_adjoint(
    drift,
    diffusion,
    y0,
    t_span,
    solver="euler",
    *,
    rtol=1e-7,
    atol=1e-9,
    reverse: bool = False,
    adaptive: bool = False,
    options: Optional[dict] = None,
    bm=None,
    key=None,
    levy_area_approximation: str = "none",
    time_axis: int = -2,
    noise_dim: Optional[int] = None,
    adjoint_params=None,
):
    """Like :func:`sdeint` but with O(T_out)-memory, discrete-exact gradients.

    Accepts 'euler' or any dedicated SDE scheme (milstein / sra1 / sriw1 /
    taylor15 / foster2 / weak2 / heun_stratonovich / euler_general /
    milstein_general / milstein_commutative / weak2_general /
    taylor15_general / taylor15_commutative — the general-noise schemes take
    a matrix diffusion ``G(t, y) -> [..., D, M]`` and ``noise_dim=M``, as in
    :func:`sdeint`). ``reversible_heun`` routes to a BETTER backward than
    the replay: the O(1)-memory reversible adjoint (see
    :func:`_reversible_heun_adjoint`).

    ``options={"step_size": h}`` runs a finer internal grid: each output
    interval ``[t_i, t_{i+1}]`` is cut into ``ceil(max_interval / h)`` equal
    sub-steps, but only the states at ``t_span`` are stored; the backward
    re-plays each segment's sub-steps from the saved left endpoint (gradient
    checkpointing at output granularity — the buffered-adjoint answer to
    dense-grid SDE training, which previously required grid == t_span).
    The sub-step count is uniform across intervals so the scan stays static;
    ``h`` is an upper bound on the realized step.

    Reverse-time solves (``reverse=True`` or a decreasing ``t_span``) run the
    reversed system forward in s = -t with the Itô reversal correction,
    exactly like :func:`sdeint`. ``adjoint_params`` is accepted for signature
    parity and ignored (closure_convert discovers parameters automatically).

    ``adaptive=True`` makes the error-controlled path DIFFERENTIABLE — the
    capability :func:`sdeint`'s ``adaptive`` flag documents as unsupported
    (reverse-mode through ``lax.while_loop`` is a JAX limitation). Two-pass
    design: (1) the adaptive engine (``solver/sde_adaptive.py``) discovers the
    accepted step grid under ``stop_gradient`` (recording each accepted
    attempt's midpoint AND endpoint, so the recorded grid reproduces the
    two-half-step composition the engine keeps); (2) the replay adjoint runs
    over that recorded grid — the forward value is BIT-EQUAL to
    ``sdeint(..., adaptive=True)`` with the same options, and gradients are
    the exact discrete gradients of the solution ON that grid (the grid
    itself is treated as non-differentiable, the standard
    discretize-then-optimize choice — controller decisions are piecewise
    constant in the parameters, so their local derivative is zero anyway).
    ``options`` then takes the adaptive vocabulary (first_step / safety /
    ifactor / dfactor / min_step / max_step / max_num_steps / norm /
    error_order) plus ``grid_buffer`` (default 64): the per-output-interval
    recording capacity, 2 entries per accepted step. Size it generously —
    an overflowing interval coarsens its tail to one forced step (flagged
    GRID_OVERFLOW by the engine; here the replayed — coarser — solution is
    still the value differentiated, so value and gradient stay consistent —
    pass ``options={"return_stats": True}`` to get the engine's stats, whose
    ``status`` carries the GRID_OVERFLOW/NON_FINITE/MAX_STEPS flags).
    Memory is O(T_out * grid_buffer) times, O(T_out) states.
    """
    del adjoint_params
    solver_name = solver.lower() if isinstance(solver, str) else ""
    sde_spec = resolve_sde_scheme(solver_name)
    if sde_spec is not None and sde_spec.name == "reversible_heun":
        # the scheme's algebraic reversibility admits a BETTER adjoint than
        # the replay: O(1)-memory state reconstruction (see
        # _reversible_heun_adjoint)
        return _reversible_heun_adjoint(
            drift, diffusion, y0, t_span, reverse=reverse,
            adaptive=adaptive, options=options, bm=bm, key=key,
            time_axis=time_axis, rtol=rtol, atol=atol,
        )
    if sde_spec is None:
        spec = resolve_solver(solver)
        if spec.kind != "fixed" or spec.implicit or spec.name != "euler":
            # same refusal as sdeint: multi-stage deterministic RK mis-weights
            # the Brownian increment (understated noise variance)
            raise ValueError(
                f"sdeint_adjoint got solver={getattr(spec, 'name', solver)!r}: "
                "use 'euler' (Euler-Maruyama) or a scheme from the SDE "
                "registry (functional/sde_schemes/registry.py)"
            )
        sde_spec = SDE_SCHEMES["euler"]
    scheme = sde_spec.name
    step_fn, _ = FIXED_STEP_FNS["euler"]  # scheme lives in the term's move/fuse
    builder_override = None
    if sde_spec.knobs:
        # scheme-construction knobs ride in options (registry vocabulary);
        # pop them BEFORE any option validation/forwarding and bake them
        # into the builder
        import functools as _ft

        _opts = dict(options or {})
        _ikw = {k: _opts.pop(k) for k in sde_spec.knobs if k in _opts}
        if "triple_substeps" in _ikw:
            _ikw["triple_substeps"] = int(_ikw["triple_substeps"])
        options = _opts or None
        if _ikw:
            builder_override = _ft.partial(sde_spec.build, **_ikw)
    is_general = sde_spec.noise == "general"
    adaptive_opts = None
    grid_buffer = 0
    if adaptive:
        adaptive_opts = dict(options or {})
        if "step_size" in adaptive_opts:
            raise ValueError(
                "adaptive=True and options={'step_size': ...} are mutually "
                "exclusive (the adaptive engine chooses the internal grid)"
            )
        grid_buffer = int(adaptive_opts.pop("grid_buffer", 64))
        if grid_buffer < 2:
            raise ValueError(
                "grid_buffer must be >= 2 (2 recorded sub-times per "
                "accepted step)"
            )
        want_stats = bool(adaptive_opts.pop("return_stats", False))
        allowed = _SDE_ADAPTIVE_KEYS - {"return_stats", "time_dtype"}
        unknown = set(adaptive_opts) - allowed
        if unknown:
            raise ValueError(
                f"sdeint_adjoint(adaptive=True) got unknown option(s) "
                f"{sorted(unknown)}; known: {sorted(allowed)} + ['grid_buffer']"
            )
        adaptive_opts.setdefault("error_order", sde_spec.local_order)
        options = None  # the legacy (fixed-grid) option parsing below is moot
    if options and "grid_constructor" in options:
        raise NotImplementedError(
            "sdeint_adjoint supports options={'step_size': h} (uniform "
            "sub-steps per output interval), not a grid_constructor"
        )
    n_sub = 1
    if options and "step_size" in options:
        n_sub = _substeps_from_step_size(t_span, options["step_size"])

    t_span = jnp.asarray(t_span)
    y0 = jax.tree.map(jnp.asarray, y0)
    leaves = jax.tree.leaves(y0)
    if len(leaves) != 1:
        raise ValueError(
            "sdeint_adjoint's diagonal-noise contract requires a single-array "
            f"state (got a pytree with {len(leaves)} leaves)"
        )
    if (sde_spec.levy == "space-time" and levy_area_approximation == "none"
            and bm is None):
        levy_area_approximation = "space-time"
    if sde_spec.levy == "space-time-time" and bm is None:
        levy_area_approximation = "space-time-time"  # (W, I10, K) triple
    if sde_spec.levy == "area" and bm is None and (
        levy_area_approximation in ("none", "space-time")
    ):
        levy_area_approximation = "davie"  # needs full areas A_{j1,j2}
    if bm is None:
        # concrete bounds whenever possible: traced bounds would leak through
        # the custom_vjp closure and crash grad-of-jit (see _span_bounds)
        t_lo, t_hi = _span_bounds(t_span)
        if is_general:
            if noise_dim is None:
                raise ValueError(
                    "general-noise solvers need the Brownian dimension: pass "
                    "noise_dim=M (bm size becomes y.shape[:-1] + (M,)) or an "
                    "explicit bm"
                )
            size = leaves[0].shape[:-1] + (noise_dim,)
        elif sde_spec.noise == "scalar":
            size = leaves[0].shape[:-1] + (1,)  # one scalar noise channel
        else:
            size = leaves[0].shape
        bm = BrownianInterval(
            t_lo, t_hi, size=size, dtype=leaves[0].dtype, key=key,
            levy_area_approximation=levy_area_approximation,
        )
    if sde_spec.levy == "area":
        commutative_alt = (
            "milstein_commutative" if scheme == "milstein_general"
            else "taylor15_commutative"
        )
        if getattr(bm, "levy_area_approximation", "none") not in ("davie", "foster", "fourier"):
            raise ValueError(
                f"{scheme} needs full Lévy areas: construct the "
                "Brownian motion with levy_area_approximation='davie', 'fourier' or "
                f"'foster' (or use {commutative_alt} if the noise commutes)"
            )
        if len(getattr(bm, "shape", ())) < 2:
            raise ValueError(
                f"{scheme} needs bm size [..., M] with at least a "
                "batch axis: a 1-D bm is treated as independent scalar "
                "Brownian motions whose Lévy area is zero (add a leading "
                "batch axis of 1)"
            )

    # Reverse-time solves: substitute s = -t so the reversed system (Itô
    # reversal drift correction +g·∂g/∂y, or the time-symmetric Stratonovich
    # form; exact reversed (ΔW̃, Ĩ10) from ReverseBrownian) is an ordinary
    # forward SDE — the replay adjoint below then applies unchanged. Gradients
    # are pinned by test against direct backprop through sdeint(reverse=True).
    flip_output = False
    if reverse or _is_decreasing(t_span):
        if sde_spec.calculus == "stratonovich":
            drift, diffusion, bm = _reversed_stratonovich_fns(drift, diffusion, bm)
        elif is_general:
            # matrix reversal correction Σ_j (∂G_{·j}/∂y)·G_{·j} (see
            # _reversed_general_ito_fns); the replay adjoint then applies to
            # the reversed system unchanged
            drift, diffusion, bm = _reversed_general_ito_fns(drift, diffusion, bm)
        elif sde_spec.noise == "scalar":
            # scalar noise: directional (∂g/∂y)·g correction, not the
            # elementwise diagonal form
            drift, diffusion, bm = _reversed_scalar_ito_fns(drift, diffusion, bm)
        else:
            drift, diffusion, bm = _reversed_ito_fns(drift, diffusion, bm)
        if _is_decreasing(t_span):
            t_span = -t_span
        else:  # reverse flag with an increasing span: report in given order
            t_span = -t_span[::-1]
            flip_output = True

    # expose closed-over parameters of drift/diffusion as explicit residuals
    t0 = t_span[0]
    drift_c, drift_consts = jax.closure_convert(lambda t, y: drift(t, y), t0, y0)
    diff_c, diff_consts = jax.closure_convert(lambda t, y: diffusion(t, y), t0, y0)
    drift_consts, diff_consts = tuple(drift_consts), tuple(diff_consts)

    term_builder = builder_override or sde_spec.build

    def one_step(y, t_a, t_b, d_consts, g_consts):
        term = term_builder(
            lambda t, y_: drift_c(t, y_, *d_consts),
            lambda t, y_: diff_c(t, y_, *g_consts),
            bm,
        )
        y1, _ = step_fn(term, t_a, t_b, y)
        return y1

    def one_segment(y, t_a, t_b, d_consts, g_consts):
        """Advance t_a -> t_b in ``n_sub`` equal sub-steps (1 = plain step).

        Only the segment endpoints are stored by the outer solve; the backward
        re-enters here under jax.vjp, re-running the sub-steps forward from
        the saved left endpoint (the stateless Brownian tree replays the same
        noise bit-exactly)."""
        if n_sub == 1:
            return one_step(y, t_a, t_b, d_consts, g_consts)
        fracs = jnp.linspace(0.0, 1.0, n_sub + 1).astype(t_span.dtype)
        sub_ts = t_a + (t_b - t_a) * fracs

        def body(yc, i):
            return one_step(yc, sub_ts[i], sub_ts[i + 1], d_consts, g_consts), None

        y_out, _ = jax.lax.scan(body, y, jnp.arange(n_sub))
        return y_out

    @jax.custom_vjp
    def _solve(y0_, ts_, d_consts, g_consts):
        def body(y, t_pair):
            y1 = one_segment(y, t_pair[0], t_pair[1], d_consts, g_consts)
            return y1, y1

        t_pairs = jnp.stack([ts_[:-1], ts_[1:]], axis=-1)
        _, ys = jax.lax.scan(body, y0_, t_pairs)
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), y0_, ys
        )

    def _fwd(y0_, ts_, d_consts, g_consts):
        sol = _solve(y0_, ts_, d_consts, g_consts)
        return sol, (sol, ts_, d_consts, g_consts)

    def _bwd(res, g_sol):
        sol, ts_, d_consts, g_consts = res
        n = ts_.shape[0]

        take = lambda tree, i: jax.tree.map(lambda a: a[i], tree)

        def body(carry, i):
            adj_y, adj_d, adj_g = carry
            adj_y = jax.tree.map(jnp.add, adj_y, take(g_sol, i))
            y_prev = take(sol, i - 1)
            _, vjp = jax.vjp(
                lambda y, dc, gc: one_segment(y, ts_[i - 1], ts_[i], dc, gc),
                y_prev,
                d_consts,
                g_consts,
            )
            g_y, g_d, g_g = vjp(adj_y)
            adj_d = jax.tree.map(jnp.add, adj_d, g_d)
            adj_g = jax.tree.map(jnp.add, adj_g, g_g)
            return (g_y, adj_d, adj_g), None

        init = (
            jax.tree.map(jnp.zeros_like, y0),
            jax.tree.map(jnp.zeros_like, d_consts),
            jax.tree.map(jnp.zeros_like, g_consts),
        )
        (adj_y, adj_d, adj_g), _ = jax.lax.scan(
            body, init, jnp.arange(n - 1, 0, -1)
        )
        adj_y = jax.tree.map(jnp.add, adj_y, take(g_sol, 0))
        return (adj_y, jnp.zeros_like(ts_), adj_d, adj_g)

    _solve.defvjp(_fwd, _bwd)

    def one_grid_segment(y, t_a, t_b, row, d_consts, g_consts):
        """Replay the recorded sub-times of one output interval.

        ``row`` holds the engine's accepted sub-times in order, padded with
        ``t_b``; padding (and any clobbered non-monotone entries after a
        GRID_OVERFLOW) replays as a skipped zero-length step, and a final
        forced step to ``t_b`` covers an overflowed tail — so the replayed
        value is always a valid discrete solution on SOME refinement of the
        recorded grid, and bit-equal to the adaptive engine's whenever the
        buffer did not overflow."""
        sub = jnp.concatenate([row, t_b[None]])

        def body(carry, t_next):
            yc, tc = carry
            t_next = jnp.maximum(t_next, tc)
            yn = jax.lax.cond(
                t_next > tc,
                lambda a: one_step(a[0], a[1], t_next, d_consts, g_consts),
                lambda a: a[0],
                (yc, tc),
            )
            return (yn, t_next), None

        (y_out, _), _ = jax.lax.scan(body, (y, t_a), sub)
        return y_out

    @jax.custom_vjp
    def _solve_adaptive(y0_, ts_, rows_, d_consts, g_consts):
        def body(y, x):
            t_pair, row = x
            y1 = one_grid_segment(
                y, t_pair[0], t_pair[1], row, d_consts, g_consts
            )
            return y1, y1

        t_pairs = jnp.stack([ts_[:-1], ts_[1:]], axis=-1)
        _, ys = jax.lax.scan(body, y0_, (t_pairs, rows_))
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), y0_, ys
        )

    def _fwd_adaptive(y0_, ts_, rows_, d_consts, g_consts):
        sol = _solve_adaptive(y0_, ts_, rows_, d_consts, g_consts)
        return sol, (sol, ts_, rows_, d_consts, g_consts)

    def _bwd_adaptive(res, g_sol):
        sol, ts_, rows_, d_consts, g_consts = res
        n = ts_.shape[0]
        take = lambda tree, i: jax.tree.map(lambda a: a[i], tree)

        def body(carry, i):
            adj_y, adj_d, adj_g = carry
            adj_y = jax.tree.map(jnp.add, adj_y, take(g_sol, i))
            y_prev = take(sol, i - 1)
            _, vjp = jax.vjp(
                lambda y, dc, gc: one_grid_segment(
                    y, ts_[i - 1], ts_[i], rows_[i - 1], dc, gc
                ),
                y_prev,
                d_consts,
                g_consts,
            )
            g_y, g_d, g_g = vjp(adj_y)
            adj_d = jax.tree.map(jnp.add, adj_d, g_d)
            adj_g = jax.tree.map(jnp.add, adj_g, g_g)
            return (g_y, adj_d, adj_g), None

        init = (
            jax.tree.map(jnp.zeros_like, y0),
            jax.tree.map(jnp.zeros_like, d_consts),
            jax.tree.map(jnp.zeros_like, g_consts),
        )
        (adj_y, adj_d, adj_g), _ = jax.lax.scan(
            body, init, jnp.arange(n - 1, 0, -1)
        )
        adj_y = jax.tree.map(jnp.add, adj_y, take(g_sol, 0))
        return (adj_y, jnp.zeros_like(ts_), jnp.zeros_like(rows_), adj_d, adj_g)

    _solve_adaptive.defvjp(_fwd_adaptive, _bwd_adaptive)

    if adaptive:
        # phase 1: grid discovery under stop_gradient — the while_loop never
        # sees differentiated values, so the surrounding vjp treats it as a
        # primal-only residual (reverse-mode through while_loop is the JAX
        # limitation this two-pass design routes around)
        sg = jax.lax.stop_gradient
        term_sg = term_builder(
            lambda t, y_: drift_c(t, y_, *sg(drift_consts)),
            lambda t, y_: diff_c(t, y_, *sg(diff_consts)),
            bm,
        )
        out = solve_sde_adaptive(
            term_sg, sg(y0), sg(t_span), rtol=rtol, atol=atol,
            grid_buffer=grid_buffer, return_stats=want_stats,
            **adaptive_opts,
        )
        # return shape: (sol, [stats], rows) — stats carry the engine's
        # GRID_OVERFLOW/NON_FINITE/MAX_STEPS flags, which would otherwise be
        # silently swallowed by the replay (options={"return_stats": True}
        # to surface them; they are primal-only discovery-pass data)
        if want_stats:
            _, stats, rows = out
        else:
            _, rows = out
        solution = _solve_adaptive(
            y0, t_span, rows, drift_consts, diff_consts
        )
        if flip_output:
            solution = jax.tree.map(lambda a: a[::-1], solution)
        solution = format_solution(solution, time_axis)
        return (solution, stats) if want_stats else solution

    solution = _solve(y0, t_span, drift_consts, diff_consts)
    if flip_output:
        solution = jax.tree.map(lambda a: a[::-1], solution)
    return format_solution(solution, time_axis)


def _reversible_heun_adjoint(
    drift, diffusion, y0, t_span, *, reverse, adaptive, options, bm, key,
    time_axis, rtol=1e-7, atol=1e-9,
):
    """O(1)-memory exact adjoint for the algebraically reversible Heun scheme
    (Kidger, Foster, Li, Lyons 2021 — "Efficient and accurate gradients for
    neural SDEs").

    The replay adjoint (above) checkpoints at output granularity: the
    backward re-runs each segment's sub-steps FORWARD from the saved left
    endpoint, so a segment's vjp holds O(sub-steps) residuals. The
    reversible scheme needs neither checkpoints nor replay: its step map is
    an EXACT algebraic bijection (``move_inv`` in
    :func:`~.sdeint.make_reversible_heun_term`), so the backward pass walks
    the chain in reverse — reconstruct the previous (y, z) pair with one
    inverse step, take the vjp of that SINGLE forward step, accumulate —
    O(1) stored state regardless of how fine ``options={'step_size': h}``
    makes the internal grid. Cost ~3x the forward (1 inverse + 1 replayed
    forward-linearization per step); gradient error is set by the f64
    reconstruction drift (~1e-15/step, pinned: matches direct backprop to
    1e-8 over hundreds of steps — in f32 prefer short chains or the direct
    scan).

    ``adaptive=True`` composes the two designs: phase 1 discovers the
    accepted grid under ``stop_gradient`` with the y-channel-only norm
    (exactly :func:`~.sdeint.sdeint`'s adaptive reversible_heun — the
    forward value is bit-equal), phase 2 walks the RECORDED grid backward
    by exact inversion — no replay-from-left, the residual stays the final
    pair (the pair state never fit the replay adjoint; it fits this one).
    ``options`` then takes the adaptive vocabulary + ``grid_buffer``/
    ``return_stats`` as the replay path.

    Contract: INCREASING spans only (a reverse solve is itself the exact
    inverse map — differentiate :func:`~.sdeint.sdeint` directly). Accepts
    plain ``y0`` (lifts z = y, returns the y channel) or the ``(y, z)``
    pair.
    """
    from .sdeint import make_reversible_heun_term

    t_span = jnp.asarray(t_span)
    if reverse or _is_decreasing(t_span):
        raise ValueError(
            "the reversible adjoint runs increasing spans; a reverse "
            "reversible_heun solve IS the exact inverse map — differentiate "
            "sdeint directly (one lax.scan)"
        )
    pair_in = isinstance(y0, tuple) and len(jax.tree.leaves(y0)) == 2
    y0 = jax.tree.map(jnp.asarray, y0)
    state0 = y0 if pair_in else (y0, y0)
    y_like = state0[0]

    n_sub = 1
    opts = dict(options or {})
    adaptive_opts = None
    grid_buffer = 0
    want_stats = False
    if adaptive:
        if "step_size" in opts:
            raise ValueError(
                "adaptive=True and options={'step_size': ...} are mutually "
                "exclusive (the adaptive engine chooses the internal grid)"
            )
        grid_buffer = int(opts.pop("grid_buffer", 64))
        if grid_buffer < 2:
            raise ValueError(
                "grid_buffer must be >= 2 (2 recorded sub-times per "
                "accepted step)"
            )
        want_stats = bool(opts.pop("return_stats", False))
        allowed = _SDE_ADAPTIVE_KEYS - {"return_stats", "time_dtype"}
        unknown = set(opts) - allowed
        if unknown:
            raise ValueError(
                f"sdeint_adjoint(adaptive=True) got unknown option(s) "
                f"{sorted(unknown)}; known: {sorted(allowed)} + "
                "['grid_buffer']"
            )
        adaptive_opts = opts
        adaptive_opts.setdefault(
            "error_order", SDE_SCHEMES["reversible_heun"].local_order
        )
        if "norm" not in adaptive_opts:
            # y-channel-only error control, exactly sdeint's adaptive
            # reversible_heun (the z channel differs between full and half
            # steps at the noise scale — controlling it starves the
            # controller; measured there)
            from ..utils.norms import rms_norm

            adaptive_opts["norm"] = lambda ratio: rms_norm(ratio[0])
    else:
        if "step_size" in opts:
            n_sub = _substeps_from_step_size(t_span, opts.pop("step_size"))
        if opts:
            raise ValueError(
                f"reversible_heun adjoint got unknown option(s) "
                f"{sorted(opts)}; known: ['step_size'] "
                "(+ the adaptive vocabulary with adaptive=True)"
            )

    if bm is None:
        t_lo, t_hi = _span_bounds(t_span)
        leaf = jax.tree.leaves(y_like)[0]
        bm = BrownianInterval(t_lo, t_hi, size=leaf.shape, dtype=leaf.dtype,
                              key=key)

    t0 = t_span[0]
    drift_c, drift_consts = jax.closure_convert(
        lambda t, y: drift(t, y), t0, y_like
    )
    diff_c, diff_consts = jax.closure_convert(
        lambda t, y: diffusion(t, y), t0, y_like
    )
    drift_consts, diff_consts = tuple(drift_consts), tuple(diff_consts)

    def _terms(dc, gc):
        d = lambda t, y_: drift_c(t, y_, *dc)
        g = lambda t, y_: diff_c(t, y_, *gc)
        return (
            make_reversible_heun_term(d, g, bm, inverse=False),
            make_reversible_heun_term(d, g, bm, inverse=True),
        )

    def fwd_step(t_a, t_b, st, dc, gc):
        term_f, _ = _terms(dc, gc)
        return term_f.move(t_a, t_b - t_a, st)

    def inv_step(t_a, t_b, st, dc, gc):
        # move_inv expects the NEGATED axis: move(s, ds) inverts [-s-ds, -s]
        _, term_i = _terms(dc, gc)
        return term_i.move(-t_b, t_b - t_a, st)

    fracs = jnp.linspace(0.0, 1.0, n_sub + 1).astype(t_span.dtype)

    def seg_fwd(st, t_a, t_b, dc, gc):
        if n_sub == 1:
            return fwd_step(t_a, t_b, st, dc, gc)
        sub = t_a + (t_b - t_a) * fracs

        def body(s, i):
            return fwd_step(sub[i], sub[i + 1], s, dc, gc), None

        out, _ = jax.lax.scan(body, st, jnp.arange(n_sub))
        return out

    @jax.custom_vjp
    def _solve(state0_, ts_, dc, gc):
        def body(st, t_pair):
            st1 = seg_fwd(st, t_pair[0], t_pair[1], dc, gc)
            return st1, st1

        t_pairs = jnp.stack([ts_[:-1], ts_[1:]], axis=-1)
        _, sts = jax.lax.scan(body, state0_, t_pairs)
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), state0_, sts
        )

    def _fwd(state0_, ts_, dc, gc):
        sol = _solve(state0_, ts_, dc, gc)
        # residual: the FINAL pair only — the whole point
        st_final = jax.tree.map(lambda a: a[-1], sol)
        return sol, (st_final, ts_, dc, gc)

    def _bwd(res, g_sol):
        st_final, ts_, dc, gc = res
        n = ts_.shape[0]
        take = lambda tree, i: jax.tree.map(lambda a: a[i], tree)
        add = lambda a, b: jax.tree.map(jnp.add, a, b)

        def one_step_bwd(carry, t0s, t1s):
            st, adj, ad, ag = carry
            st_prev = inv_step(t0s, t1s, st, dc, gc)
            _, vjp = jax.vjp(
                lambda s, d_, g_: fwd_step(t0s, t1s, s, d_, g_),
                st_prev, dc, gc,
            )
            g_s, g_d, g_g = vjp(adj)
            return (st_prev, g_s, add(ad, g_d), add(ag, g_g))

        def outer(carry, i):
            st, adj, ad, ag = carry
            adj = add(adj, take(g_sol, i))
            t_a, t_b = ts_[i - 1], ts_[i]
            if n_sub == 1:
                carry = one_step_bwd((st, adj, ad, ag), t_a, t_b)
            else:
                sub = t_a + (t_b - t_a) * fracs

                def inner(c, j):
                    return one_step_bwd(c, sub[j], sub[j + 1]), None

                carry, _ = jax.lax.scan(
                    inner, (st, adj, ad, ag),
                    jnp.arange(n_sub - 1, -1, -1),
                )
            return carry, None

        init = (
            st_final,
            jax.tree.map(jnp.zeros_like, st_final),
            jax.tree.map(jnp.zeros_like, dc),
            jax.tree.map(jnp.zeros_like, gc),
        )
        (st0_rec, adj, ad, ag), _ = jax.lax.scan(
            outer, init, jnp.arange(n - 1, 0, -1)
        )
        del st0_rec  # the reconstructed initial pair (retrace check lives in tests)
        adj = add(adj, take(g_sol, 0))
        return (adj, jnp.zeros_like(ts_), ad, ag)

    _solve.defvjp(_fwd, _bwd)

    if adaptive:
        # --- recorded-grid reversible walk ------------------------------
        def seg_times(t_a, t_b, row):
            # effective monotone sub-time sequence of one output interval
            # (cummax absorbs padding and any post-overflow clobber, same
            # contract as the replay path's one_grid_segment)
            sub = jnp.concatenate([t_a[None], row, t_b[None]])
            return jax.lax.cummax(sub)

        def seg_fwd_rows(st, t_a, t_b, row, dc, gc):
            eff = seg_times(t_a, t_b, row)

            def body(s, j):
                t0s, t1s = eff[j], eff[j + 1]
                s1 = jax.lax.cond(
                    t1s > t0s,
                    lambda a: fwd_step(t0s, t1s, a, dc, gc),
                    lambda a: a,
                    s,
                )
                return s1, None

            out, _ = jax.lax.scan(body, st, jnp.arange(eff.shape[0] - 1))
            return out

        @jax.custom_vjp
        def _solve_rows(state0_, ts_, rows_, dc, gc):
            def body(st, x):
                t_pair, row = x
                st1 = seg_fwd_rows(st, t_pair[0], t_pair[1], row, dc, gc)
                return st1, st1

            t_pairs = jnp.stack([ts_[:-1], ts_[1:]], axis=-1)
            _, sts = jax.lax.scan(body, state0_, (t_pairs, rows_))
            return jax.tree.map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0),
                state0_, sts,
            )

        def _fwd_rows(state0_, ts_, rows_, dc, gc):
            sol = _solve_rows(state0_, ts_, rows_, dc, gc)
            st_final = jax.tree.map(lambda a: a[-1], sol)
            return sol, (st_final, ts_, rows_, dc, gc)

        def _bwd_rows(res, g_sol):
            st_final, ts_, rows_, dc, gc = res
            n = ts_.shape[0]
            take = lambda tree, i: jax.tree.map(lambda a: a[i], tree)
            add = lambda a, b: jax.tree.map(jnp.add, a, b)

            def one_step_bwd(carry, t0s, t1s):
                st, adj, ad, ag = carry
                st_prev = inv_step(t0s, t1s, st, dc, gc)
                _, vjp = jax.vjp(
                    lambda s, d_, g_: fwd_step(t0s, t1s, s, d_, g_),
                    st_prev, dc, gc,
                )
                g_s, g_d, g_g = vjp(adj)
                return (st_prev, g_s, add(ad, g_d), add(ag, g_g))

            def outer(carry, i):
                st, adj, ad, ag = carry
                adj = add(adj, take(g_sol, i))
                eff = seg_times(ts_[i - 1], ts_[i], rows_[i - 1])

                def inner(c, j):
                    t0s, t1s = eff[j], eff[j + 1]
                    c1 = jax.lax.cond(
                        t1s > t0s,
                        lambda a: one_step_bwd(a, t0s, t1s),
                        lambda a: a,
                        c,
                    )
                    return c1, None

                carry2, _ = jax.lax.scan(
                    inner, (st, adj, ad, ag),
                    jnp.arange(eff.shape[0] - 2, -1, -1),
                )
                return carry2, None

            init = (
                st_final,
                jax.tree.map(jnp.zeros_like, st_final),
                jax.tree.map(jnp.zeros_like, dc),
                jax.tree.map(jnp.zeros_like, gc),
            )
            (_, adj, ad, ag), _ = jax.lax.scan(
                outer, init, jnp.arange(n - 1, 0, -1)
            )
            adj = add(adj, take(g_sol, 0))
            return (adj, jnp.zeros_like(ts_), jnp.zeros_like(rows_), ad, ag)

        _solve_rows.defvjp(_fwd_rows, _bwd_rows)

        # phase 1: grid discovery under stop_gradient (primal-only data)
        sg = jax.lax.stop_gradient
        term_sg = make_reversible_heun_term(
            lambda t, y_: drift_c(t, y_, *sg(drift_consts)),
            lambda t, y_: diff_c(t, y_, *sg(diff_consts)),
            bm, inverse=False,
        )
        out = solve_sde_adaptive(
            term_sg, sg(state0), sg(t_span), rtol=rtol, atol=atol,
            grid_buffer=grid_buffer, return_stats=want_stats,
            **adaptive_opts,
        )
        if want_stats:
            _, stats, rows = out
        else:
            _, rows = out
        sol = _solve_rows(state0, t_span, rows, drift_consts, diff_consts)
        if not pair_in:
            sol = sol[0]
        sol = format_solution(sol, time_axis)
        return (sol, stats) if want_stats else sol

    sol = _solve(state0, t_span, drift_consts, diff_consts)
    if not pair_in:
        sol = sol[0]
    return format_solution(sol, time_axis)
