"""sdeint: Itô SDEs dy = f dt + g dW with Euler–Maruyama semantics.

Signature parity with the reference (``paddlexde/functional/sdeint.py:9-37`` in
DrownFish19/PaddleXDE), with the defects fixed (SURVEY §2.11-2/-10):

- the update is true Euler–Maruyama ``y1 = y0 + f·dt + g·ΔW`` (the reference's
  fuse double-counted, ``xde/base_sde.py:60-61``);
- ``reverse=True`` actually works: the solve runs in substituted time with
  negated drift and a :class:`ReverseBrownian` over the SAME underlying path,
  so a reverse solve retraces the forward noise exactly (the reference built
  ``ReverseBrownian`` but never wired it in, ``xde/base_sde.py:38-39``);
- noise is a stateless virtual Brownian tree — bit-reproducible per key,
  generated inside jit (the reference's tree is host-side pointer chasing with
  broken seeding, SURVEY §2.11-9).

Diffusion shape contract (matching ``BaseSDE.move``'s elementwise product,
``xde/base_sde.py:55-58``): diagonal noise — ``g(t, y)`` has ``y``'s shape and
multiplies the increment elementwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sdeint",
    "make_sde_term",
    "make_milstein_term",
    "make_sra1_term",
    "make_sriw1_term",
    "make_taylor15_term",
    "make_general_taylor15_term",
    "make_reversible_heun_term",
    "make_weak2_term",
    "make_weak2_general_term",
    "make_heun_stratonovich_term",
    "make_implicit_em_term",
    "make_implicit_milstein_term",
    "make_implicit_sra1_term",
    "make_implicit_sra1_general_term",
    "make_implicit_sra1_damped_term",
    "make_implicit_sra1_damped_general_term",
    "make_implicit_foster2_term",
    "make_implicit_foster2_general_term",
    "make_general_euler_term",
    "make_general_milstein_term",
    "make_general_sra1_term",
    "make_foster2_term",
    "make_foster2_general_term",
]

# ---------------------------------------------------------------------------
# Round-4 registry split: every scheme factory now lives in
# ``sde_schemes/{common,explicit,implicit,taylor,weak,reversible}.py`` and is
# described by ONE table (``sde_schemes/registry.py``) that sdeint /
# sdeint_adjoint / sdeint_event / sdeint_weak_mc and the adaptive controller
# all consume. The names below are RE-EXPORTED so every pre-split import
# path (tests, sdeint_adjoint's _TERM_BUILDERS, examples) keeps working.
# ---------------------------------------------------------------------------

from ..brownian.api import BrownianInterval  # noqa: F401  (re-export + bm)
from .solve import _is_decreasing, format_solution, integrate_term
from .sde_schemes.common import (  # noqa: F401
    _general_fuse,
    _reversed_general_ito_fns,
    _reversed_ito_fns,
    _reversed_scalar_ito_fns,
    _reversed_stratonovich_fns,
    make_sde_term,
    noise_drift_correction,
)
from .sde_schemes.explicit import (  # noqa: F401
    make_foster2_general_term,
    make_foster2_term,
    make_general_euler_term,
    make_general_milstein_term,
    make_general_sra1_term,
    make_heun_stratonovich_term,
    make_milstein_term,
    make_sra1_term,
    make_sriw1_term,
)
from .sde_schemes.implicit import (  # noqa: F401
    make_implicit_em_term,
    make_implicit_foster2_general_term,
    make_implicit_foster2_term,
    make_implicit_milstein_term,
    make_implicit_sra1_damped_general_term,
    make_implicit_sra1_damped_term,
    make_implicit_sra1_general_term,
    make_implicit_sra1_term,
)
from .sde_schemes.registry import (  # noqa: F401
    SDE_SCHEMES,
    SDESchemeSpec,
    canonical_sde_scheme_names,
    resolve_sde_scheme,
)
from .sde_schemes.reversible import make_reversible_heun_term  # noqa: F401
from .sde_schemes.taylor import (  # noqa: F401
    _chen_levels,
    _levy_triple_integrals,
    _strat_sig23,
    make_general_taylor15_term,
    make_taylor15_term,
)
from .sde_schemes.weak import (  # noqa: F401
    make_weak2_general_term,
    make_weak2_term,
)


def _span_bounds(t_span):
    """(t_lo, t_hi) for a default BrownianInterval — CONCRETE floats whenever
    t_span's values are known, even under an ambient jit trace.

    ``float(jnp.min(t_span))`` fails inside jit even for a closed-over
    concrete span (every jnp op stages to a tracer), which used to hand the
    Brownian tree TRACED bounds; those leak through sdeint_adjoint's
    custom_vjp closure and crash grad-of-jit with "No constant handler for
    DynamicJaxprTracer". numpy reads the concrete values without staging;
    genuinely traced spans still fall back to traced bounds (fine for plain
    solves — the tree normalizes with them in-trace)."""
    try:
        arr = np.asarray(t_span)
        return float(arr.min()), float(arr.max())
    except (TypeError, jax.errors.TracerArrayConversionError):
        return jnp.min(t_span), jnp.max(t_span)



# options vocabulary of the adaptive engine (solver/sde_adaptive.py)
_SDE_ADAPTIVE_KEYS = {
    "first_step", "safety", "ifactor", "dfactor", "min_step", "max_step",
    "max_num_steps", "norm", "error_order", "return_stats", "time_dtype",
}


def _solve_adaptive_sde(term, y0, span, solver_name, rtol, atol, options):
    from ..solver.sde_adaptive import solve_sde_adaptive

    opts = dict(options or {})
    unknown = set(opts) - _SDE_ADAPTIVE_KEYS
    if unknown:
        raise ValueError(
            f"sdeint(adaptive=True) got unknown option(s) {sorted(unknown)}; "
            f"known: {sorted(_SDE_ADAPTIVE_KEYS)}"
        )
    # default controller exponent = the scheme's LOCAL strong order
    # (global + 1/2), from the registry; euler/unknown fall through to 1.0
    spec = resolve_sde_scheme(solver_name)
    opts.setdefault("error_order", spec.local_order if spec else 1.0)
    return solve_sde_adaptive(term, y0, span, rtol=rtol, atol=atol, **opts)


def _default_bm_for_scheme(
    solver_name, leaf, t_lo, t_hi, key, levy_area_approximation, noise_dim
):
    """Single source of truth for the default BrownianInterval ``sdeint``
    builds when ``bm`` is omitted: the scheme-appropriate Levy mode and size
    come from the registry (``spec.levy``: "space-time" schemes get (W, I10),
    "space-time-time" the (W, I10, K) triple, "area" full Davie areas;
    ``spec.noise``: matrix-noise schemes get ``leaf.shape[:-1] + (M,)``,
    taylor15's scalar channel ``+ (1,)``, the diagonal contract
    ``leaf.shape``). Shared with :func:`sdeint_weak_mc` (antithetic
    construction needs the bm object up front to wrap)."""
    spec = resolve_sde_scheme(solver_name)
    levy_req = spec.levy if spec is not None else "none"
    noise = spec.noise if spec is not None else "diagonal"
    if levy_req == "space-time" and levy_area_approximation == "none":
        levy_area_approximation = "space-time"
    elif levy_req == "space-time-time":
        levy_area_approximation = "space-time-time"
    elif levy_req == "area" and levy_area_approximation in (
        "none", "space-time"
    ):
        levy_area_approximation = "davie"
    if noise == "general":
        if noise_dim is None:
            raise ValueError(
                "general-noise solvers need the Brownian dimension: pass "
                "noise_dim=M (bm size becomes y.shape[:-1] + (M,)) or an "
                "explicit bm"
            )
        size = leaf.shape[:-1] + (noise_dim,)
    elif noise == "scalar":
        # scalar noise: ONE Brownian channel broadcast over the state's
        # last axis
        size = leaf.shape[:-1] + (1,)
    else:
        size = leaf.shape
    return BrownianInterval(
        t_lo,
        t_hi,
        size=size,
        dtype=leaf.dtype,
        key=key,
        levy_area_approximation=levy_area_approximation,
    )


def sdeint(
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
):
    """Integrate an Itô SDE with a fixed-step solver.

    Args:
        drift: ``f(t, y) -> dy`` (pytree like y).
        diffusion: ``g(t, y) -> dy`` (pytree like y; diagonal noise) — or, for
            the general-noise solvers (``euler_general`` /
            ``milstein_general`` / ``milstein_commutative``), a matrix
            diffusion ``G(t, y) -> [..., D, M]`` against an M-dimensional
            Brownian motion (``dy = f dt + G dW``).
        y0: initial state.
        t_span: output times (also the integration grid, reference semantics).
        solver: 'euler' (Euler–Maruyama) or a dedicated SDE scheme: milstein
            (diagonal, strong 1.0), sra1 (additive, 1.5), sriw1 (diagonal,
            1.5), taylor15 (SCALAR noise — one Brownian channel, arbitrary
            non-diagonal multiplicative g — strong 1.5 via the autodiff
            Itô–Taylor expansion), foster2 (additive, ~2.0 — cubic
            polynomial path on the tree's (W, I10, K) triple), the
            DRIFT-IMPLICIT stiff ladder implicit_em (theta method, strong
            0.5/1.0-additive) / implicit_milstein (1.0) / implicit_sra1
            (additive 1.5, L-stable SDIRK2 core) / implicit_foster2
            (additive ~2.0, L-stable SDIRK4 on the cubic path ODE), weak2
            (Platen's derivative-free WEAK order-2.0 scheme — O(h²) in
            distribution for expectations/moments; pathwise accuracy is
            not the goal), heun_stratonovich (Stratonovich),
            euler_general / milstein_general / milstein_commutative /
            sra1_general / foster2_general / weak2_general /
            taylor15_general / taylor15_commutative (matrix noise;
            taylor15_general is strong ~1.5 for MULTIPLICATIVE matrix G —
            exact-triple for commutative noise, area-approximation-bounded
            otherwise; taylor15_commutative drops the areas, exact when
            the noise vector fields commute).
        reverse: integrate from ``t_span[-1]`` backwards, retracing the same
            Brownian path.
        adaptive: error-controlled step sizes between the output times via
            tree-consistent step doubling (``solver/sde_adaptive.py``): every
            attempt compares one full step against two half steps ON THE SAME
            Brownian path (the virtual tree's interval additivity makes the
            comparison exact — no RSwM machinery), so dt tracks the scheme's
            local error through stiffness/noise bursts. Works with every
            scheme above; 3 scheme evaluations per attempt. Set rtol/atol to
            SDE-appropriate values (~1e-2..1e-4; the 1e-7 default is the ODE
            path's). ``options`` then accepts first_step / safety / ifactor /
            dfactor / min_step / max_step / max_num_steps / norm /
            error_order (controller exponent, defaults to the scheme's local
            strong order) / return_stats. For gradients use
            ``sdeint_adjoint(adaptive=True)`` — the two-pass design records
            the discovered grid under stop_gradient and replays the
            discrete-exact adjoint over it (direct reverse-mode through the
            while_loop itself is the JAX limitation it routes around).
        bm: an explicit Brownian motion (``BrownianInterval``-like); built from
            ``key`` (or key 0) when omitted.
        key: PRNG key / int entropy for the default Brownian motion.
        noise_dim: M for the general-noise solvers when ``bm`` is omitted
            (the default bm then has size ``y.shape[:-1] + (M,)``).
    """
    t_span = jnp.asarray(t_span)
    y0 = jax.tree.map(jnp.asarray, y0)

    solver_name = solver.lower() if isinstance(solver, str) else ""
    spec = resolve_sde_scheme(solver_name)
    if spec is None:
        # not a dedicated SDE scheme: only plain (fixed, explicit) Euler from
        # the deterministic registry is a valid SDE driver. The reference
        # nominally routed SDE terms through its whole fixed zoo, but
        # multi-stage RK drivers sample each stage's Brownian increment on
        # the stage's own sub-interval and fuse it unscaled — midpoint's
        # noise variance comes out dt/2 instead of dt and rk4's ~dt/8 with
        # cross-step correlation. That is a wrong diffusion law, not a
        # higher-order SDE scheme, so we refuse instead of silently
        # under-dispersing (deliberate deviation from the reference's
        # anything-goes solver plumbing, SURVEY §2.11-2).
        from ..solver.registry import resolve_solver

        ode_spec = resolve_solver(solver)
        if (ode_spec.kind != "fixed" or ode_spec.implicit
                or ode_spec.name != "euler"):
            raise ValueError(
                f"sdeint got solver={ode_spec.name!r}: multi-stage "
                "deterministic RK steppers mis-weight the Brownian increment "
                "(understated noise variance). Use 'euler' (Euler-Maruyama) "
                "or a dedicated SDE scheme: "
                + " / ".join(canonical_sde_scheme_names())
                + " (+ aliases)."
            )
        spec = SDE_SCHEMES["euler"]  # the Euler marker class resolves here
        solver_name = "euler"
    is_rev_heun = spec.name == "reversible_heun"

    leaves = jax.tree.leaves(y0)
    if len(leaves) != 1 and not (
        is_rev_heun and isinstance(y0, tuple) and len(leaves) == 2
    ):
        raise ValueError(
            "sdeint's diagonal-noise contract requires a single-array state "
            f"(got a pytree with {len(leaves)} leaves); flatten the state or "
            "drive each member with its own Brownian motion"
            " (exception: reversible_heun accepts the (y, z) pair to resume "
            "or retrace)"
        )

    # scheme-construction knobs ride in options and are POPPED here (the
    # driver/adaptive option validators must not see them); the knob
    # vocabulary comes from the registry
    knob_kw = {}
    if spec.knobs:
        options = dict(options or {})
        for kname in spec.knobs:
            if kname in options:
                knob_kw[kname] = options.pop(kname)
        if "triple_substeps" in knob_kw:
            knob_kw["triple_substeps"] = int(knob_kw["triple_substeps"])
    if (spec.implicit and spec.name != "implicit_em"
            and "theta" in (options or {})):
        raise ValueError(
            "theta applies to implicit_em/stochastic_theta only "
            "(the other drift-implicit schemes are fully implicit forms)"
        )

    if bm is None:
        t_lo, t_hi = _span_bounds(t_span)
        bm = _default_bm_for_scheme(
            spec.name, leaves[0], t_lo, t_hi, key,
            levy_area_approximation, noise_dim,
        )
    elif (spec.levy == "space-time"
          and getattr(bm, "levy_area_approximation", "none") == "none"):
        raise ValueError(
            f"{solver} needs the space-time integral: construct the Brownian "
            "motion with levy_area_approximation='space-time'"
        )
    elif (spec.levy == "space-time-time"
          and getattr(bm, "levy_area_approximation", "none")
          != "space-time-time"):
        raise ValueError(
            f"{solver} needs the space-time-time integral K: construct the "
            "Brownian motion with levy_area_approximation='space-time-time'"
        )
    if spec.levy == "area":
        commutative_alt = (
            "milstein_commutative" if spec.name == "milstein_general"
            else "taylor15_commutative"
        )
        if getattr(bm, "levy_area_approximation", "none") not in (
            "davie", "foster", "fourier"
        ):
            raise ValueError(
                f"{solver} needs full Lévy areas: construct the "
                "Brownian motion with levy_area_approximation='davie', "
                f"'fourier' or 'foster' (or use {commutative_alt} if the "
                "noise commutes)"
            )
        if len(getattr(bm, "shape", ())) < 2:
            raise ValueError(
                f"{solver} needs bm size [..., M] with at least a "
                "batch axis: a 1-D bm is treated as independent scalar "
                "Brownian motions whose Lévy area is zero (add a leading "
                "batch axis of 1)"
            )

    if is_rev_heun:
        # paired-state scheme with an ALGEBRAIC inverse: both directions are
        # handled here (reverse is the exact inverse map, not an Itô/
        # Stratonovich-reversed system)
        pair_in = isinstance(y0, tuple)
        state0 = y0 if pair_in else (y0, y0)
        decreasing = reverse or _is_decreasing(t_span)
        term = make_reversible_heun_term(
            drift, diffusion, bm, inverse=decreasing
        )
        span = t_span
        flip = False
        if decreasing:
            span = -t_span if _is_decreasing(t_span) else -t_span[::-1]
            flip = not _is_decreasing(t_span)
        stats = None
        if adaptive:
            opts = dict(options or {})
            # error control on the y channel ONLY: the auxiliary z (the
            # carried predictor) differs between one full and two half
            # steps at the NOISE scale O(sqrt(h)) — including it starves the
            # controller (measured: 198 rejects / 2 accepts before this)
            if "norm" not in opts:
                from ..utils.norms import rms_norm

                opts["norm"] = lambda ratio: rms_norm(ratio[0])
            want_stats = bool(opts.get("return_stats"))
            out = _solve_adaptive_sde(
                term, state0, span, solver_name, rtol, atol, opts
            )
            # the state here is ITSELF a tuple (the (y, z) pair), so the
            # isinstance(out, tuple) unpack the scalar-state paths use
            # would shear the pair into (sol, stats) — review-era bug:
            # without return_stats this returned (y[0], z) garbage
            if want_stats:
                sol, stats = out
            else:
                sol = out
        else:
            sol = integrate_term(
                term, state0, span, "euler", rtol=rtol, atol=atol,
                options=options, time_axis=0,
            )
        if flip:  # reverse flag with increasing span: report in given order
            sol = jax.tree.map(lambda a: a[::-1], sol)
        if not pair_in:
            sol = sol[0]
        sol = format_solution(sol, time_axis)
        return (sol, stats) if stats is not None else sol

    decreasing = reverse or _is_decreasing(t_span)
    if decreasing:
        span = -t_span if _is_decreasing(t_span) else -t_span[::-1]
        # Time reversal, registry-driven. Why each class applies unchanged
        # to the reversed system (all pinned by measured-order tests):
        # - Itô diagonal (+g·∂g/∂y correction), scalar (DIRECTIONAL
        #   (∂g/∂y)·g) and general matrix (Σ_j (∂G_j/∂y)·G_j — vanishes for
        #   additive G) reversals each produce an ORDINARY Itô SDE, so the
        #   same scheme integrates it: Milstein/theta-implicit/weak2 ride
        #   the corrected drift; sra1/foster2 families stay additive;
        #   sriw1's I11/I111 are closed-form in ΔW̃ with Ĩ10 exact.
        # - Stratonovich calculus is time-symmetric: negate the drift only.
        # - ReverseBrownian supplies the exact reversed integrals
        #   (ΔW̃ = −ΔW, Ĩ10 = U − h·ΔW, K̃ = h·U − K − h²ΔW/2, Ã = −A).
        if spec.calculus == "stratonovich":
            rev_fns = _reversed_stratonovich_fns
        elif spec.noise == "scalar":
            rev_fns = _reversed_scalar_ito_fns
        elif spec.noise == "general":
            rev_fns = _reversed_general_ito_fns
        else:
            rev_fns = _reversed_ito_fns
        term = spec.build(*rev_fns(drift, diffusion, bm), **knob_kw)
        stats = None
        if adaptive:
            out = _solve_adaptive_sde(
                term, y0, span, solver_name, rtol, atol, options
            )
            sol, stats = out if isinstance(out, tuple) else (out, None)
        else:
            sol = integrate_term(
                term, y0, span, "euler", rtol=rtol, atol=atol,
                options=options, time_axis=0,
            )
        if not _is_decreasing(t_span):  # reverse flag with increasing span:
            sol = jax.tree.map(lambda a: a[::-1], sol)  # report in given order
        sol = format_solution(sol, time_axis)
        return (sol, stats) if stats is not None else sol

    term = spec.build(drift, diffusion, bm, **knob_kw)
    if adaptive:
        out = _solve_adaptive_sde(
            term, y0, t_span, solver_name, rtol, atol, options
        )
        if isinstance(out, tuple):
            sol, stats = out
            return format_solution(sol, time_axis), stats
        return format_solution(out, time_axis)
    return integrate_term(
        term, y0, t_span, "euler", rtol=rtol, atol=atol, options=options,
        time_axis=time_axis,
    )
