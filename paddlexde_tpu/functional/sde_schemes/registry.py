"""The SDE scheme registry: one table mapping scheme name -> (factory, noise
contract, calculus, strong/weak order, Brownian requirements, adaptive
controller order, option knobs, reversal class).

VERDICT r3 next-step 5: before round 4, ``sdeint`` carried a 20-branch
``is_*`` ladder and each consumer (``sdeint_adjoint``'s ``_TERM_BUILDERS``,
``sdeint_weak``'s ``_WEAK_ORDER``, ``sdeint_event``'s include list,
``_SDE_LOCAL_ORDER``) duplicated its own scheme list — a new scheme needed
five edits and any disagreement was silent. Now every surface consumes this
table; the per-scheme order table in PARITY.md is GENERATED from it
(``tools/gen_scheme_table.py``).

Field semantics (the load-bearing ones):

- ``noise``: the diffusion contract — "diagonal" (g like y, elementwise),
  "general" (matrix G [..., D, M] against an M-dim bm), "scalar" (ONE
  Brownian channel, arbitrary non-diagonal g), "pair" (reversible_heun's
  (y, z) state). Decides the default-bm SIZE and which time-reversal drift
  correction applies (``common._reversed_*_fns``).
- ``calculus``: "ito" | "stratonovich" — decides the reversal correction
  (Stratonovich is time-symmetric) and which conversion
  (``functional/calculus.py``) a user needs.
- ``strong_order`` / ``weak_order``: the MEASURED convergence orders the
  test suite pins (weak_order None = unmeasured here — ``sdeint_weak_mc``
  refuses without an explicit ``order=``, the repo's weak-order discipline).
- ``levy``: what the scheme queries from the Brownian tree — "none" (ΔW),
  "space-time" ((W, I10)), "space-time-time" ((W, I10, K)), "area" (full
  Davie/Foster/Fourier A matrices). Drives default-bm construction AND
  explicit-bm validation.
- ``local_order``: the adaptive dt controller's default error exponent
  (local strong order = global + 1/2; the old ``_SDE_LOCAL_ORDER``).
- ``knobs``: option keys popped from ``options`` and forwarded to the
  factory (validated: "theta" is implicit_em-only).
- ``additive_only``: the stated strong order requires additive noise
  (documented contract, not runtime-enforced — state-dependent G degrades
  the order, it does not crash).
- ``pathwise``: eligible for first-passage ``sdeint_event`` (weak schemes
  approximate the LAW, not the path; reversible_heun's pair state doesn't
  fit the bracketing refinement).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

from .explicit import (
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
from .common import make_sde_term
from .implicit import (
    make_implicit_em_term,
    make_implicit_foster2_general_term,
    make_implicit_foster2_term,
    make_implicit_milstein_term,
    make_implicit_sra1_damped_general_term,
    make_implicit_sra1_damped_term,
    make_implicit_sra1_general_term,
    make_implicit_sra1_term,
)
from .reversible import make_reversible_heun_term
from .taylor import make_general_taylor15_term, make_taylor15_term
from .weak import make_weak2_general_term, make_weak2_term

__all__ = ["SDESchemeSpec", "SDE_SCHEMES", "resolve_sde_scheme",
           "canonical_sde_scheme_names"]


@dataclasses.dataclass(frozen=True)
class SDESchemeSpec:
    name: str  # canonical name
    factory: Callable  # (drift, diffusion, bm, **knobs) -> XDETerm
    noise: str  # "diagonal" | "general" | "scalar" | "pair"
    calculus: str  # "ito" | "stratonovich"
    strong_order: float
    weak_order: Optional[float]  # None = unmeasured (refuse in weak MC)
    levy: str  # "none" | "space-time" | "space-time-time" | "area"
    local_order: float  # adaptive controller default exponent
    aliases: Tuple[str, ...] = ()
    knobs: Tuple[str, ...] = ()  # options popped + forwarded to the factory
    factory_kwargs: Optional[dict] = None  # static kwargs (e.g. use_area)
    additive_only: bool = False
    pathwise: bool = True  # sdeint_event eligibility
    implicit: bool = False

    def build(self, drift, diffusion, bm, **knob_kw):
        kw = dict(self.factory_kwargs or {})
        kw.update(knob_kw)
        return self.factory(drift, diffusion, bm, **kw)


_IMPLICIT_KNOBS = ("newton_iters", "krylov")

_SPECS = [
    SDESchemeSpec(
        "euler", make_sde_term, "diagonal", "ito", 0.5, 1.0, "none", 1.0,
        aliases=(),
    ),
    SDESchemeSpec(
        "milstein", make_milstein_term, "diagonal", "ito", 1.0, 1.0, "none",
        1.5,
    ),
    SDESchemeSpec(
        "implicit_em", make_implicit_em_term, "diagonal", "ito", 0.5, 1.0,
        "none", 1.0,
        aliases=("implicit_euler_maruyama", "drift_implicit_euler",
                 "stochastic_theta"),
        knobs=("theta",) + _IMPLICIT_KNOBS, implicit=True,
    ),
    SDESchemeSpec(
        "implicit_milstein", make_implicit_milstein_term, "diagonal", "ito",
        1.0, 1.0, "none", 1.5,
        aliases=("drift_implicit_milstein",),
        knobs=_IMPLICIT_KNOBS, implicit=True,
    ),
    SDESchemeSpec(
        "sra1", make_sra1_term, "diagonal", "ito", 1.5, 2.0, "space-time",
        2.0, additive_only=True,
    ),
    SDESchemeSpec(
        "sra1_general", make_general_sra1_term, "general", "ito", 1.5, 2.0,
        "space-time", 2.0, aliases=("general_sra1",), additive_only=True,
    ),
    # round 5: the implicit additive rungs' weak orders are now MEASURED
    # (tools/measure_weak_orders.py; tests/functional/test_weak_order_
    # implicit.py): coupled-resolution differencing on one Brownian tree vs
    # exact OU / Lyapunov moment oracles with TIME-DEPENDENT G(t). The sra1
    # family measures 2.0 on every first/second-moment slope (1.88-2.14
    # band); the foster2 family's bias decays at slope ~3 on the stiff
    # oracle — 2.0 is the conservative registered claim (Richardson at an
    # UNDERestimated p stays convergent; an overestimate would not).
    SDESchemeSpec(
        "implicit_sra1", make_implicit_sra1_term, "diagonal", "ito", 1.5,
        2.0, "space-time", 2.0,
        aliases=("drift_implicit_sra1",), knobs=_IMPLICIT_KNOBS,
        additive_only=True, implicit=True,
    ),
    SDESchemeSpec(
        "implicit_sra1_general", make_implicit_sra1_general_term, "general",
        "ito", 1.5, 2.0, "space-time", 2.0,
        aliases=("general_implicit_sra1",), knobs=_IMPLICIT_KNOBS,
        additive_only=True, implicit=True,
    ),
    SDESchemeSpec(
        "implicit_sra1_damped", make_implicit_sra1_damped_term, "diagonal",
        "ito", 1.5, 2.0, "space-time", 2.0,
        aliases=("drift_implicit_sra1_damped",), knobs=_IMPLICIT_KNOBS,
        additive_only=True, implicit=True,
    ),
    SDESchemeSpec(
        "implicit_sra1_damped_general", make_implicit_sra1_damped_general_term,
        "general", "ito", 1.5, 2.0, "space-time", 2.0,
        aliases=("general_implicit_sra1_damped",), knobs=_IMPLICIT_KNOBS,
        additive_only=True, implicit=True,
    ),
    SDESchemeSpec(
        "sriw1", make_sriw1_term, "diagonal", "ito", 1.5, 2.0, "space-time",
        2.0,
    ),
    SDESchemeSpec(
        "heun_stratonovich", make_heun_stratonovich_term, "diagonal",
        "stratonovich", 1.0, 1.0, "none", 1.0,
        aliases=("stratonovich_heun",),
    ),
    SDESchemeSpec(
        "foster2", make_foster2_term, "diagonal", "ito", 2.0, 2.0,
        "space-time-time", 2.5, aliases=("foster",), additive_only=True,
    ),
    SDESchemeSpec(
        "foster2_general", make_foster2_general_term, "general", "ito", 2.0,
        2.0, "space-time-time", 2.5, aliases=("general_foster2",),
        additive_only=True,
    ),
    SDESchemeSpec(
        "implicit_foster2", make_implicit_foster2_term, "diagonal", "ito",
        2.0, 2.0, "space-time-time", 2.5,
        aliases=("drift_implicit_foster2",),
        knobs=_IMPLICIT_KNOBS + ("substeps",), additive_only=True,
        implicit=True,
    ),
    SDESchemeSpec(
        "implicit_foster2_general", make_implicit_foster2_general_term,
        "general", "ito", 2.0, 2.0, "space-time-time", 2.5,
        aliases=("general_implicit_foster2",),
        knobs=_IMPLICIT_KNOBS + ("substeps",), additive_only=True,
        implicit=True,
    ),
    SDESchemeSpec(
        "taylor15", make_taylor15_term, "scalar", "ito", 1.5, 2.0,
        "space-time", 2.0, aliases=("ito_taylor15",),
    ),
    SDESchemeSpec(
        "taylor15_general", make_general_taylor15_term, "general", "ito",
        1.5, 1.0, "area", 2.0, aliases=("general_taylor15",),
        knobs=("triple_substeps", "triple_mode"),
        factory_kwargs={"use_area": True},
    ),
    SDESchemeSpec(
        "taylor15_commutative", make_general_taylor15_term, "general", "ito",
        1.5, 1.0, "space-time", 2.0, aliases=("commutative_taylor15",),
        factory_kwargs={"use_area": False},
    ),
    SDESchemeSpec(
        "weak2", make_weak2_term, "diagonal", "ito", 0.5, 2.0, "none", 1.5,
        aliases=("platen_weak2", "weak2_platen"), pathwise=False,
    ),
    SDESchemeSpec(
        "weak2_general", make_weak2_general_term, "general", "ito", 0.5, 2.0,
        "none", 1.5, aliases=("general_weak2",), pathwise=False,
    ),
    SDESchemeSpec(
        "euler_general", make_general_euler_term, "general", "ito", 0.5, 1.0,
        "none", 1.0, aliases=("general_euler",),
    ),
    SDESchemeSpec(
        "milstein_general", make_general_milstein_term, "general", "ito",
        1.0, 1.0, "area", 1.5, aliases=("general_milstein",),
        factory_kwargs={"use_area": True},
    ),
    SDESchemeSpec(
        "milstein_commutative", make_general_milstein_term, "general", "ito",
        1.0, 1.0, "none", 1.5, aliases=("commutative_milstein",),
        factory_kwargs={"use_area": False},
    ),
    SDESchemeSpec(
        "reversible_heun", make_reversible_heun_term, "pair", "stratonovich",
        0.5, 1.0, "none", 1.0, aliases=("heun_reversible",), pathwise=False,
    ),
]

SDE_SCHEMES = {}
for _spec in _SPECS:
    SDE_SCHEMES[_spec.name] = _spec
    for _a in _spec.aliases:
        assert _a not in SDE_SCHEMES, f"duplicate scheme alias {_a!r}"
        SDE_SCHEMES[_a] = _spec


def resolve_sde_scheme(name) -> Optional[SDESchemeSpec]:
    """The spec for a scheme name/alias (case-insensitive), else None —
    callers fall through to the deterministic solver registry ('euler'
    strings resolve HERE first; RK names resolve there and are refused by
    sdeint's noise-law check)."""
    if not isinstance(name, str):
        return None
    return SDE_SCHEMES.get(name.lower())


def canonical_sde_scheme_names():
    """Canonical names in registration order (for docs/tables/errors)."""
    return [s.name for s in _SPECS]
