"""Monte-Carlo expectation estimation with Talay–Tubaro extrapolation.

No counterpart exists in the reference (DrownFish19/PaddleXDE) — its sdeint
(``paddlexde/functional/sdeint.py:9-37``) offers no expectation tooling at
all. This module is the weak-convergence counterpart of the solver zoo: when
the quantity of interest is ``E[φ(Y_T)]`` (pricing, moments, MC averages),
the right machinery is (a) a weak-order scheme, (b) a LARGE batch of paths
solved as ONE program, and (c) Richardson extrapolation over step sizes —
Talay & Tubaro (1990): a weak order-p scheme with smooth coefficients has the
expansion ``E[φ(Y_T^h)] = E[φ(X_T)] + c h^p + O(h^{p+1})``, so

    (2^p · Ê_{h/2}  −  Ê_h) / (2^p − 1)

cancels the leading bias term and estimates at weak order p+1.

TPU-native structure: the Brownian ensemble is ONE virtual tree of size
``(n_paths, D)`` — every path is a batch row, both grids (h and h/2) consume
the SAME tree, and the whole estimator (two solves + functional + reduction)
is one jitted program of large batched ops. Because the two grids ride the
same paths, the extrapolated combination is formed PER PATH before averaging,
so the h vs h/2 difference is coupled and its Monte-Carlo variance reflects
the (small) pathwise discretization gap rather than two independent O(1)
path variances — the same coupled-estimator discipline the weak2 validation
tests use (plain independent-run differencing would need ~1/h⁴ paths to see
the h² bias at all).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..brownian.api import AntitheticBrownian
from .sdeint import _default_bm_for_scheme, sdeint

__all__ = ["sdeint_weak_mc", "WeakEstimate"]

# Weak convergence order (the Talay-Tubaro exponent) now comes from the
# SDE scheme registry (``sde_schemes/registry.py`` field ``weak_order``).
# Strong order does not transfer: milstein's extra pathwise term leaves the
# weak order at 1 (its bias expansion matches EM's leading power). taylor15
# IS weak 2 — the strong-1.5 Taylor contains every length-<=2 multi-index
# with EXACT (scalar-noise) integrals (mean-bias slope ~2 measured,
# test-pinned) — but the matrix variants stay at 1: the Davie area law
# error / dropped Lie component break the level-2 weak moment conditions at
# O(h^2)/step. Registry ``weak_order=None`` (implicit_sra1/implicit_foster2
# families) = unmeasured here: refuse unless the caller passes ``order=``
# explicitly after validating with a coupled estimator (the repo's
# weak-order discipline).



class WeakEstimate(NamedTuple):
    """Result of :func:`sdeint_weak_mc`.

    mean/stderr: the headline estimate (extrapolated when richardson=True)
    and its Monte-Carlo standard error (per-path combination, so coupling is
    reflected). mean_coarse/mean_fine: the raw grid-h and grid-h/2 averages
    (fine is None when richardson=False); their gap is a practical
    discretization-bias diagnostic.
    """

    mean: jax.Array
    stderr: jax.Array
    mean_coarse: jax.Array
    mean_fine: Optional[jax.Array]


def sdeint_weak_mc(
    drift,
    diffusion,
    y0,
    t1,
    phi: Optional[Callable] = None,
    *,
    t0=0.0,
    solver: str = "weak2",
    n_paths: int = 4096,
    n_steps: int = 16,
    key=None,
    richardson: bool = True,
    antithetic: bool = False,
    order: Optional[float] = None,
    noise_dim: Optional[int] = None,
    levy_area_approximation: str = "none",
    bm=None,
):
    """Estimate ``E[φ(Y_{t1})]`` for ``dy = f dt + g dW``, ``y(t0) = y0``.

    Args:
        y0: initial state ``[D]`` (one initial condition, broadcast over
            paths) or ``[n_paths, D]`` (per-path initial conditions).
        phi: functional ``[n_paths, D] -> [n_paths] or [n_paths, k]``
            (vectorized over the path axis). Defaults to identity (estimates
            the mean state).
        solver: any ``sdeint`` scheme; ``weak2``/``weak2_general`` are the
            purpose-built choices (weak order 2 at EM-like cost).
        n_steps: coarse-grid step count; the fine grid uses ``2*n_steps``.
        richardson: form the Talay–Tubaro combination
            ``(2^p Ê_fine − Ê_coarse)/(2^p − 1)`` per path (weak order p+1).
        antithetic: ALSO solve every grid on the pathwise-negated noise
            (:class:`AntitheticBrownian`) and average each (path, −path)
            pair before the reduction — the odd part of φ's dependence on
            the path cancels exactly, cutting the MC variance (measured on
            GBM's mean at σ=0.4: 13.3x at equal n_paths = 6.6x per unit
            work). Unbiased for any φ; most effective when φ∘flow is
            near-monotone in the noise.
        order: weak order p of the scheme; inferred from ``solver`` when
            omitted.
        bm: optional explicit Brownian motion of size ``(n_paths, noise)``;
            built from ``key`` when omitted.

    Returns:
        :class:`WeakEstimate`.
    """
    y0 = jnp.asarray(y0)
    if y0.ndim == 0:
        # scalar state: the path axis IS the state axis ([n_paths])
        y0 = jnp.broadcast_to(y0, (n_paths,))
    elif y0.ndim == 1 and y0.shape[0] == n_paths:
        # ambiguous: a [D] state with D == n_paths would silently become
        # n_paths independent scalar states — demand an explicit shape
        raise ValueError(
            f"ambiguous 1-D y0 of length {n_paths} == n_paths: pass "
            "y0[:, None] for per-path SCALAR states, or shape [n_paths, D] "
            "to broadcast a [D] state explicitly"
        )
    elif y0.ndim == 1:
        y0 = jnp.broadcast_to(y0, (n_paths,) + y0.shape)
    elif y0.shape[0] != n_paths:
        raise ValueError(
            f"y0 leading axis {y0.shape[0]} != n_paths {n_paths}; pass a "
            "scalar or [D] to broadcast, or [n_paths, ...] for per-path "
            "initial conditions"
        )
    if phi is None:
        phi = lambda y: y

    solver_name = solver.lower() if isinstance(solver, str) else ""
    if order is None:
        from .sde_schemes.registry import resolve_sde_scheme

        spec = resolve_sde_scheme(solver_name)
        if spec is None or spec.weak_order is None:
            raise ValueError(
                f"unknown weak order for solver {solver!r}; pass order= "
                "explicitly"
            )
        order = spec.weak_order

    common = dict(
        solver=solver, bm=bm, key=key, noise_dim=noise_dim,
        levy_area_approximation=levy_area_approximation, time_axis=0,
    )
    if bm is None and key is None:
        common["key"] = 0  # deterministic default, documented

    bms = [bm]
    if antithetic:
        if bm is None:
            # the wrapper needs the bm OBJECT up front; build exactly what
            # sdeint would (shared helper = single source of sizing/Lévy
            # rules)
            bm = _default_bm_for_scheme(
                solver_name, y0, t0, t1, common["key"],
                levy_area_approximation, noise_dim,
            )
        bms = [bm, AntitheticBrownian(bm)]

    def _terminal_vals(ts):
        """phi at t1, averaged over the (path, −path) pair when antithetic
        (pairs share a path axis, so the elementwise mean IS the pairwise
        average and downstream stderr reflects the antithetic coupling)."""
        acc = None
        for b in bms:
            kw = dict(common)
            kw["bm"] = b
            v = jnp.asarray(phi(sdeint(drift, diffusion, y0, ts, **kw)[-1]))
            acc = v if acc is None else acc + v
        return acc / len(bms)

    t_coarse = jnp.linspace(t0, t1, n_steps + 1)
    vals_c = _terminal_vals(t_coarse)

    if not richardson:
        mean = jnp.mean(vals_c, axis=0)
        stderr = jnp.std(vals_c, axis=0) / jnp.sqrt(vals_c.shape[0])
        return WeakEstimate(mean, stderr, mean, None)

    # the fine grid rides the SAME bm/key -> coupled paths. sdeint builds
    # the default tree from (key, t-span bounds, size), all identical here.
    t_fine = jnp.linspace(t0, t1, 2 * n_steps + 1)
    vals_f = _terminal_vals(t_fine)

    w = 2.0 ** order
    per_path = (w * vals_f - vals_c) / (w - 1.0)
    mean = jnp.mean(per_path, axis=0)
    stderr = jnp.std(per_path, axis=0) / jnp.sqrt(per_path.shape[0])
    return WeakEstimate(
        mean, stderr, jnp.mean(vals_c, axis=0), jnp.mean(vals_f, axis=0)
    )
