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

from ..brownian.api import BrownianInterval, ReverseBrownian
from ..xde.term import XDETerm
from .solve import _is_decreasing, format_solution, integrate_term

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
    "make_implicit_foster2_term",
    "make_implicit_foster2_general_term",
    "make_general_euler_term",
    "make_general_milstein_term",
    "make_general_sra1_term",
    "make_foster2_term",
    "make_foster2_general_term",
]


def make_milstein_term(drift, diffusion, bm) -> XDETerm:
    """Milstein scheme for diagonal Itô noise — strong order 1.0 (EM is 0.5):

        y1 = y + f dt + g dW + 1/2 g (dg/dy) (dW^2 - dt)

    ``dg/dy`` via jvp-with-ones (exact for elementwise diffusions, the
    diagonal-noise contract). A capability beyond the reference's solver zoo;
    strong-convergence order is pinned by test against the closed-form GBM.
    """

    def move(t, dt, y):
        d_w = bm(t, t + dt)
        f_val = drift(t, y)
        g_val, dg = jax.jvp(
            lambda y_: diffusion(t, y_), (y,), (jax.tree.map(jnp.ones_like, y),)
        )
        corr = jax.tree.map(
            lambda g, d: 0.5 * g * d * (d_w * d_w - jnp.asarray(dt, g.dtype)),
            g_val,
            dg,
        )
        g_dw = jax.tree.map(lambda g, c: g * d_w + c, g_val, corr)
        return (f_val, g_dw)

    def fuse(dy, dt, y):
        f_val, g_dw = dy
        return jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl, y, f_val, g_dw
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def _drift_implicit_solve(drift, t1, dt, base, theta, newton_iters,
                          krylov=True):
    """Solve ``y1 = base + theta*dt*f(t1, y1)`` with the stage machinery
    shared with the implicit ODE solvers. DEFAULT is matrix-free
    Newton–Krylov (GMRES on the jvp operator): the flattened state of a
    BATCHED SDE ensemble is one big vector, and a dense Jacobian there is
    O(B²) memory and O(B) drift evals per Newton iteration — found the hard
    way: the dense path turned a 512-path strong-order sweep into a
    multi-minute compile. Krylov costs a handful of jvps regardless of batch
    width (and converges in one iteration for batched-independent linear
    drift — the Jacobian has few distinct eigenvalues). ``krylov=False``
    restores the dense solve for small, strongly coupled states."""
    from jax.flatten_util import ravel_pytree

    from ..solver.implicit import _stage_newton_solve

    base_flat, unravel = ravel_pytree(base)
    gdt = jnp.asarray(theta, base_flat.dtype) * jnp.asarray(dt, base_flat.dtype)

    def f_at(y_flat):
        return ravel_pytree(drift(t1, unravel(y_flat)))[0]

    kry = {"restart": 10, "maxiter": 2, "tol": 1e-10} if krylov else None
    y_flat = _stage_newton_solve(f_at, base_flat, gdt, base_flat, newton_iters,
                                 krylov_opts=kry)
    return unravel(y_flat)


def make_implicit_em_term(drift, diffusion, bm, *, theta: float = 1.0,
                          newton_iters: int = 8,
                          krylov: bool = True) -> XDETerm:
    """Stochastic theta method — DRIFT-IMPLICIT Euler–Maruyama:

        y1 = y + dt·[(1−θ) f(t0, y) + θ f(t1, y1)] + g(t0, y) ΔW

    (θ = 1 fully drift-implicit; θ ≥ 1/2 is mean-square A-stable in the
    drift — Higham 2000). The stiff-SDE workhorse the explicit zoo lacks:
    for dy = −θ_stiff·y dt + σ dW, explicit EM's moments explode once
    θ_stiff·h > 2 while this contracts for every h (measured, test-pinned,
    with the h→0 stationary law matching σ²/2θ_stiff). Diffusion stays
    explicit (diagonal contract, evaluated at the left state): strong order
    0.5 multiplicative / 1.0 additive, like EM. The Newton solve lives
    inside ``move``; ``fuse`` reconstructs y1 EXACTLY from the solved
    equation (f_eff = (y1 − y − noise)/dt), so the scan driver, adaptive
    stepping and the replay adjoint all apply unchanged. No reference
    counterpart (its sdeint is broken explicit EM,
    ``paddlexde/functional/sdeint.py:9-37``).
    """
    theta = float(theta)
    if not 0.0 < theta <= 1.0:
        raise ValueError(f"theta must be in (0, 1], got {theta}")

    def move(t, dt, y):
        t1 = t + dt
        d_w = bm(t, t1)
        g_val = diffusion(t, y)
        noise = jax.tree.map(lambda g: g * d_w, g_val)
        if theta < 1.0:
            f0 = drift(t, y)  # explicit share; skipped at theta=1 (review
            # find: it fed only the dt==0 guard there — one wasted drift
            # eval per step/attempt)
            base = jax.tree.map(
                lambda yl, fl, nl: yl
                + (1.0 - theta) * jnp.asarray(dt, yl.dtype) * fl + nl,
                y, f0, noise,
            )
        else:
            base = jax.tree.map(lambda yl, nl: yl + nl, y, noise)
        y1 = _drift_implicit_solve(drift, t1, dt, base, theta, newton_iters,
                                   krylov)
        safe_dt = jnp.where(dt == 0, jnp.ones_like(jnp.asarray(dt)), dt)
        # dt==0 guard returns a ZERO derivative (fuse is exact regardless;
        # SDE paths have no meaningful zero-width derivative to report)
        f_eff = jax.tree.map(
            lambda y1l, yl, nl: jnp.where(
                dt == 0, jnp.zeros_like(y1l),
                (y1l - yl - nl) / jnp.asarray(safe_dt, y1l.dtype),
            ),
            y1, y, noise,
        )
        return (f_eff, noise)

    def fuse(dy, dt, y):
        f_val, g_dw = dy
        return jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl,
            y, f_val, g_dw,
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_implicit_milstein_term(drift, diffusion, bm, *,
                                newton_iters: int = 8,
                                krylov: bool = True) -> XDETerm:
    """Drift-implicit Milstein (diagonal noise): the theta=1 stochastic
    theta method plus Milstein's explicit diagonal correction —

        y1 = y + dt f(t1, y1) + g ΔW + 1/2 g (∂g/∂y) (ΔW² − dt)

    strong order 1.0 with drift A-stability (pinned: GBM strong order on the
    same tree path, and the stiff-drift law test EM fails)."""

    def move(t, dt, y):
        t1 = t + dt
        d_w = bm(t, t1)
        g_val, dg = jax.jvp(
            lambda y_: diffusion(t, y_), (y,),
            (jax.tree.map(jnp.ones_like, y),),
        )
        noise = jax.tree.map(
            lambda g, d: g * d_w
            + 0.5 * g * d * (d_w * d_w - jnp.asarray(dt, g.dtype)),
            g_val, dg,
        )
        base = jax.tree.map(lambda yl, nl: yl + nl, y, noise)
        y1 = _drift_implicit_solve(drift, t1, dt, base, 1.0, newton_iters,
                                   krylov)
        safe_dt = jnp.where(dt == 0, jnp.ones_like(jnp.asarray(dt)), dt)
        f_eff = jax.tree.map(
            lambda y1l, yl, nl: jnp.where(
                dt == 0, jnp.zeros_like(y1l),
                (y1l - yl - nl) / jnp.asarray(safe_dt, y1l.dtype),
            ),
            y1, y, noise,
        )
        return (f_eff, noise)

    def fuse(dy, dt, y):
        f_val, g_dw = dy
        return jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl,
            y, f_val, g_dw,
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_sra1_term(drift, diffusion, bm) -> XDETerm:
    """SRA1 (Rössler 2010) for ADDITIVE noise — strong order 1.5.

    Requires the diffusion to be state-independent (``g(t)``; any y-dependence
    is evaluated at the step's left state and NOT corrected — the additive-
    noise contract). Uses both the increment W and the time integral
    ``I10 = ∫ (W_s - W_t0) ds`` from the virtual tree's joint (W, ∫W) descent:

        H2   = y + 3/4 h f(t0, y) + 3/2 (I10/h) g(t0)
        y1   = y + h (f(t0,y)/3 + 2 f(t0+3/4h, H2)/3)
                 + g(t1) (W - I10/h) + g(t0) (I10/h)

    For constant g the noise term reduces to g·W (consistency); for
    time-dependent g it matches the Itô expansion ``∫g dW = g(t1)·W − g'·I10
    + O(h^{5/2})`` — the ΔW weight belongs on g(t1), NOT g(t0): the swapped
    form differs from the truth by ``g'·h·(W − 2·I10/h) = −2·g'·h·H ~
    h^{3/2}`` per step, which silently degrades the scheme to strong order
    1.0 for g(t) noise (caught in round 3 by the foster2 oracle test —
    constant-g tests cannot see it). Strong order is pinned by test against
    near-exact references on the same path, constant AND time-dependent g.
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u = bm(t, t1, return_U=True)
        safe_dt = jnp.where(dt == 0, jnp.ones_like(dt), dt)
        i10_h = jax.tree.map(lambda ul: ul / safe_dt, u)
        k1 = drift(t, y)
        g0 = diffusion(t, y)
        h2_in = jax.tree.map(
            lambda yl, k, g, i: yl + 0.75 * jnp.asarray(dt, yl.dtype) * k + 1.5 * i * g,
            y, k1, g0, i10_h,
        )
        k2 = drift(t + 0.75 * dt, h2_in)
        g1 = diffusion(t1, y)
        noise = jax.tree.map(
            lambda g0l, g1l, wl, il: g1l * (wl - il) + g0l * il, g0, g1, w, i10_h
        )
        f_comb = jax.tree.map(lambda a, b: a / 3.0 + 2.0 * b / 3.0, k1, k2)
        return (f_comb, noise)

    def fuse(dy, dt, y):
        f_val, noise = dy
        return jax.tree.map(
            lambda yl, fl, nl: yl + jnp.asarray(dt, yl.dtype) * fl + nl, y, f_val, noise
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_general_sra1_term(drift, diffusion, bm) -> XDETerm:
    """SRA1 for GENERAL (matrix) ADDITIVE noise — strong order 1.5.

    Same Rössler SRA1 update as :func:`make_sra1_term` with ``G(t) ->
    [..., D, M]`` against an M-dimensional Brownian motion (``bm`` size
    ``y.shape[:-1] + (M,)``); additive-noise columns enter independently, so
    the scalar scheme applies per column and contracts with einsum:

        H2 = y + 3/4 h f(t0, y) + 3/2 G(t0) @ (I10/h)
        y1 = y + h (f(t0,y)/3 + 2 f(t0+3/4h, H2)/3)
               + G(t1) @ (W - I10/h) + G(t0) @ (I10/h)

    (ΔW weighted by G(t1), matching the Itô expansion — see
    :func:`make_sra1_term`'s round-3 fix note.)

    y-dependence of G is NOT corrected (the additive contract, as in the
    diagonal scheme). Strong order pinned by a measured self-convergence
    test on the same Brownian path; for zero drift the update telescopes to
    the exact ``y0 + G W(T)``.
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u = bm(t, t1, return_U=True)  # [..., M] each
        safe_dt = jnp.where(dt == 0, jnp.ones_like(dt), dt)
        i10_h = u / jnp.asarray(safe_dt, u.dtype)
        k1 = drift(t, y)
        g0 = diffusion(t, y)  # [..., D, M]
        # precision=HIGHEST: TPU matmuls default to bf16 passes — a ~4e-3
        # relative error that would swamp the scheme's strong order
        mv = lambda g, z: jnp.einsum("...dm,...m->...d", g, z,
                                     precision=jax.lax.Precision.HIGHEST)
        h2_in = y + 0.75 * jnp.asarray(dt, y.dtype) * k1 + 1.5 * mv(g0, i10_h)
        k2 = drift(t + 0.75 * dt, h2_in)
        g1 = diffusion(t1, y)
        noise = mv(g1, w - i10_h) + mv(g0, i10_h)
        f_comb = k1 / 3.0 + 2.0 * k2 / 3.0
        return (f_comb, noise)

    return XDETerm(move=move, fuse=_general_fuse, additive=True, kind="sde")


# --- drift-implicit additive ladder (round-4 candidate #6) -----------------
#
# SDIRK2 core for implicit_sra1: Alexander's L-stable 2-stage SDIRK
# (gamma = 1 - sqrt(2)/2, b = (1-gamma, gamma), stiffly accurate). The
# noise-in-stage coefficients B = (B1, B2) are DERIVED from the additive
# strong-1.5 order conditions (same conditions SRA1 satisfies with its
# alpha=(1/3,2/3), B=(0,3/2): alpha.B = 1, alpha.B^2 = 3/2):
#
#   sum_i b_i B_i   = 1    (matches the f_y.g.I10 double integral)
#   sum_i b_i B_i^2 = 3/2  (matches the mean of the f_yy.g^2 O(h^2) term:
#                           E[h * 1/2 f_yy g^2 sum b_i B_i^2 (I10/h)^2]
#                           = h^2/6 sum b_i B_i^2 f_yy g^2, truth h^2/4)
#
# With b = (1-g, g): B2 = 1 + sqrt((1-g)/(2g)), B1 = (1 - g*B2)/(1 - g).
_ISRA1_GAMMA = 1.0 - 0.5 * 2.0**0.5
_ISRA1_B2 = 1.0 + ((1.0 - _ISRA1_GAMMA) / (2.0 * _ISRA1_GAMMA)) ** 0.5
_ISRA1_B1 = (1.0 - _ISRA1_GAMMA * _ISRA1_B2) / (1.0 - _ISRA1_GAMMA)


def make_implicit_sra1_term(drift, diffusion, bm, *, newton_iters: int = 8,
                            krylov: bool = True) -> XDETerm:
    """DRIFT-IMPLICIT strong-1.5 scheme for ADDITIVE diagonal noise — the
    stiff rung of the additive ladder (sra1 is the explicit 1.5; implicit_em
    the stiff strong-1.0-additive theta method; this is both at once).

    L-stable SDIRK2 drift core (Alexander, gamma = 1−√2/2, stiffly accurate
    — R(−∞)=0, so dy = −θ_stiff y dt + σ(t) dW contracts at ANY dt where
    explicit SRA1's moments explode once θ_stiff·h ≳ 2), with the Brownian
    tree's (W, I10) pair entering the stages and the final noise:

        H1 = y + γh f(t+γh, H1) + B1 g(t0) I10/h
        H2 = y + (1−γ)h f1 + γh f(t1, H2) + B2 g(t0) I10/h
        y1 = y + h[(1−γ) f1 + γ f2] + g(t1)(W − I10/h) + g(t0) I10/h

    The final noise is SRA1's exact Itô form (ΔW weight on g(t1) — see
    :func:`make_sra1_term`'s round-3 fix note); B1/B2 are derived above from
    the strong-1.5 order conditions. Stage solves share the implicit-ODE
    Newton machinery (matrix-free Krylov default — a batched ensemble's
    dense Jacobian is O(B²); ``options={'krylov': False}`` for small coupled
    states, ``newton_iters`` to tune). Strong order ~1.5 and the stiff
    contraction are test-pinned against the same-path OU closed form. No
    reference counterpart (its sdeint is broken explicit EM,
    ``paddlexde/functional/sdeint.py:9-37``).

    Regime note (measured, examples/spde_demo.py): the 1.5 advantage is an
    h→0 statement. At EXTREME stiffness (λ·dt ≳ 10 on the noisy modes) the
    noise-in-stage response OVERdisperses (~6x stationary m2 overshoot at
    θ·h=10, test-pinned), so on white-noise-forced SPDE fast modes this
    scheme can trail implicit_em's damped step — use
    :func:`make_implicit_foster2_term` there (its polynomial-path step
    keeps a near-exact noise response at any λ·dt).
    """
    g_c = _ISRA1_GAMMA

    def move(t, dt, y):
        t1 = t + dt
        w, u = bm(t, t1, return_U=True)
        safe_dt = jnp.where(dt == 0, jnp.ones_like(jnp.asarray(dt)), dt)
        i10_h = jax.tree.map(lambda ul: ul / jnp.asarray(safe_dt, ul.dtype), u)
        g0 = diffusion(t, y)
        g1 = diffusion(t1, y)

        base1 = jax.tree.map(
            lambda yl, gl, il: yl + _ISRA1_B1 * gl * il, y, g0, i10_h
        )
        h1 = _drift_implicit_solve(drift, t + g_c * dt, dt, base1, g_c,
                                   newton_iters, krylov)
        gdt = jnp.asarray(g_c, jnp.result_type(dt)) * safe_dt
        f1 = jax.tree.map(
            lambda hl, bl: jnp.where(
                dt == 0, jnp.zeros_like(hl),
                (hl - bl) / jnp.asarray(gdt, hl.dtype),
            ),
            h1, base1,
        )
        base2 = jax.tree.map(
            lambda yl, fl, gl, il: yl
            + (1.0 - g_c) * jnp.asarray(dt, yl.dtype) * fl
            + _ISRA1_B2 * gl * il,
            y, f1, g0, i10_h,
        )
        h2 = _drift_implicit_solve(drift, t1, dt, base2, g_c,
                                   newton_iters, krylov)
        f2 = jax.tree.map(
            lambda hl, bl: jnp.where(
                dt == 0, jnp.zeros_like(hl),
                (hl - bl) / jnp.asarray(gdt, hl.dtype),
            ),
            h2, base2,
        )
        noise = jax.tree.map(
            lambda g0l, g1l, wl, il: g1l * (wl - il) + g0l * il,
            g0, g1, w, i10_h,
        )
        f_comb = jax.tree.map(
            lambda a, b: (1.0 - g_c) * a + g_c * b, f1, f2
        )
        return (f_comb, noise)

    def fuse(dy, dt, y):
        f_val, noise = dy
        return jax.tree.map(
            lambda yl, fl, nl: yl + jnp.asarray(dt, yl.dtype) * fl + nl,
            y, f_val, noise,
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_implicit_sra1_general_term(drift, diffusion, bm, *,
                                    newton_iters: int = 8,
                                    krylov: bool = True) -> XDETerm:
    """Drift-implicit strong-1.5 scheme for GENERAL (matrix) ADDITIVE noise:
    :func:`make_implicit_sra1_term` with ``G(t) -> [..., D, M]`` against an
    M-dimensional Brownian motion — per-channel (W, I10) enter through the
    einsum contraction (HIGHEST precision; the additive columns are
    independent so the scalar derivation applies per column)."""
    g_c = _ISRA1_GAMMA
    mv = lambda g, z: jnp.einsum("...dm,...m->...d", g, z,
                                 precision=jax.lax.Precision.HIGHEST)

    def move(t, dt, y):
        t1 = t + dt
        w, u = bm(t, t1, return_U=True)  # [..., M] each
        safe_dt = jnp.where(dt == 0, jnp.ones_like(jnp.asarray(dt)), dt)
        i10_h = u / jnp.asarray(safe_dt, u.dtype)
        g0 = diffusion(t, y)
        g1 = diffusion(t1, y)

        base1 = y + _ISRA1_B1 * mv(g0, i10_h)
        h1 = _drift_implicit_solve(drift, t + g_c * dt, dt, base1, g_c,
                                   newton_iters, krylov)
        gdt = jnp.asarray(g_c, jnp.result_type(dt)) * safe_dt
        f1 = jnp.where(dt == 0, jnp.zeros_like(h1),
                       (h1 - base1) / jnp.asarray(gdt, h1.dtype))
        base2 = (y + (1.0 - g_c) * jnp.asarray(dt, y.dtype) * f1
                 + _ISRA1_B2 * mv(g0, i10_h))
        h2 = _drift_implicit_solve(drift, t1, dt, base2, g_c,
                                   newton_iters, krylov)
        f2 = jnp.where(dt == 0, jnp.zeros_like(h2),
                       (h2 - base2) / jnp.asarray(gdt, h2.dtype))
        noise = mv(g1, w - i10_h) + mv(g0, i10_h)
        return ((1.0 - g_c) * f1 + g_c * f2, noise)

    def fuse(dy, dt, y):
        f_val, noise = dy
        return jax.tree.map(
            lambda yl, fl, nl: yl + jnp.asarray(dt, yl.dtype) * fl + nl,
            y, f_val, noise,
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


# Hairer–Wanner's 5-stage SDIRK4 (γ = 1/4; HNW II Table 6.5): L-stable,
# stiffly accurate, ORDER 4 — the same published tableau the adaptive ODE
# ladder's "sdirk4" uses (solver/tableaus.py:_sdirk4). Order 4 (not 2 or 3)
# is LOAD-BEARING for the implicit polynomial-path schemes below, for the
# same reason foster2 uses RK4 and not a cheaper core:
#   - the b-quadrature is degree-3 exact (b·cᵏ = 1/(k+1), k ≤ 3), so the
#     cubic path's quadratic q′ integrates EXACTLY (constant-g telescopes
#     to g·W; an order-2 quadrature leaves a per-step O(√h) noise error
#     that floors at fixed substeps);
#   - the drift-noise coupling chain F_y·F_θθ ∝ h·f_y·g·q''' is a 4-node
#     tree: an order-3 core misses it — O(h^{3/2}) zero-mean per step ⇒
#     the whole scheme degrades to strong order ~1.0 (measured, SDIRK3
#     core: slope 0.9 where RK4's is 1.9). Order 4 matches it, and the
#     5-node chains vanish (q'''' ≡ 0 — the cubic path lies in the
#     order-4 exactness kernel, exactly as for RK4).
_SDIRK4_G = 0.25
_SDIRK4_A = (
    (),
    (0.5,),
    (17.0 / 50.0, -1.0 / 25.0),
    (371.0 / 1360.0, -137.0 / 2720.0, 15.0 / 544.0),
    (25.0 / 24.0, -49.0 / 48.0, 125.0 / 16.0, -85.0 / 12.0),
)
_SDIRK4_C = tuple(sum(row) + _SDIRK4_G for row in _SDIRK4_A)


def _sdirk4_theta(F, y, substeps: int, newton_iters: int, krylov: bool):
    """HW SDIRK4 (L-stable, order 4) over θ ∈ [0, 1] in ``substeps`` equal
    substeps; stage equations Y = base + γ·dθ·F(θ_s, Y) via the shared
    Newton machinery (matrix-free Krylov default). Stiffly accurate:
    y⁺ = Y₅."""
    from jax.flatten_util import ravel_pytree

    from ..solver.implicit import _stage_newton_solve

    y_flat, unravel = ravel_pytree(y)
    kry = {"restart": 10, "maxiter": 2, "tol": 1e-10} if krylov else None
    dth = 1.0 / substeps

    def f_at(theta):
        def f(v):
            return ravel_pytree(F(theta, unravel(v)))[0]

        return f

    gdt_f = _SDIRK4_G * dth
    for i in range(substeps):
        th = i * dth
        gdt = jnp.asarray(gdt_f, y_flat.dtype)
        fs = []
        y_stage = y_flat
        for s in range(5):
            base = y_flat
            for a_coef, f_prev in zip(_SDIRK4_A[s], fs):
                base = base + (a_coef * dth) * f_prev
            y_stage = _stage_newton_solve(
                f_at(th + _SDIRK4_C[s] * dth), base, gdt, y_stage,
                newton_iters, kry,
            )
            fs.append((y_stage - base) / gdt)
        y_flat = y_stage  # stiffly accurate: b equals the last A row
    return unravel(y_flat)


def make_heun_stratonovich_term(drift, diffusion, bm) -> XDETerm:
    """Stratonovich Heun: trapezoidal predictor-corrector in BOTH terms.

        ỹ  = y + f(t0,y) h + g(t0,y) ΔW
        y1 = y + h (f(t0,y)+f(t1,ỹ))/2 + ΔW (g(t0,y)+g(t1,ỹ))/2

    Converges to the STRATONOVICH solution (strong order 0.5 general /
    1.0 additive; for Itô semantics use euler/milstein/sra1). Pinned by test
    against the closed-form Stratonovich GBM ``y0·exp(μt + σW)``.
    """

    def move(t, dt, y):
        t1 = t + dt
        d_w = bm(t, t1)
        f0 = drift(t, y)
        g0 = diffusion(t, y)
        y_pred = jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl * d_w,
            y, f0, g0,
        )
        f1 = drift(t1, y_pred)
        g1 = diffusion(t1, y_pred)
        f_comb = jax.tree.map(lambda a, b: 0.5 * (a + b), f0, f1)
        g_dw = jax.tree.map(lambda a, b: 0.5 * (a + b) * d_w, g0, g1)
        return (f_comb, g_dw)

    def fuse(dy, dt, y):
        f_val, g_dw = dy
        return jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl, y, f_val, g_dw
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_sriw1_term(drift, diffusion, bm) -> XDETerm:
    """SRIW1 (Rössler 2010) for DIAGONAL noise — strong order 1.5.

    The strong-1.5 upgrade over Milstein for state-dependent diagonal noise
    (SRA1 requires additive noise). For diagonal noise every iterated
    stochastic integral the scheme needs is closed-form per component in the
    increment and the tree's exact space-time integral:

        I1   = ΔW            I11  = (ΔW² − h)/2
        I10  = ∫(W_s−W_t)ds  I111 = (ΔW³ − 3hΔW)/6

    Four stages, two stage chains (published SRIW1 tableau: A0/B0 drive the
    drift-supporting chain H0, A1/B1 the diffusion-supporting chain H1):

        H0_2 = y + 3/4 h f1 + 3/2 (I10/h) g1
        H1_2 = y + 1/4 h f1 + 1/2 √h g1
        H1_3 = y +     h f1 −     √h g1
        H1_4 = y + 1/4 h f1 + √h (−5 g1 + 3 g2 + 1/2 g3)
        y1   = y + h (f1/3 + 2 f2/3)
                 + Σ_i (β1_i I1 + β2_i I11/√h + β3_i I10/h + β4_i I111/h) g_i

    with β rows (−1, 4/3, 2/3, 0), (−1, 4/3, −1/3, 0), (2, −4/3, −2/3, 0),
    (−2, 5/3, −2/3, 1) — each of β2..β4 sums to 0 and β1 to 1, so constant g
    collapses to g·ΔW (consistency). Strong order ≈ 1.5 is pinned by test
    against the closed-form GBM solution driven by the same Brownian path.
    (Stage 3's drift value is f(t, y) = f1 because its c0/A0/B0 rows are all
    zero, and α3 = α4 = 0 — only f1, f2 enter the drift combination.)
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u = bm(t, t1, return_U=True)
        safe_dt = jnp.where(dt == 0, jnp.ones_like(dt), dt)

        def lc(base, *pairs):
            """base + Σ coeff * tree, leafwise."""
            trees = [p[1] for p in pairs]
            coeffs = [p[0] for p in pairs]
            return jax.tree.map(
                lambda b, *ls: b + sum(jnp.asarray(c, b.dtype) * l
                                       for c, l in zip(coeffs, ls)),
                base, *trees,
            )

        h = jnp.asarray(safe_dt)
        sqrt_h = jnp.sqrt(h)
        i10_h = jax.tree.map(lambda ul: ul / jnp.asarray(safe_dt, ul.dtype), u)
        i11_rh = jax.tree.map(
            lambda wl: (wl * wl - jnp.asarray(h, wl.dtype))
            / (2.0 * jnp.asarray(sqrt_h, wl.dtype)),
            w,
        )
        i111_h = jax.tree.map(
            lambda wl: (wl**3 - 3.0 * jnp.asarray(h, wl.dtype) * wl)
            / (6.0 * jnp.asarray(h, wl.dtype)),
            w,
        )

        f1 = drift(t, y)
        g1 = diffusion(t, y)

        h0_2 = lc(lc(y, (0.75, jax.tree.map(lambda l: jnp.asarray(h, l.dtype) * l, f1))),
                  (1.5, jax.tree.map(lambda gl, il: gl * il, g1, i10_h)))
        h1_2 = lc(y, (0.25, jax.tree.map(lambda l: jnp.asarray(h, l.dtype) * l, f1)),
                  (0.5, jax.tree.map(lambda l: jnp.asarray(sqrt_h, l.dtype) * l, g1)))
        f2 = drift(t + 0.75 * dt, h0_2)
        g2 = diffusion(t + 0.25 * dt, h1_2)

        h1_3 = lc(y, (1.0, jax.tree.map(lambda l: jnp.asarray(h, l.dtype) * l, f1)),
                  (-1.0, jax.tree.map(lambda l: jnp.asarray(sqrt_h, l.dtype) * l, g1)))
        g3 = diffusion(t1, h1_3)

        h1_4 = lc(y, (0.25, jax.tree.map(lambda l: jnp.asarray(h, l.dtype) * l, f1)),
                  (-5.0, jax.tree.map(lambda l: jnp.asarray(sqrt_h, l.dtype) * l, g1)),
                  (3.0, jax.tree.map(lambda l: jnp.asarray(sqrt_h, l.dtype) * l, g2)),
                  (0.5, jax.tree.map(lambda l: jnp.asarray(sqrt_h, l.dtype) * l, g3)))
        g4 = diffusion(t + 0.25 * dt, h1_4)

        f_comb = jax.tree.map(lambda a, b: a / 3.0 + 2.0 * b / 3.0, f1, f2)

        beta1 = (-1.0, 4.0 / 3.0, 2.0 / 3.0, 0.0)
        beta2 = (-1.0, 4.0 / 3.0, -1.0 / 3.0, 0.0)
        beta3 = (2.0, -4.0 / 3.0, -2.0 / 3.0, 0.0)
        beta4 = (-2.0, 5.0 / 3.0, -2.0 / 3.0, 1.0)

        def noise_leafwise(wl, i11l, i10l, i111l, *gs):
            out = jnp.zeros_like(wl)
            for i, gl in enumerate(gs):
                coeff = (beta1[i] * wl + beta2[i] * i11l
                         + beta3[i] * i10l + beta4[i] * i111l)
                out = out + coeff * gl
            return out

        noise = jax.tree.map(noise_leafwise, w, i11_rh, i10_h, i111_h,
                             g1, g2, g3, g4)
        return (f_comb, noise)

    def fuse(dy, dt, y):
        f_val, noise = dy
        return jax.tree.map(
            lambda yl, fl, nl: yl + jnp.asarray(dt, yl.dtype) * fl + nl, y, f_val, noise
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_taylor15_term(drift, diffusion, bm) -> XDETerm:
    """Explicit strong order-1.5 Itô–Taylor scheme for SCALAR noise
    (Kloeden–Platen 10.4.1): ``dy = f(t, y) dt + g(t, y) dW`` with a SINGLE
    Brownian motion driving a vector state through an arbitrary (fully
    coupled, non-diagonal) multiplicative diffusion ``g(t, y) -> y.shape``.

    The strong-1.5 ladder above Milstein for multiplicative noise: sriw1
    needs the diagonal contract, sra1/foster2 need additive noise — this
    scheme has NO structural restriction on g beyond m=1. For one noise
    channel every iterated integral the order-1.5 expansion needs is exact:

        I(1,1) = (ΔW² − h)/2          I(1,1,1) = (ΔW³ − 3hΔW)/6
        I(1,0) = ΔZ (the tree's joint-descent space-time integral, exact)
        I(0,1) = hΔW − ΔZ

    so unlike the m>1 case there is no Lévy-area approximation in the error
    budget. The Taylor update

        y1 = y + f h + g ΔW + L¹g·I(1,1) + L¹f·ΔZ + ½L⁰f·h²
               + L⁰g·(hΔW − ΔZ) + L¹L¹g·I(1,1,1)

    needs the differential operators L⁰ = ∂t + f·∂y + ½g²∂²y and L¹ = g·∂y
    applied to f and g — the classical reason derivative-free SRK schemes
    exist. Under JAX they are three nested ``jvp``s (exact forward-mode
    derivatives, no finite differencing, works for any traced f/g), which is
    why this repo can ship the Taylor scheme directly where torch-based
    libraries (and the reference, whose sdeint is Euler-only —
    ``paddlexde/functional/sdeint.py:9-37``) cannot. Strong order ≈1.5 is
    pinned by tests against closed forms on the same path: scalar GBM,
    time-dependent coefficients (exercising the ∂t terms via (W, U) closed
    forms), and a 2-D COMMUTING-PAIR linear system ``dy = (aI+bB)y dt +
    By dW`` with non-diagonal B (matrix-exponential closed form) that no
    other scheme in the zoo handles above order 1.0.

    Contract: single-array state ``[..., D]``; ``bm`` has size
    ``y.shape[:-1] + (1,)`` (one Brownian channel, broadcast over D) with
    ``levy_area_approximation='space-time'``.
    """

    def move(t, dt, y):
        t1 = t + dt
        w, dz = bm(t, t1, return_U=True)  # [..., 1]; dz = I(1,0), exact
        h = jnp.asarray(dt, y.dtype)
        t_arr = jnp.asarray(t)

        f0 = drift(t, y)
        g0 = diffusion(t, y)

        # L¹φ = (∂φ/∂y)·g0 — one directional jvp
        l1f = jax.jvp(lambda y_: drift(t, y_), (y,), (g0,))[1]
        l1g = jax.jvp(lambda y_: diffusion(t, y_), (y,), (g0,))[1]

        # L¹L¹g: L¹ applied to the FUNCTION y -> (∂g/∂y)(y)·g(y)
        def l1g_fn(y_):
            return jax.jvp(
                lambda yy: diffusion(t, yy), (y_,), (diffusion(t, y_),)
            )[1]

        l1l1g = jax.jvp(l1g_fn, (y,), (g0,))[1]

        # L⁰φ = ∂t φ + (∂φ/∂y)·f0 + ½ Σᵢⱼ g0ᵢ g0ⱼ ∂²φ/∂yᵢ∂yⱼ
        def l0(phi):
            dt_phi = jax.jvp(
                lambda s: phi(s, y), (t_arr,), (jnp.ones_like(t_arr),)
            )[1]
            dy_phi = jax.jvp(lambda y_: phi(t, y_), (y,), (f0,))[1]
            hvv = jax.jvp(
                lambda y_: jax.jvp(lambda yy: phi(t, yy), (y_,), (g0,))[1],
                (y,), (g0,),
            )[1]
            return dt_phi + dy_phi + 0.5 * hvv

        l0f = l0(drift)
        l0g = l0(diffusion)

        i11 = 0.5 * (w * w - h)
        i111 = (w ** 3 - 3.0 * h * w) / 6.0
        incr = (
            h * f0 + g0 * w
            + l1g * i11
            + l1f * dz + 0.5 * (h * h) * l0f
            + l0g * (h * w - dz)
            + l1l1g * i111
        )
        return incr

    def fuse(dy, dt, y):
        del dt  # the increment already integrates the full step
        return jax.tree.map(jnp.add, y, dy)

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_reversible_heun_term(drift, diffusion, bm, *, inverse: bool = False):
    """Kidger–Foster–Li–Lyons ALGEBRAICALLY REVERSIBLE Heun (arXiv
    2105.13493, alg. 2; shipped by torchsde as ``reversible_heun``) — a
    STRATONOVICH scheme over the paired state ``(y, z)`` (``z₀ = y₀``):

        F(t, z) = f(t, z)·h + g(t, z)·ΔW
        z₁ = (2y₀ − z₀) + F(t₀, z₀)
        y₁ = y₀ + ½(F(t₀, z₀) + F(t₁, z₁))

    One drift + one diffusion evaluation per step (HALF of Heun's
    predictor-corrector cost — the z-channel carries the predictor across
    steps), strong order 0.5 for general multiplicative noise / 1.0 for
    additive, converging to the Stratonovich solution. The step map is
    EXACTLY invertible in real arithmetic:

        z₀ = (2y₁ − z₁) − F(t₁, z₁)        y₀ = y₁ − ½(F(t₀, z₀) + F(t₁, z₁))

    so ``reverse=True`` retraces the forward trajectory ALGEBRAICALLY (no
    Itô/Stratonovich reversal drift correction, no scheme error on the way
    back — the retrace is exact up to floating-point non-associativity,
    measured ~1e-13 relative after 64 f64 steps where every other scheme's
    reverse carries its O(h^p) scheme error). ``inverse=True`` builds the
    backward map as a term over the negated time axis (``s = −t``), both
    F expressions written identically to the forward's so the
    reconstruction cancels to roundoff.

    Diagonal-noise contract (``g(t, y)`` has y's shape); state is the PAIR
    pytree — :func:`sdeint` lifts ``y₀ → (y₀, y₀)`` and projects the y
    component back out. Gradients: ``sdeint`` is a ``lax.scan``, so direct
    backprop works (O(steps) memory); ``sdeint_adjoint`` implements the
    paper's O(1)-MEMORY reversible backward (round 3) — the backward pass
    reconstructs each previous (y, z) pair with one exact inverse step and
    vjps that single forward step, storing nothing per step
    (``sdeint_adjoint._reversible_heun_adjoint``; pinned machine-equal to
    direct backprop, incl. the ``step_size`` fine-grid path).
    """

    def _f_combined(t, z, d_w, dt):
        f_val = drift(t, z)
        g_val = diffusion(t, z)
        return jax.tree.map(
            lambda fl, gl, wl: jnp.asarray(dt, fl.dtype) * fl + gl * wl,
            f_val, g_val, d_w,
        )

    def move_fwd(t, dt, state):
        y_n, z_n = state
        t1 = t + dt
        d_w = bm(t, t1)
        f0 = _f_combined(t, z_n, d_w, dt)
        z1 = jax.tree.map(lambda yl, zl, fl: (2.0 * yl - zl) + fl,
                          y_n, z_n, f0)
        f1 = _f_combined(t1, z1, d_w, dt)
        y1 = jax.tree.map(lambda yl, a, b: yl + 0.5 * (a + b), y_n, f0, f1)
        return (y1, z1)

    def move_inv(s, ds, state):
        # backward map on the negated axis: [s, s+ds] is forward [t0, t1]
        y1, z1 = state
        t1 = -s
        t0 = -(s + ds)
        d_w = bm(t0, t1)
        dt = t1 - t0
        f1 = _f_combined(t1, z1, d_w, dt)
        z0 = jax.tree.map(lambda yl, zl, fl: (2.0 * yl - zl) - fl,
                          y1, z1, f1)
        f0 = _f_combined(t0, z0, d_w, dt)
        y0 = jax.tree.map(lambda yl, a, b: yl - 0.5 * (a + b), y1, f0, f1)
        return (y0, z0)

    def fuse(new_state, dt, state):
        del dt, state  # move returns the full next pair
        return new_state

    return XDETerm(move=move_inv if inverse else move_fwd, fuse=fuse,
                   additive=False, kind="sde")


def _strat_sig23(w, a_mat):
    """Level-2/3 Stratonovich signature of one interval from its (ΔW, A)
    with zero level-3 Lie component: S2 = ½ΔW⊗ΔW + A,
    S3 = ΔW⊗³/6 + (ΔW⊗A + A⊗ΔW)/2 (the level-3 term of exp(ΔW + A))."""
    s2 = 0.5 * w[..., :, None] * w[..., None, :]
    j3 = (
        w[..., :, None, None] * w[..., None, :, None] * w[..., None, None, :]
    ) / 6.0
    if a_mat is not None:
        s2 = s2 + a_mat
        j3 = j3 + 0.5 * (
            w[..., :, None, None] * a_mat[..., None, :, :]
            + a_mat[..., :, :, None] * w[..., None, None, :]
        )
    return s2, j3


def _chen_levels(bm, t, t1, substeps: int):
    """(ΔW, A, J3) over [t, t1] by CHEN-composing the level-≤3 Stratonovich
    signatures of ``substeps`` equal tree sub-intervals.

    Each sub-interval contributes its tree increment (exact, additive), its
    per-query area sample, and a ZERO level-3 Lie component; Chen's identity
    S([a,c]) = S([a,b]) ⊗ S([b,c]) then composes them exactly. The composed
    signature is group-like (shuffle identities hold exactly, tested), and
    the law error sits only in the per-sub-interval truncations, both of
    which SHRINK with the substep count k:

    - area: Davie's per-query excess Var is (h/k)²/12 per sub-interval,
      k independent pieces ⇒ total excess h²/(12k) (fourier sub-areas have
      none — their total variance is exact at any k);
    - level-3 Lie: the missing per-sub Lie triple has std O((h/k)^{3/2}),
      k independent pieces ⇒ composed-L3 law error O(h^{3/2}/k), while the
      Chen cross terms of sub-(ΔW, A) BUILD the nonzero Lie component the
      k=1 construction zeroes (measured: E[I3²] moments converge to the
      exact h³ · 1/6 of the Itô isometry as k grows).

    k=1 reproduces :func:`_strat_sig23` on the whole step bit-exactly (the
    previous construction). Cost: 2k tree descents + k area samples per
    step — a correctness dial for strongly non-commuting noise.
    """
    dt = t1 - t
    s1 = None  # running ΔW
    s2 = None
    s3 = None
    for i in range(substeps):
        ta = t + (i / substeps) * dt
        tb = t + ((i + 1) / substeps) * dt if i < substeps - 1 else t1
        w, _u, a = bm(ta, tb, return_U=True, return_A=True)
        p2, p3 = _strat_sig23(w, a)
        if s1 is None:
            s1, s2, s3 = w, p2, p3
        else:
            s3 = (
                s3
                + s2[..., :, :, None] * w[..., None, None, :]
                + s1[..., :, None, None] * p2[..., None, :, :]
                + p3
            )
            s2 = s2 + s1[..., :, None] * w[..., None, :] + p2
            s1 = s1 + w
    a_total = s2 - 0.5 * s1[..., :, None] * s1[..., None, :]
    return s1, a_total, s3


def _levy_triple_integrals(d_w, u, a_mat, h, j3=None):
    """Level-3 iterated Itô integrals ``I(a,b,c)`` from the tree's
    ``(ΔW, U, A)`` via the zero-Lie-component log-signature extension:

        J3[a,b,c] = ΔW_aΔW_bΔW_c/6 + (ΔW_a·A_{bc} + A_{ab}·ΔW_c)/2
        I3[a,b,c] = J3[a,b,c] − ½δ_{ab}·I(0,c) − ½δ_{bc}·I(a,0)

    with ``I(a,0) = U_a`` and ``I(0,c) = hΔW_c − U_c``. (The level-3
    Itô↔Stratonovich conversion is COMPLETE with these two δ-terms: on the
    diagonal it reproduces the exact (ΔW³−3hΔW)/6.) Satisfies every
    shuffle/insertion identity exactly (tested); the fully-symmetrized part
    equals the true integrals' (Lie elements symmetrize to zero), so
    contractions with permutation-symmetric coefficient tensors — the
    commutative-noise case — are exact given exact A. ``a_mat=None`` drops
    the area terms (the commutative contract). A precomputed Stratonovich
    ``j3`` (e.g. :func:`_chen_levels`' composed level 3, which carries a
    sampled nonzero Lie component) overrides the zero-Lie construction.

    Args: ``d_w``/``u``: ``[..., M]``; ``a_mat``: ``[..., M, M]``
    antisymmetric or None; ``h``: step. Returns ``[..., M, M, M]``.
    """
    m = d_w.shape[-1]
    eye = jnp.eye(m, dtype=d_w.dtype)
    if j3 is None:
        _, j3 = _strat_sig23(d_w, a_mat)
    i0c = h * d_w - u
    return (
        j3
        - 0.5 * eye[:, :, None] * i0c[..., None, None, :]
        - 0.5 * u[..., :, None, None] * eye[None, :, :]
    )


def make_general_taylor15_term(
    drift, diffusion, bm, *, use_area: bool = True, triple_substeps: int = 1
) -> XDETerm:
    """Strong order-1.5 Itô–Taylor scheme for GENERAL (matrix) multiplicative
    noise (Kloeden–Platen 10.4.1): ``dy = f dt + G dW`` with ``G(t, y) ->
    [..., D, M]`` against an M-dimensional Brownian motion. The rung above
    :func:`make_general_milstein_term` (strong 1.0) that no structural
    contract in the zoo otherwise reaches for m > 1 multiplicative noise
    (sriw1 is diagonal, sra1/foster2 additive, taylor15 scalar-channel; the
    reference's sdeint is Euler-only, ``paddlexde/functional/sdeint.py:9-37``
    in DrownFish19/PaddleXDE).

    The Taylor update needs the operators (three nested ``jvp`` families —
    the autodiff advantage that lets this repo ship Taylor schemes directly)

        Lʲφ = (∂φ/∂y)·G_{·j}
        L⁰φ = ∂t φ + (∂φ/∂y)·f + ½ Σ_j Hφ[G_{·j}, G_{·j}]

    and the iterated Itô integrals up to level 3. Per channel, ``I(j,0)=U_j``
    (exact from the tree's joint descent) and ``I(0,j)=hΔW_j−U_j``; the pair
    matrix is Milstein's ``I(j1,j2)=½(ΔW_{j1}ΔW_{j2}−hδ)+A`` with the tree's
    Davie/Foster area approximation. The TRIPLE integrals — the classical
    wall for m>1 strong 1.5 — are built from the level-3 log-signature with
    the Lie (irreducible) component set to zero:

        J3[a,b,c] = ΔW_aΔW_bΔW_c/6 + (ΔW_a·A_{bc} + A_{ab}·ΔW_c)/2
        I3[a,b,c] = J3[a,b,c] − ½δ_{ab}·I(0,c) − ½δ_{bc}·I(a,0)

    (Stratonovich J3 = level-3 term of exp(ΔW⊗ + A⊗); the Itô conversion is
    the exact algebra I = J − ½δ-corrections, derived from d⟨J(a,b), W_c⟩ =
    δ_{bc}I(a,0)ds.) This construction satisfies every shuffle/insertion
    identity exactly (it IS a geometric signature), reduces to the exact
    ``(ΔW³−3hΔW)/6`` on the diagonal, and its fully-SYMMETRIZED part equals
    the true one (Lie elements vanish under symmetrization). Consequences,
    measured in the tests:

    - COMMUTATIVE noise ([G_{·j1}, G_{·j2}] = 0 as vector fields): the
      coefficient tensors are fully symmetric, every A term cancels in the
      contraction, and the scheme attains strong order ~1.5 against a
      matrix-exponential closed form (``use_area=False`` — exposed as
      ``taylor15_commutative`` — is then exact-equivalent and needs only a
      space-time bm).
    - NON-commutative noise: with the default ``triple_substeps=1`` the
      accuracy is bounded by the area law approximation and the dropped
      Lie-triple component (std O(h^1.5) per step) — strong order degrades
      toward milstein_general's ~1.0 in the strongly non-commuting
      directions, while all commuting directions keep the 1.5 behaviour.
      ``triple_substeps=k`` (``options={'triple_substeps': k}``) replaces
      the per-query (A, zero-Lie J3) with :func:`_chen_levels`' composed
      sample: the area excess shrinks as h²/(12k) (zero with 'fourier'
      areas) and the Lie-triple law error as O(h^{3/2}/k) — the measured
      E[I3²] moments converge to the exact Itô-isometry h³/6 (the k=1
      middle-word moment sits at 0.53 of truth; k=4 restores it). Cost:
      2k tree descents + k area samples per step. TRUE order-1.5 coupling
      at k=1 for arbitrary noise would need the joint (ΔW, A, I3) KL
      expansion with O(1/h) terms per step (KP 5.8) — the k-dial is the
      convergent, test-pinned version of that trade.

    Contract: single-array state ``[..., D]``; ``bm`` of size
    ``y.shape[:-1] + (M,)`` with ``levy_area_approximation``
    davie/foster/fourier (``use_area=True``) or space-time
    (``use_area=False``).
    """

    def move(t, dt, y):
        t1 = t + dt
        j3 = None
        if use_area and triple_substeps > 1:
            # Chen-composed (ΔW, A, J3) over tree sub-intervals: the area
            # excess shrinks as h²/(12k) and the level-3 Lie component —
            # zeroed by the k=1 construction — is BUILT by the composition
            # (law → exact as k grows; see _chen_levels). One consistent
            # sample feeds the pair AND triple integrals.
            d_w, a_mat, j3 = _chen_levels(bm, t, t1, triple_substeps)
            _, u = bm(t, t1, return_U=True)  # exact tree I(j,0)
        elif use_area:
            d_w, u, a_mat = bm(t, t1, return_U=True, return_A=True)
        else:
            d_w, u = bm(t, t1, return_U=True)
            a_mat = None
        f0 = drift(t, y)  # [..., D]
        g0 = diffusion(t, y)  # [..., D, M]
        m = g0.shape[-1]
        h = jnp.asarray(dt, g0.dtype)
        t_arr = jnp.asarray(t)
        hi = jax.lax.Precision.HIGHEST

        cols = jnp.moveaxis(g0, -1, 0)  # [M, ..., D] — the g_j tangents

        # L^{j1} G: [M(j1), ..., D, M(j2)] — M jvps of the diffusion
        def dg_dir(tangent):
            return jax.jvp(lambda y_: diffusion(t, y_), (y,), (tangent,))[1]

        dg_all = jax.vmap(dg_dir)(cols)

        # L^j f: [M, ..., D]
        def df_dir(tangent):
            return jax.jvp(lambda y_: drift(t, y_), (y,), (tangent,))[1]

        ljf = jax.vmap(df_dir)(cols)

        # L⁰φ = ∂tφ + (∂φ/∂y)·f + ½ Σ_j Hφ[g_j, g_j] (per-channel HVPs)
        def l0(phi):
            dt_phi = jax.jvp(
                lambda s: phi(s, y), (t_arr,), (jnp.ones_like(t_arr),)
            )[1]
            dy_phi = jax.jvp(lambda y_: phi(t, y_), (y,), (f0,))[1]

            def hvv(v):
                return jax.jvp(
                    lambda y_: jax.jvp(lambda yy: phi(t, yy), (y_,), (v,))[1],
                    (y,), (v,),
                )[1]

            return dt_phi + dy_phi + 0.5 * jnp.sum(jax.vmap(hvv)(cols), axis=0)

        l0f = l0(drift)  # [..., D]
        l0g = l0(diffusion)  # [..., D, M]

        # L^{j1}L^{j2}G: jvp along g_{j1} of the FUNCTION y -> L^{j2}G(y)
        # (the outer derivative sees y-dependence through both G and its
        # tangent columns) -> c3[j1, j2, ..., D, j3]
        def inner(y_):
            g_ = diffusion(t, y_)
            cols_ = jnp.moveaxis(g_, -1, 0)
            return jax.vmap(
                lambda v: jax.jvp(
                    lambda yy: diffusion(t, yy), (y_,), (v,)
                )[1]
            )(cols_)

        c3 = jax.vmap(lambda v: jax.jvp(inner, (y,), (v,))[1])(cols)

        eye = jnp.eye(m, dtype=g0.dtype)
        i2 = 0.5 * (d_w[..., :, None] * d_w[..., None, :] - h * eye)
        if a_mat is not None:
            i2 = i2 + a_mat
        i0c = h * d_w - u  # I(0,c) per channel
        i3 = _levy_triple_integrals(d_w, u, a_mat, h, j3)

        mv = lambda g, z: jnp.einsum("...dm,...m->...d", g, z, precision=hi)
        pair = jnp.einsum("j...dk,...jk->...d", dg_all, i2, precision=hi)
        trip = jnp.einsum("ij...dk,...ijk->...d", c3, i3, precision=hi)
        incr = (
            h * f0
            + mv(g0, d_w)
            + pair
            + jnp.einsum("j...d,...j->...d", ljf, u, precision=hi)
            + 0.5 * (h * h) * l0f
            + mv(l0g, i0c)
            + trip
        )
        return incr

    def fuse(dy, dt, y):
        del dt  # the increment already integrates the full step
        return jax.tree.map(jnp.add, y, dy)

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_weak2_term(drift, diffusion, bm) -> XDETerm:
    """Platen's explicit WEAK order-2.0 scheme (derivative-free, Kloeden–
    Platen 14.2.1/14.2.2 specialized to the diagonal contract): converges at
    O(h²) in distribution — ``|E[φ(Y_T^h)] − E[φ(Y_T)]| = O(h²)`` for smooth
    φ — where every strong scheme driven by the same increments is weak
    order ≤ 1.0 at EM cost. The right tool when only expectations matter
    (option pricing, moment estimation, MC averages): pathwise accuracy is
    NOT improved (strong order stays low) and is not the goal.

    Diagonal contract (same as :func:`make_milstein_term`): ``g(t, y)`` has
    ``y``'s shape and ``∂g_i/∂y_j`` is diagonal. Under that contract the
    multi-dimensional cross-support terms of KP 14.2.2 vanish identically
    (``b^j(Ū±_r) = b^j`` for r≠j) and the scheme is elementwise:

        Ȳ  = y + a h + g ΔW              (drift support)
        R± = y + a h ± g √h              (diffusion supports)
        y1 = y + ½(a(t1,Ȳ) + a) h
               + ¼[(g(t1,R+) + g(t1,R−) + 2g) ΔW
                   + (g(t1,R+) − g(t1,R−)) ((ΔW)² − h)/√h]

    Support times follow the time-augmented-state reduction of the
    autonomous scheme (t has zero noise, so Ȳ/R± carry time t+h). Gaussian
    increments from the tree satisfy the weak moment conditions (KP allows
    the cheaper three-point ΔŴ; the true ΔW keeps the scheme coupled to
    ``bm`` and replayable). No Lévy areas are needed. Weak order ≈2.0 is
    pinned by coupled-to-exact weak-error measurement on GBM (the reference
    has no weak schemes at all — its sdeint is broken EM,
    ``paddlexde/functional/sdeint.py:9-37``).
    """

    def move(t, dt, y):
        t1 = t + dt
        d_w = bm(t, t1)
        a0 = drift(t, y)
        g0 = diffusion(t, y)

        def cast(yl):
            h = jnp.asarray(dt, yl.dtype)
            safe = jnp.where(h == 0, jnp.ones_like(h), h)
            sqrt_h = jnp.where(h == 0, jnp.zeros_like(h), jnp.sqrt(safe))
            inv_sqrt = jnp.where(h == 0, jnp.zeros_like(h), 1.0 / jnp.sqrt(safe))
            return h, sqrt_h, inv_sqrt

        ybar = jax.tree.map(
            lambda yl, al, gl, wl: yl + cast(yl)[0] * al + gl * wl,
            y, a0, g0, d_w,
        )
        r_p = jax.tree.map(
            lambda yl, al, gl: yl + cast(yl)[0] * al + cast(yl)[1] * gl,
            y, a0, g0,
        )
        r_m = jax.tree.map(
            lambda yl, al, gl: yl + cast(yl)[0] * al - cast(yl)[1] * gl,
            y, a0, g0,
        )
        a1 = drift(t1, ybar)
        g_p = diffusion(t1, r_p)
        g_m = diffusion(t1, r_m)
        noise = jax.tree.map(
            lambda gp, gm, gl, wl: 0.25 * (
                (gp + gm + 2.0 * gl) * wl
                + (gp - gm) * (wl * wl - cast(gl)[0]) * cast(gl)[2]
            ),
            g_p, g_m, g0, d_w,
        )
        f_comb = jax.tree.map(lambda a, b: 0.5 * (a + b), a0, a1)
        return (f_comb, noise)

    def fuse(dy, dt, y):
        f_val, noise = dy
        return jax.tree.map(
            lambda yl, fl, nl: yl + jnp.asarray(dt, yl.dtype) * fl + nl,
            y, f_val, noise,
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_weak2_general_term(drift, diffusion, bm, *, v_key=None) -> XDETerm:
    """Platen's explicit weak order-2.0 scheme for GENERAL (matrix) noise
    (Kloeden–Platen 14.2.2): state ``y [..., D]``, diffusion ``G(t, y) ->
    [..., D, M]``, M-dimensional Brownian motion. Derivative-free weak 2.0
    with NO commutativity condition and NO Lévy areas — the cross-channel
    double integrals are replaced, in distribution, by ``(ΔW_j ΔW_r +
    V_{r,j})/2`` with antisymmetric two-point variables ``V_{r,j} = ±h``
    (i.i.d. for r<j, ``V_{j,r} = −V_{r,j}``). Supports:

        Ȳ    = y + a h + G ΔW
        R̄±_j = y + a h ± b_j √h      (b_j = G[..., :, j], evaluated at t+h)
        Ū±_r = y ± b_r √h            (evaluated at t)

        y1 = y + ½(a(t1,Ȳ) + a) h
           + ¼ Σ_j [(b_j(R̄+_j) + b_j(R̄−_j) + 2 b_j) ΔW_j
                    + (b_j(R̄+_j) − b_j(R̄−_j)) ((ΔW_j)² − h)/√h]
           + ¼ Σ_j Σ_{r≠j} [(b_j(Ū+_r) + b_j(Ū−_r) − 2 b_j) ΔW_j
                    + (b_j(Ū+_r) − b_j(Ū−_r)) (ΔW_j ΔW_r + V_{r,j})/√h]

    4M+1 diffusion evaluations per step (two vmapped G calls of M supports
    each, plus Ȳ/base) — the derivative-free price of weak 2.0 for
    arbitrary noise. ``V`` is sampled from a counter-based key derived from
    the Brownian tree's key and the step's left endpoint (independent of W,
    deterministic per (path, step) — replay-adjoint safe). Weak order ≈2.0
    is pinned by a measured weak-convergence test against moment-ODE
    oracles on a NON-COMMUTING 2-noise linear SDE.
    """
    base = getattr(bm, "base_brownian", bm)
    if v_key is None:
        v_key = getattr(base, "_key", None)
    v_key = (jax.random.key(0x57EA2) if v_key is None
             else jax.random.fold_in(v_key, 0x57EA2))

    def move(t, dt, y):
        t1 = t + dt
        d_w = bm(t, t1)  # [..., M]
        h = jnp.asarray(dt, y.dtype)
        safe = jnp.where(h == 0, jnp.ones_like(h), h)
        sqrt_h = jnp.where(h == 0, jnp.zeros_like(h), jnp.sqrt(safe))
        inv_sqrt = jnp.where(h == 0, jnp.zeros_like(h), 1.0 / jnp.sqrt(safe))
        hi = jax.lax.Precision.HIGHEST

        a0 = drift(t, y)
        g0 = diffusion(t, y)  # [..., D, M]
        m = g0.shape[-1]
        eye = jnp.eye(m, dtype=y.dtype)

        g_dw = jnp.einsum("...dm,...m->...d", g0, d_w, precision=hi)
        yah = y + h * a0
        ybar = yah + g_dw
        a1 = drift(t1, ybar)

        cols = jnp.moveaxis(g0, -1, 0)  # [M, ..., D]
        sup_r = jnp.concatenate(
            [yah[None] + sqrt_h * cols, yah[None] - sqrt_h * cols], axis=0
        )
        sup_u = jnp.concatenate(
            [y[None] + sqrt_h * cols, y[None] - sqrt_h * cols], axis=0
        )
        g_r = jax.vmap(lambda ys: diffusion(t1, ys))(sup_r)  # [2M, ..., D, M]
        g_u = jax.vmap(lambda ys: diffusion(t, ys))(sup_u)
        g_rp, g_rm = g_r[:m], g_r[m:]
        g_up, g_um = g_u[:m], g_u[m:]

        # b_j evaluated at ITS OWN support R̄±_j: diagonal over
        # (support index, noise column) via one-hot contraction
        diag = lambda g: jnp.einsum("r...dj,rj->...dj", g, eye, precision=hi)
        b_rp, b_rm = diag(g_rp), diag(g_rm)
        term1 = 0.25 * (
            jnp.einsum("...dj,...j->...d", b_rp + b_rm + 2.0 * g0, d_w,
                       precision=hi)
            + jnp.einsum("...dj,...j->...d", b_rp - b_rm,
                         d_w * d_w - h, precision=hi) * inv_sqrt
        )

        # cross-channel supports: Σ_{r≠j} — full sum minus the r=j diagonal
        s_mat = g_up + g_um - 2.0 * g0[None]  # [M(r), ..., D, M(j)]
        d_mat = g_up - g_um
        s_sum = jnp.sum(s_mat, axis=0) - diag(s_mat)
        cross_w = jnp.einsum("...dj,...j->...d", s_sum, d_w, precision=hi)

        # V_{r,j}: antisymmetric two-point ±h, i.i.d. per (path, step, r<j),
        # counter-based key = tree key ⊕ step left endpoint (f32 bits)
        step_key = jax.random.fold_in(
            v_key,
            jax.lax.bitcast_convert_type(
                jnp.asarray(t, jnp.float32), jnp.int32
            ),
        )
        rad = jax.random.rademacher(
            step_key, d_w.shape[:-1] + (m, m), dtype=y.dtype
        )
        v_mat = jnp.triu(rad, 1) * h
        v_mat = v_mat - jnp.swapaxes(v_mat, -1, -2)
        coeff = (d_w[..., :, None] * d_w[..., None, :] + v_mat) * (1.0 - eye)
        cross_v = jnp.einsum("r...dj,...rj->...d", d_mat, coeff,
                             precision=hi) * inv_sqrt
        noise = term1 + 0.25 * (cross_w + cross_v)
        f_comb = 0.5 * (a0 + a1)
        return (f_comb, noise)

    return XDETerm(move=move, fuse=_general_fuse, additive=False, kind="sde")


# cubic-path coefficient map: (a, b, c) of q(θ)=aθ³+bθ²+cθ from the moment
# constraints q(1)=ŵ, ∫₀¹q=û, ∫₀¹(1-θ)q=k̂ (scaled w, u/h, k/h²); constant
# 3x3 inverse computed once in f64
_CUBIC_MINV = np.linalg.inv(np.array(
    [[1.0, 1.0, 1.0],
     [1.0 / 4.0, 1.0 / 3.0, 1.0 / 2.0],
     [1.0 / 20.0, 1.0 / 12.0, 1.0 / 6.0]]
))


def _cubic_path_coeffs(w, u, k, dt):
    """Per-leaf (a, b, c) of the unique cubic q(θ) on [0,1] matching the
    step's (W, I10, K) triple. q' is quadratic, so RK4's Simpson weights
    integrate the noise path segment exactly for constant diffusion."""
    safe = jnp.where(dt == 0, jnp.ones_like(dt), dt)

    def per_leaf(row):
        return jax.tree.map(
            lambda wl, ul, kl: (
                row[0] * wl
                + row[1] * (ul / jnp.asarray(safe, wl.dtype))
                + row[2] * (kl / jnp.asarray(safe, wl.dtype) ** 2)
            ),
            w, u, k,
        )

    return (per_leaf(tuple(float(x) for x in _CUBIC_MINV[0])),
            per_leaf(tuple(float(x) for x in _CUBIC_MINV[1])),
            per_leaf(tuple(float(x) for x in _CUBIC_MINV[2])))


def _rk4_theta(F, y, substeps: int):
    """Classic RK4 over θ ∈ [0, 1] in ``substeps`` equal substeps (static)."""
    dth = 1.0 / substeps
    for i in range(substeps):
        th = i * dth
        k1 = F(th, y)
        k2 = F(th + 0.5 * dth, jax.tree.map(
            lambda yl, kl: yl + 0.5 * dth * kl, y, k1))
        k3 = F(th + 0.5 * dth, jax.tree.map(
            lambda yl, kl: yl + 0.5 * dth * kl, y, k2))
        k4 = F(th + dth, jax.tree.map(lambda yl, kl: yl + dth * kl, y, k3))
        y = jax.tree.map(
            lambda yl, a, b, c, d: yl + (dth / 6.0) * (a + 2 * b + 2 * c + d),
            y, k1, k2, k3, k4,
        )
    return y


def make_foster2_term(drift, diffusion, bm, substeps: int = 1) -> XDETerm:
    """Cubic polynomial-path method for ADDITIVE diagonal noise — strong
    order ~2.0 (measured).

    Round-3 K-consumer (ROADMAP r2 #3; no reference counterpart): each step
    replaces the Brownian path by the unique cubic ``q(θ)`` matching the
    virtual tree's ``(W, I10, K)`` triple — ``q(0)=0, q(1)=W, ∫q = I10/h,
    ∫(1-θ)q = K/h²`` — and integrates the resulting ODE

        dy/dθ = h f(t+θh, y) + g(t+θh) · q'(θ),   θ ∈ [0, 1]

    with RK4 (the polynomial-path / shifted-ODE construction of
    Foster–Lyons–Oberhauser, rederived here from the moment constraints).
    Requires state-independent ``g`` (the additive contract, as SRA1); the
    bm must carry ``levy_area_approximation='space-time-time'``. For
    constant g the noise contribution telescopes to exactly ``g·W`` (RK4 =
    Simpson is exact on the quadratic q'). Strong order is test-pinned
    against a near-exact OU reference on the same path.
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u, k = bm(t, t1, return_U=True, return_K=True)
        a, b, c = _cubic_path_coeffs(w, u, k, dt)

        def F(theta, yv):
            f_val = drift(t + theta * dt, yv)
            g_val = diffusion(t + theta * dt, yv)
            return jax.tree.map(
                lambda fl, gl, al, bl, cl: (
                    jnp.asarray(dt, fl.dtype) * fl
                    + gl * (3 * al * theta**2 + 2 * bl * theta + cl)
                ),
                f_val, g_val, a, b, c,
            )

        y1 = _rk4_theta(F, y, substeps)
        return jax.tree.map(jnp.subtract, y1, y)

    def fuse(dy, dt, y):
        del dt  # the increment already integrated over the step
        return jax.tree.map(jnp.add, y, dy)

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_foster2_general_term(drift, diffusion, bm, substeps: int = 1) -> XDETerm:
    """Cubic polynomial-path method for GENERAL (matrix) ADDITIVE noise.

    Same construction as :func:`make_foster2_term` with ``G(t) ->
    [..., D, M]`` against an M-dimensional Brownian motion: per-channel
    cubic paths, contraction ``G @ q'(θ)`` (HIGHEST precision — TPU bf16
    matmul passes would swamp the order-2 error floor).
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u, k = bm(t, t1, return_U=True, return_K=True)  # [..., M] each
        a, b, c = _cubic_path_coeffs(w, u, k, dt)
        mv = lambda g, z: jnp.einsum("...dm,...m->...d", g, z,
                                     precision=jax.lax.Precision.HIGHEST)

        def F(theta, yv):
            f_val = drift(t + theta * dt, yv)
            g_val = diffusion(t + theta * dt, yv)
            qp = 3 * a * theta**2 + 2 * b * theta + c
            return jnp.asarray(dt, f_val.dtype) * f_val + mv(g_val, qp)

        y1 = _rk4_theta(F, y, substeps)
        return y1 - y

    def fuse(dy, dt, y):
        del dt
        return jax.tree.map(jnp.add, y, dy)

    # additive=False: fuse is y + dy (the increment already integrates the
    # step); the additive=True contract means fuse == y + dt*dy
    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_implicit_foster2_term(drift, diffusion, bm, *, substeps: int = 1,
                               newton_iters: int = 8,
                               krylov: bool = True) -> XDETerm:
    """DRIFT-IMPLICIT cubic polynomial-path method for ADDITIVE diagonal
    noise — strong order ~2.0 with an L-STABLE core: the top of the stiff
    additive ladder (implicit_em 1.0 → implicit_sra1 1.5 → this).

    Same construction as :func:`make_foster2_term` — each step replaces the
    Brownian path by the cubic q(θ) matching the tree's (W, I10, K) triple
    and integrates dy/dθ = h·f + g·q′(θ) — but the θ-ODE is solved with
    Hairer–Wanner's 5-stage L-stable stiffly-accurate SDIRK4 instead of RK4,
    so arbitrarily stiff drift (SPDE operators at dt ≫ the explicit
    stability limit) is damped, not amplified. The ORDER-4 choice is
    load-bearing (see the tableau comment above :func:`_sdirk4_theta`):
    degree-3-exact quadrature keeps constant-g telescoping exact, and order
    4 captures the h·f_y·g·q''' coupling chain that degraded a measured
    SDIRK3 core to strong ~1.0 (q'''' ≡ 0 then kills the 5-node chains —
    the cubic path sits in the order-4 exactness kernel, as for RK4).
    Strong order vs the same-path OU oracle and the stiff contraction
    explicit foster2 fails are test-pinned.
    Knobs (via ``options``): substeps / newton_iters / krylov (matrix-free
    default — batched ensembles, see :func:`_drift_implicit_solve`).
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u, k = bm(t, t1, return_U=True, return_K=True)
        a, b, c = _cubic_path_coeffs(w, u, k, dt)

        def F(theta, yv):
            f_val = drift(t + theta * dt, yv)
            g_val = diffusion(t + theta * dt, yv)
            return jax.tree.map(
                lambda fl, gl, al, bl, cl: (
                    jnp.asarray(dt, fl.dtype) * fl
                    + gl * (3 * al * theta**2 + 2 * bl * theta + cl)
                ),
                f_val, g_val, a, b, c,
            )

        y1 = _sdirk4_theta(F, y, substeps, newton_iters, krylov)
        return jax.tree.map(jnp.subtract, y1, y)

    def fuse(dy, dt, y):
        del dt  # the increment already integrated over the step
        return jax.tree.map(jnp.add, y, dy)

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_implicit_foster2_general_term(drift, diffusion, bm, *,
                                       substeps: int = 1,
                                       newton_iters: int = 8,
                                       krylov: bool = True) -> XDETerm:
    """Drift-implicit cubic polynomial-path method for GENERAL (matrix)
    ADDITIVE noise: :func:`make_implicit_foster2_term` with ``G(t) ->
    [..., D, M]`` (per-channel cubic paths, HIGHEST-precision contraction)."""

    def move(t, dt, y):
        t1 = t + dt
        w, u, k = bm(t, t1, return_U=True, return_K=True)  # [..., M] each
        a, b, c = _cubic_path_coeffs(w, u, k, dt)
        mv = lambda g, z: jnp.einsum("...dm,...m->...d", g, z,
                                     precision=jax.lax.Precision.HIGHEST)

        def F(theta, yv):
            f_val = drift(t + theta * dt, yv)
            g_val = diffusion(t + theta * dt, yv)
            qp = 3 * a * theta**2 + 2 * b * theta + c
            return jnp.asarray(dt, f_val.dtype) * f_val + mv(g_val, qp)

        y1 = _sdirk4_theta(F, y, substeps, newton_iters, krylov)
        return y1 - y

    def fuse(dy, dt, y):
        del dt
        return jax.tree.map(jnp.add, y, dy)

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


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
    import numpy as np

    try:
        arr = np.asarray(t_span)
        return float(arr.min()), float(arr.max())
    except (TypeError, jax.errors.TracerArrayConversionError):
        return jnp.min(t_span), jnp.max(t_span)


def _general_fuse(dy, dt, y):
    f_val, g_dw = dy
    return jax.tree.map(
        lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl, y, f_val, g_dw
    )


def make_general_euler_term(drift, diffusion, bm) -> XDETerm:
    """Euler–Maruyama for GENERAL (matrix) noise: dy = f dt + G(t, y) dW with
    state ``y [..., D]``, diffusion ``G(t, y) -> [..., D, M]`` and an
    M-dimensional Brownian motion (``bm`` size ``y.shape[:-1] + (M,)``).

    Capability beyond the reference's diagonal-only ``BaseSDE.move``
    (``xde/base_sde.py:55-58``). Strong order 0.5.
    """

    def move(t, dt, y):
        d_w = bm(t, t + dt)  # [..., M]
        f_val = drift(t, y)
        g_val = diffusion(t, y)  # [..., D, M]
        g_dw = jnp.einsum("...dm,...m->...d", g_val, d_w,
                          precision=jax.lax.Precision.HIGHEST)
        return (f_val, g_dw)

    return XDETerm(move=move, fuse=_general_fuse, additive=False, kind="sde")


def make_general_milstein_term(drift, diffusion, bm, *, use_area: bool = True) -> XDETerm:
    """Milstein for GENERAL (matrix) noise — strong order 1.0:

        y1 = y + f h + G ΔW + Σ_{j1,j2} (∂G_{·j2}/∂y · G_{·j1}) I(j1,j2)
        I(j1,j2) = (ΔW_{j1} ΔW_{j2} − h δ_{j1j2}) / 2 + A_{j1,j2}

    The directional derivatives come from M ``jvp``s of the diffusion (one per
    noise column, vmapped). ``A`` is the antisymmetric Lévy area from the
    tree's Davie/Foster approximation (``brownian_interval.py:81-107`` math);
    with ``use_area=False`` the A term is dropped — EXACT for commutative
    noise (where ∂G_{·j2}·G_{·j1} is symmetric in (j1,j2) and A cancels
    identically), wrong diffusion law otherwise. Strong order is pinned by a
    measured-convergence test on a two-noise commutative GBM closed form and
    a variance test on the non-commutative Lévy-area triple.
    """

    def move(t, dt, y):
        t1 = t + dt
        if use_area:
            d_w, _, a_mat = bm(t, t1, return_U=True, return_A=True)
        else:
            d_w, a_mat = bm(t, t1), None
        f_val = drift(t, y)
        g_val = diffusion(t, y)  # [..., D, M]
        m = g_val.shape[-1]
        h = jnp.asarray(dt, g_val.dtype)

        def dcol(tangent):
            # ∂G/∂y · tangent, tangent [..., D] -> [..., D, M]
            return jax.jvp(lambda y_: diffusion(t, y_), (y,), (tangent,))[1]

        tangents = jnp.moveaxis(g_val, -1, 0)  # [M, ..., D]
        dg_all = jax.vmap(dcol)(tangents)  # [M, ..., D, M]

        eye = jnp.eye(m, dtype=g_val.dtype)
        i_mat = 0.5 * (d_w[..., :, None] * d_w[..., None, :] - h * eye)
        if a_mat is not None:
            i_mat = i_mat + a_mat
        corr = jnp.einsum("j...dk,...jk->...d", dg_all, i_mat,
                          precision=jax.lax.Precision.HIGHEST)
        g_dw = jnp.einsum("...dm,...m->...d", g_val, d_w,
                          precision=jax.lax.Precision.HIGHEST) + corr
        return (f_val, g_dw)

    return XDETerm(move=move, fuse=_general_fuse, additive=False, kind="sde")


def noise_drift_correction(diffusion, noise: str = "diagonal"):
    """The Itô correction field ``Σ_j (∂G_{·j}/∂y)·G_{·j}`` as ``corr(t, y)``
    for each noise contract — the single shared kernel behind time reversal
    (coefficient +1, ``_reversed_*_ito_fns``) and the Itô↔Stratonovich
    converters (coefficient ∓½, ``functional/calculus.py``).

    Contracts: 'diagonal' (elementwise g·∂g/∂y via jvp-with-ones — exact
    for diagonal-Jacobian diffusions), 'scalar' (one channel, coupled g:
    the DIRECTIONAL (∂g/∂y)·g — the elementwise form is wrong for coupled
    g, see CLAUDE.md), 'general' (matrix G: the column trace). Every
    branch evaluates the diffusion ONCE (``jax.linearize``).
    """
    if noise not in ("diagonal", "scalar", "general"):
        raise ValueError(
            f"noise must be 'diagonal', 'scalar' or 'general', got {noise!r}"
        )

    def corr(t, y):
        if noise == "general":
            g_val, lin = jax.linearize(lambda y_: diffusion(t, y_), y)
            cols = jnp.moveaxis(g_val, -1, 0)  # [M, ..., D]
            dg_all = jax.vmap(lin)(cols)  # [M, ..., D, M]
            return jnp.einsum("j...dj->...d", dg_all)
        if noise == "scalar":
            g_val, lin = jax.linearize(lambda y_: diffusion(t, y_), y)
            return lin(g_val)
        g_val, dg = jax.jvp(
            lambda y_: diffusion(t, y_), (y,),
            (jax.tree.map(jnp.ones_like, y),),
        )
        return jax.tree.map(lambda g, d: g * d, g_val, dg)

    return corr


def _reversed_ito_fns(drift, diffusion, bm):
    """Time-reversal substitution (s = -t) for an Itô SDE.

    Naive backward EM carries a systematic O(1) bias of -g·(∂g/∂y)·T (the
    backward Itô integral has the opposite endpoint convention); adding
    g·∂g/∂y to the reversed drift cancels it. ∂g/∂y computed by
    jvp-with-ones — exact for elementwise (diagonal-Jacobian) diffusions,
    the diagonal-noise contract of this API. The reversed system is itself
    an Itô SDE, so any Itô scheme (EM, Milstein) applies to it unchanged.
    """

    corr = noise_drift_correction(diffusion, "diagonal")

    def drift_rev(s, y):
        t = -s
        return jax.tree.map(
            lambda f, c: -f + c, drift(t, y), corr(t, y)
        )

    return drift_rev, (lambda s, y: diffusion(-s, y)), ReverseBrownian(bm)


def _reversed_scalar_ito_fns(drift, diffusion, bm):
    """Time-reversal substitution (s = -t) for a SCALAR-noise Itô SDE with a
    general (non-diagonal) diffusion ``g(t, y) -> y.shape``.

    The reversal drift correction is the m=1 case of the general matrix
    form: ``+(∂g/∂y)·g`` as a DIRECTIONAL derivative (one jvp along g) —
    NOT the elementwise jvp-with-ones of ``_reversed_ito_fns``, which is
    only exact for diagonal Jacobians."""

    corr = noise_drift_correction(diffusion, "scalar")

    def drift_rev(s, y):
        t = -s
        return jax.tree.map(
            lambda f, c: -f + c, drift(t, y), corr(t, y)
        )

    return drift_rev, (lambda s, y: diffusion(-s, y)), ReverseBrownian(bm)


def _reversed_general_ito_fns(drift, diffusion, bm):
    """Time-reversal substitution (s = -t) for a GENERAL (matrix) noise Itô
    SDE ``dy = f dt + G dW`` with ``G(t, y) -> [..., D, M]``.

    The pathwise backward Itô integral carries the matrix analogue of the
    diagonal ``+g·∂g/∂y`` correction:

        f̃(s, y) = -f(-s, y) + Σ_j (∂G_{·j}/∂y) · G_{·j}(-s, y)

    (for diagonal G this reduces exactly to ``_reversed_ito_fns``'s term).
    The directional derivatives come from M jvps of the diffusion, one per
    noise column (the same machinery as ``make_general_milstein_term``); the
    correction is the trace ``Σ_j dG[j, ..., d, j]``. ReverseBrownian supplies
    ΔW̃ = -ΔW and Ã = -A, so euler_general / milstein_general /
    milstein_commutative apply to the reversed system unchanged. Strong
    orders on the reversed path are pinned by measured-convergence tests."""

    corr = noise_drift_correction(diffusion, "general")

    def drift_rev(s, y):
        t = -s
        return -drift(t, y) + corr(t, y)

    return drift_rev, (lambda s, y: diffusion(-s, y)), ReverseBrownian(bm)


def _reversed_stratonovich_fns(drift, diffusion, bm):
    """Time-reversal substitution for a STRATONOVICH SDE: no drift correction
    (Stratonovich calculus is time-symmetric) — just negate the drift and
    retrace the path."""
    return (
        (lambda s, y: jax.tree.map(jnp.negative, drift(-s, y))),
        (lambda s, y: diffusion(-s, y)),
        ReverseBrownian(bm),
    )


def make_sde_term(drift, diffusion, bm, *, reverse: bool = False) -> XDETerm:
    """Build the SDE term; with ``reverse``, drift/diffusion/noise are the
    substituted-time (s = -t) forms so the solve runs over an increasing span."""
    if reverse:
        drift, diffusion, bm = _reversed_ito_fns(drift, diffusion, bm)

    def move(t, dt, y):
        d_w = bm(t, t + dt)
        f_val = drift(t, y)
        g_val = diffusion(t, y)
        # diagonal noise: dW matches the (single-array) state shape
        g_dw = jax.tree.map(lambda g: g * d_w, g_val)
        return (f_val, g_dw)

    def fuse(dy, dt, y):
        f_val, g_dw = dy
        return jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl, y, f_val, g_dw
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


# options vocabulary of the adaptive engine (solver/sde_adaptive.py)
_SDE_ADAPTIVE_KEYS = {
    "first_step", "safety", "ifactor", "dfactor", "min_step", "max_step",
    "max_num_steps", "norm", "error_order", "return_stats", "time_dtype",
}

# scheme -> LOCAL strong order (global strong order + 1/2): the default
# exponent of the adaptive dt controller (err^(-1/order)); euler and
# heun_stratonovich fall through to 1.0
_SDE_LOCAL_ORDER = {
    "milstein": 1.5, "implicit_milstein": 1.5, "drift_implicit_milstein": 1.5, "milstein_general": 1.5, "general_milstein": 1.5,
    "milstein_commutative": 1.5, "commutative_milstein": 1.5,
    "weak2": 1.5, "platen_weak2": 1.5, "weak2_platen": 1.5,
    "weak2_general": 1.5, "general_weak2": 1.5,
    "sra1": 2.0, "sra1_general": 2.0, "general_sra1": 2.0,
    "implicit_sra1": 2.0, "drift_implicit_sra1": 2.0,
    "implicit_sra1_general": 2.0, "general_implicit_sra1": 2.0,
    "implicit_foster2": 2.5, "drift_implicit_foster2": 2.5,
    "implicit_foster2_general": 2.5, "general_implicit_foster2": 2.5,
    "sriw1": 2.0, "taylor15": 2.0, "ito_taylor15": 2.0,
    "taylor15_general": 2.0, "general_taylor15": 2.0,
    "taylor15_commutative": 2.0, "commutative_taylor15": 2.0,
    "foster2": 2.5, "foster": 2.5, "foster2_general": 2.5,
    "general_foster2": 2.5,
    "reversible_heun": 1.0, "heun_reversible": 1.0,
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
    opts.setdefault("error_order", _SDE_LOCAL_ORDER.get(solver_name, 1.0))
    return solve_sde_adaptive(term, y0, span, rtol=rtol, atol=atol, **opts)


def _default_bm_for_scheme(
    solver_name, leaf, t_lo, t_hi, key, levy_area_approximation, noise_dim
):
    """Single source of truth for the default BrownianInterval ``sdeint``
    builds when ``bm`` is omitted: the scheme-appropriate Lévy mode (sra1/
    sriw1/taylor15-class need (W, I10); foster2 the (W, I10, K) triple;
    milstein_general/taylor15_general full Davie areas) and the
    scheme-appropriate size (matrix-noise schemes: ``leaf.shape[:-1]+(M,)``;
    taylor15's scalar channel: ``+(1,)``; diagonal contract: ``leaf.shape``).
    Shared with :func:`sdeint_weak_mc` (antithetic construction needs the bm
    object up front to wrap)."""
    need_levy = solver_name in (
        "sra1", "sriw1", "sra1_general", "general_sra1", "taylor15",
        "ito_taylor15", "taylor15_commutative", "commutative_taylor15",
        "implicit_sra1", "drift_implicit_sra1",
        "implicit_sra1_general", "general_implicit_sra1",
    )
    need_k = solver_name in (
        "foster2", "foster", "foster2_general", "general_foster2",
        "implicit_foster2", "drift_implicit_foster2",
        "implicit_foster2_general", "general_implicit_foster2",
    )
    need_area = solver_name in (
        "milstein_general", "general_milstein", "taylor15_general",
        "general_taylor15",
    )
    is_general = solver_name in (
        "euler_general", "general_euler", "milstein_general",
        "general_milstein", "milstein_commutative", "commutative_milstein",
        "sra1_general", "general_sra1", "foster2_general", "general_foster2",
        "weak2_general", "general_weak2", "taylor15_general",
        "general_taylor15", "taylor15_commutative", "commutative_taylor15",
        "implicit_sra1_general", "general_implicit_sra1",
        "implicit_foster2_general", "general_implicit_foster2",
    )
    if need_levy and levy_area_approximation == "none":
        levy_area_approximation = "space-time"
    if need_k:
        levy_area_approximation = "space-time-time"
    if need_area and levy_area_approximation in ("none", "space-time"):
        levy_area_approximation = "davie"
    if is_general:
        if noise_dim is None:
            raise ValueError(
                "general-noise solvers need the Brownian dimension: pass "
                "noise_dim=M (bm size becomes y.shape[:-1] + (M,)) or an "
                "explicit bm"
            )
        size = leaf.shape[:-1] + (noise_dim,)
    elif solver_name in ("taylor15", "ito_taylor15"):
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
    is_rev_heun = solver_name in ("reversible_heun", "heun_reversible")
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
    is_milstein = solver_name == "milstein"
    is_implicit_em = solver_name in (
        "implicit_em", "implicit_euler_maruyama", "drift_implicit_euler",
        "stochastic_theta",
    )
    is_implicit_milstein = solver_name in (
        "implicit_milstein", "drift_implicit_milstein",
    )
    is_sra1 = solver_name == "sra1"
    is_implicit_sra1 = solver_name in ("implicit_sra1", "drift_implicit_sra1")
    is_general_implicit_sra1 = solver_name in (
        "implicit_sra1_general", "general_implicit_sra1",
    )
    is_implicit_foster2 = solver_name in (
        "implicit_foster2", "drift_implicit_foster2",
    )
    is_general_implicit_foster2 = solver_name in (
        "implicit_foster2_general", "general_implicit_foster2",
    )
    is_sriw1 = solver_name == "sriw1"
    is_heun_strat = solver_name in ("heun_stratonovich", "stratonovich_heun")
    is_foster2 = solver_name in ("foster2", "foster")
    is_taylor15 = solver_name in ("taylor15", "ito_taylor15")
    is_weak2 = solver_name in ("weak2", "platen_weak2", "weak2_platen")
    is_general_weak2 = solver_name in ("weak2_general", "general_weak2")
    is_general_euler = solver_name in ("euler_general", "general_euler")
    is_general_sra1 = solver_name in ("sra1_general", "general_sra1")
    is_general_foster2 = solver_name in ("foster2_general", "general_foster2")
    is_general_milstein = solver_name in ("milstein_general", "general_milstein")
    is_comm_milstein = solver_name in (
        "milstein_commutative", "commutative_milstein"
    )
    is_general_taylor15 = solver_name in ("taylor15_general", "general_taylor15")
    is_comm_taylor15 = solver_name in (
        "taylor15_commutative", "commutative_taylor15"
    )
    is_general = (is_general_euler or is_general_milstein or is_comm_milstein
                  or is_general_sra1 or is_general_foster2 or is_general_weak2
                  or is_general_taylor15 or is_comm_taylor15
                  or is_general_implicit_sra1 or is_general_implicit_foster2)

    # scheme-construction knobs ride in options and are POPPED here (the
    # driver/adaptive option validators must not see them)
    implicit_kw = {}
    if (is_implicit_em or is_implicit_milstein or is_implicit_sra1
            or is_general_implicit_sra1 or is_implicit_foster2
            or is_general_implicit_foster2):
        options = dict(options or {})
        knobs = ("theta", "newton_iters", "krylov")
        if is_implicit_foster2 or is_general_implicit_foster2:
            knobs = ("newton_iters", "krylov", "substeps")
        for kname in knobs:
            if kname in options:
                implicit_kw[kname] = options.pop(kname)
        if not is_implicit_em and "theta" in implicit_kw:
            raise ValueError(
                "theta applies to implicit_em/stochastic_theta only "
                "(the other drift-implicit schemes are fully implicit forms)"
            )
    taylor_kw = {}
    if is_general_taylor15:
        options = dict(options or {})
        if "triple_substeps" in options:
            taylor_kw["triple_substeps"] = int(options.pop("triple_substeps"))

    need_levy = (is_sra1 or is_sriw1 or is_general_sra1 or is_taylor15
                 or is_comm_taylor15 or is_implicit_sra1
                 or is_general_implicit_sra1)
    need_k = (is_foster2 or is_general_foster2 or is_implicit_foster2
              or is_general_implicit_foster2)
    if bm is None:
        t_lo, t_hi = _span_bounds(t_span)
        bm = _default_bm_for_scheme(
            solver_name, leaves[0], t_lo, t_hi, key,
            levy_area_approximation, noise_dim,
        )
    elif need_levy and getattr(bm, "levy_area_approximation", "none") == "none":
        raise ValueError(
            f"{solver} needs the space-time integral: construct the Brownian "
            "motion with levy_area_approximation='space-time'"
        )
    elif need_k and getattr(
        bm, "levy_area_approximation", "none"
    ) != "space-time-time":
        raise ValueError(
            f"{solver} needs the space-time-time integral K: construct the "
            "Brownian motion with levy_area_approximation='space-time-time'"
        )
    if is_general_milstein or is_general_taylor15:
        commutative_alt = (
            "milstein_commutative" if is_general_milstein
            else "taylor15_commutative"
        )
        if getattr(bm, "levy_area_approximation", "none") not in ("davie", "foster", "fourier"):
            raise ValueError(
                f"{solver} needs full Lévy areas: construct the "
                "Brownian motion with levy_area_approximation='davie', 'fourier' or "
                f"'foster' (or use {commutative_alt} if the noise commutes)"
            )
        if len(getattr(bm, "shape", ())) < 2:
            raise ValueError(
                f"{solver} needs bm size [..., M] with at least a "
                "batch axis: a 1-D bm is treated as independent scalar "
                "Brownian motions whose Lévy area is zero (add a leading "
                "batch axis of 1)"
            )

    if not (is_milstein or is_sra1 or is_sriw1 or is_heun_strat or is_general
            or is_foster2 or is_taylor15 or is_weak2 or is_rev_heun
            or is_implicit_em or is_implicit_milstein or is_implicit_sra1
            or is_implicit_foster2):
        from ..solver.registry import resolve_solver

        spec = resolve_solver(solver)
        if spec.kind != "fixed" or spec.implicit or spec.name != "euler":
            # The reference nominally routed SDE terms through its whole fixed
            # zoo, but multi-stage RK drivers sample each stage's Brownian
            # increment on the stage's own sub-interval and fuse it unscaled —
            # midpoint's noise variance comes out dt/2 instead of dt and rk4's
            # ~dt/8 with cross-step correlation. That is a wrong diffusion law,
            # not a higher-order SDE scheme, so we refuse instead of silently
            # under-dispersing (deliberate deviation from the reference's
            # anything-goes solver plumbing, SURVEY §2.11-2).
            raise ValueError(
                f"sdeint got solver={spec.name!r}: multi-stage deterministic RK "
                "steppers mis-weight the Brownian increment (understated noise "
                "variance). Use 'euler' (Euler-Maruyama) or a dedicated SDE "
                "scheme: milstein / implicit_em / implicit_milstein / sra1 / "
                "implicit_sra1 / sriw1 / foster2 / implicit_foster2 / "
                "taylor15 / weak2 / heun_stratonovich / "
                "reversible_heun (+ the *_general matrix-noise variants)."
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
        if is_general:
            # reversed system: drift gets the matrix correction
            # Σ_j (∂G_{·j}/∂y)·G_{·j} (zero for additive G); ReverseBrownian
            # supplies ΔW̃=-ΔW, Ĩ10~=U-h·ΔW, Ã=-A
            rev = _reversed_general_ito_fns(drift, diffusion, bm)
            if is_general_euler:
                term = make_general_euler_term(*rev)
            elif is_general_weak2:
                # the reversed system is an ordinary Itô SDE; the weak
                # scheme applies unchanged (reverse accuracy is weak-order,
                # not a pathwise retrace)
                term = make_weak2_general_term(*rev)
            elif is_general_sra1:
                term = make_general_sra1_term(*rev)
            elif is_general_implicit_sra1:
                # additive G: matrix correction vanishes; the drift-implicit
                # stages apply to the reversed system unchanged
                term = make_implicit_sra1_general_term(*rev, **implicit_kw)
            elif is_general_implicit_foster2:
                term = make_implicit_foster2_general_term(*rev, **implicit_kw)
            elif is_general_foster2:
                # additive G: the matrix correction vanishes, the reversed
                # system stays additive, ReverseBrownian supplies the exact
                # reversed (ΔW̃, Ĩ10, K̃) triple (K̃ = h·U − K − h²ΔW/2)
                term = make_foster2_general_term(*rev)
            elif is_general_taylor15 or is_comm_taylor15:
                # the reversed (matrix-corrected) system is an ordinary Itô
                # SDE; the Taylor scheme applies with ReverseBrownian's
                # (ΔW̃, Ũ, Ã) algebra
                term = make_general_taylor15_term(
                    *rev, use_area=is_general_taylor15, **taylor_kw
                )
            else:
                term = make_general_milstein_term(
                    *rev, use_area=is_general_milstein
                )
            solver = "euler"
        elif is_milstein:
            # the reversed (Itô-corrected) system is itself an Itô SDE, so
            # Milstein applies unchanged for strong order 1 on the way back
            term = make_milstein_term(*_reversed_ito_fns(drift, diffusion, bm))
            solver = "euler"
        elif is_implicit_em:
            # reversed Itô system: the drift-implicit theta step applies
            term = make_implicit_em_term(
                *_reversed_ito_fns(drift, diffusion, bm), **implicit_kw
            )
            solver = "euler"
        elif is_implicit_milstein:
            term = make_implicit_milstein_term(
                *_reversed_ito_fns(drift, diffusion, bm), **implicit_kw
            )
            solver = "euler"
        elif is_sra1:
            # additive noise: the reversal correction g·∂g/∂y vanishes, the
            # reversed system stays additive, and ReverseBrownian supplies the
            # exact reversed (ΔW̃, Ĩ10) pair — SRA1 applies unchanged.
            # Strong order ~1.5 on the reversed path is pinned by test.
            term = make_sra1_term(*_reversed_ito_fns(drift, diffusion, bm))
            solver = "euler"
        elif is_implicit_sra1:
            # additive: same reversal algebra as sra1 (correction vanishes)
            term = make_implicit_sra1_term(
                *_reversed_ito_fns(drift, diffusion, bm), **implicit_kw
            )
            solver = "euler"
        elif is_implicit_foster2:
            # additive: reversed system stays additive; ReverseBrownian
            # supplies the exact reversed (ΔW̃, Ĩ10, K̃) triple
            term = make_implicit_foster2_term(
                *_reversed_ito_fns(drift, diffusion, bm), **implicit_kw
            )
            solver = "euler"
        elif is_foster2:
            # additive: reversed system stays additive; ReverseBrownian
            # supplies the exact reversed (ΔW̃, Ĩ10, K̃) triple
            term = make_foster2_term(*_reversed_ito_fns(drift, diffusion, bm))
            solver = "euler"
        elif is_sriw1:
            # diagonal noise: the reversed system is an Itô SDE with drift
            # -f + g·∂g/∂y and the same diagonal structure; I11/I111 are
            # closed-form in ΔW̃ and Ĩ10 comes exact from ReverseBrownian.
            # Strong order ~1.5 on the reversed path is pinned by test
            # against the closed-form reversed GBM on the same path.
            term = make_sriw1_term(*_reversed_ito_fns(drift, diffusion, bm))
            solver = "euler"
        elif is_taylor15:
            # scalar noise: reversed drift gets the DIRECTIONAL correction
            # (∂g/∂y)·g (m=1 case of the matrix form); the reversed system
            # is an ordinary Itô SDE, so the Taylor scheme applies unchanged
            # with ReverseBrownian's exact (ΔW̃, Ĩ10)
            term = make_taylor15_term(
                *_reversed_scalar_ito_fns(drift, diffusion, bm)
            )
            solver = "euler"
        elif is_weak2:
            # diagonal contract: elementwise reversal correction; the
            # reversed system is an Itô SDE, weak2 applies unchanged
            term = make_weak2_term(*_reversed_ito_fns(drift, diffusion, bm))
            solver = "euler"
        elif is_heun_strat:
            term = make_heun_stratonovich_term(
                *_reversed_stratonovich_fns(drift, diffusion, bm)
            )
            solver = "euler"
        else:
            term = make_sde_term(drift, diffusion, bm, reverse=True)
        stats = None
        if adaptive:
            out = _solve_adaptive_sde(
                term, y0, span, solver_name, rtol, atol, options
            )
            sol, stats = out if isinstance(out, tuple) else (out, None)
        else:
            sol = integrate_term(
                term, y0, span, solver, rtol=rtol, atol=atol, options=options,
                time_axis=0,
            )
        if not _is_decreasing(t_span):  # reverse flag with increasing span:
            sol = jax.tree.map(lambda a: a[::-1], sol)  # report in given order
        sol = format_solution(sol, time_axis)
        return (sol, stats) if stats is not None else sol

    if is_milstein:
        term = make_milstein_term(drift, diffusion, bm)
        solver = "euler"  # the update lives in move/fuse; the driver is the
        # plain one-eval-per-step fixed stepper
    elif is_implicit_em:
        term = make_implicit_em_term(drift, diffusion, bm, **implicit_kw)
        solver = "euler"
    elif is_implicit_milstein:
        term = make_implicit_milstein_term(drift, diffusion, bm, **implicit_kw)
        solver = "euler"
    elif is_sra1:
        term = make_sra1_term(drift, diffusion, bm)
        solver = "euler"
    elif is_implicit_sra1:
        term = make_implicit_sra1_term(drift, diffusion, bm, **implicit_kw)
        solver = "euler"
    elif is_general_implicit_sra1:
        term = make_implicit_sra1_general_term(drift, diffusion, bm,
                                               **implicit_kw)
        solver = "euler"
    elif is_implicit_foster2:
        term = make_implicit_foster2_term(drift, diffusion, bm, **implicit_kw)
        solver = "euler"
    elif is_general_implicit_foster2:
        term = make_implicit_foster2_general_term(drift, diffusion, bm,
                                                  **implicit_kw)
        solver = "euler"
    elif is_sriw1:
        term = make_sriw1_term(drift, diffusion, bm)
        solver = "euler"
    elif is_foster2:
        term = make_foster2_term(drift, diffusion, bm)
        solver = "euler"
    elif is_taylor15:
        term = make_taylor15_term(drift, diffusion, bm)
        solver = "euler"
    elif is_weak2:
        term = make_weak2_term(drift, diffusion, bm)
        solver = "euler"
    elif is_general_weak2:
        term = make_weak2_general_term(drift, diffusion, bm)
        solver = "euler"
    elif is_general_foster2:
        term = make_foster2_general_term(drift, diffusion, bm)
        solver = "euler"
    elif is_heun_strat:
        term = make_heun_stratonovich_term(drift, diffusion, bm)
        solver = "euler"
    elif is_general_euler:
        term = make_general_euler_term(drift, diffusion, bm)
        solver = "euler"
    elif is_general_sra1:
        term = make_general_sra1_term(drift, diffusion, bm)
        solver = "euler"
    elif is_general_milstein:
        term = make_general_milstein_term(drift, diffusion, bm, use_area=True)
        solver = "euler"
    elif is_comm_milstein:
        term = make_general_milstein_term(drift, diffusion, bm, use_area=False)
        solver = "euler"
    elif is_general_taylor15:
        term = make_general_taylor15_term(drift, diffusion, bm, use_area=True,
                                          **taylor_kw)
        solver = "euler"
    elif is_comm_taylor15:
        term = make_general_taylor15_term(drift, diffusion, bm, use_area=False)
        solver = "euler"
    else:
        term = make_sde_term(drift, diffusion, bm)
    if adaptive:
        out = _solve_adaptive_sde(
            term, y0, t_span, solver_name, rtol, atol, options
        )
        if isinstance(out, tuple):
            sol, stats = out
            return format_solution(sol, time_axis), stats
        return format_solution(out, time_axis)
    return integrate_term(
        term, y0, t_span, solver, rtol=rtol, atol=atol, options=options,
        time_axis=time_axis,
    )
