"""Drift-implicit (stiff) SDE schemes: the stochastic theta family and the
L-stable additive ladder (SDIRK2/SDIRK4 cores).

Moved verbatim from ``functional/sdeint.py`` in the round-4 registry split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ...xde.term import XDETerm
from .common import _cubic_path_coeffs

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

    from ...solver.implicit import _stage_newton_solve

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


# Stage-noise injections of the DAMPED stiffly-accurate variant, derived
# from the strong-1.5 additive order conditions with y1 = H2 (see
# make_implicit_sra1_damped_term): n1 = g0·(A1·ΔW + B1·I10/h) must supply
# the f′g·I10 term THROUGH stage 1's drift coupling while cancelling the
# spurious γ·h·ΔW·f′g term that stage 2's direct ΔW injection creates:
#   (1−γ)·B1 = 1           →  B1 = 1/(1−γ)
#   (1−γ)·A1 + γ = 0       →  A1 = −γ/(1−γ)
_ISRA1D_A1 = -_ISRA1_GAMMA / (1.0 - _ISRA1_GAMMA)
_ISRA1D_B1 = 1.0 / (1.0 - _ISRA1_GAMMA)


def make_implicit_sra1_damped_term(drift, diffusion, bm, *,
                                   newton_iters: int = 8,
                                   krylov: bool = True) -> XDETerm:
    """STIFFLY-ACCURATE drift-implicit strong-1.5 scheme for ADDITIVE
    diagonal noise with a DAMPED large-λ·dt noise response — the ROADMAP
    round-4 follow-on to :func:`make_implicit_sra1_term`.

    Same L-stable SDIRK2 drift core (Alexander, γ = 1−√2/2), but y1 IS the
    last stage (stiffly accurate) and EVERY noise term enters through a
    stage base, so the whole step — noise included — passes through the
    1/(1−γλh) stage solves:

        H1 = y + γh f(t+γh, H1) + g(t0)(A1·ΔW + B1·I10/h)
        H2 = y + (1−γ)h f1 + γh f(t1, H2)
                 + g(t1)(ΔW − I10/h) + g(t0)·I10/h
        y1 = H2

    with A1 = −γ/(1−γ), B1 = 1/(1−γ) re-solved from the strong-1.5 order
    conditions for THIS structure (module constants above): stage 2's base
    carries SRA1's exact (ΔW, I10) combination directly (gΔW + ∂t g·I01),
    and stage 1's injection both supplies f′g·I10 through the drift
    coupling and cancels the γ·hΔW·f′g term the direct ΔW injection
    creates. Consequences, all test-pinned:

    - strong order ~1.5 on the same-path OU oracle (identical regime to
      implicit_sra1);
    - λh → −∞: y1 → 0 including the noise. The closed-form discrete
      stationary m2 (the (W, U)-Gaussian response of the linear map,
      derived in the tests) stays within +16% of the exact σ²/(2θ) at
      EVERY θ·h — peak ratio ~1.154 at θ·h ≈ 5, ~1.03 at θ·h = 10 where
      implicit_sra1's undamped final noise measures ~7× — then damps
      toward zero as θ·h → ∞ (the safe direction for white-noise-forced
      SPDE fast modes; implicit_foster2 remains the choice when the
      stationary law must be accurate at extreme λ·dt, this scheme when
      a single L-stable SDIRK2-core step must never overdisperse).

    No reference counterpart (``paddlexde/functional/sdeint.py:9-37`` is
    broken explicit EM). Validated by MEASURED strong order vs the OU
    closed form on the same path, per the repo convention.
    """
    g_c = _ISRA1_GAMMA

    def move(t, dt, y):
        t1 = t + dt
        w, u = bm(t, t1, return_U=True)
        safe_dt = jnp.where(dt == 0, jnp.ones_like(jnp.asarray(dt)), dt)
        i10_h = jax.tree.map(lambda ul: ul / jnp.asarray(safe_dt, ul.dtype),
                             u)
        g0 = diffusion(t, y)
        g1 = diffusion(t1, y)

        base1 = jax.tree.map(
            lambda yl, gl, wl, il: yl
            + gl * (_ISRA1D_A1 * wl + _ISRA1D_B1 * il),
            y, g0, w, i10_h,
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
        noise = jax.tree.map(
            lambda g0l, g1l, wl, il: g1l * (wl - il) + g0l * il,
            g0, g1, w, i10_h,
        )
        base2 = jax.tree.map(
            lambda yl, fl, nl: yl
            + (1.0 - g_c) * jnp.asarray(dt, yl.dtype) * fl + nl,
            y, f1, noise,
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
        f_comb = jax.tree.map(
            lambda a, b: (1.0 - g_c) * a + g_c * b, f1, f2
        )
        return (f_comb, noise)

    def fuse(dy, dt, y):
        # y1 = H2 = y + h[(1−γ)f1 + γf2] + n2 — the stiffly-accurate
        # identity, algebraically rearranged into the shared fuse form
        f_val, noise = dy
        return jax.tree.map(
            lambda yl, fl, nl: yl + jnp.asarray(dt, yl.dtype) * fl + nl,
            y, f_val, noise,
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_implicit_sra1_damped_general_term(drift, diffusion, bm, *,
                                           newton_iters: int = 8,
                                           krylov: bool = True) -> XDETerm:
    """Damped stiffly-accurate strong-1.5 scheme for GENERAL (matrix)
    ADDITIVE noise: :func:`make_implicit_sra1_damped_term` with
    ``G(t) -> [..., D, M]`` against an M-dimensional Brownian motion (the
    additive columns are independent, so the scalar derivation applies per
    column through the einsum contraction)."""
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

        base1 = y + mv(g0, _ISRA1D_A1 * w + _ISRA1D_B1 * i10_h)
        h1 = _drift_implicit_solve(drift, t + g_c * dt, dt, base1, g_c,
                                   newton_iters, krylov)
        gdt = jnp.asarray(g_c, jnp.result_type(dt)) * safe_dt
        f1 = jnp.where(dt == 0, jnp.zeros_like(h1),
                       (h1 - base1) / jnp.asarray(gdt, h1.dtype))
        noise = mv(g1, w - i10_h) + mv(g0, i10_h)
        base2 = (y + (1.0 - g_c) * jnp.asarray(dt, y.dtype) * f1 + noise)
        h2 = _drift_implicit_solve(drift, t1, dt, base2, g_c,
                                   newton_iters, krylov)
        f2 = jnp.where(dt == 0, jnp.zeros_like(h2),
                       (h2 - base2) / jnp.asarray(gdt, h2.dtype))
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

    from ...solver.implicit import _stage_newton_solve

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
