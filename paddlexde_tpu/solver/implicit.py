"""Implicit (backward) Euler for stiff systems — on-device Newton iterations.

The reference's only stiff-capable path is the host-side scipy LSODA bridge
(``solver/base_scipy_solver.py`` in DrownFish19/PaddleXDE), unusable on TPU.
This solver keeps stiff problems on-device: each step solves

    y1 = y0 + dt * f(t1, y1)

by Newton iteration with the Jacobian assembled through ``jax.linearize`` (one
vector-field trace per iteration; the primal is reused for the residual) and a
dense ``jnp.linalg.solve`` — A-stable (order 1), so dt is limited by accuracy,
not stability (pinned by a stiffness test: lambda = -1000 with dt = 0.1 stays
bounded where explicit Euler diverges). Two linear-algebra backends:

- dense (``implicit_euler``): Jacobian materialized via ``vmap(jvp)`` over the
  identity + ``jnp.linalg.solve`` — right for small/medium states (O(D^2)
  memory, O(D^3) solve, but ONE fused MXU solve per Newton iteration).
- matrix-free Newton--Krylov (``implicit_euler_krylov``): GMRES on the
  operator ``v -> v - dt * (J @ v)`` where ``J @ v`` is a single ``jvp`` —
  never materializes J, so it scales to large semi-discretized PDE states
  (O(D * restart) memory). Pinned against the dense solver on a stiff 1-D
  heat equation (method-of-lines Laplacian).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..xde.term import XDETerm

__all__ = [
    "implicit_midpoint_step",
    "make_implicit_midpoint_step",
    "implicit_euler_step",
    "make_implicit_euler_step",
    "implicit_euler_krylov_step",
    "make_implicit_euler_krylov_step",
    "sdirk2_step",
    "sdirk2_krylov_step",
    "make_sdirk2_step",
    "sdirk3_step",
    "make_sdirk3_step",
]


def make_implicit_euler_step(newton_iters: int = 6):
    """Build an implicit-Euler step function for ``solve_fixed``."""

    def step(term: XDETerm, t0, t1, y0):
        dt = t1 - t0
        y0_flat, unravel = ravel_pytree(y0)

        def f_flat(y_flat):
            f_tree = term.move(t1, dt, unravel(y_flat))
            return ravel_pytree(f_tree)[0]

        dt_f = jnp.asarray(dt, y0_flat.dtype)
        eye = jnp.eye(y0_flat.size, dtype=y0_flat.dtype)

        def newton_body(_, y_flat):
            f_val, jvp = jax.linearize(f_flat, y_flat)
            residual = y_flat - y0_flat - dt_f * f_val
            # HIGHEST precision: same rationale as _stage_newton_solve —
            # TPU's default f32 matmul path rounds through bf16 passes,
            # leaving bf16-quality Newton deltas (review find: the fix
            # belongs at every dense Newton site, not one)
            with jax.default_matmul_precision("highest"):
                jac = jax.vmap(jvp)(eye).T  # column i = J @ e_i
                delta = jnp.linalg.solve(eye - dt_f * jac, residual)
            return y_flat - delta

        # warm start from an explicit Euler predictor; dy0 doubles as the
        # dense-output derivative the fixed driver expects
        dy0 = term.move(t0, dt, y0)
        y_init = y0_flat + dt_f * ravel_pytree(dy0)[0]
        y1_flat = jax.lax.fori_loop(0, newton_iters, newton_body, y_init)
        return unravel(y1_flat), dy0

    return step


implicit_euler_step = make_implicit_euler_step()


def make_implicit_euler_krylov_step(
    newton_iters: int = 6,
    gmres_tol: float = 1e-8,
    gmres_restart: int = 20,
    gmres_maxiter: int = 4,
    preconditioner=None,
):
    """Matrix-free Newton--Krylov implicit Euler step for ``solve_fixed``.

    Each Newton iteration solves ``(I - dt J) delta = residual`` with GMRES,
    evaluating ``J @ v`` through the ``jax.linearize`` jvp of the vector field
    (the linearization is traced once per iteration and reused for the residual
    and every Krylov matvec). Nothing of size O(D^2) is ever built, so this is
    the stiff path for large flattened states — e.g. method-of-lines PDEs —
    where the dense variant's Jacobian would not fit (measured, 1-D heat
    equation on CPU: D=2048 dense 830 ms vs Krylov 53 ms per 5-step solve;
    D=8192 dense needs a 512 MB Jacobian per Newton iteration, Krylov 372 ms).

    GMRES here is a fixed-budget inner solve (restart x maxiter matvecs,
    batched Gram-Schmidt): bounded work per step keeps the whole integration
    one compiled ``lax.scan``, and gradients flow via the implicit-function
    transpose solve (``lax.custom_linear_solve`` inside ``gmres``), not by
    unrolling Krylov iterations.

    Convergence envelope (unpreconditioned; measured on the heat-equation
    Laplacian): the inner solve resolves ``dt * ||J||`` up to ~1e5 in float32
    and ~1e6 in float64 within the default 80-matvec budget. Beyond that,
    enable x64 and/or pass ``preconditioner`` — a callable ``v -> M^-1 v``
    approximating ``(I - dt J)^-1`` (forwarded to GMRES as ``M``). Krylov
    breakdown after convergence is guarded: a non-finite GMRES result leaves
    the Newton iterate unchanged instead of poisoning the state with NaNs.
    """
    from jax.scipy.sparse.linalg import gmres

    def step(term: XDETerm, t0, t1, y0):
        dt = t1 - t0
        y0_flat, unravel = ravel_pytree(y0)

        def f_flat(y_flat):
            f_tree = term.move(t1, dt, unravel(y_flat))
            return ravel_pytree(f_tree)[0]

        dt_f = jnp.asarray(dt, y0_flat.dtype)

        def newton_body(_, y_flat):
            f_val, jvp = jax.linearize(f_flat, y_flat)
            residual = y_flat - y0_flat - dt_f * f_val
            operator = lambda v: v - dt_f * jvp(v)
            # x0 MUST be zero: warm-starting from the residual makes the
            # initial GMRES residual (I - dt J) r - r ~ dt ||J|| ||r||, which
            # destroys convergence on stiff systems (measured: err 9e3 vs 5e-3
            # at dt*lambda ~ 1.7e5 in f32)
            delta, _ = gmres(
                operator,
                residual,
                tol=gmres_tol,
                atol=0.0,
                restart=gmres_restart,
                maxiter=gmres_maxiter,
                solve_method="batched",
                M=preconditioner,
            )
            delta = jnp.where(jnp.isfinite(delta), delta, jnp.zeros_like(delta))
            return y_flat - delta

        dy0 = term.move(t0, dt, y0)
        y_init = y0_flat + dt_f * ravel_pytree(dy0)[0]
        y1_flat = jax.lax.fori_loop(0, newton_iters, newton_body, y_init)
        return unravel(y1_flat), dy0

    return step


implicit_euler_krylov_step = make_implicit_euler_krylov_step()


def _stage_newton_solve(f_at, base_flat, gamma_dt, y_init, newton_iters,
                        krylov_opts=None):
    """Solve the DIRK stage equation ``Y = base + gamma*dt * f(Y)`` by Newton.

    ``krylov_opts is None`` -> dense Jacobian + ``jnp.linalg.solve`` (one MXU
    solve per iteration); a dict -> matrix-free GMRES on the jvp operator,
    with the same zero-x0 / non-finite guards as ``implicit_euler_krylov``.
    """
    dim = base_flat.size
    eye = None if krylov_opts is not None else jnp.eye(dim, dtype=base_flat.dtype)

    def newton_body(_, y_flat):
        f_val, jvp = jax.linearize(f_at, y_flat)
        residual = y_flat - base_flat - gamma_dt * f_val
        if krylov_opts is None:
            # HIGHEST matmul precision: TPU's default f32 matmul path rounds
            # through bf16 passes, and a Newton delta solved at bf16 quality
            # leaves O(1e-2) stage errors that large-error-weight tableaus
            # (sdirk4's c_error reaches ±4) amplify into bogus error
            # estimates — measured on-chip: the sdirk4 adjoint gradient came
            # back 0.92 where 2.48 was exact, while CPU f32 was fine. The
            # matrices here are tiny; full-precision costs nothing.
            with jax.default_matmul_precision("highest"):
                jac = jax.vmap(jvp)(eye).T
                delta = jnp.linalg.solve(eye - gamma_dt * jac, residual)
        else:
            from jax.scipy.sparse.linalg import gmres

            delta, _ = gmres(
                lambda v: v - gamma_dt * jvp(v),
                residual,
                tol=krylov_opts.get("tol", 1e-8),
                atol=0.0,
                restart=krylov_opts.get("restart", 20),
                maxiter=krylov_opts.get("maxiter", 4),
                solve_method="batched",
                M=krylov_opts.get("preconditioner"),
            )
            delta = jnp.where(jnp.isfinite(delta), delta, jnp.zeros_like(delta))
        return y_flat - delta

    return jax.lax.fori_loop(0, newton_iters, newton_body, y_init)


def make_implicit_midpoint_step(newton_iters: int = 8, krylov: bool = False,
                                **krylov_opts):
    """Implicit midpoint (one-stage Gauss–Legendre): Y = y0 + dt·f(t_mid,
    (y0+Y)/2). Symmetric, A-stable, order 2, and SYMPLECTIC for EVERY
    Hamiltonian system — including non-separable ones where leapfrog's
    (q, p) splitting does not apply (det of the step's phase-space Jacobian
    is pinned to ~1e-12 in the tests; the Newton iteration converges the
    implicit map to machine precision on smooth fields). NOT L-stable:
    R(−∞) = −1 (the stage is reformulated as Z = y0 + (dt/2) f(t_mid, Z),
    Y = 2Z − y0 — one `_stage_newton_solve` with γ·dt = dt/2), so highly
    stiff transients alternate instead of damping — use sdirk2/trbdf2 for
    that regime; this scheme is for conservative/oscillatory dynamics."""

    def step(term: XDETerm, t0, t1, y0):
        dt = t1 - t0
        t_mid = t0 + 0.5 * dt
        y0_flat, unravel = ravel_pytree(y0)

        def f_at(y_flat):
            return ravel_pytree(term.move(t_mid, dt, unravel(y_flat)))[0]

        dt_f = jnp.asarray(dt, y0_flat.dtype)
        dy0 = term.move(t0, dt, y0)
        z_init = y0_flat + 0.5 * dt_f * ravel_pytree(dy0)[0]
        z = _stage_newton_solve(
            f_at, y0_flat, 0.5 * dt_f, z_init, newton_iters,
            krylov_opts if krylov else None,
        )
        return unravel(2.0 * z - y0_flat), dy0

    return step


implicit_midpoint_step = make_implicit_midpoint_step()


# Alexander's 2-stage SDIRK, gamma = 1 - sqrt(2)/2: stiffly accurate, L-stable,
# order 2 — the workhorse upgrade over backward Euler for stiff problems
# (R. Alexander, SINUM 1977, "Diagonally implicit Runge-Kutta methods for
# stiff ODEs"). Butcher tableau:
#     gamma | gamma      0
#       1   | 1-gamma  gamma
#     ------+----------------
#           | 1-gamma  gamma
_SDIRK2_GAMMA = 1.0 - 0.5 * 2.0**0.5


def make_sdirk2_step(newton_iters: int = 6, krylov: bool = False, **krylov_opts):
    """L-stable order-2 SDIRK step for ``solve_fixed``.

    Both stages solve the SAME-shaped equation ``Y = base + gamma*dt*f(t_s, Y)``
    (the point of the *singly* diagonally implicit family: one Newton/linear
    structure reused), dense-Jacobian by default or matrix-free Newton--Krylov
    with ``krylov=True``. Stiffly accurate (y1 = Y2), so no order reduction at
    the stiff limit; L-stable, so fast transients are damped, not aliased.
    """
    opts = (krylov_opts or {}) if krylov else None

    def step(term: XDETerm, t0, t1, y0):
        dt = t1 - t0
        y0_flat, unravel = ravel_pytree(y0)
        dt_f = jnp.asarray(dt, y0_flat.dtype)
        g = jnp.asarray(_SDIRK2_GAMMA, y0_flat.dtype)

        def f_flat_at(t_s):
            def f_at(y_flat):
                return ravel_pytree(term.move(t_s, dt, unravel(y_flat)))[0]

            return f_at

        dy0 = term.move(t0, dt, y0)  # dense-output derivative for the driver
        f0_flat = ravel_pytree(dy0)[0]

        # stage 1: Y1 = y0 + g*dt f(t0+g*dt, Y1); explicit predictor warm start
        t_s1 = t0 + g * dt
        y1_stage = _stage_newton_solve(
            f_flat_at(t_s1), y0_flat, g * dt_f, y0_flat + g * dt_f * f0_flat,
            newton_iters, opts,
        )
        f1_flat = f_flat_at(t_s1)(y1_stage)

        # stage 2 (stiffly accurate: y_next = Y2):
        # Y2 = y0 + (1-g)*dt f1 + g*dt f(t1, Y2)
        base2 = y0_flat + (1.0 - g) * dt_f * f1_flat
        y2_stage = _stage_newton_solve(
            f_flat_at(t1), base2, g * dt_f, y1_stage + g * dt_f * f1_flat,
            newton_iters, opts,
        )
        return unravel(y2_stage), dy0

    return step


sdirk2_step = make_sdirk2_step()
sdirk2_krylov_step = make_sdirk2_step(krylov=True)


# Crouzeix's 2-stage SDIRK, gamma = 1/2 + sqrt(3)/6: A-stable, order 3 — the
# accuracy upgrade over SDIRK2 for stiff-but-not-violently-stiff problems
# (A-stable but NOT L-stable: |R(-inf)| < 1 so fast transients are damped,
# but not annihilated like sdirk2's R(-inf) = 0). gamma is the root of
# g^2 - g + 1/6 = 0 picked for A-stability; the order-3 conditions
# (sum b = 1, b.c = 1/2, b.c^2 = 1/3, b.A.c = 1/6) are pinned exactly in
# tests/solver/test_implicit.py.
_CROUZEIX_GAMMA = 0.5 + 3.0**0.5 / 6.0


def make_sdirk3_step(newton_iters: int = 8, krylov: bool = False, **krylov_opts):
    """A-stable order-3 SDIRK (Crouzeix) step for ``solve_fixed``.

        Y1 = y + g*dt f(t + g dt, Y1)
        Y2 = y + (1-2g)*dt f(t + g dt, Y1) + g*dt f(t + (1-g) dt, Y2)
        y1 = y + dt/2 (f(t + g dt, Y1) + f(t + (1-g) dt, Y2))

    Same singly-diagonal Newton structure as SDIRK2 (shared
    ``_stage_newton_solve``; dense Jacobian or matrix-free Krylov).

    Trade-off vs ``sdirk2``: higher classical order (3 vs 2) wins on
    smooth-stiff problems, but this scheme is neither stiffly accurate nor
    L-stable, so ON the stiff manifold (fast transients at large dt*lambda)
    ``sdirk2`` is more accurate (measured: 1.1e-5 vs 1.2e-4 at dt=0.1,
    lambda=-1000 on the relaxation test).
    """
    opts = (krylov_opts or {}) if krylov else None

    def step(term: XDETerm, t0, t1, y0):
        dt = t1 - t0
        y0_flat, unravel = ravel_pytree(y0)
        dt_f = jnp.asarray(dt, y0_flat.dtype)
        g = jnp.asarray(_CROUZEIX_GAMMA, y0_flat.dtype)

        def f_flat_at(t_s):
            def f_at(y_flat):
                return ravel_pytree(term.move(t_s, dt, unravel(y_flat)))[0]

            return f_at

        dy0 = term.move(t0, dt, y0)
        f0_flat = ravel_pytree(dy0)[0]

        t_s1 = t0 + g * dt
        y1_stage = _stage_newton_solve(
            f_flat_at(t_s1), y0_flat, g * dt_f, y0_flat + g * dt_f * f0_flat,
            newton_iters, opts,
        )
        f1_flat = f_flat_at(t_s1)(y1_stage)

        t_s2 = t0 + (1.0 - g) * dt
        base2 = y0_flat + (1.0 - 2.0 * g) * dt_f * f1_flat
        y2_stage = _stage_newton_solve(
            f_flat_at(t_s2), base2, g * dt_f, y1_stage, newton_iters, opts,
        )
        f2_flat = f_flat_at(t_s2)(y2_stage)

        y_next = y0_flat + 0.5 * dt_f * (f1_flat + f2_flat)
        return unravel(y_next), dy0

    return step


sdirk3_step = make_sdirk3_step()
