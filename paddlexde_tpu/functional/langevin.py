"""Kinetic (underdamped) Langevin dynamics — the BAOAB splitting family.

    dq = M⁻¹ p dt
    dp = F(q) dt − γ p dt + √(2γ/β) M^{1/2} dW

Sampling-oriented splitting integrators (Leimkuhler–Matthews 2013): a
step is a palindromic composition of exactly-solvable pieces —

    B(s): p ← p + s F(q)             (kick)
    A(s): q ← q + s M⁻¹ p            (drift)
    O(s): p ← c₁ p + c₂ M^{1/2} ξ    (exact OU flow: c₁ = e^{−γs},
                                      c₂ = √((1 − c₁²)/β))

Three orderings are provided (``scheme=``):

- ``"baoab"`` — B(h/2) A(h/2) O(h) A(h/2) B(h/2). Configurational bias is
  O(h²) generally and EXACTLY ZERO for harmonic potentials at every stable
  h (the Leimkuhler–Matthews "superconvergence": the discrete chain's
  Var(q) equals 1/(βω²) to machine precision — test-pinned via the exact
  discrete Lyapunov solution, with the kinetic marginal's known
  (1 − h²ω²/4)/β bias also pinned). One ξ draw per step. γ = 0 is
  velocity Verlet (kick-drift-kick), bit-pinned.
- ``"obabo"`` — O(h/2) B(h/2) A(h) B(h/2) O(h/2) (Bussi–Parrinello). TWO
  independent ξ draws per step, taken as the tree's increments over
  [t, t+h/2] and [t+h/2, t+h] so replay/bit-reproducibility still hold.
  The harmonic KINETIC marginal is exact at every stable h (Var(p)=1/β);
  the configurational one carries the (1/(βω²))/(1 − h²ω²/4) bias —
  both closed forms test-pinned via the Lyapunov solution. γ = 0 is
  velocity Verlet (the O half-steps become identities).
- ``"aboba"`` — A(h/2) B(h/2) O(h) B(h/2) A(h/2). One ξ draw per step.
  Like BAOAB the harmonic CONFIGURATIONAL marginal is exact at every
  stable h, with kinetic bias (1/β)/(1 − h²ω²/4) (test-pinned closed
  forms); γ = 0 is POSITION Verlet (drift-kick-drift), bit-pinned.

The ξ draw is the virtual tree's increment normalized per (sub)step
(ξ = ΔW/√s — a standard normal, bit-reproducible per key, replayable,
vmappable), so the whole chain is one ``lax.scan`` with exact direct
backprop. ``mass`` is a scalar or pytree-of-diagonals: the target law is
∝ e^{−β(V(q) + ½pᵀM⁻¹p)}, so Var(q) is mass-independent and Var(p) = M/β
(Lyapunov-pinned in the tests).

NON-DIAGONAL mass preconditioning: pass ``mass_ops=(minv, msqrt)`` —
two linear pytree operators ``minv(p) = M⁻¹p`` (the A-step drift) and
``msqrt(ξ) = Lξ`` with ``L Lᵀ = M`` (the O-step noise; any such factor
works, e.g. a Cholesky factor — only L Lᵀ enters the law). The O-step
stays EXACT because the friction is scalar (γI commutes with every M),
and the harmonic superconvergence structure survives: under q̃ = M^{1/2}q,
p̃ = M^{-1/2}p the chain is the identity-mass scheme on the normal modes
of M^{-1/2}KM^{-1/2} driven by isotropic noise (M^{-1/2}L is orthogonal),
so BAOAB/ABOBA sample Cov(q) = K⁻¹/β EXACTLY at every stable h and OBABO
samples Cov(p) = M/β exactly — pinned against the matrix-valued discrete
Lyapunov solution in the tests.

No reference counterpart (DrownFish19/PaddleXDE has no sampling schemes;
its sdeint is broken EM, ``paddlexde/functional/sdeint.py:9-37``). The
harmonic-chain stationary covariance of every scheme is pinned against
the EXACT discrete Lyapunov solution of its linear update map (not an
h→0 approximation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..brownian.api import BrownianInterval
from .solve import format_solution

__all__ = [
    "langevin",
    "langevin_baoab",
    "make_langevin_step",
    "make_baoab_step",
]

_SCHEMES = ("baoab", "obabo", "aboba")


def _mass_tree(mass, like):
    if isinstance(mass, (int, float)):
        return jax.tree.map(lambda l: jnp.asarray(mass, l.dtype), like)
    return mass


def make_langevin_step(force, gamma, beta=1.0, mass=None, bm=None,
                       scheme="baoab", mass_ops=None):
    """One splitting step ``(t, dt, (q, p)) -> (q1, p1)``.

    ``force(t, q) -> -∇V`` (pytree like q). ``mass`` is a scalar or a
    pytree-of-diagonals like q (diagonal mass matrix); for a NON-diagonal
    mass pass ``mass_ops=(minv, msqrt)`` instead — linear pytree operators
    ``minv(p) = M⁻¹p`` and ``msqrt(ξ) = Lξ`` with ``L Lᵀ = M`` (see module
    docstring). ``bm`` supplies the O-step's standard normal(s) via
    ``ΔW/√s`` (shape = q's shape; OBABO queries the two half-intervals)."""
    gamma = float(gamma)
    beta = float(beta)
    if gamma < 0.0:
        raise ValueError(f"gamma must be >= 0, got {gamma}")
    if beta <= 0.0:
        raise ValueError(f"beta must be > 0, got {beta}")
    if scheme not in _SCHEMES:
        raise ValueError(f"scheme must be one of {_SCHEMES}, got {scheme!r}")
    if mass_ops is not None:
        if not (isinstance(mass_ops, (tuple, list)) and len(mass_ops) == 2
                and all(callable(op) for op in mass_ops)):
            raise ValueError(
                "mass_ops must be a (minv, msqrt) pair of callables")
        # sentinel default (ADVICE r4): reject ANY explicitly-passed mass —
        # the old value test let mass=1.0/True slip through and rejected
        # jnp scalar 1.0, making the boundary value/type dependent
        if mass is not None:
            raise ValueError("pass mass= OR mass_ops=, not both")
        minv_op, msqrt_op = mass_ops
    else:
        minv_op = msqrt_op = None
    if mass is None:
        mass = 1.0

    def kick(p, f, s):
        return jax.tree.map(
            lambda pl, fl: pl + jnp.asarray(s, pl.dtype) * fl, p, f)

    def drift(q, p, s):
        if minv_op is not None:
            return jax.tree.map(
                lambda ql, vl: ql + jnp.asarray(s, ql.dtype) * vl,
                q, minv_op(p))
        return jax.tree.map(
            lambda ql, pl, ml: ql + jnp.asarray(s, ql.dtype) * pl / ml,
            q, p, _mass_tree(mass, q))

    def ou(p, t_a, t_b):
        # exact OU update over [t_a, t_b]; xi = ΔW/√s from the tree
        # (standard normal, reproducible per (key, interval)); s == 0
        # degrades to the identity (c2 -> 0 and safe_s guards the /√s)
        s = t_b - t_a
        c1 = jnp.exp(-gamma * jnp.asarray(s, jnp.result_type(float)))
        c2 = jnp.sqrt(jnp.maximum(1.0 - c1 * c1, 0.0) / beta)
        safe_s = jnp.where(s == 0, jnp.ones_like(jnp.asarray(s)), s)
        d_w = bm(t_a, t_b)
        xi = jax.tree.map(
            lambda wl: wl / jnp.sqrt(jnp.asarray(safe_s, wl.dtype)), d_w)
        if msqrt_op is not None:
            return jax.tree.map(
                lambda pl, nl: jnp.asarray(c1, pl.dtype) * pl
                + jnp.asarray(c2, pl.dtype) * nl,
                p, msqrt_op(xi))
        return jax.tree.map(
            lambda pl, xl, ml: jnp.asarray(c1, pl.dtype) * pl
            + jnp.asarray(c2, pl.dtype) * jnp.sqrt(ml) * xl,
            p, xi, _mass_tree(mass, p))

    def step_baoab(t, dt, state):
        q, p = state
        half = 0.5 * dt
        p = kick(p, force(t, q), half)
        q = drift(q, p, half)
        p = ou(p, t, t + dt)
        q = drift(q, p, half)
        p = kick(p, force(t + dt, q), half)
        return (q, p)

    def step_obabo(t, dt, state):
        q, p = state
        half = 0.5 * dt
        mid = t + half
        p = ou(p, t, mid)
        p = kick(p, force(t, q), half)
        q = drift(q, p, dt)
        p = kick(p, force(t + dt, q), half)
        p = ou(p, mid, t + dt)
        return (q, p)

    def step_aboba(t, dt, state):
        q, p = state
        half = 0.5 * dt
        q = drift(q, p, half)
        # q is unchanged by the O step, so both half-kicks share ONE force
        # evaluation (don't rely on XLA CSE to dedup a user callable)
        f_mid = force(t + half, q)
        p = kick(p, f_mid, half)
        p = ou(p, t, t + dt)
        p = kick(p, f_mid, half)
        q = drift(q, p, half)
        return (q, p)

    return {"baoab": step_baoab, "obabo": step_obabo,
            "aboba": step_aboba}[scheme]


def make_baoab_step(force, gamma, beta=1.0, mass=None, bm=None):
    """One BAOAB step (back-compat alias of :func:`make_langevin_step`)."""
    return make_langevin_step(force, gamma, beta, mass, bm, scheme="baoab")


def langevin(
    force,
    y0,
    t_span,
    *,
    gamma: float,
    beta: float = 1.0,
    mass=None,
    mass_ops=None,
    bm=None,
    key=None,
    scheme: str = "baoab",
    time_axis: int = 0,
):
    """Integrate kinetic Langevin dynamics over ``t_span``.

    Args:
        force: ``F(t, q) = -∇V(q)`` (pytree like q).
        y0: ``(q0, p0)`` tuple.
        t_span: output times (also the step grid, as :func:`sdeint`).
        gamma: friction. γ = 0 reduces the O-step to the identity
            (velocity Verlet for baoab/obabo, position Verlet for aboba).
        beta: inverse temperature (target law ∝ e^{−β(V(q) + ½pᵀM⁻¹p)}).
        mass: scalar or pytree-of-diagonals like q (default: unit mass).
        mass_ops: optional ``(minv, msqrt)`` pair of linear pytree
            operators for a NON-diagonal mass matrix (``minv(p) = M⁻¹p``,
            ``msqrt(ξ) = Lξ`` with ``L Lᵀ = M``); mutually exclusive
            with passing ``mass`` at all.
        bm / key: Brownian motion over the span (shape = q's shape) or the
            PRNG entropy for the default one.
        scheme: ``"baoab"`` (default) / ``"obabo"`` / ``"aboba"``.
        time_axis: output layout (as the other integrators).

    Returns ``(q_path, p_path)`` stacked along ``time_axis``.
    """
    if not (isinstance(y0, tuple) and len(y0) == 2):
        raise ValueError("langevin takes y0 = (q0, p0)")
    t_span = jnp.asarray(t_span)
    q0, p0 = jax.tree.map(jnp.asarray, y0)
    if bm is None:
        from .sdeint import _span_bounds

        leaves = jax.tree.leaves(q0)
        if len(leaves) != 1:
            raise ValueError(
                "langevin's default Brownian motion covers a "
                f"single-array q (got a pytree with {len(leaves)} leaves); "
                "pass bm= a callable returning a MATCHING pytree of "
                "increments per (ta, tb) query"
            )
        t_lo, t_hi = _span_bounds(t_span)
        leaf = leaves[0]
        bm = BrownianInterval(t_lo, t_hi, size=leaf.shape, dtype=leaf.dtype,
                              key=key)
    step = make_langevin_step(force, gamma, beta, mass, bm, scheme=scheme,
                              mass_ops=mass_ops)

    def scan_body(state, ts):
        t_a, t_b = ts
        new = step(t_a, t_b - t_a, state)
        return new, new

    init = (q0, p0)
    _, path = jax.lax.scan(scan_body, init, (t_span[:-1], t_span[1:]))
    full = jax.tree.map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
        init, path,
    )
    return format_solution(full, time_axis)


def langevin_baoab(force, y0, t_span, *, gamma, beta=1.0, mass=None, bm=None,
                   key=None, time_axis: int = 0):
    """BAOAB chain (back-compat alias of :func:`langevin`)."""
    return langevin(force, y0, t_span, gamma=gamma, beta=beta, mass=mass,
                    bm=bm, key=key, scheme="baoab", time_axis=time_axis)
