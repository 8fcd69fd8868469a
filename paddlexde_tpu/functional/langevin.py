"""Kinetic (underdamped) Langevin dynamics — the BAOAB family.

    dq = M⁻¹ p dt
    dp = F(q) dt − γ p dt + √(2γ/β) M^{1/2} dW

Sampling-oriented splitting integrators (Leimkuhler–Matthews 2013): the
step is a palindromic composition of exactly-solvable pieces —

    B: p ← p + (h/2) F(q)          (kick)
    A: q ← q + (h/2) M⁻¹ p         (drift)
    O: p ← c₁ p + c₂ M^{1/2} ξ     (exact OU flow: c₁ = e^{−γh},
                                    c₂ = √((1 − c₁²)/β))

BAOAB's configurational sampling bias is O(h²) generally and EXACTLY ZERO
for harmonic potentials at every stable h (the Leimkuhler–Matthews
"superconvergence": the discrete chain's Var(q) equals 1/(βω²) to machine
precision — test-pinned via the exact discrete Lyapunov solution, with the
kinetic marginal's known (1 − h²ω²/4)/β bias also pinned); at γ = 0 the
O-step is the identity and the scheme IS velocity Verlet (test-pinned). The ξ draw is the virtual tree's increment
normalized per step (ξ = ΔW/√h — a standard normal, bit-reproducible per
key, replayable, vmappable), so the whole chain is one ``lax.scan`` with
exact direct backprop.

No reference counterpart (DrownFish19/PaddleXDE has no sampling schemes;
its sdeint is broken EM, ``paddlexde/functional/sdeint.py:9-37``). The
harmonic-chain stationary covariance is pinned against the EXACT discrete
Lyapunov solution of the linear update map (not an h→0 approximation), and
the O(h²) configurational bias (vs EM's O(h)) is measured.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..brownian.api import BrownianInterval
from .solve import format_solution

__all__ = ["langevin_baoab", "make_baoab_step"]


def make_baoab_step(force, gamma, beta=1.0, mass=1.0, bm=None):
    """One BAOAB step ``(t, dt, (q, p)) -> (q1, p1)``.

    ``force(t, q) -> -∇V`` (pytree like q). ``mass`` is a scalar or a
    pytree-of-diagonals like q (diagonal mass matrix). ``bm`` supplies the
    O-step's standard normal via ``ΔW/√h`` (shape = q's shape)."""
    gamma = float(gamma)
    beta = float(beta)
    if gamma < 0.0:
        raise ValueError(f"gamma must be >= 0, got {gamma}")
    if beta <= 0.0:
        raise ValueError(f"beta must be > 0, got {beta}")

    def inv_m(leaf, m_leaf):
        return leaf / m_leaf

    def step(t, dt, state):
        q, p = state
        h = dt
        half = 0.5 * h
        f0 = force(t, q)
        p = jax.tree.map(lambda pl, fl: pl + jnp.asarray(half, pl.dtype) * fl,
                         p, f0)
        q = jax.tree.map(
            lambda ql, pl, ml: ql + jnp.asarray(half, ql.dtype) * inv_m(pl, ml),
            q, p, _mass_tree(mass, q),
        )
        # O: exact OU update; xi = ΔW/√h from the tree (standard normal,
        # reproducible per (key, step)); dt == 0 degrades to the identity
        c1 = jnp.exp(-gamma * jnp.asarray(h, jnp.result_type(float)))
        c2 = jnp.sqrt(jnp.maximum(1.0 - c1 * c1, 0.0) / beta)
        safe_h = jnp.where(dt == 0, jnp.ones_like(jnp.asarray(dt)), dt)
        d_w = bm(t, t + dt)
        xi = jax.tree.map(
            lambda wl: wl / jnp.sqrt(jnp.asarray(safe_h, wl.dtype)), d_w
        )
        p = jax.tree.map(
            lambda pl, xl, ml: jnp.asarray(c1, pl.dtype) * pl
            + jnp.asarray(c2, pl.dtype) * jnp.sqrt(ml) * xl,
            p, xi, _mass_tree(mass, p),
        )
        q = jax.tree.map(
            lambda ql, pl, ml: ql + jnp.asarray(half, ql.dtype) * inv_m(pl, ml),
            q, p, _mass_tree(mass, q),
        )
        f1 = force(t + dt, q)
        p = jax.tree.map(lambda pl, fl: pl + jnp.asarray(half, pl.dtype) * fl,
                         p, f1)
        return (q, p)

    return step


def _mass_tree(mass, like):
    if isinstance(mass, (int, float)):
        return jax.tree.map(lambda l: jnp.asarray(mass, l.dtype), like)
    return mass


def langevin_baoab(
    force,
    y0,
    t_span,
    *,
    gamma: float,
    beta: float = 1.0,
    mass=1.0,
    bm=None,
    key=None,
    time_axis: int = 0,
):
    """Integrate kinetic Langevin dynamics with BAOAB over ``t_span``.

    Args:
        force: ``F(t, q) = -∇V(q)`` (pytree like q).
        y0: ``(q0, p0)`` tuple.
        t_span: output times (also the step grid, as :func:`sdeint`).
        gamma: friction. γ = 0 reduces to velocity Verlet exactly.
        beta: inverse temperature (target law ∝ e^{−β(V(q) + ½pᵀM⁻¹p)}).
        mass: scalar or pytree-of-diagonals like q.
        bm / key: Brownian motion over the span (shape = q's shape) or the
            PRNG entropy for the default one.
        time_axis: output layout (as the other integrators).

    Returns ``(q_path, p_path)`` stacked along ``time_axis``.
    """
    if not (isinstance(y0, tuple) and len(y0) == 2):
        raise ValueError("langevin_baoab takes y0 = (q0, p0)")
    t_span = jnp.asarray(t_span)
    q0, p0 = jax.tree.map(jnp.asarray, y0)
    if bm is None:
        from .sdeint import _span_bounds

        leaves = jax.tree.leaves(q0)
        if len(leaves) != 1:
            raise ValueError(
                "langevin_baoab's default Brownian motion covers a "
                f"single-array q (got a pytree with {len(leaves)} leaves); "
                "pass bm= a callable returning a MATCHING pytree of "
                "increments per (ta, tb) query"
            )
        t_lo, t_hi = _span_bounds(t_span)
        leaf = leaves[0]
        bm = BrownianInterval(t_lo, t_hi, size=leaf.shape, dtype=leaf.dtype,
                              key=key)
    step = make_baoab_step(force, gamma, beta, mass, bm)

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
