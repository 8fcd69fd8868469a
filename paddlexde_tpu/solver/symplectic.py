"""Symplectic integrators for separable Hamiltonian systems.

No reference counterpart (its zoo is Euler/Midpoint/RK4/Adams/adaptive RK —
``paddlexde/solver/__init__.py:1-6`` in DrownFish19/PaddleXDE): for long-time
Hamiltonian dynamics every non-symplectic scheme drifts in energy linearly in
T no matter its order, while a symplectic one conserves a shadow Hamiltonian
— energy error stays BOUNDED forever. The schemes:

- ``leapfrog`` (velocity Verlet / Störmer–Verlet, kick-drift-kick): order 2.
- ``yoshida4``: Yoshida's triple-leapfrog composition with
  ``w1 = 1/(2 − 2^{1/3})``, ``w0 = −2^{1/3} w1`` — order 4, still symplectic.

Contract: the state is the PAIR pytree ``(q, p)`` and the vector field is
SEPARABLE — ``func(t, (q, p)) -> (dq, dp)`` with ``dq`` depending only on
``p`` (and t) and ``dp`` only on ``q`` (and t), i.e. ``H(q, p) = T(p) +
V(q)``. The steppers are expressed purely in the term's move/fuse hooks
(fuse is affine in dy, so a half-kick is ``fuse((0, dp/2), dt, y)``), so
they run under the same ``lax.scan`` fixed driver as everything else and
gradients flow by direct backprop. Symplecticity is pinned exactly in the
tests: the step map's phase-space Jacobian has det 1 to machine precision
(RK4's does not), and the energy error over 10⁴ steps stays bounded where
RK4's drifts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["leapfrog_step", "yoshida4_step"]

_W1 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
_W0 = 1.0 - 2.0 * _W1  # = −2^{1/3}·w1


def _kick(term, t, dt, y, frac):
    """p += frac·dt·dp(t, y) — fuse with the q-component zeroed."""
    dy = term.move(t, dt, y)
    dq, dp = dy
    dy_kick = (
        jax.tree.map(jnp.zeros_like, dq),
        jax.tree.map(lambda a: frac * a, dp),
    )
    return term.fuse(dy_kick, dt, y), dy


def _drift(term, t, dt, y, frac):
    """q += frac·dt·dq(t, y) — fuse with the p-component zeroed."""
    dq, dp = term.move(t, dt, y)
    dy_drift = (
        jax.tree.map(lambda a: frac * a, dq),
        jax.tree.map(jnp.zeros_like, dp),
    )
    return term.fuse(dy_drift, dt, y)


def leapfrog_step(term, t0, t1, y0):
    """One kick-drift-kick velocity-Verlet step (order 2, symplectic)."""
    dt = t1 - t0
    y_half, k0 = _kick(term, t0, dt, y0, 0.5)
    y_drift = _drift(term, t0 + 0.5 * dt, dt, y_half, 1.0)
    y1, _ = _kick(term, t1, dt, y_drift, 0.5)
    return y1, k0


def yoshida4_step(term, t0, t1, y0):
    """Yoshida's order-4 composition: leapfrog(w1·h) ∘ leapfrog(w0·h) ∘
    leapfrog(w1·h) (w0 negative — the backward sub-step is what buys the
    order while keeping symplecticity)."""
    dt = t1 - t0
    ta = t0 + _W1 * dt
    tb = ta + _W0 * dt
    y, k0 = leapfrog_step(term, t0, ta, y0)
    y, _ = leapfrog_step(term, ta, tb, y)
    y, _ = leapfrog_step(term, tb, t1, y)
    return y, k0
