"""Implicit (backward) Euler for stiff systems — on-device Newton iterations.

The reference's only stiff-capable path is the host-side scipy LSODA bridge
(``solver/base_scipy_solver.py`` in DrownFish19/PaddleXDE), unusable on TPU.
This solver keeps stiff problems on-device: each step solves

    y1 = y0 + dt * f(t1, y1)

by Newton iteration with the Jacobian assembled through ``jax.linearize`` (one
vector-field trace per iteration; the primal is reused for the residual) and a
dense ``jnp.linalg.solve`` — A-stable (order 1), so dt is limited by accuracy,
not stability (pinned by a stiffness test: lambda = -1000 with dt = 0.1 stays
bounded where explicit Euler diverges). Intended for small/medium flattened
states (the Jacobian is materialized, O(D^2)); larger systems should use a
matrix-free variant (future work, see ROADMAP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..xde.term import XDETerm

__all__ = ["implicit_euler_step", "make_implicit_euler_step"]


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
