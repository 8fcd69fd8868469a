"""Implicit (backward) Euler for stiff systems — on-device Newton iterations.

The reference's only stiff-capable path is the host-side scipy LSODA bridge
(``solver/base_scipy_solver.py`` in DrownFish19/PaddleXDE), unusable on TPU.
This solver keeps stiff problems on-device: each step solves

    y1 = y0 + dt * f(t1, y1)

by Newton iteration with the Jacobian from ``jax.jacfwd`` and a dense
``jnp.linalg.solve`` — A-stable (order 1), so dt is limited by accuracy, not
stability (pinned by a stiffness test: lambda = -1000 with dt = 0.1 stays
bounded where explicit Euler diverges). Intended for small/medium flattened
states (the Jacobian is materialized, O(D^2)); larger systems should use a
matrix-free variant (future work, see ROADMAP).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..xde.term import XDETerm

__all__ = ["implicit_euler_step", "make_implicit_euler_step"]


def make_implicit_euler_step(newton_iters: int = 6):
    """Build an implicit-Euler step function for ``solve_fixed``."""

    def step(term: XDETerm, t0, t1, y0):
        dt = t1 - t0
        leaves, treedef = jax.tree.flatten(y0)
        sizes = [leaf.size for leaf in leaves]
        shapes = [leaf.shape for leaf in leaves]

        def pack(tree):
            return jnp.concatenate(
                [jnp.ravel(l) for l in jax.tree.leaves(tree)]
            )

        split_points = [int(s) for s in np.cumsum(sizes)[:-1]]

        def unpack(flat):
            parts = jnp.split(flat, split_points) if split_points else [flat]
            return treedef.unflatten(
                [p.reshape(s) for p, s in zip(parts, shapes)]
            )

        y0_flat = pack(y0)

        def f_flat(y_flat):
            return pack(term.move(t1, dt, unpack(y_flat)))

        dt_f = jnp.asarray(dt, y0_flat.dtype)
        eye = jnp.eye(y0_flat.size, dtype=y0_flat.dtype)

        def newton_body(_, y_flat):
            f_val = f_flat(y_flat)
            residual = y_flat - y0_flat - dt_f * f_val
            jac = jax.jacfwd(f_flat)(y_flat)
            delta = jnp.linalg.solve(eye - dt_f * jac, residual)
            return y_flat - delta

        # warm start from an explicit Euler predictor
        y_init = y0_flat + dt_f * pack(term.move(t0, dt, y0))
        y1_flat = jax.lax.fori_loop(0, newton_iters, newton_body, y_init)
        y1 = unpack(y1_flat)
        dy0 = term.move(t0, dt, y0)
        return y1, dy0

    return step


implicit_euler_step = make_implicit_euler_step()
