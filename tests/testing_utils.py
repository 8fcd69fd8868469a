"""Closed-form test problems, mirroring the reference's fixture strategy.

Same three analytic problems as ``tests/testing_utils.py:8-98`` in
DrownFish19/PaddleXDE (constant / sine / linear), expressed as pure functions —
exact solutions are framework-agnostic, so accuracy bars carry over verbatim.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
import scipy.linalg

PROBLEMS = {}


def _register(name):
    def deco(fn):
        PROBLEMS[name] = fn
        return fn

    return deco


@_register("constant")
def constant_problem(dtype=jnp.float64):
    """dy/dt = a + (y - (a t + b))^5; exact y = a t + b (starts on the solution)."""
    a, b = 0.2, 3.0

    def f(t, y):
        return a + (y - (a * t + b)) ** 5

    def y_exact(t):
        return (a * jnp.asarray(t, dtype) + b)[..., None]

    return f, y_exact


@_register("sine")
def sine_problem(dtype=jnp.float64):
    """dy/dt = 2y/t + t^4 sin(2t) - t^2 + 4t^3 with the reference's closed form."""

    def f(t, y):
        return 2 * y / t + t**4 * jnp.sin(2 * t) - t**2 + 4 * t**3

    def y_exact(t):
        t = jnp.asarray(t, dtype)
        return (
            -0.5 * t**4 * jnp.cos(2 * t)
            + 0.5 * t**3 * jnp.sin(2 * t)
            + 0.25 * t**2 * jnp.cos(2 * t)
            - t**3
            + 2 * t**4
            + (math.pi - 0.25) * t**2
        )[..., None]

    return f, y_exact


@_register("linear")
def linear_problem(dtype=jnp.float64, dim=10, seed=0):
    """dy/dt = A y with skew-symmetric-ish A; exact via expm."""
    rng = np.random.RandomState(seed)
    u = rng.randn(dim, dim) * 0.1
    a_mat = 2 * u - (u + u.T)  # = u - u.T (skew-symmetric)
    a_jnp = jnp.asarray(a_mat, dtype)
    y_init = np.ones((dim,))

    def f(t, y):
        return a_jnp @ y

    def y_exact(t):
        t_np = np.asarray(t)
        sols = [scipy.linalg.expm(a_mat * ti) @ y_init for ti in np.atleast_1d(t_np)]
        return jnp.asarray(np.stack(sols), dtype)

    return f, y_exact


def construct_problem(npts=10, ode="constant", reverse=False, dtype=jnp.float64):
    """Return (f, y0 [1,D], t_points [npts] in [1,8], sol [1,npts,D]).

    Mirrors reference ``construct_problem`` (``tests/testing_utils.py:83-98``),
    including the batch-of-1 shape convention and the reverse-time flip.
    """
    f, y_exact = PROBLEMS[ode](dtype=dtype)
    t_points = jnp.linspace(1.0, 8.0, npts, dtype=dtype)
    sol = y_exact(t_points)  # [npts, D]
    if reverse:
        t_points = t_points[::-1]
        sol = sol[::-1]
    y0 = sol[0][None]  # [1, D]
    # vector field applied to batched y: problems above are elementwise or
    # matmul on the last axis, so batching broadcasts naturally except linear.
    if ode == "linear":
        f_batched = lambda t, y: (f(t, y[0]))[None]
    else:
        f_batched = f
    return f_batched, y0, t_points, sol[None]  # sol: [1, npts, D]


FIXED_METHODS = ("euler", "midpoint", "rk4")
ADAMS_METHODS = ("explicit_adams", "implicit_adams")
ADAPTIVE_METHODS = ("adaptive_heun", "fehlberg2", "bosh3", "dopri5", "dopri8")
