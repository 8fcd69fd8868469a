"""SciPy `solve_ivp` escape hatch (host-side, eager).

TPU rebuild of the reference's ``ScipyWrapperODESolver``
(``paddlexde/solver/base_scipy_solver.py:35-67`` in DrownFish19/PaddleXDE):
a CPU debug/validation path bridging to ``scipy.integrate.solve_ivp`` (LSODA by
default — the one stiff-capable method in the zoo).

Like the reference (which detaches to numpy), this path is EAGER and
forward-only: it cannot run under ``jit`` and produces no gradients. It is
deliberately not a ``pure_callback`` — TPU runtimes (including this axon
backend) commonly do not support host send/recv callbacks, and a per-RHS-eval
host round-trip would be pathological on accelerators anyway. The vector field
re-enters JAX eagerly per evaluation, exactly as the reference re-enters paddle
(``base_scipy_solver.py:59-67``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..xde.term import XDETerm

__all__ = ["solve_scipy"]


def solve_scipy(term: XDETerm, y0, t_span, *, rtol=1e-7, atol=1e-9, scipy_method="LSODA"):
    """Integrate on host with scipy; returns time-first ``[T, ...]`` pytree."""
    from scipy.integrate import solve_ivp

    leaves, treedef = jax.tree.flatten(jax.tree.map(jnp.asarray, y0))
    if any(isinstance(l, jax.core.Tracer) for l in leaves) or isinstance(
        jnp.asarray(t_span), jax.core.Tracer
    ):
        raise TypeError(
            "scipy_solver is a host-side debug path and cannot run under jit/"
            "grad; use an adaptive native solver (e.g. 'dopri5') instead."
        )

    shapes = [l.shape for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    splits = list(np.cumsum(sizes)[:-1])
    dtype = jnp.result_type(*[l.dtype for l in leaves])

    t_np = np.asarray(t_span, np.float64)
    y0_flat = np.concatenate([np.asarray(l, np.float64).ravel() for l in leaves])

    def unflatten(flat):
        parts = np.split(flat, splits)
        return treedef.unflatten(
            [jnp.asarray(p.reshape(s), dtype) for p, s in zip(parts, shapes)]
        )

    def rhs(t, y_flat):
        dy = term.move(jnp.asarray(t, dtype), jnp.zeros((), dtype), unflatten(y_flat))
        return np.concatenate(
            [np.asarray(l, np.float64).ravel() for l in jax.tree.leaves(dy)]
        )

    sol = solve_ivp(
        rhs,
        (t_np[0], t_np[-1]),
        y0_flat,
        t_eval=t_np,
        method=scipy_method,
        rtol=float(rtol),
        atol=float(atol),
    )
    flat_sol = np.asarray(sol.y.T)  # [T, total]
    parts = np.split(flat_sol, splits, axis=1)
    return treedef.unflatten(
        [
            jnp.asarray(p.reshape((t_np.shape[0],) + s), dtype)
            for p, s in zip(parts, shapes)
        ]
    )
