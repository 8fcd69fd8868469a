"""Divergence operators for continuous normalizing flows (FFJORD).

The instantaneous change-of-variables formula (Chen et al. 2018, Grathwohl
et al. 2019) needs ``div f = tr(∂f/∂y)`` along the flow. The reference has
no CNF story (its applications stop at the D3STN example,
``example/D3STN/``); this is a capability add that composes with
``odeint``/``odeint_adjoint`` — see ``examples/cnf_demo.py``.

Two estimators, both built on ``jax.jvp`` (forward-mode — one pass per
probe, no [D, D] Jacobian ever materialized):

- :func:`exact_divergence`: D basis-vector jvps, vmapped into one batched
  pass. Exact; right for small/moderate event dims (the usual CNF regime).
- :func:`hutchinson_divergence`: k Rademacher probes, ``E[εᵀ J ε] = tr J``.
  Unbiased; O(k) cost independent of D — the FFJORD trick for large D. The
  estimator noise enters the *likelihood estimate only*; samples from the
  flow are unaffected.

Both return functions with signature ``(t, y) -> (f(t, y), div)`` over a
single event vector ``y [D]`` — ``jax.vmap`` for batches (done in the CNF
example), which keeps the basis/probe batch fused by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["exact_divergence", "hutchinson_divergence"]


def exact_divergence(f):
    """``(t, y [D]) -> (f(t, y), tr ∂f/∂y)`` via D forward-mode passes."""

    def f_and_div(t, y):
        d = y.shape[-1]
        basis = jnp.eye(d, dtype=y.dtype)

        def one(e):
            out, tangent = jax.jvp(lambda y_: f(t, y_), (y,), (e,))
            return out, tangent @ e

        outs, diag = jax.vmap(one)(basis)
        return outs[0], jnp.sum(diag)

    return f_and_div


def hutchinson_divergence(f, probes: int = 1):
    """``(t, y [D], key) -> (f(t, y), ε̂)`` with ``E[ε̂] = tr ∂f/∂y``.

    Rademacher probes (variance-optimal among iid zero-mean unit-variance
    probes for a symmetric estimator). ``key`` must be FIXED along one solve
    (the same probe for every ODE step) — resampling per step makes the
    divergence integrand discontinuous in t and breaks adaptive solvers.
    """

    def f_and_div(t, y, key):
        d = y.shape[-1]
        eps = jax.random.rademacher(key, (probes, d), dtype=y.dtype)

        def one(e):
            out, tangent = jax.jvp(lambda y_: f(t, y_), (y,), (e,))
            return out, tangent @ e

        outs, quad = jax.vmap(one)(eps)
        return outs[0], jnp.mean(quad)

    return f_and_div


def cnf_aug_dynamics(f, divergence="exact", probes: int = 1):
    """Augmented CNF dynamics ``d(y, logp)/dt = (f, -div f)`` as a pytree
    field for :func:`paddlexde_tpu.odeint` over state ``(y [B, D], lp [B])``.

    ``divergence='exact'`` needs no key; ``'hutchinson'`` returns a factory
    taking per-sample probe keys ``[B]`` (fixed along the solve).
    """
    if divergence == "exact":
        fd = exact_divergence(f)

        def field(t, state):
            y, _ = state
            out, div = jax.vmap(functools.partial(fd, t))(y)
            return out, -div

        return field
    if divergence != "hutchinson":
        raise ValueError(
            f"divergence must be 'exact' or 'hutchinson', got {divergence!r}"
        )
    fd = hutchinson_divergence(f, probes)

    def make_field(keys):
        def field(t, state):
            y, _ = state
            out, div = jax.vmap(lambda y_, k: fd(t, y_, k))(y, keys)
            return out, -div

        return field

    return make_field
