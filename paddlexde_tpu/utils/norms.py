"""Error norms over pytree states.

TPU-native rebuild of the reference's norm zoo (``paddlexde/utils/ode_utils.py:4-19``
in DrownFish19/PaddleXDE). Unlike the reference (per-tensor norms + a separate
``_mixed_norm`` for tuple states), every norm here accepts an arbitrary pytree so
solver code never special-cases tuple states.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["linf_norm", "rms_norm", "zero_norm", "mixed_norm"]


def _leaves(tree):
    return [jnp.asarray(leaf) for leaf in jax.tree_util.tree_leaves(tree)]


def linf_norm(tree) -> jax.Array:
    """max |x| over every element of every leaf (cf. reference ``_linf_norm``)."""
    leaves = _leaves(tree)
    if not leaves:
        return jnp.zeros(())
    return jnp.max(jnp.stack([jnp.max(jnp.abs(leaf)) for leaf in leaves]))


def rms_norm(tree) -> jax.Array:
    """Global root-mean-square over all elements (cf. reference ``_rms_norm``).

    For a single array this equals the reference exactly; for a pytree it is the
    RMS over the concatenation of all leaves (size-weighted), which is the natural
    generalisation used by torchdiffeq's tuple handling.
    """
    leaves = _leaves(tree)
    if not leaves:
        return jnp.zeros(())
    sq_sums = [jnp.sum(jnp.square(jnp.abs(leaf))) for leaf in leaves]
    n = sum(leaf.size for leaf in leaves)
    return jnp.sqrt(sum(sq_sums) / n)


def zero_norm(tree) -> jax.Array:
    """Always zero — accepts every step (cf. reference ``_zero_norm``)."""
    del tree
    return jnp.zeros(())


def mixed_norm(tree) -> jax.Array:
    """max over leaves of the per-leaf RMS norm (cf. reference ``_mixed_norm``).

    Used for adjoint augmented states, where (y, adj_y, *adj_params) live on very
    different scales and a size-weighted global RMS would drown the small members.
    """
    leaves = _leaves(tree)
    if not leaves:
        return jnp.zeros(())
    return jnp.max(jnp.stack([rms_norm(leaf) for leaf in leaves]))


# Reference-compatible aliases (the reference exposes underscore names through
# `options={"norm": _rms_norm}`):
_linf_norm = linf_norm
_rms_norm = rms_norm
_zero_norm = zero_norm
_mixed_norm = mixed_norm
