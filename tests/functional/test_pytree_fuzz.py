"""Property tests: random nested state structures through solve + adjoint.

The reference supported tuple states only as a commented-out sketch; here
arbitrary pytrees are first-class, so pin it across randomized structures,
shapes, and dtypes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import odeint, odeint_adjoint


def random_tree(rng, depth=0):
    choice = rng.randint(0, 3 if depth < 2 else 1)
    if choice == 0:  # leaf
        ndim = rng.randint(0, 4)
        shape = tuple(int(s) for s in rng.randint(1, 4, ndim))
        return jnp.asarray(rng.randn(*shape))
    if choice == 1:
        return {f"k{i}": random_tree(rng, depth + 1) for i in range(rng.randint(1, 3))}
    return tuple(random_tree(rng, depth + 1) for _ in range(rng.randint(1, 3)))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_pytree_roundtrip(seed):
    rng = np.random.RandomState(seed)
    y0 = random_tree(rng)
    rates = jax.tree.map(lambda l: jnp.asarray(rng.rand(*l.shape) - 0.5), y0)

    def f(t, y):
        return jax.tree.map(lambda yl, r: r * yl, y, rates)

    ts = jnp.linspace(0.0, 1.0, 9)
    sol = odeint(f, y0, ts, "rk4", time_axis=0)
    # elementwise exact solution y0 * exp(r t)
    expect = jax.tree.map(lambda yl, r: yl * jnp.exp(r), y0, rates)
    got = jax.tree.map(lambda s: s[-1], sol)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8)


def test_random_pytree_adjoint_grads():
    rng = np.random.RandomState(7)
    y0 = random_tree(rng)
    rates = jax.tree.map(lambda l: jnp.asarray(rng.rand(*l.shape) - 0.5), y0)

    def loss(y0_, fn):
        def f(t, y):
            return jax.tree.map(lambda yl, r: r * yl, y, rates)

        sol = fn(f, y0_, jnp.linspace(0.0, 1.0, 5), "rk4", time_axis=0)
        return sum(jnp.sum(l[-1] ** 2) for l in jax.tree.leaves(sol))

    g_direct = jax.grad(lambda y: loss(y, odeint))(y0)
    g_adj = jax.grad(lambda y: loss(y, odeint_adjoint))(y0)
    for a, b in zip(jax.tree.leaves(g_adj), jax.tree.leaves(g_direct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-8)
