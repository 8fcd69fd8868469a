"""sdeint_adjoint jit-interaction pins (the scheme-matrix adjoint tests
live in test_sdeint.py / test_sde_adaptive.py; this file pins the training-
loop usage patterns)."""
def test_traced_key_through_jit_training_step():
    """The latent-SDE training pattern: a FRESH tree key flows through jit
    every step — jit(value_and_grad(f)) with the bm built from a traced key
    must work and match the concrete-key gradient. (The FAILING form is
    value_and_grad(jit(f)): the inner jit bakes the custom_vjp residuals
    against the outer tracer — documented in CLAUDE.md, not pinned here
    because the error type is a JAX internal.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from paddlexde_tpu import BrownianInterval, sdeint_adjoint

    def loss(theta, key):
        f = lambda t, y: theta * y
        g = lambda t, y: 0.3 * y
        y0 = jnp.ones((4,))
        bm = BrownianInterval(0.0, 1.0, size=(4,), key=key,
                              dtype=jnp.float32)
        ts = jnp.linspace(0.0, 1.0, 9)
        return jnp.sum(
            sdeint_adjoint(f, g, y0, ts, "milstein", bm=bm, time_axis=0)[-1]
        )

    key = jax.random.key(3)
    v_j, g_j = jax.jit(jax.value_and_grad(loss))(0.5, key)
    v_e, g_e = jax.value_and_grad(loss)(0.5, key)  # concrete-key eager
    np.testing.assert_allclose(float(v_j), float(v_e), rtol=1e-6)
    np.testing.assert_allclose(float(g_j), float(g_e), rtol=1e-6)
