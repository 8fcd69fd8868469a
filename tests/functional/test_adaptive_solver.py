"""Adaptive-solver accuracy vs closed-form solutions.

Accuracy bars from the reference suite (``tests/functional/
test_adaptive_solver.py:32-87`` in DrownFish19/PaddleXDE): rtol 4e-3 on the sine
and linear problems (1e-2 for adaptive_heun on linear), plus NFE-stat checks and
jit/grad coverage the reference lacked.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import odeint

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from testing_utils import ADAPTIVE_METHODS, construct_problem  # noqa: E402


@pytest.mark.parametrize("method", ADAPTIVE_METHODS)
def test_sine_problem(method):
    f, y0, t_points, sol = construct_problem(ode="sine")
    y = odeint(f, y0, t_points, method, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(y, sol, rtol=4e-3, atol=1e-5)


@pytest.mark.parametrize("method", ADAPTIVE_METHODS)
def test_linear_problem(method):
    f, y0, t_points, sol = construct_problem(ode="linear")
    rtol = 1e-2 if method == "adaptive_heun" else 4e-3
    y = odeint(f, y0, t_points, method, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(y, sol, rtol=rtol, atol=1e-5)


def test_stats_and_status():
    f, y0, t_points, _ = construct_problem(ode="sine")
    y, stats = odeint(
        f, y0, t_points, "dopri5", rtol=1e-6, atol=1e-8, options={"return_stats": True}
    )
    assert int(stats.status) == 0
    assert int(stats.nfe) > 0
    assert int(stats.n_accept) > 0


def test_max_num_steps_flag():
    f, y0, t_points, _ = construct_problem(ode="sine")
    _, stats = odeint(
        f,
        y0,
        t_points,
        "dopri5",
        rtol=1e-10,
        atol=1e-12,
        options={"return_stats": True, "max_num_steps": 3},
    )
    assert int(stats.status) != 0


def test_reverse_time_adaptive():
    f, y0, t_points, sol = construct_problem(ode="sine", reverse=True)
    y = odeint(f, y0, t_points, "dopri5", rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(y, sol, rtol=4e-3, atol=1e-5)


def test_jit_grad_through_while_loop():
    """Backprop through the adaptive solve (lax.while_loop is fwd-only, so this
    exercises the scan-over-outputs structure with stop-grad-free stepping)."""

    def run(a):
        f = lambda t, y: a * y
        y = odeint(
            f, jnp.ones(()), jnp.linspace(0.0, 1.0, 5), "dopri5", time_axis=0,
            options={"first_step": 0.1},
        )
        return y[-1]

    val = jax.jit(run)(0.7)
    np.testing.assert_allclose(val, np.exp(0.7), rtol=1e-6)


def test_step_t_jump_t():
    """Prescribed grid points are hit exactly and do not break accuracy."""
    f, y0, t_points, sol = construct_problem(ode="sine")
    y = odeint(
        f,
        y0,
        t_points,
        "dopri5",
        rtol=1e-7,
        atol=1e-9,
        options={"step_t": np.array([2.5, 4.75]), "jump_t": np.array([3.3])},
    )
    np.testing.assert_allclose(y, sol, rtol=4e-3, atol=1e-5)


def test_fp32_adaptive_smoke():
    with jax.enable_x64(False):
        f, y0, t_points, sol = construct_problem(npts=10, ode="sine", dtype=jnp.float32)
        y = odeint(f, y0, t_points, "dopri5", rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(y, sol, rtol=1e-2, atol=1e-2)


def test_buffered_dense_engine_matches_standard():
    """options={'max_steps': N}: same trajectory via the buffered-dense
    engine (one integration pass + vectorized dense output)."""
    f, y0, t_points, sol = construct_problem(npts=50, ode="sine")
    y_std = odeint(f, y0, t_points, "dopri5", rtol=1e-7, atol=1e-9)
    y_dense, stats = odeint(
        f, y0, t_points, "dopri5", rtol=1e-7, atol=1e-9,
        options={"max_steps": 256, "return_stats": True},
    )
    assert int(stats.status) == 0
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(y_std), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(y_dense), np.asarray(sol), rtol=4e-3, atol=1e-5)


def test_buffered_dense_cap_flag():
    f, y0, t_points, _ = construct_problem(ode="sine")
    _, stats = odeint(
        f, y0, t_points, "dopri5", rtol=1e-10, atol=1e-12,
        options={"max_steps": 4, "return_stats": True},
    )
    assert int(stats.status) != 0


def test_odeint_per_element_independent_step_control():
    """vmap-of-solve (torchode-style per-element dt, arXiv:2210.12375): a
    stiffness-spread batch must be accurate per element AND show a real NFE
    spread in the per-element stats — proof each element stepped at its own
    pace rather than sharing the stiffest element's dt."""
    from paddlexde_tpu import odeint_per_element

    # autonomous y' = -y^2: y(t) = y0/(1 + y0 t); initial stiffness ~ y0
    def f(t, y):
        return -y * y

    y0_spread = jnp.asarray([[1.0], [10.0], [40.0], [160.0]])
    ts = jnp.linspace(0.0, 1.0, 5)
    sol, stats = odeint_per_element(
        f, y0_spread, ts, "dopri5", rtol=1e-8, atol=1e-10,
        options={"return_stats": True, "max_steps": 512}, time_axis=0,
    )
    exact = y0_spread[:, None, :] / (1.0 + y0_spread[:, None, :] * ts[None, :, None])
    np.testing.assert_allclose(np.asarray(sol), np.asarray(exact), rtol=1e-6)
    nfe = np.asarray(stats.nfe)
    assert nfe.shape == (4,)
    assert nfe.max() > nfe.min() + 10, nfe  # genuinely independent step control
    assert np.all(np.asarray(stats.status) == 0)
