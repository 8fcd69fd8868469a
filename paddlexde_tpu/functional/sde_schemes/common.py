"""Shared kernels of the SDE scheme zoo: the default Euler-Maruyama term,
the time-reversal drift corrections, and the small helpers several scheme
modules share (general-noise fuse, cubic-path coefficients, the RK4
theta-integrator for polynomial-path ODEs).

Everything here was part of ``functional/sdeint.py`` before the round-4
registry split; the docstrings (with their reference citations) moved
verbatim. Public import paths are preserved by re-exports in
``functional/sdeint.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...xde.term import XDETerm
from ...brownian.api import ReverseBrownian

def _general_fuse(dy, dt, y):
    f_val, g_dw = dy
    return jax.tree.map(
        lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl, y, f_val, g_dw
    )




# cubic-path coefficient map: (a, b, c) of q(θ)=aθ³+bθ²+cθ from the moment
# constraints q(1)=ŵ, ∫₀¹q=û, ∫₀¹(1-θ)q=k̂ (scaled w, u/h, k/h²); constant
# 3x3 inverse computed once in f64
_CUBIC_MINV = np.linalg.inv(np.array(
    [[1.0, 1.0, 1.0],
     [1.0 / 4.0, 1.0 / 3.0, 1.0 / 2.0],
     [1.0 / 20.0, 1.0 / 12.0, 1.0 / 6.0]]
))


def _cubic_path_coeffs(w, u, k, dt):
    """Per-leaf (a, b, c) of the unique cubic q(θ) on [0,1] matching the
    step's (W, I10, K) triple. q' is quadratic, so RK4's Simpson weights
    integrate the noise path segment exactly for constant diffusion."""
    safe = jnp.where(dt == 0, jnp.ones_like(dt), dt)

    def per_leaf(row):
        return jax.tree.map(
            lambda wl, ul, kl: (
                row[0] * wl
                + row[1] * (ul / jnp.asarray(safe, wl.dtype))
                + row[2] * (kl / jnp.asarray(safe, wl.dtype) ** 2)
            ),
            w, u, k,
        )

    return (per_leaf(tuple(float(x) for x in _CUBIC_MINV[0])),
            per_leaf(tuple(float(x) for x in _CUBIC_MINV[1])),
            per_leaf(tuple(float(x) for x in _CUBIC_MINV[2])))


def _rk4_theta(F, y, substeps: int):
    """Classic RK4 over θ ∈ [0, 1] in ``substeps`` equal substeps (static)."""
    dth = 1.0 / substeps
    for i in range(substeps):
        th = i * dth
        k1 = F(th, y)
        k2 = F(th + 0.5 * dth, jax.tree.map(
            lambda yl, kl: yl + 0.5 * dth * kl, y, k1))
        k3 = F(th + 0.5 * dth, jax.tree.map(
            lambda yl, kl: yl + 0.5 * dth * kl, y, k2))
        k4 = F(th + dth, jax.tree.map(lambda yl, kl: yl + dth * kl, y, k3))
        y = jax.tree.map(
            lambda yl, a, b, c, d: yl + (dth / 6.0) * (a + 2 * b + 2 * c + d),
            y, k1, k2, k3, k4,
        )
    return y




def noise_drift_correction(diffusion, noise: str = "diagonal"):
    """The Itô correction field ``Σ_j (∂G_{·j}/∂y)·G_{·j}`` as ``corr(t, y)``
    for each noise contract — the single shared kernel behind time reversal
    (coefficient +1, ``_reversed_*_ito_fns``) and the Itô↔Stratonovich
    converters (coefficient ∓½, ``functional/calculus.py``).

    Contracts: 'diagonal' (elementwise g·∂g/∂y via jvp-with-ones — exact
    for diagonal-Jacobian diffusions), 'scalar' (one channel, coupled g:
    the DIRECTIONAL (∂g/∂y)·g — the elementwise form is wrong for coupled
    g, see CLAUDE.md), 'general' (matrix G: the column trace). Every
    branch evaluates the diffusion ONCE (``jax.linearize``).
    """
    if noise not in ("diagonal", "scalar", "general"):
        raise ValueError(
            f"noise must be 'diagonal', 'scalar' or 'general', got {noise!r}"
        )

    def corr(t, y):
        if noise == "general":
            g_val, lin = jax.linearize(lambda y_: diffusion(t, y_), y)
            cols = jnp.moveaxis(g_val, -1, 0)  # [M, ..., D]
            dg_all = jax.vmap(lin)(cols)  # [M, ..., D, M]
            return jnp.einsum("j...dj->...d", dg_all)
        if noise == "scalar":
            g_val, lin = jax.linearize(lambda y_: diffusion(t, y_), y)
            return lin(g_val)
        g_val, dg = jax.jvp(
            lambda y_: diffusion(t, y_), (y,),
            (jax.tree.map(jnp.ones_like, y),),
        )
        return jax.tree.map(lambda g, d: g * d, g_val, dg)

    return corr


def _reversed_ito_fns(drift, diffusion, bm):
    """Time-reversal substitution (s = -t) for an Itô SDE.

    Naive backward EM carries a systematic O(1) bias of -g·(∂g/∂y)·T (the
    backward Itô integral has the opposite endpoint convention); adding
    g·∂g/∂y to the reversed drift cancels it. ∂g/∂y computed by
    jvp-with-ones — exact for elementwise (diagonal-Jacobian) diffusions,
    the diagonal-noise contract of this API. The reversed system is itself
    an Itô SDE, so any Itô scheme (EM, Milstein) applies to it unchanged.
    """

    corr = noise_drift_correction(diffusion, "diagonal")

    def drift_rev(s, y):
        t = -s
        return jax.tree.map(
            lambda f, c: -f + c, drift(t, y), corr(t, y)
        )

    return drift_rev, (lambda s, y: diffusion(-s, y)), ReverseBrownian(bm)


def _reversed_scalar_ito_fns(drift, diffusion, bm):
    """Time-reversal substitution (s = -t) for a SCALAR-noise Itô SDE with a
    general (non-diagonal) diffusion ``g(t, y) -> y.shape``.

    The reversal drift correction is the m=1 case of the general matrix
    form: ``+(∂g/∂y)·g`` as a DIRECTIONAL derivative (one jvp along g) —
    NOT the elementwise jvp-with-ones of ``_reversed_ito_fns``, which is
    only exact for diagonal Jacobians."""

    corr = noise_drift_correction(diffusion, "scalar")

    def drift_rev(s, y):
        t = -s
        return jax.tree.map(
            lambda f, c: -f + c, drift(t, y), corr(t, y)
        )

    return drift_rev, (lambda s, y: diffusion(-s, y)), ReverseBrownian(bm)


def _reversed_general_ito_fns(drift, diffusion, bm):
    """Time-reversal substitution (s = -t) for a GENERAL (matrix) noise Itô
    SDE ``dy = f dt + G dW`` with ``G(t, y) -> [..., D, M]``.

    The pathwise backward Itô integral carries the matrix analogue of the
    diagonal ``+g·∂g/∂y`` correction:

        f̃(s, y) = -f(-s, y) + Σ_j (∂G_{·j}/∂y) · G_{·j}(-s, y)

    (for diagonal G this reduces exactly to ``_reversed_ito_fns``'s term).
    The directional derivatives come from M jvps of the diffusion, one per
    noise column (the same machinery as ``make_general_milstein_term``); the
    correction is the trace ``Σ_j dG[j, ..., d, j]``. ReverseBrownian supplies
    ΔW̃ = -ΔW and Ã = -A, so euler_general / milstein_general /
    milstein_commutative apply to the reversed system unchanged. Strong
    orders on the reversed path are pinned by measured-convergence tests."""

    corr = noise_drift_correction(diffusion, "general")

    def drift_rev(s, y):
        t = -s
        return -drift(t, y) + corr(t, y)

    return drift_rev, (lambda s, y: diffusion(-s, y)), ReverseBrownian(bm)


def _reversed_stratonovich_fns(drift, diffusion, bm):
    """Time-reversal substitution for a STRATONOVICH SDE: no drift correction
    (Stratonovich calculus is time-symmetric) — just negate the drift and
    retrace the path."""
    return (
        (lambda s, y: jax.tree.map(jnp.negative, drift(-s, y))),
        (lambda s, y: diffusion(-s, y)),
        ReverseBrownian(bm),
    )


def make_sde_term(drift, diffusion, bm, *, reverse: bool = False) -> XDETerm:
    """Build the SDE term; with ``reverse``, drift/diffusion/noise are the
    substituted-time (s = -t) forms so the solve runs over an increasing span."""
    if reverse:
        drift, diffusion, bm = _reversed_ito_fns(drift, diffusion, bm)

    def move(t, dt, y):
        d_w = bm(t, t + dt)
        f_val = drift(t, y)
        g_val = diffusion(t, y)
        # diagonal noise: dW matches the (single-array) state shape
        g_dw = jax.tree.map(lambda g: g * d_w, g_val)
        return (f_val, g_dw)

    def fuse(dy, dt, y):
        f_val, g_dw = dy
        return jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl, y, f_val, g_dw
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")
