"""Weak order-2.0 schemes (Platen's derivative-free family): O(h^2) in
distribution for expectations at EM-like cost; pathwise accuracy is not the
goal (excluded from sdeint_event by design).

Moved verbatim from ``functional/sdeint.py`` in the round-4 registry split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ...xde.term import XDETerm
from .common import _general_fuse

def make_weak2_term(drift, diffusion, bm) -> XDETerm:
    """Platen's explicit WEAK order-2.0 scheme (derivative-free, Kloeden–
    Platen 14.2.1/14.2.2 specialized to the diagonal contract): converges at
    O(h²) in distribution — ``|E[φ(Y_T^h)] − E[φ(Y_T)]| = O(h²)`` for smooth
    φ — where every strong scheme driven by the same increments is weak
    order ≤ 1.0 at EM cost. The right tool when only expectations matter
    (option pricing, moment estimation, MC averages): pathwise accuracy is
    NOT improved (strong order stays low) and is not the goal.

    Diagonal contract (same as :func:`make_milstein_term`): ``g(t, y)`` has
    ``y``'s shape and ``∂g_i/∂y_j`` is diagonal. Under that contract the
    multi-dimensional cross-support terms of KP 14.2.2 vanish identically
    (``b^j(Ū±_r) = b^j`` for r≠j) and the scheme is elementwise:

        Ȳ  = y + a h + g ΔW              (drift support)
        R± = y + a h ± g √h              (diffusion supports)
        y1 = y + ½(a(t1,Ȳ) + a) h
               + ¼[(g(t1,R+) + g(t1,R−) + 2g) ΔW
                   + (g(t1,R+) − g(t1,R−)) ((ΔW)² − h)/√h]

    Support times follow the time-augmented-state reduction of the
    autonomous scheme (t has zero noise, so Ȳ/R± carry time t+h). Gaussian
    increments from the tree satisfy the weak moment conditions (KP allows
    the cheaper three-point ΔŴ; the true ΔW keeps the scheme coupled to
    ``bm`` and replayable). No Lévy areas are needed. Weak order ≈2.0 is
    pinned by coupled-to-exact weak-error measurement on GBM (the reference
    has no weak schemes at all — its sdeint is broken EM,
    ``paddlexde/functional/sdeint.py:9-37``).
    """

    def move(t, dt, y):
        t1 = t + dt
        d_w = bm(t, t1)
        a0 = drift(t, y)
        g0 = diffusion(t, y)

        def cast(yl):
            h = jnp.asarray(dt, yl.dtype)
            safe = jnp.where(h == 0, jnp.ones_like(h), h)
            sqrt_h = jnp.where(h == 0, jnp.zeros_like(h), jnp.sqrt(safe))
            inv_sqrt = jnp.where(h == 0, jnp.zeros_like(h), 1.0 / jnp.sqrt(safe))
            return h, sqrt_h, inv_sqrt

        ybar = jax.tree.map(
            lambda yl, al, gl, wl: yl + cast(yl)[0] * al + gl * wl,
            y, a0, g0, d_w,
        )
        r_p = jax.tree.map(
            lambda yl, al, gl: yl + cast(yl)[0] * al + cast(yl)[1] * gl,
            y, a0, g0,
        )
        r_m = jax.tree.map(
            lambda yl, al, gl: yl + cast(yl)[0] * al - cast(yl)[1] * gl,
            y, a0, g0,
        )
        a1 = drift(t1, ybar)
        g_p = diffusion(t1, r_p)
        g_m = diffusion(t1, r_m)
        noise = jax.tree.map(
            lambda gp, gm, gl, wl: 0.25 * (
                (gp + gm + 2.0 * gl) * wl
                + (gp - gm) * (wl * wl - cast(gl)[0]) * cast(gl)[2]
            ),
            g_p, g_m, g0, d_w,
        )
        f_comb = jax.tree.map(lambda a, b: 0.5 * (a + b), a0, a1)
        return (f_comb, noise)

    def fuse(dy, dt, y):
        f_val, noise = dy
        return jax.tree.map(
            lambda yl, fl, nl: yl + jnp.asarray(dt, yl.dtype) * fl + nl,
            y, f_val, noise,
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_weak2_general_term(drift, diffusion, bm, *, v_key=None) -> XDETerm:
    """Platen's explicit weak order-2.0 scheme for GENERAL (matrix) noise
    (Kloeden–Platen 14.2.2): state ``y [..., D]``, diffusion ``G(t, y) ->
    [..., D, M]``, M-dimensional Brownian motion. Derivative-free weak 2.0
    with NO commutativity condition and NO Lévy areas — the cross-channel
    double integrals are replaced, in distribution, by ``(ΔW_j ΔW_r +
    V_{r,j})/2`` with antisymmetric two-point variables ``V_{r,j} = ±h``
    (i.i.d. for r<j, ``V_{j,r} = −V_{r,j}``). Supports:

        Ȳ    = y + a h + G ΔW
        R̄±_j = y + a h ± b_j √h      (b_j = G[..., :, j], evaluated at t+h)
        Ū±_r = y ± b_r √h            (evaluated at t)

        y1 = y + ½(a(t1,Ȳ) + a) h
           + ¼ Σ_j [(b_j(R̄+_j) + b_j(R̄−_j) + 2 b_j) ΔW_j
                    + (b_j(R̄+_j) − b_j(R̄−_j)) ((ΔW_j)² − h)/√h]
           + ¼ Σ_j Σ_{r≠j} [(b_j(Ū+_r) + b_j(Ū−_r) − 2 b_j) ΔW_j
                    + (b_j(Ū+_r) − b_j(Ū−_r)) (ΔW_j ΔW_r + V_{r,j})/√h]

    4M+1 diffusion evaluations per step (two vmapped G calls of M supports
    each, plus Ȳ/base) — the derivative-free price of weak 2.0 for
    arbitrary noise. ``V`` is sampled from a counter-based key derived from
    the Brownian tree's key and the step's left endpoint (independent of W,
    deterministic per (path, step) — replay-adjoint safe). Weak order ≈2.0
    is pinned by a measured weak-convergence test against moment-ODE
    oracles on a NON-COMMUTING 2-noise linear SDE.
    """
    base = getattr(bm, "base_brownian", bm)
    if v_key is None:
        v_key = getattr(base, "_key", None)
    v_key = (jax.random.key(0x57EA2) if v_key is None
             else jax.random.fold_in(v_key, 0x57EA2))

    def move(t, dt, y):
        t1 = t + dt
        d_w = bm(t, t1)  # [..., M]
        h = jnp.asarray(dt, y.dtype)
        safe = jnp.where(h == 0, jnp.ones_like(h), h)
        sqrt_h = jnp.where(h == 0, jnp.zeros_like(h), jnp.sqrt(safe))
        inv_sqrt = jnp.where(h == 0, jnp.zeros_like(h), 1.0 / jnp.sqrt(safe))
        hi = jax.lax.Precision.HIGHEST

        a0 = drift(t, y)
        g0 = diffusion(t, y)  # [..., D, M]
        m = g0.shape[-1]
        eye = jnp.eye(m, dtype=y.dtype)

        g_dw = jnp.einsum("...dm,...m->...d", g0, d_w, precision=hi)
        yah = y + h * a0
        ybar = yah + g_dw
        a1 = drift(t1, ybar)

        cols = jnp.moveaxis(g0, -1, 0)  # [M, ..., D]
        sup_r = jnp.concatenate(
            [yah[None] + sqrt_h * cols, yah[None] - sqrt_h * cols], axis=0
        )
        sup_u = jnp.concatenate(
            [y[None] + sqrt_h * cols, y[None] - sqrt_h * cols], axis=0
        )
        g_r = jax.vmap(lambda ys: diffusion(t1, ys))(sup_r)  # [2M, ..., D, M]
        g_u = jax.vmap(lambda ys: diffusion(t, ys))(sup_u)
        g_rp, g_rm = g_r[:m], g_r[m:]
        g_up, g_um = g_u[:m], g_u[m:]

        # b_j evaluated at ITS OWN support R̄±_j: diagonal over
        # (support index, noise column) via one-hot contraction
        diag = lambda g: jnp.einsum("r...dj,rj->...dj", g, eye, precision=hi)
        b_rp, b_rm = diag(g_rp), diag(g_rm)
        term1 = 0.25 * (
            jnp.einsum("...dj,...j->...d", b_rp + b_rm + 2.0 * g0, d_w,
                       precision=hi)
            + jnp.einsum("...dj,...j->...d", b_rp - b_rm,
                         d_w * d_w - h, precision=hi) * inv_sqrt
        )

        # cross-channel supports: Σ_{r≠j} — full sum minus the r=j diagonal
        s_mat = g_up + g_um - 2.0 * g0[None]  # [M(r), ..., D, M(j)]
        d_mat = g_up - g_um
        s_sum = jnp.sum(s_mat, axis=0) - diag(s_mat)
        cross_w = jnp.einsum("...dj,...j->...d", s_sum, d_w, precision=hi)

        # V_{r,j}: antisymmetric two-point ±h, i.i.d. per (path, step, r<j),
        # counter-based key = tree key ⊕ step left endpoint (f32 bits)
        step_key = jax.random.fold_in(
            v_key,
            jax.lax.bitcast_convert_type(
                jnp.asarray(t, jnp.float32), jnp.int32
            ),
        )
        rad = jax.random.rademacher(
            step_key, d_w.shape[:-1] + (m, m), dtype=y.dtype
        )
        v_mat = jnp.triu(rad, 1) * h
        v_mat = v_mat - jnp.swapaxes(v_mat, -1, -2)
        coeff = (d_w[..., :, None] * d_w[..., None, :] + v_mat) * (1.0 - eye)
        cross_v = jnp.einsum("r...dj,...rj->...d", d_mat, coeff,
                             precision=hi) * inv_sqrt
        noise = term1 + 0.25 * (cross_w + cross_v)
        f_comb = 0.5 * (a0 + a1)
        return (f_comb, noise)

    return XDETerm(move=move, fuse=_general_fuse, additive=False, kind="sde")
