"""Explicit pathwise SDE schemes (diagonal + matrix noise).

Moved verbatim from ``functional/sdeint.py`` in the round-4 registry split;
docstrings carry the original reference citations and order pins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ...xde.term import XDETerm
from .common import _cubic_path_coeffs, _general_fuse, _rk4_theta

def make_milstein_term(drift, diffusion, bm) -> XDETerm:
    """Milstein scheme for diagonal Itô noise — strong order 1.0 (EM is 0.5):

        y1 = y + f dt + g dW + 1/2 g (dg/dy) (dW^2 - dt)

    ``dg/dy`` via jvp-with-ones (exact for elementwise diffusions, the
    diagonal-noise contract). A capability beyond the reference's solver zoo;
    strong-convergence order is pinned by test against the closed-form GBM.
    """

    def move(t, dt, y):
        d_w = bm(t, t + dt)
        f_val = drift(t, y)
        g_val, dg = jax.jvp(
            lambda y_: diffusion(t, y_), (y,), (jax.tree.map(jnp.ones_like, y),)
        )
        corr = jax.tree.map(
            lambda g, d: 0.5 * g * d * (d_w * d_w - jnp.asarray(dt, g.dtype)),
            g_val,
            dg,
        )
        g_dw = jax.tree.map(lambda g, c: g * d_w + c, g_val, corr)
        return (f_val, g_dw)

    def fuse(dy, dt, y):
        f_val, g_dw = dy
        return jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl, y, f_val, g_dw
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")




def make_sra1_term(drift, diffusion, bm) -> XDETerm:
    """SRA1 (Rössler 2010) for ADDITIVE noise — strong order 1.5.

    Requires the diffusion to be state-independent (``g(t)``; any y-dependence
    is evaluated at the step's left state and NOT corrected — the additive-
    noise contract). Uses both the increment W and the time integral
    ``I10 = ∫ (W_s - W_t0) ds`` from the virtual tree's joint (W, ∫W) descent:

        H2   = y + 3/4 h f(t0, y) + 3/2 (I10/h) g(t0)
        y1   = y + h (f(t0,y)/3 + 2 f(t0+3/4h, H2)/3)
                 + g(t1) (W - I10/h) + g(t0) (I10/h)

    For constant g the noise term reduces to g·W (consistency); for
    time-dependent g it matches the Itô expansion ``∫g dW = g(t1)·W − g'·I10
    + O(h^{5/2})`` — the ΔW weight belongs on g(t1), NOT g(t0): the swapped
    form differs from the truth by ``g'·h·(W − 2·I10/h) = −2·g'·h·H ~
    h^{3/2}`` per step, which silently degrades the scheme to strong order
    1.0 for g(t) noise (caught in round 3 by the foster2 oracle test —
    constant-g tests cannot see it). Strong order is pinned by test against
    near-exact references on the same path, constant AND time-dependent g.
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u = bm(t, t1, return_U=True)
        safe_dt = jnp.where(dt == 0, jnp.ones_like(dt), dt)
        i10_h = jax.tree.map(lambda ul: ul / safe_dt, u)
        k1 = drift(t, y)
        g0 = diffusion(t, y)
        h2_in = jax.tree.map(
            lambda yl, k, g, i: yl + 0.75 * jnp.asarray(dt, yl.dtype) * k + 1.5 * i * g,
            y, k1, g0, i10_h,
        )
        k2 = drift(t + 0.75 * dt, h2_in)
        g1 = diffusion(t1, y)
        noise = jax.tree.map(
            lambda g0l, g1l, wl, il: g1l * (wl - il) + g0l * il, g0, g1, w, i10_h
        )
        f_comb = jax.tree.map(lambda a, b: a / 3.0 + 2.0 * b / 3.0, k1, k2)
        return (f_comb, noise)

    def fuse(dy, dt, y):
        f_val, noise = dy
        return jax.tree.map(
            lambda yl, fl, nl: yl + jnp.asarray(dt, yl.dtype) * fl + nl, y, f_val, noise
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_general_sra1_term(drift, diffusion, bm) -> XDETerm:
    """SRA1 for GENERAL (matrix) ADDITIVE noise — strong order 1.5.

    Same Rössler SRA1 update as :func:`make_sra1_term` with ``G(t) ->
    [..., D, M]`` against an M-dimensional Brownian motion (``bm`` size
    ``y.shape[:-1] + (M,)``); additive-noise columns enter independently, so
    the scalar scheme applies per column and contracts with einsum:

        H2 = y + 3/4 h f(t0, y) + 3/2 G(t0) @ (I10/h)
        y1 = y + h (f(t0,y)/3 + 2 f(t0+3/4h, H2)/3)
               + G(t1) @ (W - I10/h) + G(t0) @ (I10/h)

    (ΔW weighted by G(t1), matching the Itô expansion — see
    :func:`make_sra1_term`'s round-3 fix note.)

    y-dependence of G is NOT corrected (the additive contract, as in the
    diagonal scheme). Strong order pinned by a measured self-convergence
    test on the same Brownian path; for zero drift the update telescopes to
    the exact ``y0 + G W(T)``.
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u = bm(t, t1, return_U=True)  # [..., M] each
        safe_dt = jnp.where(dt == 0, jnp.ones_like(dt), dt)
        i10_h = u / jnp.asarray(safe_dt, u.dtype)
        k1 = drift(t, y)
        g0 = diffusion(t, y)  # [..., D, M]
        # precision=HIGHEST: TPU matmuls default to bf16 passes — a ~4e-3
        # relative error that would swamp the scheme's strong order
        mv = lambda g, z: jnp.einsum("...dm,...m->...d", g, z,
                                     precision=jax.lax.Precision.HIGHEST)
        h2_in = y + 0.75 * jnp.asarray(dt, y.dtype) * k1 + 1.5 * mv(g0, i10_h)
        k2 = drift(t + 0.75 * dt, h2_in)
        g1 = diffusion(t1, y)
        noise = mv(g1, w - i10_h) + mv(g0, i10_h)
        f_comb = k1 / 3.0 + 2.0 * k2 / 3.0
        return (f_comb, noise)

    return XDETerm(move=move, fuse=_general_fuse, additive=True, kind="sde")


# --- drift-implicit additive ladder (round-4 candidate #6) -----------------
#
# SDIRK2 core for implicit_sra1: Alexander's L-stable 2-stage SDIRK
# (gamma = 1 - sqrt(2)/2, b = (1-gamma, gamma), stiffly accurate). The
# noise-in-stage coefficients B = (B1, B2) are DERIVED from the additive
# strong-1.5 order conditions (same conditions SRA1 satisfies with its
# alpha=(1/3,2/3), B=(0,3/2): alpha.B = 1, alpha.B^2 = 3/2):
#
#   sum_i b_i B_i   = 1    (matches the f_y.g.I10 double integral)
#   sum_i b_i B_i^2 = 3/2  (matches the mean of the f_yy.g^2 O(h^2) term:
#                           E[h * 1/2 f_yy g^2 sum b_i B_i^2 (I10/h)^2]
#                           = h^2/6 sum b_i B_i^2 f_yy g^2, truth h^2/4)
#
# With b = (1-g, g): B2 = 1 + sqrt((1-g)/(2g)), B1 = (1 - g*B2)/(1 - g).


def make_heun_stratonovich_term(drift, diffusion, bm) -> XDETerm:
    """Stratonovich Heun: trapezoidal predictor-corrector in BOTH terms.

        ỹ  = y + f(t0,y) h + g(t0,y) ΔW
        y1 = y + h (f(t0,y)+f(t1,ỹ))/2 + ΔW (g(t0,y)+g(t1,ỹ))/2

    Converges to the STRATONOVICH solution (strong order 0.5 general /
    1.0 additive; for Itô semantics use euler/milstein/sra1). Pinned by test
    against the closed-form Stratonovich GBM ``y0·exp(μt + σW)``.
    """

    def move(t, dt, y):
        t1 = t + dt
        d_w = bm(t, t1)
        f0 = drift(t, y)
        g0 = diffusion(t, y)
        y_pred = jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl * d_w,
            y, f0, g0,
        )
        f1 = drift(t1, y_pred)
        g1 = diffusion(t1, y_pred)
        f_comb = jax.tree.map(lambda a, b: 0.5 * (a + b), f0, f1)
        g_dw = jax.tree.map(lambda a, b: 0.5 * (a + b) * d_w, g0, g1)
        return (f_comb, g_dw)

    def fuse(dy, dt, y):
        f_val, g_dw = dy
        return jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl, y, f_val, g_dw
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_sriw1_term(drift, diffusion, bm) -> XDETerm:
    """SRIW1 (Rössler 2010) for DIAGONAL noise — strong order 1.5.

    The strong-1.5 upgrade over Milstein for state-dependent diagonal noise
    (SRA1 requires additive noise). For diagonal noise every iterated
    stochastic integral the scheme needs is closed-form per component in the
    increment and the tree's exact space-time integral:

        I1   = ΔW            I11  = (ΔW² − h)/2
        I10  = ∫(W_s−W_t)ds  I111 = (ΔW³ − 3hΔW)/6

    Four stages, two stage chains (published SRIW1 tableau: A0/B0 drive the
    drift-supporting chain H0, A1/B1 the diffusion-supporting chain H1):

        H0_2 = y + 3/4 h f1 + 3/2 (I10/h) g1
        H1_2 = y + 1/4 h f1 + 1/2 √h g1
        H1_3 = y +     h f1 −     √h g1
        H1_4 = y + 1/4 h f1 + √h (−5 g1 + 3 g2 + 1/2 g3)
        y1   = y + h (f1/3 + 2 f2/3)
                 + Σ_i (β1_i I1 + β2_i I11/√h + β3_i I10/h + β4_i I111/h) g_i

    with β rows (−1, 4/3, 2/3, 0), (−1, 4/3, −1/3, 0), (2, −4/3, −2/3, 0),
    (−2, 5/3, −2/3, 1) — each of β2..β4 sums to 0 and β1 to 1, so constant g
    collapses to g·ΔW (consistency). Strong order ≈ 1.5 is pinned by test
    against the closed-form GBM solution driven by the same Brownian path.
    (Stage 3's drift value is f(t, y) = f1 because its c0/A0/B0 rows are all
    zero, and α3 = α4 = 0 — only f1, f2 enter the drift combination.)
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u = bm(t, t1, return_U=True)
        safe_dt = jnp.where(dt == 0, jnp.ones_like(dt), dt)

        def lc(base, *pairs):
            """base + Σ coeff * tree, leafwise."""
            trees = [p[1] for p in pairs]
            coeffs = [p[0] for p in pairs]
            return jax.tree.map(
                lambda b, *ls: b + sum(jnp.asarray(c, b.dtype) * l
                                       for c, l in zip(coeffs, ls)),
                base, *trees,
            )

        h = jnp.asarray(safe_dt)
        sqrt_h = jnp.sqrt(h)
        i10_h = jax.tree.map(lambda ul: ul / jnp.asarray(safe_dt, ul.dtype), u)
        i11_rh = jax.tree.map(
            lambda wl: (wl * wl - jnp.asarray(h, wl.dtype))
            / (2.0 * jnp.asarray(sqrt_h, wl.dtype)),
            w,
        )
        i111_h = jax.tree.map(
            lambda wl: (wl**3 - 3.0 * jnp.asarray(h, wl.dtype) * wl)
            / (6.0 * jnp.asarray(h, wl.dtype)),
            w,
        )

        f1 = drift(t, y)
        g1 = diffusion(t, y)

        h0_2 = lc(lc(y, (0.75, jax.tree.map(lambda l: jnp.asarray(h, l.dtype) * l, f1))),
                  (1.5, jax.tree.map(lambda gl, il: gl * il, g1, i10_h)))
        h1_2 = lc(y, (0.25, jax.tree.map(lambda l: jnp.asarray(h, l.dtype) * l, f1)),
                  (0.5, jax.tree.map(lambda l: jnp.asarray(sqrt_h, l.dtype) * l, g1)))
        f2 = drift(t + 0.75 * dt, h0_2)
        g2 = diffusion(t + 0.25 * dt, h1_2)

        h1_3 = lc(y, (1.0, jax.tree.map(lambda l: jnp.asarray(h, l.dtype) * l, f1)),
                  (-1.0, jax.tree.map(lambda l: jnp.asarray(sqrt_h, l.dtype) * l, g1)))
        g3 = diffusion(t1, h1_3)

        h1_4 = lc(y, (0.25, jax.tree.map(lambda l: jnp.asarray(h, l.dtype) * l, f1)),
                  (-5.0, jax.tree.map(lambda l: jnp.asarray(sqrt_h, l.dtype) * l, g1)),
                  (3.0, jax.tree.map(lambda l: jnp.asarray(sqrt_h, l.dtype) * l, g2)),
                  (0.5, jax.tree.map(lambda l: jnp.asarray(sqrt_h, l.dtype) * l, g3)))
        g4 = diffusion(t + 0.25 * dt, h1_4)

        f_comb = jax.tree.map(lambda a, b: a / 3.0 + 2.0 * b / 3.0, f1, f2)

        beta1 = (-1.0, 4.0 / 3.0, 2.0 / 3.0, 0.0)
        beta2 = (-1.0, 4.0 / 3.0, -1.0 / 3.0, 0.0)
        beta3 = (2.0, -4.0 / 3.0, -2.0 / 3.0, 0.0)
        beta4 = (-2.0, 5.0 / 3.0, -2.0 / 3.0, 1.0)

        def noise_leafwise(wl, i11l, i10l, i111l, *gs):
            out = jnp.zeros_like(wl)
            for i, gl in enumerate(gs):
                coeff = (beta1[i] * wl + beta2[i] * i11l
                         + beta3[i] * i10l + beta4[i] * i111l)
                out = out + coeff * gl
            return out

        noise = jax.tree.map(noise_leafwise, w, i11_rh, i10_h, i111_h,
                             g1, g2, g3, g4)
        return (f_comb, noise)

    def fuse(dy, dt, y):
        f_val, noise = dy
        return jax.tree.map(
            lambda yl, fl, nl: yl + jnp.asarray(dt, yl.dtype) * fl + nl, y, f_val, noise
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")




def make_foster2_term(drift, diffusion, bm, substeps: int = 1) -> XDETerm:
    """Cubic polynomial-path method for ADDITIVE diagonal noise — strong
    order ~2.0 (measured).

    Round-3 K-consumer (ROADMAP r2 #3; no reference counterpart): each step
    replaces the Brownian path by the unique cubic ``q(θ)`` matching the
    virtual tree's ``(W, I10, K)`` triple — ``q(0)=0, q(1)=W, ∫q = I10/h,
    ∫(1-θ)q = K/h²`` — and integrates the resulting ODE

        dy/dθ = h f(t+θh, y) + g(t+θh) · q'(θ),   θ ∈ [0, 1]

    with RK4 (the polynomial-path / shifted-ODE construction of
    Foster–Lyons–Oberhauser, rederived here from the moment constraints).
    Requires state-independent ``g`` (the additive contract, as SRA1); the
    bm must carry ``levy_area_approximation='space-time-time'``. For
    constant g the noise contribution telescopes to exactly ``g·W`` (RK4 =
    Simpson is exact on the quadratic q'). Strong order is test-pinned
    against a near-exact OU reference on the same path.
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u, k = bm(t, t1, return_U=True, return_K=True)
        a, b, c = _cubic_path_coeffs(w, u, k, dt)

        def F(theta, yv):
            f_val = drift(t + theta * dt, yv)
            g_val = diffusion(t + theta * dt, yv)
            return jax.tree.map(
                lambda fl, gl, al, bl, cl: (
                    jnp.asarray(dt, fl.dtype) * fl
                    + gl * (3 * al * theta**2 + 2 * bl * theta + cl)
                ),
                f_val, g_val, a, b, c,
            )

        y1 = _rk4_theta(F, y, substeps)
        return jax.tree.map(jnp.subtract, y1, y)

    def fuse(dy, dt, y):
        del dt  # the increment already integrated over the step
        return jax.tree.map(jnp.add, y, dy)

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def make_foster2_general_term(drift, diffusion, bm, substeps: int = 1) -> XDETerm:
    """Cubic polynomial-path method for GENERAL (matrix) ADDITIVE noise.

    Same construction as :func:`make_foster2_term` with ``G(t) ->
    [..., D, M]`` against an M-dimensional Brownian motion: per-channel
    cubic paths, contraction ``G @ q'(θ)`` (HIGHEST precision — TPU bf16
    matmul passes would swamp the order-2 error floor).
    """

    def move(t, dt, y):
        t1 = t + dt
        w, u, k = bm(t, t1, return_U=True, return_K=True)  # [..., M] each
        a, b, c = _cubic_path_coeffs(w, u, k, dt)
        mv = lambda g, z: jnp.einsum("...dm,...m->...d", g, z,
                                     precision=jax.lax.Precision.HIGHEST)

        def F(theta, yv):
            f_val = drift(t + theta * dt, yv)
            g_val = diffusion(t + theta * dt, yv)
            qp = 3 * a * theta**2 + 2 * b * theta + c
            return jnp.asarray(dt, f_val.dtype) * f_val + mv(g_val, qp)

        y1 = _rk4_theta(F, y, substeps)
        return y1 - y

    def fuse(dy, dt, y):
        del dt
        return jax.tree.map(jnp.add, y, dy)

    # additive=False: fuse is y + dy (the increment already integrates the
    # step); the additive=True contract means fuse == y + dt*dy
    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")




def make_general_euler_term(drift, diffusion, bm) -> XDETerm:
    """Euler–Maruyama for GENERAL (matrix) noise: dy = f dt + G(t, y) dW with
    state ``y [..., D]``, diffusion ``G(t, y) -> [..., D, M]`` and an
    M-dimensional Brownian motion (``bm`` size ``y.shape[:-1] + (M,)``).

    Capability beyond the reference's diagonal-only ``BaseSDE.move``
    (``xde/base_sde.py:55-58``). Strong order 0.5.
    """

    def move(t, dt, y):
        d_w = bm(t, t + dt)  # [..., M]
        f_val = drift(t, y)
        g_val = diffusion(t, y)  # [..., D, M]
        g_dw = jnp.einsum("...dm,...m->...d", g_val, d_w,
                          precision=jax.lax.Precision.HIGHEST)
        return (f_val, g_dw)

    return XDETerm(move=move, fuse=_general_fuse, additive=False, kind="sde")


def make_general_milstein_term(drift, diffusion, bm, *, use_area: bool = True) -> XDETerm:
    """Milstein for GENERAL (matrix) noise — strong order 1.0:

        y1 = y + f h + G ΔW + Σ_{j1,j2} (∂G_{·j2}/∂y · G_{·j1}) I(j1,j2)
        I(j1,j2) = (ΔW_{j1} ΔW_{j2} − h δ_{j1j2}) / 2 + A_{j1,j2}

    The directional derivatives come from M ``jvp``s of the diffusion (one per
    noise column, vmapped). ``A`` is the antisymmetric Lévy area from the
    tree's Davie/Foster approximation (``brownian_interval.py:81-107`` math);
    with ``use_area=False`` the A term is dropped — EXACT for commutative
    noise (where ∂G_{·j2}·G_{·j1} is symmetric in (j1,j2) and A cancels
    identically), wrong diffusion law otherwise. Strong order is pinned by a
    measured-convergence test on a two-noise commutative GBM closed form and
    a variance test on the non-commutative Lévy-area triple.
    """

    def move(t, dt, y):
        t1 = t + dt
        if use_area:
            d_w, _, a_mat = bm(t, t1, return_U=True, return_A=True)
        else:
            d_w, a_mat = bm(t, t1), None
        f_val = drift(t, y)
        g_val = diffusion(t, y)  # [..., D, M]
        m = g_val.shape[-1]
        h = jnp.asarray(dt, g_val.dtype)

        def dcol(tangent):
            # ∂G/∂y · tangent, tangent [..., D] -> [..., D, M]
            return jax.jvp(lambda y_: diffusion(t, y_), (y,), (tangent,))[1]

        tangents = jnp.moveaxis(g_val, -1, 0)  # [M, ..., D]
        dg_all = jax.vmap(dcol)(tangents)  # [M, ..., D, M]

        eye = jnp.eye(m, dtype=g_val.dtype)
        i_mat = 0.5 * (d_w[..., :, None] * d_w[..., None, :] - h * eye)
        if a_mat is not None:
            i_mat = i_mat + a_mat
        corr = jnp.einsum("j...dk,...jk->...d", dg_all, i_mat,
                          precision=jax.lax.Precision.HIGHEST)
        g_dw = jnp.einsum("...dm,...m->...d", g_val, d_w,
                          precision=jax.lax.Precision.HIGHEST) + corr
        return (f_val, g_dw)

    return XDETerm(move=move, fuse=_general_fuse, additive=False, kind="sde")
