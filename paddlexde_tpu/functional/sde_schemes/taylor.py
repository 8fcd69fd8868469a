"""Ito-Taylor strong-1.5 schemes: the scalar-noise autodiff expansion and
the general-matrix variant built on level-3 log-signature triple integrals.

Moved verbatim from ``functional/sdeint.py`` in the round-4 registry split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ...xde.term import XDETerm
def make_taylor15_term(drift, diffusion, bm) -> XDETerm:
    """Explicit strong order-1.5 Itô–Taylor scheme for SCALAR noise
    (Kloeden–Platen 10.4.1): ``dy = f(t, y) dt + g(t, y) dW`` with a SINGLE
    Brownian motion driving a vector state through an arbitrary (fully
    coupled, non-diagonal) multiplicative diffusion ``g(t, y) -> y.shape``.

    The strong-1.5 ladder above Milstein for multiplicative noise: sriw1
    needs the diagonal contract, sra1/foster2 need additive noise — this
    scheme has NO structural restriction on g beyond m=1. For one noise
    channel every iterated integral the order-1.5 expansion needs is exact:

        I(1,1) = (ΔW² − h)/2          I(1,1,1) = (ΔW³ − 3hΔW)/6
        I(1,0) = ΔZ (the tree's joint-descent space-time integral, exact)
        I(0,1) = hΔW − ΔZ

    so unlike the m>1 case there is no Lévy-area approximation in the error
    budget. The Taylor update

        y1 = y + f h + g ΔW + L¹g·I(1,1) + L¹f·ΔZ + ½L⁰f·h²
               + L⁰g·(hΔW − ΔZ) + L¹L¹g·I(1,1,1)

    needs the differential operators L⁰ = ∂t + f·∂y + ½g²∂²y and L¹ = g·∂y
    applied to f and g — the classical reason derivative-free SRK schemes
    exist. Under JAX they are three nested ``jvp``s (exact forward-mode
    derivatives, no finite differencing, works for any traced f/g), which is
    why this repo can ship the Taylor scheme directly where torch-based
    libraries (and the reference, whose sdeint is Euler-only —
    ``paddlexde/functional/sdeint.py:9-37``) cannot. Strong order ≈1.5 is
    pinned by tests against closed forms on the same path: scalar GBM,
    time-dependent coefficients (exercising the ∂t terms via (W, U) closed
    forms), and a 2-D COMMUTING-PAIR linear system ``dy = (aI+bB)y dt +
    By dW`` with non-diagonal B (matrix-exponential closed form) that no
    other scheme in the zoo handles above order 1.0.

    Contract: single-array state ``[..., D]``; ``bm`` has size
    ``y.shape[:-1] + (1,)`` (one Brownian channel, broadcast over D) with
    ``levy_area_approximation='space-time'``.
    """

    def move(t, dt, y):
        t1 = t + dt
        w, dz = bm(t, t1, return_U=True)  # [..., 1]; dz = I(1,0), exact
        h = jnp.asarray(dt, y.dtype)
        t_arr = jnp.asarray(t)

        f0 = drift(t, y)
        g0 = diffusion(t, y)

        # L¹φ = (∂φ/∂y)·g0 — one directional jvp
        l1f = jax.jvp(lambda y_: drift(t, y_), (y,), (g0,))[1]
        l1g = jax.jvp(lambda y_: diffusion(t, y_), (y,), (g0,))[1]

        # L¹L¹g: L¹ applied to the FUNCTION y -> (∂g/∂y)(y)·g(y)
        def l1g_fn(y_):
            return jax.jvp(
                lambda yy: diffusion(t, yy), (y_,), (diffusion(t, y_),)
            )[1]

        l1l1g = jax.jvp(l1g_fn, (y,), (g0,))[1]

        # L⁰φ = ∂t φ + (∂φ/∂y)·f0 + ½ Σᵢⱼ g0ᵢ g0ⱼ ∂²φ/∂yᵢ∂yⱼ
        def l0(phi):
            dt_phi = jax.jvp(
                lambda s: phi(s, y), (t_arr,), (jnp.ones_like(t_arr),)
            )[1]
            dy_phi = jax.jvp(lambda y_: phi(t, y_), (y,), (f0,))[1]
            hvv = jax.jvp(
                lambda y_: jax.jvp(lambda yy: phi(t, yy), (y_,), (g0,))[1],
                (y,), (g0,),
            )[1]
            return dt_phi + dy_phi + 0.5 * hvv

        l0f = l0(drift)
        l0g = l0(diffusion)

        i11 = 0.5 * (w * w - h)
        i111 = (w ** 3 - 3.0 * h * w) / 6.0
        incr = (
            h * f0 + g0 * w
            + l1g * i11
            + l1f * dz + 0.5 * (h * h) * l0f
            + l0g * (h * w - dz)
            + l1l1g * i111
        )
        return incr

    def fuse(dy, dt, y):
        del dt  # the increment already integrates the full step
        return jax.tree.map(jnp.add, y, dy)

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")




def _strat_sig23(w, a_mat):
    """Level-2/3 Stratonovich signature of one interval from its (ΔW, A)
    with zero level-3 Lie component: S2 = ½ΔW⊗ΔW + A,
    S3 = ΔW⊗³/6 + (ΔW⊗A + A⊗ΔW)/2 (the level-3 term of exp(ΔW + A))."""
    s2 = 0.5 * w[..., :, None] * w[..., None, :]
    j3 = (
        w[..., :, None, None] * w[..., None, :, None] * w[..., None, None, :]
    ) / 6.0
    if a_mat is not None:
        s2 = s2 + a_mat
        j3 = j3 + 0.5 * (
            w[..., :, None, None] * a_mat[..., None, :, :]
            + a_mat[..., :, :, None] * w[..., None, None, :]
        )
    return s2, j3


def _chen_levels(bm, t, t1, substeps: int, joint_triple: bool = False):
    """(ΔW, A, J3) over [t, t1] by CHEN-composing the level-≤3 Stratonovich
    signatures of ``substeps`` equal tree sub-intervals.

    Each sub-interval contributes its tree increment (exact, additive), its
    per-query area sample, and a ZERO level-3 Lie component; Chen's identity
    S([a,c]) = S([a,b]) ⊗ S([b,c]) then composes them exactly. The composed
    signature is group-like (shuffle identities hold exactly, tested), and
    the law error sits only in the per-sub-interval truncations, both of
    which SHRINK with the substep count k:

    - area: Davie's per-query excess Var is (h/k)²/12 per sub-interval,
      k independent pieces ⇒ total excess h²/(12k) (fourier sub-areas have
      none — their total variance is exact at any k);
    - level-3 Lie: the missing per-sub Lie triple has std O((h/k)^{3/2}),
      k independent pieces ⇒ composed-L3 law error O(h^{3/2}/k), while the
      Chen cross terms of sub-(ΔW, A) BUILD the nonzero Lie component the
      k=1 construction zeroes (measured: E[I3²] moments converge to the
      exact h³ · 1/6 of the Itô isometry as k grows).

    k=1 reproduces :func:`_strat_sig23` on the whole step bit-exactly (the
    previous construction). Cost: 2k tree descents + k area samples per
    step — a correctness dial for strongly non-commuting noise.
    """
    dt = t1 - t
    s1 = None  # running ΔW
    s2 = None
    s3 = None
    for i in range(substeps):
        ta = t + (i / substeps) * dt
        tb = t + ((i + 1) / substeps) * dt if i < substeps - 1 else t1
        if joint_triple:
            # each sub-signature is the exact signature of a KL path
            # (nonzero Lie triple per piece); Chen keeps it group-like
            w, _u, a, p3 = bm(ta, tb, return_U=True, return_A=True,
                              return_J3=True)
            p2 = 0.5 * w[..., :, None] * w[..., None, :] + a
        else:
            w, _u, a = bm(ta, tb, return_U=True, return_A=True)
            p2, p3 = _strat_sig23(w, a)
        if s1 is None:
            s1, s2, s3 = w, p2, p3
        else:
            s3 = (
                s3
                + s2[..., :, :, None] * w[..., None, None, :]
                + s1[..., :, None, None] * p2[..., None, :, :]
                + p3
            )
            s2 = s2 + s1[..., :, None] * w[..., None, :] + p2
            s1 = s1 + w
    a_total = s2 - 0.5 * s1[..., :, None] * s1[..., None, :]
    return s1, a_total, s3


def _levy_triple_integrals(d_w, u, a_mat, h, j3=None):
    """Level-3 iterated Itô integrals ``I(a,b,c)`` from the tree's
    ``(ΔW, U, A)`` via the zero-Lie-component log-signature extension:

        J3[a,b,c] = ΔW_aΔW_bΔW_c/6 + (ΔW_a·A_{bc} + A_{ab}·ΔW_c)/2
        I3[a,b,c] = J3[a,b,c] − ½δ_{ab}·I(0,c) − ½δ_{bc}·I(a,0)

    with ``I(a,0) = U_a`` and ``I(0,c) = hΔW_c − U_c``. (The level-3
    Itô↔Stratonovich conversion is COMPLETE with these two δ-terms: on the
    diagonal it reproduces the exact (ΔW³−3hΔW)/6.) Satisfies every
    shuffle/insertion identity exactly (tested); the fully-symmetrized part
    equals the true integrals' (Lie elements symmetrize to zero), so
    contractions with permutation-symmetric coefficient tensors — the
    commutative-noise case — are exact given exact A. ``a_mat=None`` drops
    the area terms (the commutative contract). A precomputed Stratonovich
    ``j3`` (e.g. :func:`_chen_levels`' composed level 3, which carries a
    sampled nonzero Lie component) overrides the zero-Lie construction.

    Args: ``d_w``/``u``: ``[..., M]``; ``a_mat``: ``[..., M, M]``
    antisymmetric or None; ``h``: step. Returns ``[..., M, M, M]``.
    """
    m = d_w.shape[-1]
    eye = jnp.eye(m, dtype=d_w.dtype)
    if j3 is None:
        _, j3 = _strat_sig23(d_w, a_mat)
    i0c = h * d_w - u
    return (
        j3
        - 0.5 * eye[:, :, None] * i0c[..., None, None, :]
        - 0.5 * u[..., :, None, None] * eye[None, :, :]
    )


def make_general_taylor15_term(
    drift, diffusion, bm, *, use_area: bool = True, triple_substeps: int = 1,
    triple_mode: str = "zero-lie",
) -> XDETerm:
    """Strong order-1.5 Itô–Taylor scheme for GENERAL (matrix) multiplicative
    noise (Kloeden–Platen 10.4.1): ``dy = f dt + G dW`` with ``G(t, y) ->
    [..., D, M]`` against an M-dimensional Brownian motion. The rung above
    :func:`make_general_milstein_term` (strong 1.0) that no structural
    contract in the zoo otherwise reaches for m > 1 multiplicative noise
    (sriw1 is diagonal, sra1/foster2 additive, taylor15 scalar-channel; the
    reference's sdeint is Euler-only, ``paddlexde/functional/sdeint.py:9-37``
    in DrownFish19/PaddleXDE).

    The Taylor update needs the operators (three nested ``jvp`` families —
    the autodiff advantage that lets this repo ship Taylor schemes directly)

        Lʲφ = (∂φ/∂y)·G_{·j}
        L⁰φ = ∂t φ + (∂φ/∂y)·f + ½ Σ_j Hφ[G_{·j}, G_{·j}]

    and the iterated Itô integrals up to level 3. Per channel, ``I(j,0)=U_j``
    (exact from the tree's joint descent) and ``I(0,j)=hΔW_j−U_j``; the pair
    matrix is Milstein's ``I(j1,j2)=½(ΔW_{j1}ΔW_{j2}−hδ)+A`` with the tree's
    Davie/Foster area approximation. The TRIPLE integrals — the classical
    wall for m>1 strong 1.5 — are built from the level-3 log-signature with
    the Lie (irreducible) component set to zero:

        J3[a,b,c] = ΔW_aΔW_bΔW_c/6 + (ΔW_a·A_{bc} + A_{ab}·ΔW_c)/2
        I3[a,b,c] = J3[a,b,c] − ½δ_{ab}·I(0,c) − ½δ_{bc}·I(a,0)

    (Stratonovich J3 = level-3 term of exp(ΔW⊗ + A⊗); the Itô conversion is
    the exact algebra I = J − ½δ-corrections, derived from d⟨J(a,b), W_c⟩ =
    δ_{bc}I(a,0)ds.) This construction satisfies every shuffle/insertion
    identity exactly (it IS a geometric signature), reduces to the exact
    ``(ΔW³−3hΔW)/6`` on the diagonal, and its fully-SYMMETRIZED part equals
    the true one (Lie elements vanish under symmetrization). Consequences,
    measured in the tests:

    - COMMUTATIVE noise ([G_{·j1}, G_{·j2}] = 0 as vector fields): the
      coefficient tensors are fully symmetric, every A term cancels in the
      contraction, and the scheme attains strong order ~1.5 against a
      matrix-exponential closed form (``use_area=False`` — exposed as
      ``taylor15_commutative`` — is then exact-equivalent and needs only a
      space-time bm).
    - NON-commutative noise: with the default ``triple_substeps=1`` the
      accuracy is bounded by the area law approximation and the dropped
      Lie-triple component (std O(h^1.5) per step) — strong order degrades
      toward milstein_general's ~1.0 in the strongly non-commuting
      directions, while all commuting directions keep the 1.5 behaviour.
      ``triple_substeps=k`` (``options={'triple_substeps': k}``) replaces
      the per-query (A, zero-Lie J3) with :func:`_chen_levels`' composed
      sample: the area excess shrinks as h²/(12k) (zero with 'fourier'
      areas) and the Lie-triple law error as O(h^{3/2}/k) — the measured
      E[I3²] moments converge to the exact Itô-isometry h³/6 (the k=1
      middle-word moment sits at 0.53 of truth; k=4 restores it). Cost:
      2k tree descents + k area samples per step. TRUE order-1.5 coupling
      at k=1 for arbitrary noise would need the joint (ΔW, A, I3) KL
      expansion with O(1/h) terms per step (KP 5.8) —
      ``options={'triple_mode': 'fourier'}`` is exactly that expansion
      (round 4): the (A, J3) pair is the EXACT level-≤3 signature of the
      bm's truncated-KL bridge path (``virtual_tree.fourier_triple``;
      requires ``levy_area_approximation='fourier'``; the bm's
      ``levy_fourier_terms`` is KP's p(h) dial). With exact triples the
      scheme MEASURES strong ~1.5 on non-commuting fields against the
      Wong–Zakai-coupled oracle where zero-lie measures ~1.0
      (``tests/functional/test_fourier_triple_order.py``); the residual vs
      the true solution is the O(h/√n) bridge truncation common to every
      KL-class sampler — grow n like h⁻¹..h⁻² for true asymptotic 1.5.
      Composes with ``triple_substeps`` (Chen over joint sub-triples).

    Contract: single-array state ``[..., D]``; ``bm`` of size
    ``y.shape[:-1] + (M,)`` with ``levy_area_approximation``
    davie/foster/fourier (``use_area=True``) or space-time
    (``use_area=False``).
    """
    if triple_mode not in ("zero-lie", "fourier"):
        raise ValueError(
            f"triple_mode must be 'zero-lie' or 'fourier', got {triple_mode!r}"
        )
    joint = triple_mode == "fourier"
    if joint and not use_area:
        raise ValueError(
            "triple_mode='fourier' needs full areas (it IS the area+triple "
            "sampler); taylor15_commutative has no use for it"
        )

    def move(t, dt, y):
        t1 = t + dt
        j3 = None
        if use_area and triple_substeps > 1:
            # Chen-composed (ΔW, A, J3) over tree sub-intervals: the area
            # excess shrinks as h²/(12k) and the level-3 Lie component —
            # zeroed by the k=1 construction — is BUILT by the composition
            # (law → exact as k grows; see _chen_levels). One consistent
            # sample feeds the pair AND triple integrals.
            d_w, a_mat, j3 = _chen_levels(bm, t, t1, triple_substeps,
                                          joint_triple=joint)
            _, u = bm(t, t1, return_U=True)  # exact tree I(j,0)
        elif joint:
            # single-query exact-signature triple (KP 5.8): (W, U, A, J3)
            # all functionals of one truncated-KL path
            d_w, u, a_mat, j3 = bm(t, t1, return_U=True, return_A=True,
                                   return_J3=True)
        elif use_area:
            d_w, u, a_mat = bm(t, t1, return_U=True, return_A=True)
        else:
            d_w, u = bm(t, t1, return_U=True)
            a_mat = None
        f0 = drift(t, y)  # [..., D]
        g0 = diffusion(t, y)  # [..., D, M]
        m = g0.shape[-1]
        h = jnp.asarray(dt, g0.dtype)
        t_arr = jnp.asarray(t)
        hi = jax.lax.Precision.HIGHEST

        cols = jnp.moveaxis(g0, -1, 0)  # [M, ..., D] — the g_j tangents

        # L^{j1} G: [M(j1), ..., D, M(j2)] — M jvps of the diffusion
        def dg_dir(tangent):
            return jax.jvp(lambda y_: diffusion(t, y_), (y,), (tangent,))[1]

        dg_all = jax.vmap(dg_dir)(cols)

        # L^j f: [M, ..., D]
        def df_dir(tangent):
            return jax.jvp(lambda y_: drift(t, y_), (y,), (tangent,))[1]

        ljf = jax.vmap(df_dir)(cols)

        # L⁰φ = ∂tφ + (∂φ/∂y)·f + ½ Σ_j Hφ[g_j, g_j] (per-channel HVPs)
        def l0(phi):
            dt_phi = jax.jvp(
                lambda s: phi(s, y), (t_arr,), (jnp.ones_like(t_arr),)
            )[1]
            dy_phi = jax.jvp(lambda y_: phi(t, y_), (y,), (f0,))[1]

            def hvv(v):
                return jax.jvp(
                    lambda y_: jax.jvp(lambda yy: phi(t, yy), (y_,), (v,))[1],
                    (y,), (v,),
                )[1]

            return dt_phi + dy_phi + 0.5 * jnp.sum(jax.vmap(hvv)(cols), axis=0)

        l0f = l0(drift)  # [..., D]
        l0g = l0(diffusion)  # [..., D, M]

        # L^{j1}L^{j2}G: jvp along g_{j1} of the FUNCTION y -> L^{j2}G(y)
        # (the outer derivative sees y-dependence through both G and its
        # tangent columns) -> c3[j1, j2, ..., D, j3]
        def inner(y_):
            g_ = diffusion(t, y_)
            cols_ = jnp.moveaxis(g_, -1, 0)
            return jax.vmap(
                lambda v: jax.jvp(
                    lambda yy: diffusion(t, yy), (y_,), (v,)
                )[1]
            )(cols_)

        c3 = jax.vmap(lambda v: jax.jvp(inner, (y,), (v,))[1])(cols)

        eye = jnp.eye(m, dtype=g0.dtype)
        i2 = 0.5 * (d_w[..., :, None] * d_w[..., None, :] - h * eye)
        if a_mat is not None:
            i2 = i2 + a_mat
        i0c = h * d_w - u  # I(0,c) per channel
        i3 = _levy_triple_integrals(d_w, u, a_mat, h, j3)

        mv = lambda g, z: jnp.einsum("...dm,...m->...d", g, z, precision=hi)
        pair = jnp.einsum("j...dk,...jk->...d", dg_all, i2, precision=hi)
        trip = jnp.einsum("ij...dk,...ijk->...d", c3, i3, precision=hi)
        incr = (
            h * f0
            + mv(g0, d_w)
            + pair
            + jnp.einsum("j...d,...j->...d", ljf, u, precision=hi)
            + 0.5 * (h * h) * l0f
            + mv(l0g, i0c)
            + trip
        )
        return incr

    def fuse(dy, dt, y):
        del dt  # the increment already integrates the full step
        return jax.tree.map(jnp.add, y, dy)

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")
