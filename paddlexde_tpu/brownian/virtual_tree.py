"""Stateless virtual Brownian tree: counter-based, jit-safe, bit-reproducible.

TPU-native replacement for the reference's ``BrownianInterval``
(``paddlexde/utils/brownian/brownian_interval.py`` in DrownFish19/PaddleXDE) —
a CPU-side object graph of lazily split intervals with an LRU cache,
trampolined recursion, and (defectively, SURVEY §2.11-9) *unseeded* sampling.
Here the same Brownian-bridge mathematics runs as a fixed-depth bisection
entirely inside ``jit``:

- ``W(s)`` descends a dyadic binary tree over ``[t0, t1]``; the midpoint value
  of each interval is drawn from the exact bridge conditional
  ``W_m | W_a, W_b ~ N((W_a+W_b)/2, (b-a)/4)`` with noise keyed by
  ``jax.random.fold_in(key, node_id)`` — same node, same noise, forever: the
  reproducibility-by-entropy that the reference intends but silently breaks
  (its ``_Interval._randn`` ignores its seed, ``brownian_interval.py:246-251``).
- Increments are differences of absolute values, so queries are additive and
  consistent across overlapping intervals by construction — no cache, no
  dependency-tree tuning (``:582-668``), O(depth) per query, vectorized over
  the state shape.
- Space-time Lévy area ``H`` and full Lévy area ``A`` are sampled per query
  from their exact conditionals (H | W ~ N(0, h/12); Davie / Foster
  approximations ported from ``brownian_interval.py:81-107``), keyed by the
  query interval's bit pattern — reproducible per (ta, tb). Deviation from the
  reference: H is consistent per-query, not under interval composition (the
  reference's composition algebra sat on top of broken RNG anyway).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "brownian_value_levy",
    "brownian_value_levy_k",
    "brownian_value",
    "brownian_increment",
    "brownian_triple",
    "space_time_levy_area",
    "davie_foster_area",
    "fourier_area",
    "fourier_path_coeffs",
    "fourier_triple",
    "reverse_triple",
    "h_to_u",
]

_DEFAULT_DEPTH = 24


def tol_to_depth(t0: float, t1: float, tol: Optional[float]) -> int:
    """depth cap 28: node ids grow as ~2^(depth+2) and the Lévy descent folds
    2*node+1, which must stay below 2^31 to avoid uint32 wraparound colliding
    with other nodes' (and the root samples') fold keys."""
    if tol is None or tol <= 0:
        return _DEFAULT_DEPTH
    span = abs(float(t1) - float(t0))
    if span == 0:
        return 1
    return max(1, min(28, int(math.ceil(math.log2(span / tol)))))


def brownian_value(key, t0, t1, s, shape=(), dtype=jnp.float32, depth: int = _DEFAULT_DEPTH, w_total=None):
    """Absolute W(s) with W(t0) = 0, via fixed-depth bridge bisection.

    ``w_total`` optionally pins W(t1) (the reference's ``W=`` ctor argument).
    """
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    s = jnp.clip(jnp.asarray(s, dtype), t0, t1)

    span = t1 - t0
    if w_total is None:
        w_total = (
            jax.random.normal(jax.random.fold_in(key, 1), shape, dtype)
            * jnp.sqrt(jnp.maximum(span, 0.0))
        )
    else:
        w_total = jnp.asarray(w_total, dtype)

    def body(_, carry):
        a, b, wa, wb, node = carry
        m = 0.5 * (a + b)
        # exact bridge conditional at the midpoint
        x = jax.random.normal(jax.random.fold_in(key, node), shape, dtype)
        wm = 0.5 * (wa + wb) + 0.5 * jnp.sqrt(jnp.maximum(b - a, 0.0)) * x
        go_left = s < m
        a2 = jnp.where(go_left, a, m)
        b2 = jnp.where(go_left, m, b)
        wa2 = jnp.where(go_left, wa, wm)
        wb2 = jnp.where(go_left, wm, wb)
        node2 = jnp.where(go_left, 2 * node, 2 * node + 1)
        return (a2, b2, wa2, wb2, node2)

    init = (t0, t1, jnp.zeros(shape, dtype), w_total, jnp.asarray(2, jnp.uint32))
    a, b, wa, wb, _ = jax.lax.fori_loop(0, depth, body, init)
    frac = jnp.where(b == a, jnp.zeros_like(a), (s - a) / (b - a))
    return wa + frac * (wb - wa)


def brownian_increment(key, t0, t1, ta, tb, shape=(), dtype=jnp.float32, depth: int = _DEFAULT_DEPTH, w_total=None):
    """W(tb) - W(ta); consistent and additive across queries."""
    w_b = brownian_value(key, t0, t1, tb, shape, dtype, depth, w_total)
    w_a = brownian_value(key, t0, t1, ta, shape, dtype, depth, w_total)
    return w_b - w_a


def brownian_value_levy(
    key, t0, t1, s, shape=(), dtype=jnp.float32, depth: int = _DEFAULT_DEPTH, w_total=None
):
    """(W(s), U(s)) with W(t0)=0, U(s)=∫_{t0}^{s} W du — joint bridge descent.

    Carries each interval's local (w, h) pair down the dyadic tree using the
    exact joint bridge split (the reference's ``_increment_and_space_time_levy_
    area`` formulas, ``brownian_interval.py:199-236``, specialized to equal
    halves), accumulating the ABSOLUTE (W, U) of the descended interval's left
    edge. Because the returned quantities are absolute path functionals,
    interval queries composed from them are consistent by construction:
    ``U_{s,u} = U_{s,t} + U_{t,u} + (u-t)(W(t)-W(s))`` holds exactly — the
    property the reference's cache algebra aims for (on top of broken RNG).
    """
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    s = jnp.clip(jnp.asarray(s, dtype), t0, t1)
    span = t1 - t0

    if w_total is None:
        w_total = (
            jax.random.normal(jax.random.fold_in(key, 1), shape, dtype)
            * jnp.sqrt(jnp.maximum(span, 0.0))
        )
    else:
        w_total = jnp.asarray(w_total, dtype)
    # root space-time Lévy area: H | W ~ N(0, span/12), independent of W
    h_total = (
        jax.random.normal(jax.random.fold_in(key, 3), shape, dtype)
        * jnp.sqrt(jnp.maximum(span / 12.0, 0.0))
    )

    _rsqrt3 = float(1.0 / np.sqrt(3.0))  # python float: weak-typed, no f64 promotion

    def body(_, carry):
        a, b, w_abs, u_abs, w, h, node = carry
        m = 0.5 * (a + b)
        delta = b - a
        half = 0.5 * delta

        x1 = jax.random.normal(jax.random.fold_in(key, 2 * node), shape, dtype)
        x2 = jax.random.normal(jax.random.fold_in(key, 2 * node + 1), shape, dtype)

        # equal-halves specialization of the reference split (left_diff ==
        # right_diff == delta/2): v = 0.5/sqrt(delta); coefficients follow
        sqrt_delta = jnp.sqrt(jnp.maximum(delta, jnp.finfo(dtype).tiny))
        v = 0.5 / sqrt_delta
        a_coef = v * half * half / delta  # == v * delta / 4
        c_coef = v * _rsqrt3
        third = 2.0 * (a_coef * half + a_coef * half) / delta  # == v * delta ... x1 weight

        w_left = 0.5 * w + 1.5 * h + third * x1
        h_left = 0.25 * h - a_coef * x1 + c_coef * half * x2
        w_right = w - w_left
        h_right = 0.25 * h - a_coef * x1 - c_coef * half * x2

        go_left = s < m
        # absolute left-edge accumulators advance only when we descend right
        u_left = half * (w_abs + 0.5 * w_left + h_left)
        w_abs2 = jnp.where(go_left, w_abs, w_abs + w_left)
        u_abs2 = jnp.where(go_left, u_abs, u_abs + u_left)

        a2 = jnp.where(go_left, a, m)
        b2 = jnp.where(go_left, m, b)
        w2 = jnp.where(go_left, w_left, w_right)
        h2 = jnp.where(go_left, h_left, h_right)
        node2 = jnp.where(go_left, 2 * node, 2 * node + 1)
        return (a2, b2, w_abs2, u_abs2, w2, h2, node2)

    init = (
        t0, t1,
        jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
        w_total, h_total,
        jnp.asarray(2, jnp.uint32),
    )
    a, b, w_abs, u_abs, w, h, _ = jax.lax.fori_loop(0, depth, body, init)
    frac = jnp.where(b == a, jnp.zeros_like(a), (s - a) / (b - a))
    w_s = w_abs + frac * w
    # within-leaf: treat W as linear => ∫_a^s (W_u - W_a) du ≈ (s-a) * frac*w/2
    u_s = u_abs + (s - a) * (w_abs + 0.5 * frac * w)
    return w_s, u_s


def brownian_value_levy_k(
    key, t0, t1, s, shape=(), dtype=jnp.float32, depth: int = _DEFAULT_DEPTH,
    w_total=None,
):
    """(W(s), U(s), V(s)) with U = ∫ W, V = ∫ U — the (W, H, K) joint descent.

    Round-3 extension of :func:`brownian_value_levy` (ROADMAP r2 #3): the
    descent carries each interval's LOCAL triple ``(w, u, k)`` with
    ``k = ∫_a^b ∫_a^s (W_v - W_a) dv ds``, so K-consuming schemes
    (high-order additive noise, Foster's cubic polynomial path) get
    composition-consistent space-time-time areas.

    The split is the EXACT 3-dim bridge conditional: with the standardized
    covariance of ``(w, u, k)/(δ^{1/2}, δ^{3/2}, δ^{5/2})``
    Σ = [[1,1/2,1/6],[1/2,1/3,1/8],[1/6,1/8,1/20]] (verified against
    Monte-Carlo path statistics), the scaled left-child triple is
    ``X̂₁ = C P̂ + L ξ`` with closed-form C, L derived from Gaussian
    conditioning (and verified: children marginally Σ, independent, parent
    reproduced — a 2-dim split that ignores k̂_p breaks the child cross-
    covariances, measured −16% on Cov(u₁, k₁), so conditioning on the FULL
    parent triple is load-bearing). W and U from this tree agree with
    :func:`brownian_value_levy` in LAW but not sample-wise — one bm instance
    must route all its queries through one descent (api.py does).

    Chaining: ``k = k₁ + η u₁ + (η²/2) w₁ + k₂`` (η = child length); root
    ``k̂ | (ŵ, û) = −ŵ/12 + û/2 + ξ/√720``.
    """
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    s = jnp.clip(jnp.asarray(s, dtype), t0, t1)
    span = t1 - t0

    if w_total is None:
        w_total = (
            jax.random.normal(jax.random.fold_in(key, 1), shape, dtype)
            * jnp.sqrt(jnp.maximum(span, 0.0))
        )
    else:
        w_total = jnp.asarray(w_total, dtype)
    h_total = (
        jax.random.normal(jax.random.fold_in(key, 3), shape, dtype)
        * jnp.sqrt(jnp.maximum(span / 12.0, 0.0))
    )
    # root K: k̂ = -ŵ/12 + û/2 + ξ/√720, with û = ŵ/2 + ĥ where ĥ = H/√δ...
    # in unscaled terms: u_root = span*(w/2 + h), k̂ = u_root/span^{3/2}... all
    # done in scaled space below
    sqrt_span = jnp.sqrt(jnp.maximum(span, jnp.finfo(dtype).tiny))
    w_hat = w_total / sqrt_span
    u_root = span * (0.5 * w_total + h_total)
    u_hat = u_root / (span * sqrt_span)
    xi_root = jax.random.normal(
        jax.random.fold_in(jax.random.fold_in(key, 3), 1), shape, dtype
    )
    _s720 = float(1.0 / np.sqrt(720.0))
    k_hat_root = -w_hat / 12.0 + 0.5 * u_hat + _s720 * xi_root
    k_total = k_hat_root * span * span * sqrt_span  # δ^{5/2}

    # exact 3-dim conditional split constants (scaled space; closed forms
    # verified numerically at import-time precision):
    #   C = [[-1/(2√2),  3/√2,      0    ],
    #        [ 1/(8√2), -7/(4√2), 15/(2√2)],
    #        [ 1/(8√2), -5/(4√2),  2√2   ]]
    #   L = [[1/(2√2), 0,       0       ],
    #        [0,       1/(8√6), 0       ],
    #        [-√2/48,  0,       1/√1440 ]]
    _r2 = float(np.sqrt(2.0))
    _C = [
        (float(-1 / (2 * _r2)), float(3 / _r2), 0.0),
        (float(1 / (8 * _r2)), float(-7 / (4 * _r2)), float(15 / (2 * _r2))),
        (float(1 / (8 * _r2)), float(-5 / (4 * _r2)), float(2 * _r2)),
    ]
    _L = (
        float(1 / (2 * _r2)),
        float(1 / (8 * np.sqrt(6.0))),
        float(-_r2 / 48),
        float(1 / np.sqrt(1440.0)),
    )

    def body(_, carry):
        a, b, w_abs, u_abs, v_abs, w, u, k, node = carry
        m = 0.5 * (a + b)
        delta = b - a
        half = 0.5 * delta

        x1 = jax.random.normal(jax.random.fold_in(key, 2 * node), shape, dtype)
        x2 = jax.random.normal(jax.random.fold_in(key, 2 * node + 1), shape, dtype)
        x3 = jax.random.normal(
            jax.random.fold_in(jax.random.fold_in(key, node), 3), shape, dtype
        )

        sqrt_delta = jnp.sqrt(jnp.maximum(delta, jnp.finfo(dtype).tiny))
        sqrt_half = jnp.sqrt(jnp.maximum(half, jnp.finfo(dtype).tiny))
        w_hat = w / sqrt_delta
        u_hat = u / (delta * sqrt_delta)
        k_hat = k / (delta * delta * sqrt_delta)

        w1_hat = _C[0][0] * w_hat + _C[0][1] * u_hat + _L[0] * x1
        u1_hat = (
            _C[1][0] * w_hat + _C[1][1] * u_hat + _C[1][2] * k_hat + _L[1] * x2
        )
        k1_hat = (
            _C[2][0] * w_hat + _C[2][1] * u_hat + _C[2][2] * k_hat
            + _L[2] * x1 + _L[3] * x3
        )
        w_left = w1_hat * sqrt_half
        u_left = u1_hat * half * sqrt_half
        k_left = k1_hat * half * half * sqrt_half
        # chaining gives the right child exactly
        w_right = w - w_left
        u_right = u - u_left - half * w_left
        k_right = k - k_left - half * u_left - 0.5 * half * half * w_left

        go_left = s < m
        # absolute accumulators advance only when descending right:
        # U(m) = U(a) + η W(a) + u_left
        # V(m) = V(a) + η U(a) + (η²/2) W(a) + k_left
        u_mid = half * w_abs + u_left
        v_mid = half * u_abs + 0.5 * half * half * w_abs + k_left
        w_abs2 = jnp.where(go_left, w_abs, w_abs + w_left)
        u_abs2 = jnp.where(go_left, u_abs, u_abs + u_mid)
        v_abs2 = jnp.where(go_left, v_abs, v_abs + v_mid)

        a2 = jnp.where(go_left, a, m)
        b2 = jnp.where(go_left, m, b)
        w2 = jnp.where(go_left, w_left, w_right)
        u2 = jnp.where(go_left, u_left, u_right)
        k2 = jnp.where(go_left, k_left, k_right)
        node2 = jnp.where(go_left, 2 * node, 2 * node + 1)
        return (a2, b2, w_abs2, u_abs2, v_abs2, w2, u2, k2, node2)

    init = (
        t0, t1,
        jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
        w_total, u_root, k_total,
        jnp.asarray(2, jnp.uint32),
    )
    a, b, w_abs, u_abs, v_abs, w, u, k, _ = jax.lax.fori_loop(0, depth, body, init)
    lam = b - a
    frac = jnp.where(lam == 0, jnp.zeros_like(a), (s - a) / lam)
    ds = s - a
    w_s = w_abs + frac * w
    u_s = u_abs + ds * (w_abs + 0.5 * frac * w)
    # within-leaf V: linear-W approximation of the local double integral
    safe_lam = jnp.where(lam == 0, jnp.ones_like(lam), lam)
    k_loc = w * ds * ds * ds / (6.0 * safe_lam)
    v_s = v_abs + ds * u_abs + 0.5 * ds * ds * w_abs + k_loc
    return w_s, u_s, v_s


def brownian_triple(
    key, t0, t1, ta, tb, shape=(), dtype=jnp.float32, depth: int = _DEFAULT_DEPTH,
    w_total=None,
):
    """(w, u, k) LOCAL to [ta, tb]: increment, ∫(W−W_ta), ∫∫(W−W_ta).

    ``k = ∫_ta^tb ∫_ta^s (W_v − W_ta) dv ds = ∫_ta^tb (tb−v)(W_v − W_ta) dv``
    — the space-time-time integral high-order additive-noise schemes consume.
    Composition-consistent across queries (differences of the absolute
    (W, U, V) functionals from one tree).
    """
    w_b, u_b, v_b = brownian_value_levy_k(key, t0, t1, tb, shape, dtype, depth, w_total)
    w_a, u_a, v_a = brownian_value_levy_k(key, t0, t1, ta, shape, dtype, depth, w_total)
    delta = jnp.asarray(tb, dtype) - jnp.asarray(ta, dtype)
    w = w_b - w_a
    u = u_b - u_a - w_a * delta
    k = v_b - v_a - delta * u_a - 0.5 * delta * delta * w_a
    return w, u, k


def _query_key(key, ta, tb):
    """Reproducible per-(ta, tb) key from the interval's float bit pattern.

    float64 times fold in BOTH 32-bit halves of the 64-bit pattern: a plain
    f32 downcast would collide distinct fine-step intervals (times closer than
    f32 resolution), silently duplicating the per-query Lévy-area noise.

    The ``where`` canonicalizes the zero sign: −0.0 and +0.0 are the SAME
    time but different bit patterns, and ReverseBrownian's ``-tb`` produces
    −0.0 whenever a query ends at the origin — without the canonicalization
    the reversed solve would re-draw (not retrace) the area of every
    interval touching t = 0 (caught by tests/brownian/test_fourier_triple.py
    's reverse contract). ``where`` rather than ``t + 0.0``: XLA's algebraic
    simplifier may fold the add away.
    """

    def fold_time(k, t):
        t = jnp.asarray(t)
        t = jnp.where(t == 0, jnp.zeros_like(t), t)
        if t.dtype == jnp.float64:
            bits = jax.lax.bitcast_convert_type(t, jnp.int64)
            lo = jax.lax.convert_element_type(
                jax.lax.bitwise_and(bits, jnp.int64(0xFFFFFFFF)), jnp.uint32
            )
            hi = jax.lax.convert_element_type(
                jax.lax.shift_right_logical(bits, jnp.int64(32)), jnp.uint32
            )
            return jax.random.fold_in(jax.random.fold_in(k, lo), hi)
        bits = jax.lax.bitcast_convert_type(t.astype(jnp.float32), jnp.int32)
        return jax.random.fold_in(k, bits)

    return fold_time(fold_time(key, ta), tb)


def space_time_levy_area(key, ta, tb, w, shape=(), dtype=jnp.float32):
    """H over [ta, tb] sampled from the exact conditional H | W ~ N(0, h/12).

    CHEAP PER-QUERY PATH — composition-INconsistent by construction: H values
    for [a,m] and [m,b] do not compose to the H of [a,b] (each query draws
    from an independent per-(ta,tb) key). Never mix these values with the
    joint-descent U/H returned by :class:`~.api.BrownianInterval` (the single
    default every solver uses — it routes ALL queries, W included, through the
    consistent joint (W, ∫W) descent). Use this only for standalone,
    single-interval statistics.
    """
    del w  # H is independent of W in the space-time decomposition
    h = jnp.asarray(tb, dtype) - jnp.asarray(ta, dtype)
    x = jax.random.normal(_query_key(key, ta, tb), shape, dtype)
    return jnp.sqrt(jnp.maximum(h / 12.0, 0.0)) * x


def h_to_u(w, h_levy, h):
    """U = h * (W/2 + H) (reference ``_H_to_U``, ``brownian_interval.py:110-111``)."""
    return h * (0.5 * w + h_levy)


def davie_foster_area(key, ta, tb, w, h_levy, *, foster: bool = False):
    """Full Lévy area approximation A from (W, H).

    Port of ``_davie_foster_approximation`` (``brownian_interval.py:81-107``):
    Davie's approximation ``A_ij = H_i W_j - W_i H_j + noise`` with
    skew-symmetric noise of std sqrt(h^2/12), or Foster's variance correction
    ``std = sqrt(h/10 * (h/10 + H_i^2 + H_j^2))``. Scalar/1-D states have zero
    area (treated as batch of 1-D Brownian motions, as the reference does).
    """
    if w.ndim in (0, 1):
        return jnp.zeros_like(w)
    h = jnp.asarray(tb, w.dtype) - jnp.asarray(ta, w.dtype)
    a_mat = h_levy[..., :, None] * w[..., None, :] - w[..., :, None] * h_levy[..., None, :]
    noise = jax.random.normal(
        jax.random.fold_in(_query_key(key, ta, tb), 2),
        w.shape + (w.shape[-1],),
        w.dtype,
    )
    noise = noise - jnp.swapaxes(noise, -1, -2)  # skew-symmetric, variance 2
    if foster:
        tenth_h = 0.1 * h
        h_sq = h_levy**2
        std = jnp.sqrt(tenth_h * (tenth_h + h_sq[..., :, None] + h_sq[..., None, :]))
    else:
        std = jnp.sqrt(h * h / 12.0)
    return a_mat + std * noise


def fourier_area(key, ta, tb, w, h_levy, *, n_terms: int = 8):
    """Full Lévy area from (W, H) via the bridge's Fourier/KL expansion
    (Kloeden–Platen §5.8 / Wiktorsson 2001 class; no reference counterpart —
    its menu stops at Davie/Foster, ``brownian_interval.py:81-107``).

    Write W_t = (t/h)ΔW + B_t with B the bridge, expanded as
    ``B_t = Σ_r a_r(cos(ωrt) − 1) + b_r sin(ωrt)`` (ω = 2π/h; a_r, b_r iid
    N(0, σ_r²), σ_r² = h/(2π²r²)). Then EXACTLY (derivation in this round's
    notes, variance-checked below):

        A = ΔW αᵀ − α ΔWᵀ + π Σ_r r (a_r b_rᵀ − b_r a_rᵀ),   α = Σ_r a_r,

    and α is NOT free — the tree's space-time area pins it: α = −H. The
    first ``n_terms`` (a_r, b_r) pairs are sampled (the a's conditioned on
    their full-series sum equalling −H), and the dropped r > n tail is
    replaced by an antisymmetric Gaussian with its exact variance
    (Wiktorsson's tail-matching): per entry Var = (h²/2π²)·Σ_{r>n} r⁻².

    Law facts (test-pinned): total Var(A_ij) = h²/6 + h²/12 = h²/4 — the
    exact value for EVERY n (the tail carries the exact missing variance),
    unlike Davie's h²/3 (its +h²/12 excess is the documented overshoot in
    the Lévy-triple test). n buys the higher/conditional moments: the exact
    Var(A_ij | W, H) = h²/20 + (h/5)(H_i² + H_j²) (H-dependent, which no
    constant-variance tail can represent) and Lévy's characteristic function
    E[cos λA | ΔW=0] = (λh/2)/sinh(λh/2) are approached as n grows.
    Per-query approximation like Davie/Foster: values do NOT chain across
    interval splits (only their law does).
    """
    if w.ndim in (0, 1):
        return jnp.zeros_like(w)
    h = jnp.asarray(tb, w.dtype) - jnp.asarray(ta, w.dtype)
    h = jnp.maximum(h, jnp.zeros_like(h))
    qkey = jax.random.fold_in(_query_key(key, ta, tb), 3)
    k_a, k_b, k_r, k_z = jax.random.split(qkey, 4)
    m = w.shape[-1]
    alpha = -h_levy  # Σ_r a_r, pinned by the tree's (W, U)

    pair = jnp.zeros(w.shape + (m,), w.dtype)
    if n_terms > 0:
        r = jnp.arange(1, n_terms + 1, dtype=w.dtype)
        sig2 = h / (2.0 * jnp.pi**2 * r**2)  # [n] (h is the scalar span)
        sig = jnp.sqrt(sig2)
        s_total = h / 12.0  # Var(Σ_r a_r), full series
        bshape = w.shape[:-1] + (n_terms, m)
        a_t = jax.random.normal(k_a, bshape, w.dtype) * sig[..., :, None]
        s_tail = jnp.maximum(s_total - jnp.sum(sig2, -1), 0.0)
        rest = jax.random.normal(k_r, w.shape, w.dtype) * jnp.sqrt(s_tail)
        tot = jnp.sum(a_t, axis=-2) + rest
        safe_s = jnp.where(s_total == 0, jnp.ones_like(s_total), s_total)
        a = a_t + (sig2 / safe_s)[..., :, None] * (alpha - tot)[..., None, :]
        b = jax.random.normal(k_b, bshape, w.dtype) * sig[..., :, None]
        ra = r[..., :, None] * a
        pair = jnp.pi * (
            jnp.einsum("...ri,...rj->...ij", ra, b)
            - jnp.einsum("...ri,...rj->...ij", b, ra)
        )
        psi_n = jnp.pi**2 / 6.0 - float(np.sum(1.0 / np.arange(1, n_terms + 1) ** 2))
    else:
        psi_n = jnp.pi**2 / 6.0
    mean = w[..., :, None] * alpha[..., None, :] - alpha[..., :, None] * w[..., None, :]
    z = jax.random.normal(k_z, w.shape + (m,), w.dtype)
    tail = (h * jnp.sqrt(psi_n) / (2.0 * jnp.pi)) * (z - jnp.swapaxes(z, -1, -2))
    return mean + pair + tail


def fourier_path_coeffs(key, ta, tb, w, h_levy, *, n_terms: int = 8):
    """Sample the truncated-KL bridge coefficients ξ = (ΔW, a_1..a_n, b_1..b_n)
    of one query interval — the SMOOTH PATH whose exact level-≤3 signature
    :func:`fourier_triple` returns.

        W(x·h) = ΔW·x + Σ_r [a_r (cos(2πrx) − 1) + b_r sin(2πrx)],  x ∈ [0,1]

    a_r, b_r iid N(0, σ_r² = h/(2π²r²)), with the a's conditioned EXACTLY on
    Σ_{r≤n} a_r = −H so the path's time integral matches the tree's U
    (∫₀ʰ B dt = −h·Σa_r = h·H): the sampled (ΔW, U, A, J3) are then all
    exact functionals of ONE path. This differs from :func:`fourier_area`'s
    conditioning (there the FULL series sum is conditioned and a variance-
    matched tail restores Var(A) exactly); conditioning the truncated sum
    instead shifts the (A | H) law by O(1/n) — the same order as the
    truncation itself — in exchange for exact path consistency, which is
    what the level-3 construction needs (a tail bolted onto A has no
    consistent J3). Per-query keyed like the other area samplers: values do
    not chain across interval splits (only their law does).

    Returns ``xi`` of shape ``w.shape[:-1] + (2n+1, M)``.
    """
    dtype = w.dtype
    h = jnp.asarray(tb, dtype) - jnp.asarray(ta, dtype)
    h = jnp.maximum(h, jnp.zeros_like(h))
    m = w.shape[-1]
    if n_terms == 0:
        return w[..., None, :]
    qkey = jax.random.fold_in(_query_key(key, ta, tb), 4)
    k_a, k_b = jax.random.split(qkey)
    r = jnp.arange(1, n_terms + 1, dtype=dtype)
    sig2 = h / (2.0 * jnp.pi**2 * r**2)  # [n]
    sig = jnp.sqrt(sig2)
    bshape = w.shape[:-1] + (n_terms, m)
    a_raw = jax.random.normal(k_a, bshape, dtype) * sig[..., :, None]
    b = jax.random.normal(k_b, bshape, dtype) * sig[..., :, None]
    s_n = jnp.sum(sig2, -1)
    safe_s = jnp.where(s_n == 0, jnp.ones_like(s_n), s_n)
    alpha = -h_levy  # Σ_{r≤n} a_r, pinned so ∫B dt = h·H exactly
    a = a_raw + (sig2 / safe_s)[..., :, None] * (
        alpha - jnp.sum(a_raw, axis=-2)
    )[..., None, :]
    return jnp.concatenate([w[..., None, :], a, b], axis=-2)


def fourier_triple(key, ta, tb, w, h_levy, *, n_terms: int = 8):
    """Joint (A, J3): the EXACT level-2/3 Stratonovich signature of the
    truncated-KL bridge path (:func:`fourier_path_coeffs`) — the single-query
    level-3 sampler of Kloeden–Platen §5.8 that VERDICT r3 item 3 asked for
    (no reference counterpart: ``brownian_interval.py:81-107`` in
    DrownFish19/PaddleXDE stops at Davie/Foster level-2 pairs).

    The signature is computed by contracting the precomputed closed-form
    resonance tensors (:mod:`.trig_poly`) with ξ — iterated integrals are
    reparametrization-invariant, so the [0,1] tensors apply at any h — then
    REBUILT as exp(ΔW + A + ℓ3) with ℓ3 the Dynkin projection ρ/3 of the
    level-3 log component (ρ(δ)[a,b,c] = δ[abc] − δ[bac] − δ[bca] + δ[cba],
    the left-normed bracketing map; ρ/3 is the identity on Lie elements).
    The raw contraction is already group-like to fp (it IS a path
    signature); the exp-rebuild makes every shuffle identity hold machine-
    EXACTLY by construction and keeps (w, A, J3) algebraically consistent.

    Law facts (test-pinned): sym(J3) = ΔW⊗³/6 exact at every n; the Lie
    component's law → truth as n grows (E[I3(w)²] → h³/6 for every word —
    the middle-word moment the zero-Lie construction caps at ~0.53);
    Var(A) = (h²/4)(1 − O(1/n)) — no variance tail, see
    :func:`fourier_path_coeffs`. For TRUE strong-1.5 use of the triple at
    step h, n must grow like h⁻¹..h⁻² (KP §5.8's p(h)) — at fixed n the
    residual is the O(h/√n) bridge truncation, same as every KL-class
    sampler; the win over the Chen ``triple_substeps`` dial is ONE tree
    query + O(n²·M³) flops per step and exact (W, U, A, J3) consistency.

    Returns ``(a_mat, j3)`` with shapes ``[..., M, M]`` / ``[..., M, M, M]``.
    """
    if w.ndim in (0, 1):
        # scalar / 1-D states are a batch of independent 1-D BMs: zero area,
        # and any 1-D path's level-3 signature is W³/6 exactly
        return jnp.zeros_like(w), (w**3) / 6.0
    from .trig_poly import signature_tensors

    t2_np, t3_np = signature_tensors(int(n_terms))
    t2 = jnp.asarray(t2_np, w.dtype)
    t3 = jnp.asarray(t3_np, w.dtype)
    xi = fourier_path_coeffs(key, ta, tb, w, h_levy, n_terms=n_terms)
    j2 = jnp.einsum("ij,...ia,...jb->...ab", t2, xi, xi)
    a_mat = 0.5 * (j2 - jnp.swapaxes(j2, -1, -2))
    j3_raw = jnp.einsum("ijk,...ia,...jb,...kc->...abc", t3, xi, xi, xi)
    # exp(ΔW + A) level-3 part, then Dynkin-project the remainder onto Lie
    j3_exp = (
        w[..., :, None, None] * w[..., None, :, None] * w[..., None, None, :]
    ) / 6.0 + 0.5 * (
        w[..., :, None, None] * a_mat[..., None, :, :]
        + a_mat[..., :, :, None] * w[..., None, None, :]
    )
    delta = j3_raw - j3_exp
    # ρ(δ)[p,q,r] = δ[pqr] − δ[qpr] − δ[qrp] + δ[rqp] (left-normed bracket
    # map); ρ/3 is the identity on Lie elements (Dynkin–Specht–Wever)
    rho = (
        delta
        - jnp.einsum("...bac->...abc", delta)
        - jnp.einsum("...bca->...abc", delta)
        + jnp.einsum("...cba->...abc", delta)
    )
    return a_mat, j3_exp + rho / 3.0


def reverse_triple(w, a_mat, j3):
    """(Ã, J̃3) of the TIME-REVERSED query from the forward (ΔW, A, J3): the
    reversed path's signature is the group inverse exp(−ΔW − A − ℓ3), so with
    ℓ3 = J3 − ΔW⊗³/6 − (ΔW⊗A + A⊗ΔW)/2:

        Ã = −A,   J̃3 = −ΔW⊗³/6 + (ΔW⊗A + A⊗ΔW)/2 − ℓ3

    (consistent with ΔW̃ = −ΔW: the −Ã cross terms rebuild with a + sign).
    Used by ``ReverseBrownian`` so reverse-time taylor15_general works with
    the joint triple exactly as with pair-level areas."""
    cube = (
        w[..., :, None, None] * w[..., None, :, None] * w[..., None, None, :]
    ) / 6.0
    cross = 0.5 * (
        w[..., :, None, None] * a_mat[..., None, :, :]
        + a_mat[..., :, :, None] * w[..., None, None, :]
    )
    ell3 = j3 - cube - cross
    return -a_mat, -cube + cross - ell3


def brownian_pair(
    key, t0, t1, ta, tb, shape=(), dtype=jnp.float32, depth: int = _DEFAULT_DEPTH,
    w_total=None, levy: str = "none", foster: bool = False,
    fourier_terms: int = 8, triple: bool = False,
):
    """(W, U, A[, J3]) over [ta, tb] — the full query the BrownianInterval
    API needs.

    With a Lévy mode, (W, U) come from the joint (W, ∫W) tree descent, so both
    are CONSISTENT under interval composition (the per-query-keyed
    :func:`space_time_levy_area` remains available as the cheap approximation).
    ``levy='fourier'`` draws the area from :func:`fourier_area` with
    ``fourier_terms`` Fourier pairs + exact-variance Gaussian tail.
    ``triple=True`` (requires ``levy='fourier'``) returns the 4-tuple
    ``(W, U, A, J3)`` from :func:`fourier_triple` — note its A is the
    truncated path's own (no variance tail), consistent with J3.
    """
    if levy == "none":
        w = brownian_increment(key, t0, t1, ta, tb, shape, dtype, depth, w_total)
        return w, None, None
    w_b, u_b = brownian_value_levy(key, t0, t1, tb, shape, dtype, depth, w_total)
    w_a, u_a = brownian_value_levy(key, t0, t1, ta, shape, dtype, depth, w_total)
    delta = jnp.asarray(tb, dtype) - jnp.asarray(ta, dtype)
    w = w_b - w_a
    u = u_b - u_a - w_a * delta  # ∫_ta^tb (W_s - W_ta) ds
    if levy == "space-time":
        return w, u, None
    safe = jnp.where(delta == 0, jnp.ones_like(delta), delta)
    h_levy = jnp.where(delta == 0, jnp.zeros_like(u), u / safe - 0.5 * w)
    if triple:
        if levy != "fourier":
            raise ValueError(
                "the joint (W, U, A, J3) query requires levy='fourier' "
                f"(got {levy!r}): only the truncated-KL path has a "
                "consistent level-3 signature"
            )
        a, j3 = fourier_triple(key, ta, tb, w, h_levy, n_terms=fourier_terms)
        return w, u, a, j3
    if levy == "fourier":
        a = fourier_area(key, ta, tb, w, h_levy, n_terms=fourier_terms)
    else:
        a = davie_foster_area(key, ta, tb, w, h_levy, foster=(levy == "foster" or foster))
    return w, u, a
