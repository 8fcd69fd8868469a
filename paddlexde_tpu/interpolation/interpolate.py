"""Differentiable spline interpolation over sampled series.

TPU-native rebuild of ``paddlexde/interpolation/`` (DrownFish19/PaddleXDE):
``LinearInterpolation`` / ``CubicHermiteSpline`` / ``BezierSpline`` over a
series ``[..., T, D]`` with knots ``t [T]``, exposing ``evaluate(t)`` and
``derivative(t)``.

Design differences from the reference (all deliberate):

- The reference materializes per-family control-point tensors (shifted, scale-
  pre-divided copies of the series) at construction and evaluates via sparse
  basis matrices ``ts @ H @ ps`` (``interpolate_base.py:49-114``). Here
  evaluation is one vectorized gather (``searchsorted`` + ``take``) feeding a
  fused closed-form polynomial — no O(T·M) duplicated storage and a single
  XLA-fusable expression per query batch. A Pallas kernel fuses the
  gather+Horner path for large histories (``paddlexde_tpu.ops``).
- The reference's scale normalization is only correct on uniform grids (it
  divides ``p_{i+1}`` by the *previous* interval's width,
  ``interpolate.py:42-66``); we use the mathematically standard forms, which
  coincide with the reference on the uniform grids its tests use.
- ``BezierSpline`` keeps the reference's (unusual but well-defined) smoothing
  scheme: segment ``i`` evaluates the cubic Bézier with control points
  ``p_i..p_{i+3}`` (last-clamped) at local time normalized by the 3-knot span
  (``interpolate.py:241-273``) — an approximating, not interpolating, spline;
  its accuracy bar in the reference tests is 5e-2 accordingly.
- Hermite derivative estimates are the reference's forward differences with the
  last slope replicated (``interpolate.py:160-182``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "InterpolationBase",
    "LinearInterpolation",
    "CubicHermiteSpline",
    "BezierSpline",
    "NaturalCubicSpline",
    "rectilinear_interpolation",
]


class InterpolationBase:
    """Shared machinery: knot bookkeeping + vectorized segment lookup."""

    def __init__(self, series, t=None):
        series = jnp.asarray(series)
        if t is None:
            t = jnp.arange(series.shape[-2], dtype=series.dtype)
        t = jnp.asarray(t, series.dtype)
        if t.shape[0] != series.shape[-2]:
            raise ValueError(
                f"knots t [{t.shape[0]}] must match series time axis "
                f"[{series.shape[-2]}]"
            )
        self._series = series
        self._t = t

    @property
    def grid_points(self):
        return self._t

    @property
    def interval(self):
        return jnp.stack([self._t[0], self._t[-1]])

    def _locate(self, t_eval):
        """segment index + local offset for each query time (clamped)."""
        t_eval = jnp.asarray(t_eval, self._t.dtype)
        scalar = t_eval.ndim == 0
        t_eval = jnp.atleast_1d(t_eval)
        max_idx = self._series.shape[-2] - 2
        idx = jnp.clip(
            jnp.searchsorted(self._t, t_eval, side="right") - 1, 0, max_idx
        )
        return idx, t_eval, scalar

    def _gather(self, offset, idx):
        """series[..., idx + offset, :] with index clamping (last repeated)."""
        i = jnp.clip(idx + offset, 0, self._series.shape[-2] - 1)
        return jnp.take(self._series, i, axis=-2)

    def evaluate(self, t):
        idx, t_eval, scalar = self._locate(t)
        out = self._evaluate(idx, t_eval)
        return jax.tree.map(lambda o: o[..., 0, :], out) if scalar else out

    def derivative(self, t):
        idx, t_eval, scalar = self._locate(t)
        out = self._derivative(idx, t_eval)
        return jax.tree.map(lambda o: o[..., 0, :], out) if scalar else out


def _exp(v, ref):
    """Broadcast a per-query vector [K] against [..., K, D] leaves."""
    return v[..., :, None].astype(ref.dtype)


class LinearInterpolation(InterpolationBase):
    """Piecewise-linear; reference ``interpolate.py:6-98``."""

    def _coeffs(self, idx, t_eval):
        t0 = self._t[idx]
        t1 = self._t[jnp.clip(idx + 1, 0, self._t.shape[0] - 1)]
        h = jnp.where(t1 == t0, jnp.ones_like(t0), t1 - t0)
        x = (t_eval - t0) / h
        p0 = self._gather(0, idx)
        p1 = self._gather(1, idx)
        return p0, p1, x, h

    def _evaluate(self, idx, t_eval):
        p0, p1, x, _ = self._coeffs(idx, t_eval)
        return p0 + _exp(x, p0) * (p1 - p0)

    def _derivative(self, idx, t_eval):
        p0, p1, _, h = self._coeffs(idx, t_eval)
        return (p1 - p0) / _exp(h, p0)


class CubicHermiteSpline(InterpolationBase):
    """Cubic Hermite with forward-difference slopes; reference
    ``interpolate.py:101-204``."""

    def __init__(self, series, t=None):
        super().__init__(series, t)
        # slopes m_i = (p_{i+1} - p_i)/(t_{i+1} - t_i), last replicated
        dt = self._t[1:] - self._t[:-1]
        dp = self._series[..., 1:, :] - self._series[..., :-1, :]
        m = dp / dt[:, None]
        self._m = jnp.concatenate([m, m[..., -1:, :]], axis=-2)

    def _coeffs(self, idx, t_eval):
        t0 = self._t[idx]
        t1 = self._t[jnp.clip(idx + 1, 0, self._t.shape[0] - 1)]
        h = jnp.where(t1 == t0, jnp.ones_like(t0), t1 - t0)
        x = (t_eval - t0) / h
        p0, p1 = self._gather(0, idx), self._gather(1, idx)
        i1 = jnp.clip(idx + 1, 0, self._m.shape[-2] - 1)
        m0 = jnp.take(self._m, idx, axis=-2)
        m1 = jnp.take(self._m, i1, axis=-2)
        return p0, p1, m0, m1, x, h

    def _evaluate(self, idx, t_eval):
        p0, p1, m0, m1, x, h = self._coeffs(idx, t_eval)
        x2 = x * x
        x3 = x2 * x
        h00 = 2 * x3 - 3 * x2 + 1
        h10 = x3 - 2 * x2 + x
        h01 = -2 * x3 + 3 * x2
        h11 = x3 - x2
        return (
            _exp(h00, p0) * p0
            + _exp(h10 * h, p0) * m0
            + _exp(h01, p0) * p1
            + _exp(h11 * h, p0) * m1
        )

    def _derivative(self, idx, t_eval):
        p0, p1, m0, m1, x, h = self._coeffs(idx, t_eval)
        x2 = x * x
        d00 = (6 * x2 - 6 * x) / h
        d10 = 3 * x2 - 4 * x + 1
        d01 = (-6 * x2 + 6 * x) / h
        d11 = 3 * x2 - 2 * x
        return (
            _exp(d00, p0) * p0
            + _exp(d10, p0) * m0
            + _exp(d01, p0) * p1
            + _exp(d11, p0) * m1
        )


class BezierSpline(InterpolationBase):
    """Cubic-Bézier smoothing over sliding 4-point windows; reference
    ``interpolate.py:207-298`` (control points ``p_i..p_{i+3}``, local time
    normalized by the 3-knot span — approximating, C0 at knots only)."""

    def _coeffs(self, idx, t_eval):
        t0 = self._t[idx]
        t3 = self._t[jnp.clip(idx + 3, 0, self._t.shape[0] - 1)]
        h = jnp.where(t3 == t0, jnp.ones_like(t0), t3 - t0)
        x = (t_eval - t0) / h
        ps = [self._gather(k, idx) for k in range(4)]
        return ps, x, h

    def _evaluate(self, idx, t_eval):
        (p0, p1, p2, p3), x, _ = self._coeffs(idx, t_eval)
        u = 1 - x
        b0 = u * u * u
        b1 = 3 * u * u * x
        b2 = 3 * u * x * x
        b3 = x * x * x
        return (
            _exp(b0, p0) * p0 + _exp(b1, p0) * p1 + _exp(b2, p0) * p2 + _exp(b3, p0) * p3
        )

    def _derivative(self, idx, t_eval):
        (p0, p1, p2, p3), x, h = self._coeffs(idx, t_eval)
        u = 1 - x
        d0 = 3 * u * u / h
        d1 = 3 * u * x / h
        d2 = 3 * x * x / h
        return (
            _exp(d0, p0) * (p1 - p0)
            + _exp(2 * d1, p0) * (p2 - p1)
            + _exp(d2, p0) * (p3 - p2)
        )


class NaturalCubicSpline(InterpolationBase):
    """Natural cubic spline: C2-continuous interpolation (torchcde's canonical
    control-path interpolant — a family BEYOND the reference's three).

    Second derivatives M_i solve the standard tridiagonal system with natural
    boundary conditions (M_0 = M_{T-1} = 0), via jax's tridiagonal solve; the
    piecewise cubic then evaluates/differentiates in closed form. Construction
    is O(T) and jit-safe; evaluation is the same gather+polynomial pattern as
    the other families.
    """

    def __init__(self, series, t=None):
        super().__init__(series, t)
        series = self._series
        t = self._t
        n = t.shape[0]
        if n < 3:
            self._m2 = jnp.zeros_like(series)
            return
        h = t[1:] - t[:-1]  # [n-1]
        # tridiagonal system for interior M_1..M_{n-2}:
        #   (h_{i-1}) M_{i-1} + 2(h_{i-1}+h_i) M_i + (h_i) M_{i+1} = 6*rhs_i
        x = series.reshape((-1,) + series.shape[-2:])  # [B, T, D]
        c = jnp.swapaxes(x, 0, 1).reshape(n, -1)  # [T, B*D], batch-major
        slope = (c[1:] - c[:-1]) / h[:, None]
        rhs = 6.0 * (slope[1:] - slope[:-1])  # [n-2, C]
        dl = h[:-1]  # sub-diagonal (h_0 .. h_{n-3})
        dm = 2.0 * (h[:-1] + h[1:])  # main diagonal
        du = h[1:]  # super-diagonal
        # jax.lax.linalg.tridiagonal_solve expects [..., n] bands with the
        # first sub-diagonal entry and last super-diagonal entry zero
        dl_ = jnp.concatenate([jnp.zeros((1,), dl.dtype), dl[1:]])
        du_ = jnp.concatenate([du[:-1], jnp.zeros((1,), du.dtype)])
        m_inner = jax.lax.linalg.tridiagonal_solve(
            dl_, dm, du_, rhs.astype(dm.dtype)
        )
        m_flat = jnp.concatenate(
            [jnp.zeros((1, c.shape[1]), m_inner.dtype), m_inner,
             jnp.zeros((1, c.shape[1]), m_inner.dtype)], axis=0
        )
        m3 = m_flat.reshape((n, -1, series.shape[-1]))  # [T, B, D]
        self._m2 = (
            jnp.swapaxes(m3, 0, 1).reshape(series.shape).astype(series.dtype)
        )

    def _coeffs(self, idx, t_eval):
        t0 = self._t[idx]
        t1 = self._t[jnp.clip(idx + 1, 0, self._t.shape[0] - 1)]
        h = jnp.where(t1 == t0, jnp.ones_like(t0), t1 - t0)
        p0, p1 = self._gather(0, idx), self._gather(1, idx)
        m0 = jnp.take(self._m2, idx, axis=-2)
        m1 = jnp.take(self._m2, jnp.clip(idx + 1, 0, self._t.shape[0] - 1), axis=-2)
        a = (t1 - t_eval) / h  # note: a + b = 1
        b = (t_eval - t0) / h
        return p0, p1, m0, m1, a, b, h

    def _evaluate(self, idx, t_eval):
        p0, p1, m0, m1, a, b, h = self._coeffs(idx, t_eval)
        e = lambda v: _exp(v, p0)
        return (
            e(a) * p0
            + e(b) * p1
            + e((a**3 - a) * h**2 / 6.0) * m0
            + e((b**3 - b) * h**2 / 6.0) * m1
        )

    def _derivative(self, idx, t_eval):
        p0, p1, m0, m1, a, b, h = self._coeffs(idx, t_eval)
        e = lambda v: _exp(v, p0)
        return (
            e(1.0 / h) * (p1 - p0)
            + e(-(3 * a**2 - 1) * h / 6.0) * m0
            + e((3 * b**2 - 1) * h / 6.0) * m1
        )


def rectilinear_interpolation(series, t=None, *, time_channel: int = 0):
    """torchcde's CAUSAL interpolation for online prediction
    (``torchcde.linear_interpolation_coeffs(..., rectilinear=...)``): move
    horizontally in time, then vertically in value, so the interpolated
    control at time ``s`` never looks ahead of the last observation ≤ s —
    the property that lets a neural CDE run in real time. (The reference
    has no CDE machinery at all; the cubic/linear modes here interpolate
    ACROSS future knots, which is fine offline and leaky online.)

    Implementation: the knot sequence ``(t_i, x_i)`` is rewritten as the
    doubled sequence ``(t_1, x_0) → (t_1, x_1) → (t_2, x_1) → …`` over a
    synthetic arc-length parameter (one unit per hop), with the TIME
    channel of the control carrying the actual clock. Returns a
    :class:`LinearInterpolation` over the doubled knots; feed it to
    :func:`cdeint` as usual (time reparameterization does not change a
    CDE's solution — dX/ds integrates the same increments).

    Args:
        series: ``[..., T, C]`` where channel ``time_channel`` is the
            observation time (the standard CDE time-augmentation; required
            so the rewrite can hold time flat on vertical segments).
        t: the observation times ``[T]`` (defaults to
            ``series[..., time_channel]`` of the first batch element).
        time_channel: which channel carries time.

    Returns:
        ``(interp, s_knots)`` — the LinearInterpolation over the doubled
        sequence and its synthetic parameter knots ``[2T−1]``.
    """
    series = jnp.asarray(series)
    n_t = series.shape[-2]
    if t is None:
        t = jnp.moveaxis(series, -1, 0)[time_channel]
        t = t.reshape((-1, n_t))[0]
    t = jnp.asarray(t, series.dtype)
    # doubled knots: even slot k=2i is (t_{i}, x_{i}) [arrival of value i];
    # odd slot k=2i+1 is (t_{i+1}, x_i) [time advances, value held]
    x_even = series  # [..., T, C]
    x_odd = series[..., :-1, :]  # value held...
    t_next = t[1:]
    x_odd = jnp.concatenate(
        [
            x_odd[..., :time_channel],
            jnp.broadcast_to(
                t_next[..., :, None],
                x_odd.shape[:-1] + (1,),
            ),
            x_odd[..., time_channel + 1:],
        ],
        axis=-1,
    )
    doubled = jnp.zeros(
        series.shape[:-2] + (2 * n_t - 1, series.shape[-1]), series.dtype
    )
    doubled = doubled.at[..., 0::2, :].set(x_even)
    doubled = doubled.at[..., 1::2, :].set(x_odd)
    s_knots = jnp.arange(2 * n_t - 1, dtype=series.dtype)
    return LinearInterpolation(doubled, s_knots), s_knots
