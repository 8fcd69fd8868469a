"""Log-signature machinery for CDEs: the log-ODE method.

The reference's CDE support is vaporware (``paddlexde/xde/base_cde.py:20-35``
in DrownFish19/PaddleXDE); this module extends the working :func:`cdeint`
with the rough-path toolkit torchcde ships for long/rough control paths:

- :func:`logsignature_windows` — the DATA transform (torchcde parity):
  depth-2 log-signatures of the piecewise-linear control over coarse
  windows, returned as a new (shorter, wider) series whose channels are
  ``[ΔX (C), vectorized Lévy areas (C(C−1)/2)]``. A neural CDE then learns
  its vector field directly on those channels — fewer solver steps over an
  information-richer path (the standard long-time-series recipe).

- :func:`cdeint_logode` — the EXPLICIT log-ODE solver: per window, flow the
  Lie-extended vector field

      F(y) = f(y)·ΔX + ½ Σ_{i,j} [f_i, f_j](y)·A_{ij}

  for unit time ([f_i, f_j] = ∂f_j·f_i − ∂f_i·f_j — under JAX these are C
  jvps of the matrix field, the same autodiff move that makes the Taylor
  SDE schemes shippable). Depth 2 captures the control's area (what a
  naive coarse-knot CDE throws away): for NON-commuting vector fields the
  coarse-window error drops from the area-loss floor to O(window²)
  (measured in tests/functional/test_logsig.py against a tight-tolerance
  fine cdeint oracle; for commuting fields depth 1 is already exact and
  the bracket term vanishes identically).

TPU shape: the log-signature computation is cumulative-sum + einsum over
``[..., n_segments, C]`` (one fused pass, no sequential scan), and the
log-ODE solve is ``n_windows`` RK4 flows of large batched matvecs — coarse
time axis, fat compute per step: exactly the trade the hardware wants.

Piecewise-LINEAR control convention: within a segment the path has no area,
so the window log-signature is exact in closed form (cumsum cross products).
That matches torchcde's logsig_windows (which computes signatures of the
linear interpolation) and the CDE literature's default.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..interpolation.interpolate import InterpolationBase, LinearInterpolation
from .odeint import odeint

__all__ = ["logsignature_windows", "cdeint_logode", "piecewise_logsignature", "piecewise_logsignature3", "piecewise_signature3"]


def piecewise_logsignature(series, t=None):
    """Depth-2 log-signature of ONE window of a piecewise-linear path.

    Args:
        series: knots ``[..., m+1, C]`` (the window's path).
        t: unused (the log-signature is parameterization-invariant); kept
            for signature symmetry with the interpolation constructors.

    Returns:
        ``(increment [..., C], area [..., C, C])`` — the level-1 term and
        the antisymmetric level-2 Lie term ``A = ½Σ_{s<r}(δ_s⊗δ_r −
        δ_r⊗δ_s)`` (within-segment areas of a linear path are zero, so the
        cross-segment cumsum form is EXACT, not an approximation).
    """
    del t
    series = jnp.asarray(series)
    deltas = jnp.diff(series, axis=-2)  # [..., m, C]
    inc = jnp.sum(deltas, axis=-2)
    # prefix sums P_{r-1} paired with each δ_r: A = ½Σ_r (P⊗δ − δ⊗P)
    prefix = jnp.cumsum(deltas, axis=-2) - deltas  # exclusive prefix
    cross = jnp.einsum("...si,...sj->...ij", prefix, deltas)
    area = 0.5 * (cross - jnp.swapaxes(cross, -1, -2))
    return inc, area


def piecewise_signature3(series):
    """Levels 1-3 of the SIGNATURE of one piecewise-linear window (exact):
    Chen's relation over segments with each segment's own signature
    ``(δ, δ⊗δ/2!, δ⊗δ⊗δ/3!)``. Returns ``(S1 [..., C], S2 [..., C, C],
    S3 [..., C, C, C])``. One fused pass: the cross terms need only the
    per-segment PREFIX of (S1, S2), which are cumulative sums/einsum
    accumulations — no sequential scan."""
    series = jnp.asarray(series)
    deltas = jnp.diff(series, axis=-2)  # [..., m, C]
    hi = jax.lax.Precision.HIGHEST
    s1 = jnp.sum(deltas, axis=-2)
    p1 = jnp.cumsum(deltas, axis=-2) - deltas  # exclusive prefix of S1
    # S2 = Σ_r [P1_{r}⊗δ_r + δ_r⊗δ_r/2]
    s2 = (jnp.einsum("...si,...sj->...ij", p1, deltas, precision=hi)
          + 0.5 * jnp.einsum("...si,...sj->...ij", deltas, deltas,
                             precision=hi))
    # exclusive prefix of S2 per segment r: P2_r = Σ_{s<r} (P1_s⊗δ_s + ...)
    seg_s2 = (p1[..., :, :, None] * deltas[..., :, None, :]
              + 0.5 * deltas[..., :, :, None] * deltas[..., :, None, :])
    p2 = jnp.cumsum(seg_s2, axis=-3) - seg_s2  # [..., m, C, C]
    # S3 = Σ_r [P2_r⊗δ_r + P1_r⊗(δ⊗δ/2)_r + (δ⊗δ⊗δ/6)_r]
    s3 = (
        jnp.einsum("...sij,...sk->...ijk", p2, deltas, precision=hi)
        + 0.5 * jnp.einsum("...si,...sj,...sk->...ijk", p1, deltas, deltas,
                           precision=hi)
        + (1.0 / 6.0) * jnp.einsum("...si,...sj,...sk->...ijk", deltas,
                                   deltas, deltas, precision=hi)
    )
    return s1, s2, s3


def piecewise_logsignature3(series):
    """Depth-3 LOG-signature of one piecewise-linear window (exact):
    ``ℓ = log(S)`` truncated at level 3 —

        ℓ1 = S1        ℓ2 = S2 − S1⊗S1/2   (= the antisymmetric area)
        ℓ3 = S3 − (S1⊗S2 + S2⊗S1)/2 + S1⊗S1⊗S1/3

    ``ℓ3`` is a Lie element (Dynkin); its associated vector field is
    ``(1/3)Σ ℓ3[i,j,k]·[f_i,[f_j,f_k]]`` (used by depth-3
    :func:`cdeint_logode`). Returns ``(ℓ1, ℓ2, ℓ3)``."""
    s1, s2, s3 = piecewise_signature3(series)
    hi = jax.lax.Precision.HIGHEST
    l2 = s2 - 0.5 * s1[..., :, None] * s1[..., None, :]
    l3 = (
        s3
        - 0.5 * (jnp.einsum("...i,...jk->...ijk", s1, s2, precision=hi)
                 + jnp.einsum("...ij,...k->...ijk", s2, s1, precision=hi))
        + (1.0 / 3.0) * jnp.einsum("...i,...j,...k->...ijk", s1, s1, s1,
                                   precision=hi)
    )
    return s1, l2, l3


def _vectorize_area(area):
    """Antisymmetric ``[..., C, C]`` -> strict upper triangle ``[..., C(C−1)/2]``
    (row-major (i, j) with i < j — the torchcde/signatory channel order)."""
    c = area.shape[-1]
    iu, ju = jnp.triu_indices(c, k=1)
    return area[..., iu, ju]


def logsignature_windows(series, t, *, window: Optional[float] = None,
                         knots_per_window: Optional[int] = None):
    """Transform ``(series, t)`` into depth-2 log-signature windows
    (torchcde's ``logsignature_windows`` — the long-series preprocessing
    that trades path resolution for channel information).

    Args:
        series: control knots ``[..., T, C]`` (piecewise-linear between).
        t: knot times ``[T]`` (any spacing).
        window: window length in TIME (windows are ``[t0, t0+window, ...]``;
            knots are binned by time). Exactly one of window /
            knots_per_window.
        knots_per_window: window length in KNOTS (every k segments).

    Returns:
        ``(logsig_series, t_windows)`` — ``logsig_series`` is
        ``[..., n_windows+1, C + C(C−1)/2]``: the CUMULATIVE sum of the
        per-window ``[ΔX, vec(A)]`` with a zero first row, so its linear
        interpolation has the window log-signature as its per-window
        increment (feed it straight to :func:`cdeint` /
        ``LinearInterpolation``); ``t_windows`` are the window boundary
        times ``[n_windows+1]``.
    """
    series = jnp.asarray(series)
    t = jnp.asarray(t)
    n_t = series.shape[-2]
    if (window is None) == (knots_per_window is None):
        raise ValueError("pass exactly one of window= or knots_per_window=")
    if knots_per_window is not None:
        k = int(knots_per_window)
        if k < 1:
            raise ValueError("knots_per_window must be >= 1")
        bounds = list(range(0, n_t - 1, k)) + [n_t - 1]
    else:
        import numpy as _np

        t_host = _np.asarray(t)
        edges = _np.arange(float(t_host[0]), float(t_host[-1]),
                           float(window))[1:]
        idx = _np.searchsorted(t_host, edges)
        bounds = [0] + [int(i) for i in idx if 0 < int(i) < n_t - 1]
        bounds = sorted(set(bounds)) + [n_t - 1]
    incs, areas = [], []
    for a, b in zip(bounds[:-1], bounds[1:]):
        inc, area = piecewise_logsignature(series[..., a:b + 1, :])
        incs.append(inc)
        areas.append(_vectorize_area(area))
    per_window = jnp.concatenate(
        [jnp.stack(incs, axis=-2), jnp.stack(areas, axis=-2)], axis=-1
    )  # [..., n_windows, C + C(C-1)/2]
    zero = jnp.zeros_like(per_window[..., :1, :])
    logsig_series = jnp.concatenate(
        [zero, jnp.cumsum(per_window, axis=-2)], axis=-2
    )
    t_windows = t[jnp.asarray(bounds)]
    return logsig_series, t_windows


def cdeint_logode(
    func,
    y0,
    t_span,
    control: Union[InterpolationBase, tuple],
    *,
    depth: int = 2,
    substeps: int = 1,
    solver: str = "rk4",
    time_axis: int = -2,
):
    """Solve the CDE ``dy = f(t, y)·dX`` by the DEPTH-``depth`` log-ODE
    method over the intervals of ``t_span``.

    Per interval ``[t_k, t_{k+1}]`` the control's depth-``depth``
    log-signature is computed in closed form (piecewise-linear X) and the
    Lie-extended field

        F(y) = f(y)·ΔX + ½Σ[f_i,f_j](y)·ℓ2_{ij}
                 + (1/3)Σ[f_i,[f_j,f_k]](y)·ℓ3_{ijk}   (depth 3)

    is flowed for unit time with ``substeps`` RK4 steps (the 1/3 is
    Dynkin's right-bracketing map on Lie elements — pinned to 3e-11
    against the matrix-exponential identity for linear fields).
    ``depth=1`` drops all bracket terms (exact for commuting vector
    fields; the naive coarse baseline otherwise); ``depth=3`` costs C²
    nested-jvp families per flow eval and buys a measured ~2x over depth
    2 on a smooth non-commuting control.

    Args:
        func: ``func(t, y) -> [..., D_y, C]`` — evaluated at the interval
            MIDPOINT time (the log-ODE flow is autonomous per window; a
            strongly time-dependent f belongs in the control channels, the
            standard CDE time-augmentation).
        control: :class:`InterpolationBase` over X or a ``(series, t)``
            pair (LINEAR interpolation — the convention the closed-form
            log-signature is exact for).
        t_span: output times = window boundaries. Coarse is the point:
            each window is one flow of a bracket-enriched field.

    Returns:
        solution ``[..., T, D_y]`` on ``time_axis``.
    """
    if depth not in (1, 2, 3):
        raise ValueError(f"cdeint_logode supports depth 1, 2 or 3, got {depth}")
    t_span = jnp.asarray(t_span)
    if isinstance(control, InterpolationBase):
        interp = control
        series, knots = interp._series, interp._t
    else:
        series, knots = control
        series = jnp.asarray(series)
        knots = jnp.asarray(knots)
        interp = LinearInterpolation(series, knots)

    def window_path(t_a, t_b):
        # exact for piecewise-linear X: endpoint evaluations + interior
        # knots. Interior knots are selected by masking (static shapes).
        x_a = interp.evaluate(jnp.reshape(t_a, ()))
        x_b = interp.evaluate(jnp.reshape(t_b, ()))
        inside = (knots > t_a) & (knots < t_b)  # [T]
        # clip interior knots' values into the window: masked rows collapse
        # onto the endpoints so they contribute zero increment/area
        tt = jnp.clip(knots, t_a, t_b)
        x_t = jax.vmap(lambda s: interp.evaluate(jnp.reshape(s, ())),
                       in_axes=0, out_axes=-2)(tt)
        x_t = jnp.where(inside[..., :, None], x_t,
                        jnp.where((knots <= t_a)[..., :, None],
                                  x_a[..., None, :], x_b[..., None, :]))
        return jnp.concatenate(
            [x_a[..., None, :], x_t, x_b[..., None, :]], axis=-2
        )

    def lie_field(t_mid, inc, area, l3):
        hi = jax.lax.Precision.HIGHEST

        def f_ext(y):
            mat = func(t_mid, y)  # [..., D, C]
            out = jnp.einsum("...dc,...c->...d", mat, inc)
            if depth == 1:
                return out
            cols = jnp.moveaxis(mat, -1, 0)  # [C, ..., D]

            def dmat(y_, v):  # ∂f/∂y(y_) · v -> [..., D, C]
                return jax.jvp(lambda yy: func(t_mid, yy), (y_,), (v,))[1]

            d_all = jax.vmap(lambda v: dmat(y, v))(cols)  # [C(i),...,D,C(j)]
            # ½ Σ_ij [f_i, f_j]·A_ij = Σ_ij (∂f_j·f_i)·A_ij (A antisym)
            out = out + jnp.einsum("i...dj,...ij->...d", d_all, area,
                                   precision=hi)
            if depth == 3:
                # level-3 Lie term: ℓ3 is a Lie element, so its field is
                # Dynkin's right-bracketing over degree:
                #   F3 = (1/3) Σ_ijk ℓ3[i,j,k]·[f_i, [f_j, f_k]]
                # Contract (j,k) first: M_i(y) = Σ_jk ℓ3[ijk][f_j,f_k](y),
                # then F3 = (1/3) Σ_i (∂M_i·f_i − ∂f_i·M_i).
                def m_all(y_):
                    mat_ = func(t_mid, y_)
                    cols_ = jnp.moveaxis(mat_, -1, 0)
                    da = jax.vmap(lambda v: dmat(y_, v))(cols_)
                    # [f_j, f_k] = ∂f_k·f_j − ∂f_j·f_k = da[j,:,k] − da[k,:,j]
                    return (
                        jnp.einsum("...ijk,j...dk->i...d", l3, da,
                                   precision=hi)
                        - jnp.einsum("...ijk,k...dj->i...d", l3, da,
                                     precision=hi)
                    )  # [C(i), ..., D]

                # linearize: ONE primal trace shared by all C tangent
                # directions (vmap-of-jvp would recompute the primal per
                # direction)
                m_i, m_lin = jax.linearize(m_all, y)
                # ∂M_i·f_i per i: the linear map along each f_i, row i
                dm_fi = jax.vmap(m_lin)(cols)  # [C(dir), C(i), ..., D]
                idx = jnp.arange(mat.shape[-1])
                dm_diag = dm_fi[idx, idx]  # [C, ..., D]
                # ∂f_i·M_i per i: jvp of f along M_i, column i
                df_mi = jax.vmap(lambda v: dmat(y, v))(m_i)  # [C,...,D,C]
                df_diag = jax.vmap(lambda a, i: a[..., i])(df_mi, idx)
                out = out + (1.0 / 3.0) * jnp.sum(dm_diag - df_diag, axis=0)
            return out

        return f_ext

    def flow(y, t_a, t_b):
        path = window_path(t_a, t_b)
        if depth == 3:
            inc, area, l3 = piecewise_logsignature3(path)
        else:
            inc, area = piecewise_logsignature(path)
            l3 = None
        f_ext = lie_field(0.5 * (t_a + t_b), inc, area, l3)
        tau = jnp.linspace(0.0, 1.0, substeps + 1)
        out = odeint(lambda s, y_: f_ext(y_), y, tau, solver, time_axis=0)
        return jax.tree.map(lambda a: a[-1], out)

    def scan_body(y, ab):
        t_a, t_b = ab
        y1 = flow(y, t_a, t_b)
        return y1, y1

    _, ys = jax.lax.scan(scan_body, y0, (t_span[:-1], t_span[1:]))
    sol = jax.tree.map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
        y0, ys,
    )
    if time_axis != 0:
        from .solve import format_solution

        sol = format_solution(sol, time_axis)
    return sol
