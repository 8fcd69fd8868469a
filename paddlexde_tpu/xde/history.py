"""Differentiable history lookup at learnable fractional lags.

TPU-native rebuild of the reference's ``HistoryIndex`` PyLayer
(``paddlexde/xde/base_dde.py:82-128`` in DrownFish19/PaddleXDE; duplicated as
``DecoderIndex`` in ``example/D3STN/d3stn.py:128-174``): evaluate a spline over
the history series at (learnable, fractional) lag positions, with gradients
flowing to the LAGS ONLY — the delay-selection mechanism that lets D3STN learn
*where* in a 2016-step history to look (SURVEY §5 long-context note).

In JAX no custom PyLayer is needed: the spline evaluation is differentiable by
construction, so ``grad_lags = Σ_{B,D} grad_y ⊙ dH/dlag`` (the reference's
hand-written backward, ``base_dde.py:120-127``) falls out of autodiff of the
gather+polynomial; ``stop_gradient`` on the history reproduces the reference's
"no grad to his" contract. The evaluation is one vectorized gather feeding a
fused polynomial — and a Pallas kernel for large histories lives in
``paddlexde_tpu.ops.spline_eval``.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from ..interpolation.interpolate import (
    BezierSpline,
    CubicHermiteSpline,
    LinearInterpolation,
)

__all__ = ["history_index", "HistoryIndex"]

_INTERPS = {
    "linear": LinearInterpolation,
    "cubic": CubicHermiteSpline,
    "cubic_hermite": CubicHermiteSpline,
    "bezier": BezierSpline,
}


def history_index(
    lags,
    his,
    his_span=None,
    *,
    interpolation: Union[str, type] = "cubic",
    stop_his_gradient: bool = True,
    use_pallas: Union[bool, None] = None,
):
    """Evaluate the history ``his [..., T, D]`` at fractional ``lags [L]``.

    Returns ``y_lags [..., L, D]``. Gradients flow to ``lags`` (and to ``his``
    too when ``stop_his_gradient=False`` — an extension over the reference,
    whose backward hard-codes no-grad-to-his).

    ``use_pallas``: route the cubic path through the fused gather+Horner
    Pallas kernel (``paddlexde_tpu.ops.spline_pallas``). Default (None):
    automatically on TPU for long histories when gradients-to-his are off.
    """
    if stop_his_gradient:
        his = jax.lax.stop_gradient(his)

    if interpolation in ("cubic", "cubic_hermite"):
        his_arr = jnp.asarray(his)
        if use_pallas is None:
            from ..ops.spline_pallas import pallas_available

            use_pallas = (
                stop_his_gradient
                and pallas_available()
                and his_arr.shape[-2] >= 256
            )
        if use_pallas:
            from ..ops.spline_pallas import hermite_gather_eval

            span = (
                jnp.arange(his_arr.shape[-2], dtype=his_arr.dtype)
                if his_span is None
                else his_span
            )
            return hermite_gather_eval(his_arr, span, jnp.asarray(lags), True)

    cls = _INTERPS[interpolation] if isinstance(interpolation, str) else interpolation
    interp = cls(his, his_span)
    return interp.evaluate(jnp.asarray(lags))


# Reference-parity alias: the reference exposes this as a PyLayer with
# ``HistoryIndex.apply(lags, his, his_span)``.
class HistoryIndex:
    @staticmethod
    def apply(lags, his, his_span=None, interpolation="cubic"):
        return history_index(lags, his, his_span, interpolation=interpolation)
