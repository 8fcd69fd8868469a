"""Reference import path: ``from paddlexde.interpolation.interpolate import ...``
(used by example/D3STN/d3stn.py:10-14)."""

from paddlexde_tpu.interpolation import (  # noqa: F401
    BezierSpline,
    CubicHermiteSpline,
    LinearInterpolation,
)
from paddlexde_tpu.interpolation.interpolate import InterpolationBase  # noqa: F401
