from paddlexde_tpu.interpolation import (  # noqa: F401
    BezierSpline,
    CubicHermiteSpline,
    LinearInterpolation,
    cubic_hermite_interp,
    linear_interp,
)
