from .spline_pallas import hermite_gather_eval, pallas_available  # noqa: F401
