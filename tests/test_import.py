"""Package import / version surface (reference ``tests/test_import.py:4-8``)."""

import paddlexde_tpu


def test_version():
    assert hasattr(paddlexde_tpu, "__version__")
    assert paddlexde_tpu.__version__ == "0.1.0"


def test_public_surface():
    expected = [
        # functional
        "odeint", "odeint_adjoint", "sdeint", "sdeint_adjoint", "ddeint",
        "ddeint_adjoint", "cdeint",
        # solver markers
        "Euler", "Midpoint", "RK4", "AdamsBashforthMoulton", "AdaptiveHeun",
        "Fehlberg2", "Bosh3", "Dopri5", "Dopri8", "ScipyWrapperODESolver",
        # interpolation
        "LinearInterpolation", "CubicHermiteSpline", "BezierSpline",
        # brownian
        "BrownianInterval", "BrownianPath", "BrownianTree", "ReverseBrownian",
        "brownian_interval_like",
        # xde
        "XDETerm", "ode_term", "sde_term", "dde_term", "cde_term",
        "HistoryIndex", "history_index",
    ]
    for name in expected:
        assert hasattr(paddlexde_tpu, name), name


def test_subpackages_import():
    import paddlexde_tpu.brownian  # noqa: F401
    import paddlexde_tpu.functional  # noqa: F401
    import paddlexde_tpu.interpolation  # noqa: F401
    import paddlexde_tpu.models.d3stn  # noqa: F401
    import paddlexde_tpu.ops  # noqa: F401
    import paddlexde_tpu.parallel  # noqa: F401
    import paddlexde_tpu.solver  # noqa: F401
    import paddlexde_tpu.utils  # noqa: F401
    import paddlexde_tpu.version  # noqa: F401
    import paddlexde_tpu.xde  # noqa: F401


def test_commit_introspection():
    from paddlexde_tpu.version import commit

    c = commit()
    assert isinstance(c, str) and len(c) >= 7  # sha or "unknown"
