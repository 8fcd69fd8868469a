"""The reference's exact import statements must work against the compat
package (import sites from SURVEY §1/§3 and the reference examples)."""


def test_reference_import_sites():
    from paddlexde.functional import ddeint, odeint, sdeint  # noqa: F401
    from paddlexde.functional import odeint_adjoint, sdeint_adjoint  # noqa: F401
    from paddlexde.solver.fixed_solver import RK4, Euler, Midpoint  # noqa: F401
    from paddlexde.version import commit  # noqa: F401
    from paddlexde.xde.base_dde import HistoryIndex  # noqa: F401
    from paddlexde.interpolation.interpolate import (  # noqa: F401
        BezierSpline,
        CubicHermiteSpline,
        LinearInterpolation,
    )
    from paddlexde.utils.brownian import BrownianInterval  # noqa: F401
    from paddlexde.solver import RK4 as RK4_b  # noqa: F401
    from paddlexde.solver.fixed_solver import (  # noqa: F401
        AdamsBashforthMoulton,
    )
    from paddlexde.solver.adaptive_solver import (  # noqa: F401
        AdaptiveHeun,
        Bosh3,
        Dopri5,
        Dopri8,
        Fehlberg2,
    )
    from paddlexde.functional import sdeint, sdeint_adjoint  # noqa: F401
    from paddlexde.functional import ddeint_adjoint  # noqa: F401
    from paddlexde.interpolation import (  # noqa: F401
        BezierSpline,
        CubicHermiteSpline,
        LinearInterpolation,
    )
    import paddlexde

    assert paddlexde.__version__


def test_compat_solve_runs():
    import jax.numpy as jnp
    import numpy as np
    from paddlexde.functional import odeint
    from paddlexde.solver.fixed_solver import RK4

    y = odeint(lambda t, y: -y, jnp.ones(2), jnp.linspace(0.0, 1.0, 9), RK4,
               time_axis=0)
    np.testing.assert_allclose(np.asarray(y[-1]), np.exp(-1.0), rtol=1e-5)
