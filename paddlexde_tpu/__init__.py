"""paddlexde_tpu — a TPU-native neural differential-equation framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
DrownFish19/PaddleXDE: functional ``odeint`` / ``sdeint`` / ``ddeint`` /
``cdeint`` entry points, a fixed + adaptive Runge–Kutta solver zoo compiled as
``lax.scan`` / ``lax.while_loop`` programs, O(1)-memory adjoint gradients via
``jax.custom_vjp``, a differentiable spline-interpolation subsystem, a
counter-based virtual Brownian tree, and the D3STN delay-DE spatiotemporal
forecasting workload sharded over TPU meshes.
"""

from .version import __version__  # noqa: F401

from .brownian import (  # noqa: F401
    BaseBrownian,
    BrownianInterval,
    BrownianPath,
    BrownianTree,
    AntitheticBrownian,
    ReverseBrownian,
    brownian_interval_like,
)
from .functional import (  # noqa: F401
    cdeint,
    ddeint,
    ddeint_adjoint,
    odeint,
    odeint_dense,
    odeint_per_element,
    odeint_adjoint,
    odeint_event,
    odeint_event_grad,
    sdeint,
    sdeint_adjoint,
    cdeint_logode,
    ddeint_mos,
    ito_to_stratonovich,
    stratonovich_to_ito,
    logsignature_windows,
    piecewise_logsignature,
    piecewise_logsignature3,
    piecewise_signature3,
    langevin,
    langevin_baoab,
    sdeint_event,
    sdeint_logqp,
    sdeint_mlmc,
    sdeint_weak_mc,
    MLMCEstimate,
    WeakEstimate,
)
from .solver import (  # noqa: F401
    AdamsBashforthMoulton,
    AdaptiveHeun,
    Bosh3,
    Dopri5,
    Dopri8,
    Tsit5,
    Euler,
    Fehlberg2,
    ImplicitEuler,
    ImplicitMidpoint,
    ImplicitEulerKrylov,
    SDIRK2,
    SDIRK3,
    Kvaerno3,
    SDIRK4Adaptive,
    Leapfrog,
    Midpoint,
    RK4,
    ScipyWrapperODESolver,
    Yoshida4,
)
from .interpolation import (  # noqa: F401
    BezierSpline,
    CubicHermiteSpline,
    LinearInterpolation,
    NaturalCubicSpline,
)
from .xde import (  # noqa: F401
    HistoryIndex,
    XDETerm,
    cde_term,
    dde_term,
    history_index,
    ode_term,
    sde_term,
)
