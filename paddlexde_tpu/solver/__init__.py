from .adaptive import AdaptiveStats, solve_adaptive  # noqa: F401
from .fixed import solve_fixed  # noqa: F401
from .registry import (  # noqa: F401
    SOLVERS,
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
    TRBDF2,
    Midpoint,
    RK4,
    Leapfrog,
    Yoshida4,
    ScipyWrapperODESolver,
    SolverSpec,
    resolve_solver,
)
from .tableaus import TABLEAUS, ButcherTableau  # noqa: F401
from .adaptive_dense import solve_adaptive_dense  # noqa: F401
