from paddlexde_tpu.solver import (  # noqa: F401
    AdamsBashforthMoulton,
    AdaptiveHeun,
    Bosh3,
    Dopri5,
    Dopri8,
    Euler,
    Fehlberg2,
    Midpoint,
    RK4,
    ScipyWrapperODESolver,
)
