from paddlexde_tpu.functional import (  # noqa: F401
    cdeint,
    ddeint,
    ddeint_adjoint,
    odeint,
    odeint_adjoint,
    sdeint,
    sdeint_adjoint,
)
