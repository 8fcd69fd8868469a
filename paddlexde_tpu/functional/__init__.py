from .cdeint import cdeint  # noqa: F401
from .ddeint import ddeint  # noqa: F401
from .ddeint_mos import ddeint_mos  # noqa: F401
from .ddeint_adjoint import ddeint_adjoint  # noqa: F401
from .odeint import odeint, odeint_dense, odeint_per_element  # noqa: F401
from .odeint_adjoint import odeint_adjoint  # noqa: F401
from .sdeint import sdeint  # noqa: F401
from .sdeint_adjoint import sdeint_adjoint  # noqa: F401
from .sdeint_event import sdeint_event  # noqa: F401
from .sdeint_weak import WeakEstimate, sdeint_weak_mc  # noqa: F401
from .sdeint_mlmc import MLMCEstimate, sdeint_mlmc  # noqa: F401
from .sdeint_logqp import sdeint_logqp  # noqa: F401
from .calculus import ito_to_stratonovich, stratonovich_to_ito  # noqa: F401
from .langevin import (  # noqa: F401
    langevin,
    langevin_baoab,
    make_baoab_step,
    make_langevin_step,
)
from .logsig import cdeint_logode, logsignature_windows, piecewise_logsignature  # noqa: F401
from .logsig import piecewise_logsignature3, piecewise_signature3  # noqa: F401
from .odeint_event import EventResult, odeint_event, odeint_event_grad  # noqa: F401
