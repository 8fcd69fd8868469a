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

from .functional import odeint  # noqa: F401
from .solver import (  # noqa: F401
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
from .xde import XDETerm, cde_term, dde_term, ode_term, sde_term  # noqa: F401
