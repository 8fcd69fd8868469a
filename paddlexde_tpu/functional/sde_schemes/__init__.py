"""SDE scheme zoo: term factories + the scheme registry (round-4 split of
``functional/sdeint.py`` — see ``registry.py`` for the table every SDE
surface consumes). Import factories from here or (back-compat) from
``paddlexde_tpu.functional.sdeint``."""

from .common import (  # noqa: F401
    make_sde_term,
    noise_drift_correction,
)
from .explicit import (  # noqa: F401
    make_foster2_general_term,
    make_foster2_term,
    make_general_euler_term,
    make_general_milstein_term,
    make_general_sra1_term,
    make_heun_stratonovich_term,
    make_milstein_term,
    make_sra1_term,
    make_sriw1_term,
)
from .implicit import (  # noqa: F401
    make_implicit_em_term,
    make_implicit_foster2_general_term,
    make_implicit_foster2_term,
    make_implicit_milstein_term,
    make_implicit_sra1_damped_general_term,
    make_implicit_sra1_damped_term,
    make_implicit_sra1_general_term,
    make_implicit_sra1_term,
)
from .registry import (  # noqa: F401
    SDE_SCHEMES,
    SDESchemeSpec,
    canonical_sde_scheme_names,
    resolve_sde_scheme,
)
from .reversible import make_reversible_heun_term  # noqa: F401
from .taylor import make_general_taylor15_term, make_taylor15_term  # noqa: F401
from .weak import make_weak2_general_term, make_weak2_term  # noqa: F401
