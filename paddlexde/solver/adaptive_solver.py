"""Reference import path alias."""

from paddlexde_tpu.solver import AdaptiveHeun, Bosh3, Dopri5, Dopri8, Fehlberg2  # noqa: F401
