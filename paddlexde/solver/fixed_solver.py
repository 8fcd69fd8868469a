"""Reference import path: ``from paddlexde.solver.fixed_solver import RK4, ...``
(used by example/D3STN/train_dde.py:30)."""

from paddlexde_tpu.solver import AdamsBashforthMoulton, Euler, Midpoint, RK4  # noqa: F401
