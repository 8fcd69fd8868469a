"""Reference import path: ``from paddlexde.xde.base_dde import HistoryIndex``
(used by example/D3STN/train_dde.py:32)."""

from paddlexde_tpu.xde import HistoryIndex, dde_term  # noqa: F401
