from . import d3stn  # noqa: F401
