from paddlexde_tpu.version import __version__, commit, show  # noqa: F401
