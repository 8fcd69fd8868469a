from paddlexde_tpu.xde import *  # noqa: F401,F403
