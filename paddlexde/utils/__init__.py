from paddlexde_tpu.utils import *  # noqa: F401,F403
