"""Drop-in compatibility package: the reference's import paths, this framework.

Users of DrownFish19/PaddleXDE import ``paddlexde.*``; this alias package
re-exports ``paddlexde_tpu`` under every module path the reference's own code
and examples use (verified against the reference's import sites, SURVEY §1),
so existing user code switches by changing nothing but the backend arrays.
"""

from paddlexde_tpu import *  # noqa: F401,F403
from paddlexde_tpu import __version__  # noqa: F401
