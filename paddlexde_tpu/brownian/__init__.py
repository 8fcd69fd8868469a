from .api import (  # noqa: F401
    LEVY_AREA_APPROXIMATIONS,
    BaseBrownian,
    BrownianInterval,
    BrownianPath,
    BrownianTree,
    ReverseBrownian,
    AntitheticBrownian,
    brownian_interval_like,
)
from .virtual_tree import (  # noqa: F401
    brownian_increment,
    brownian_value,
    davie_foster_area,
    h_to_u,
    space_time_levy_area,
)
