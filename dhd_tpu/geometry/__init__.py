from .frustum import (
    create_frustum,
    frustum_to_ego,
    get_mlp_input,
    sensor2keyego,
)
from .rigid import rigid_inverse, rigid_relative

__all__ = [
    "create_frustum",
    "frustum_to_ego",
    "get_mlp_input",
    "sensor2keyego",
    "rigid_inverse",
    "rigid_relative",
]
