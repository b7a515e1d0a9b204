from .frustum import (
    create_frustum,
    frustum_to_ego,
    get_mlp_input,
    sensor2keyego,
)

__all__ = [
    "create_frustum",
    "frustum_to_ego",
    "get_mlp_input",
    "sensor2keyego",
]
