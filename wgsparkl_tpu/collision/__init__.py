from wgsparkl_tpu.collision.shapes import (
    SHAPE_BALL,
    SHAPE_CAPSULE,
    SHAPE_CUBOID,
    SHAPE_HALFSPACE,
    SHAPE_POLYLINE,
    SHAPE_TRIMESH,
    SHAPE_HEIGHTFIELD,
    Collider,
    project_on_boundary,
)
from wgsparkl_tpu.collision import cdf

__all__ = [
    "SHAPE_BALL",
    "SHAPE_CAPSULE",
    "SHAPE_CUBOID",
    "SHAPE_HALFSPACE",
    "SHAPE_POLYLINE",
    "SHAPE_TRIMESH",
    "SHAPE_HEIGHTFIELD",
    "Collider",
    "project_on_boundary",
    "cdf",
]
