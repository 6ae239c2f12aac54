from . import math, warp, rng, distr, transform, records  # noqa: F401
from .pytree import pytree, static, field  # noqa: F401
from .records import (  # noqa: F401
    Ray,
    PreliminaryIntersection,
    SurfaceInteraction,
    PositionSample,
    DirectionSample,
    BSDFSample,
)
