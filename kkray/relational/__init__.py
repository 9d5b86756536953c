from .join import broadcast_join  # noqa: F401
from .temporal import asof_join, range_join_count, sessionize  # noqa: F401
