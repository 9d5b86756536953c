from .join import broadcast_join  # noqa: F401
