from .builder import Graph, WalkerPool  # noqa: F401
from .partition import degree_aware_boundaries, part_of  # noqa: F401
from .sample import khop_neighbors  # noqa: F401
