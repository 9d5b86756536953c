from .builder import Graph, WalkerPool  # noqa: F401
from .partition import degree_aware_boundaries, part_of  # noqa: F401
from .sample import khop_neighbors, khop_neighbors_graph  # noqa: F401
