from .pagerank import pagerank  # noqa: F401
from .components import connected_components  # noqa: F401
from .labelprop import label_propagation  # noqa: F401
from .triangles import (  # noqa: F401
    degree_assortativity,
    local_clustering,
    local_triangle_counts,
    triangle_count,
)
from .hits import hits  # noqa: F401
from .bfs import bfs_distances  # noqa: F401
from .kcore import kcore  # noqa: F401
from .sssp import sssp  # noqa: F401
