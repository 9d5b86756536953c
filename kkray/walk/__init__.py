from .spec import WalkerSpec, TransitionSpec, Node2vecSpec  # noqa: F401
from .engine import random_walk, assemble_paths  # noqa: F401
from .apps import deepwalk, ppr_walk, metapath_walk, node2vec, mh_walk  # noqa: F401
