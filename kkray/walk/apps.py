"""The built-in walker applications (reference SURVEY.md §2.4).

Each mirrors a reference app's configuration in Ray-native form; all run on
an already-built Graph (multiple walks per load, reference README.md:20).
"""
from __future__ import annotations

import numpy as np

from .engine import random_walk
from .spec import Node2vecSpec, TransitionSpec, WalkerSpec


def deepwalk(graph, walker_num: int, length: int = 80, weighted: bool = False, start="equal", seed: int = 42, **kw):
    """Truncated random walk (reference src/apps/deepwalk.hpp:30-47):
    extension = step>=L ? 0 : 1; static = edge weight (or uniform)."""
    return random_walk(
        graph,
        WalkerSpec(walker_num, start),
        TransitionSpec(kind="truncated", length=length, weighted=weighted),
        seed=seed,
        **kw,
    )


def ppr_walk(graph, walker_num: int, terminate_prob: float = 1.0 / 80, weighted: bool = False, start="equal", seed: int = 42, **kw):
    """Personalized-PageRank walk (reference src/apps/ppr.hpp:30-64):
    geometric termination, extension = 1 - terminate_prob every step;
    optional custom start-vertex array (ppr.cpp:49-66)."""
    return random_walk(
        graph,
        WalkerSpec(walker_num, start),
        TransitionSpec(kind="geometric", alpha=1.0 - terminate_prob, length=1 << 30, weighted=weighted),
        seed=seed,
        **kw,
    )


def metapath_walk(graph, walker_num: int, schemes: list[list[int]], length: int = 80, weighted: bool = False, start="equal", seed: int = 42, **kw):
    """Metapath walk (reference src/apps/metapath.hpp:70-128): walker
    carries (scheme_id = wid % S, position); candidate accepted iff its
    edge type is in the scheme's allowed bitmask at the current position
    (0/1 dynamic comp, ub=1 rejection); terminates when step>=L or the
    vertex has no edge of the allowed type (per-vertex type bitmask).

    `schemes`: list of schemes; each scheme is a list of allowed-edge-type
    BITMASKS per position (cyclic)."""
    return random_walk(
        graph,
        WalkerSpec(walker_num, start),
        TransitionSpec(kind="metapath", length=length, weighted=weighted, schemes=schemes),
        seed=seed,
        **kw,
    )


def node2vec(graph, walker_num: int, p: float = 1.0, q: float = 1.0, length: int = 80, weighted: bool = False, start="equal", seed: int = 42, adj_cap: int = 0, **kw):
    """Second-order biased walk (reference src/apps/node2vec.hpp:108-202)."""
    return random_walk(
        graph,
        WalkerSpec(walker_num, start),
        Node2vecSpec(p=p, q=q, length=length, weighted=weighted, adj_cap=adj_cap),
        seed=seed,
        **kw,
    )


def mh_walk(graph, walker_num: int, length: int = 80, start="equal", seed: int = 42, **kw):
    """Metropolis-Hastings uniform-target walk (SURVEY.md §2.4's
    'Metropolis-Hastings-style rejection sampling' surfaced as a
    first-class app): propose a neighbour uniformly, accept with
    probability min(1, deg(u)/deg(v)), REJECT = STAY (the chain re-emits
    the current vertex and the step counts). On a connected undirected
    graph the stationary distribution is UNIFORM over vertices — the
    unbiased-sampling counterpart to the simple walk's deg(v)/2E bias.
    Candidate degrees come from a per-walk routed degree exchange
    (engine.py), so no O(V) structure is broadcast. Unweighted only."""
    return random_walk(
        graph,
        WalkerSpec(walker_num, start),
        TransitionSpec(kind="mh", length=length),
        seed=seed,
        **kw,
    )


def scheme_from_type_sequence(seq: list[int]) -> list[int]:
    """Convenience: a scheme allowing exactly one edge type per position."""
    return [1 << t for t in seq]
