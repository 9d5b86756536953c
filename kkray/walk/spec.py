"""Walk configuration dataclasses — the picklable mirror of the reference's
user-extension surface (SURVEY.md §2.5):

* ``WalkerSpec``  ~ reference ``WalkerConfig`` (include/walk.hpp:147-193):
  walker count + start distribution (equal: walker i starts at ``i % v_num``,
  reference include/walk.hpp:403-411; uniform: include/walk.hpp:413-421; or an
  explicit start-vertex array, the PPR custom-start case src/apps/ppr.cpp:49-66).
* ``TransitionSpec`` ~ reference ``TransitionConfig`` (include/walk.hpp:195-271):
  unnormalized P(e) = extension(w,v) x static(v,e) x dynamic(w,v,e).
  Built-in kinds cover the reference apps (SURVEY.md §2.4): ``truncated``
  (DeepWalk: extension = step>=L ? 0 : 1), ``geometric`` (PPR: extension =
  1-terminate_prob each step), ``metapath`` (0/1 dynamic comp on edge-type
  match with rejection sampling).
* ``Node2vecSpec`` ~ the second-order config (include/walk.hpp:273-363 +
  src/apps/node2vec.hpp:108-202): dynamic = 1/p (return), 1 (common
  neighbour), 1/q (else). On unweighted graphs with 1/p > max(1,1/q) the
  engine uses the reference's outlier-appendix sampling (node2vec.hpp:47-106,
  walk.hpp:981-1014: the return edge gets its own overflow area beside the
  regular deg*ub region); otherwise 1/p folds into the scalar bound.
  Lower bound min(1/p,1,1/q) enables pre-acceptance without the remote
  membership query (the reference's lower-bound optimization,
  walk.hpp:1030-1040).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class WalkerSpec:
    walker_num: int
    start: str | np.ndarray = "equal"  # "equal" | "uniform" | array of start vids
    wid_offset: int = 0  # first walker id (walk-rate epochs carry global ids)


@dataclass
class TransitionSpec:
    kind: str = "truncated"  # "truncated" | "geometric" | "metapath" | "custom"
    length: int = 80  # max steps (edges) for truncated / metapath / custom
    alpha: float = 1.0 - 1.0 / 80  # geometric continue-probability
    weighted: bool = False  # static comp = edge weight (else uniform)
    sampler: str = "cdf"  # "cdf" (searchsorted) | "alias" (O(1) buckets)
    schemes: list = field(default_factory=list)  # metapath: [ [allowed-type bitmask per position] ]
    # --- "custom" kind: the open UDF surface (reference TransitionConfig,
    # include/walk.hpp:195-271: P(e) = extension x static x dynamic).
    # All hooks are VECTORIZED numpy callables shipped to the shard actors:
    #   extension_fn(step, cur) -> continue-probability per walker
    #     (reference extension_comp; None -> step<length ? 1 : 0)
    #   dynamic_fn(step, cur, cand, prev, wstate) -> unnormalized dynamic
    #     component per candidate (reference dynamic_comp; None -> 1);
    #     requires dynamic_ub (reference's validity assert walk.hpp:251-261)
    #   dynamic_ub / dynamic_lb: rejection bounds (dcomp_upperbound /
    #     lowerbound, reference walk.hpp:1030-1040): accept iff
    #     r*ub <= dynamic; pre-accept when r*ub <= lb without calling the
    #     hook. Either may be a SCALAR or a CALLABLE
    #     (vids, out_degree) -> per-vertex array, evaluated once per shard
    #     over its owned range (the reference's per-vertex bound arrays
    #     filled from upperbound_func, walk.hpp:499-536)
    # walker state (reference WalkerConfig hooks, walk.hpp:147-193):
    #   state_init_fn(wid, start) -> int64 state per walker
    #   state_update_fn(wstate, step, cur, cand) -> new state (called once
    #     per ACCEPTED step, matching walker_update_state_func timing)
    extension_fn: object = None
    dynamic_fn: object = None
    dynamic_ub: object = None  # scalar or (vids, outdeg) -> array
    dynamic_lb: object = 0.0  # scalar or (vids, outdeg) -> array
    track_prev: bool = False  # carry previous vertex for dynamic_fn
    state_init_fn: object = None
    state_update_fn: object = None

    def to_dict(self) -> dict:
        if self.kind == "custom":
            if self.dynamic_fn is not None and self.dynamic_ub is None:
                raise ValueError("dynamic_fn requires dynamic_ub (reference walk.hpp:251-261)")
        return {
            "kind": self.kind,
            "length": int(self.length),
            "alpha": float(self.alpha),
            "weighted": bool(self.weighted),
            "sampler": self.sampler,
            "schemes": [[int(m) for m in s] for s in self.schemes],
            "extension_fn": self.extension_fn,
            "dynamic_fn": self.dynamic_fn,
            "dynamic_ub": self.dynamic_ub,
            "dynamic_lb": self.dynamic_lb,
            "track_prev": bool(self.track_prev),
            "state_init_fn": self.state_init_fn,
            "state_update_fn": self.state_update_fn,
        }


@dataclass
class Node2vecSpec:
    p: float = 1.0
    q: float = 1.0
    length: int = 80
    weighted: bool = False
    sampler: str = "cdf"
    # outlier-appendix sampling (reference node2vec.hpp:47-106) whenever
    # 1/p > max(1, 1/q); False folds 1/p into the scalar bound instead
    # (the pre-appendix formulation — kept togglable for A/B benchmarks)
    appendix: bool = True
    # adjacency piggyback: an emigrating walker carries prev's neighbor
    # list when deg(prev) <= adj_cap, so the receiving shard resolves the
    # second-order membership test locally instead of forwarding a query;
    # hubs above the cap fall back to query forwarding. MEASURED on this
    # single-node plasma fabric the extra envelope volume (~(1+deg)x row
    # size) costs more than the one forwarded 48-byte query row it saves
    # (16M-edge A/B: 24.9s pure-forwarding vs 40.0s cap=32), so the
    # default is OFF; the knob exists for high-latency network fabrics
    # where a routed hop costs more than bandwidth.
    adj_cap: int = 0

    def to_dict(self) -> dict:
        return {
            "kind": "node2vec",
            "p": float(self.p),
            "q": float(self.q),
            "length": int(self.length),
            "weighted": bool(self.weighted),
            "sampler": self.sampler,
            "appendix": bool(self.appendix),
            "adj_cap": int(self.adj_cap),
        }
