"""kkray — a from-scratch Ray-Data-native link-graph analytics & random-walk
engine in the spirit of KnightKing (SOSP '19, reference at /root/reference).

Design blueprint: /root/repo/SURVEY.md.  All dataflow is expressed as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches; per-partition
CSR graph shards live in long-lived Ray actors (the one place the Dataset
API cannot express the semantics — a shared, reused, mutable index).
"""

__version__ = "0.1.0"
