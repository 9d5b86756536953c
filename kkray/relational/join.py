"""Join primitives (SURVEY.md §2.6: the reference has no general relational
join; the new engine needs them for the url-id map and the relational query
surface).

* ``broadcast_join`` — small side ``ray.put`` once, probed per batch inside
  ``map_batches`` (no shuffle). The default for dimension tables.
* ``consecutive_pairs`` — sort-based self-join on (group, seq+1): sort once,
  emit pairs inside each block, stitch block boundaries driver-side (the
  boundary rows are O(#blocks), not O(rows)). Scales without a hash join.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def broadcast_join(
    big: ray.data.Dataset,
    small_df: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
    small_prefix: str = "",
) -> ray.data.Dataset:
    """Hash-join `big` against an in-memory `small_df`, broadcast once."""
    ref = ray.put(small_df)

    class Probe:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.small, on=on, how=how)

    return big.map_batches(Probe, batch_format="pandas", concurrency=(1, 8))


def consecutive_pairs(
    ds: ray.data.Dataset,
    group: str,
    seq: str,
    value: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Self-join: (src=value[a], dst=value[b]) for every pair of rows in
    the same group with seq[b] == seq[a] + 1 (ALL matches, duplicates
    included — exact SQL `b.seq = a.seq + 1` semantics). Implemented as a
    hash-partitioned Dataset.join on (group, seq).

    num_partitions defaults to the cluster CPU count — the join's
    aggregator pool is one actor per partition, and far more partitions
    than CPUs stalls small clusters."""
    import pyarrow.compute as pc

    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    def as_left(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                group: t.column(group),
                "_k": pc.add(t.column(seq).cast(pa.int64()), 1),
                "src": t.column(value).cast(pa.int64()),
            }
        )

    def as_right(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                group: t.column(group),
                "_k": t.column(seq).cast(pa.int64()),
                "dst": t.column(value).cast(pa.int64()),
            }
        )

    left = ds.map_batches(as_left, batch_format="pyarrow")
    right = ds.map_batches(as_right, batch_format="pyarrow")
    joined = left.join(right, "inner", num_partitions=num_partitions, on=(group, "_k"))
    return joined.select_columns(["src", "dst"])
