"""Curated-corpus pipeline — the composed training-data shape:
quality pre-filter -> exact text dedup (min doc_id wins) -> deterministic
stratified sample per language. Every stage is an existing operator, so
the whole pipeline is DuckDB-oracle-checkable end to end.

Scale notes: the filter is one map_batches pass; the dedup is ONE
grouped-argmin shuffle keyed on text (exact equality, same semantics as
SQL GROUP BY text); the sample rides grouped_top_k so at most k rows per
language per batch reach the final shuffle.
"""
from __future__ import annotations

import pandas as pd
import ray.data

from ..ops import grouped_top_k, stratified_sample
from ..textops import QualityFilter


def curated_corpus(sf_dir: str, k_per_lang: int = 3) -> pd.DataFrame:
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    qf = QualityFilter()

    def keep_rows(df: pd.DataFrame) -> pd.DataFrame:
        mask = qf(df)["keep"].to_numpy().astype(bool)
        return df.loc[mask, ["doc_id", "text", "lang"]]

    kept = docs.map_batches(keep_rows, batch_format="pandas")
    # exact dedup, min doc_id wins, lang rides along (grouped argmin)
    winners = grouped_top_k(kept, ["text"], ["doc_id"], k=1, descending=False)
    sampled = stratified_sample(
        winners.map_batches(lambda df: df[["doc_id", "lang"]], batch_format="pandas"),
        ["lang"],
        "doc_id",
        k=k_per_lang,
    )
    out = sampled.to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["lang", "doc_id"]].sort_values(["lang", "doc_id"]).reset_index(drop=True)
