"""PII redaction and fixed-size token chunking — two training-corpus
hygiene/prep stages (new scope beyond the reference, mandated by the
build brief's "operations a large-scale training-data pipeline would
need"). Both are single ``map_batches`` passes: no shuffle, O(batch)
memory, vectorized pandas C-regex / numpy kernels.

Oracle parity: every regex uses ASCII-explicit classes valid and
identical under Python ``re`` and DuckDB's RE2 (no ``\\d``/``\\w``/
``\\b`` whose Unicode/ASCII semantics differ), and the replacement order
is part of the contract — counts are taken on the text as it exists
*before* that pattern's own replacement, exactly as the nested
``regexp_replace`` CTE chain in the SQL oracle."""
from __future__ import annotations

import re

import numpy as np
import pandas as pd

# ASCII-explicit patterns, Python-re <-> RE2 identical. Order matters and
# is part of the operator contract: emails first (an address may embed a
# phone-shaped digit run), then phones, then IPv4 (a dotted phone like
# 555.123.4567 is consumed by the phone pass before the IP pass sees it).
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
IPV4_PAT = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

_STAGES = (
    ("email", re.compile(EMAIL_PAT), "<EMAIL>"),
    ("phone", re.compile(PHONE_PAT), "<PHONE>"),
    ("ip", re.compile(IPV4_PAT), "<IP>"),
)


class RedactPII:
    """documents(text) -> (doc_id, n_emails, n_phones, n_ips,
    text_redacted): mask emails, dotted/dashed US-style phone numbers and
    IPv4 literals with typed placeholder tokens and report per-doc match
    counts.

    100 TB shape: one stateless map_batches pass (patterns compiled once
    per actor at ``__init__``); three pandas C-level ``str.count`` +
    ``str.replace`` sweeps per batch, no Python row loop, no shuffle.
    The count for each stage is taken on the text *before* that stage's
    replacement (and after the previous stages'), mirroring the SQL
    oracle's nested regexp_replace chain token for token."""

    def __init__(self, text_col: str = "text", out_col: str = "text_redacted"):
        self.text_col = text_col
        self.out_col = out_col
        self.stages = _STAGES  # compiled at import; held per actor

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        cur = df[self.text_col].fillna("")
        counts = {}
        for name, pat, repl in self.stages:
            counts[f"n_{name}s"] = cur.str.count(pat).to_numpy().astype(np.int64)
            cur = cur.str.replace(pat, repl, regex=True)
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        for k, v in counts.items():
            out[k] = v
        out[self.out_col] = cur.to_numpy()
        return out


def chunk_documents(
    docs: "ray.data.Dataset",
    chunk_size: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Split each document into fixed-size whitespace-token chunks — the
    sequence-packing prep stage of an LLM training pipeline (documents ->
    bounded-length training samples). Output rows:
    (doc_id, chunk_id, n_tokens, chunk_text) with chunk_id 0-based,
    chunk_text the literal ``' '``-joined token window, and the final
    chunk short (no padding). Zero-token documents produce zero chunks.

    100 TB shape: ONE map_batches pass (a flat-map: each input row
    yields ceil(n_tokens/chunk_size) output rows), no shuffle — chunking
    is embarrassingly parallel and the output streams straight to a
    partitioned Parquet sink. Tokenization is the shared ASCII
    ``[^\\t\\n\\f\\r ]+`` rule (RE2 ``\\S+`` parity), so the whole
    operator is DuckDB-oracle-checkable via list slicing
    (``tk[g*k+1 : g*k+k]``). Vectorized: one token explode, integer
    chunk keys, one pandas groupby-join for the string assembly (the
    join itself is allocation-bound string work, not row iteration)."""
    import pyarrow as pa

    from .quality import _TOK_RE

    k = int(chunk_size)
    if k <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")

    def chunk_batch(df: pd.DataFrame) -> pa.Table:
        texts = df[text_col].fillna("").reset_index(drop=True)
        split = texts.str.findall(_TOK_RE)
        n_tok = split.str.len().to_numpy().astype(np.int64)
        ex = split.explode().dropna()
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
        if not len(ex):
            return empty
        pos = ex.index.to_numpy().astype(np.int64)  # doc position per token
        starts = np.zeros(len(texts), dtype=np.int64)
        if len(n_tok) > 1:
            np.cumsum(n_tok[:-1], out=starts[1:])
        within = np.arange(len(pos), dtype=np.int64) - starts[pos]
        chunk = within // k
        t = pd.DataFrame(
            {
                "_d": df[id_col].to_numpy()[pos],
                "_c": chunk,
                "_t": ex.to_numpy(),
            }
        )
        g = t.groupby(["_d", "_c"], sort=True)
        joined = g["_t"].agg(" ".join)
        sizes = g.size()
        idx = joined.index
        return pa.table(
            {
                id_col: pa.array(idx.get_level_values(0).to_numpy().astype(np.int64)),
                "chunk_id": pa.array(idx.get_level_values(1).to_numpy().astype(np.int64)),
                "n_tokens": pa.array(sizes.to_numpy().astype(np.int64)),
                "chunk_text": pa.array(joined.to_numpy().astype(str)),
            }
        )

    return docs.map_batches(chunk_batch, batch_format="pandas")
