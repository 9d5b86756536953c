"""Text-analysis stages for a large-scale training-data pipeline
(new scope beyond the reference, mandated by the build brief): language ID,
quality scoring, token counting, document fingerprinting. All are
vectorized ``map_batches`` stages; pattern compilation happens once per
actor (stateful-stage pattern)."""
from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..utils import splitmix64

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)  # BPE-ish: words or single punct

# tiny per-language stopword lexicons for the n-gram/stopword heuristic
_LEXICON = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "von", "zu"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans", "que", "avec"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "para", "en", "con"},
}


# ASCII digit and whitespace classes, matching the DuckDB (RE2) oracle
# exactly: the SQL uses [0-9] and RE2's \s == [\t\n\f\r ]. Python's \d/\s
# are Unicode (Nd / all-Unicode-whitespace) and would diverge on non-ASCII
# digits or NBSP-style whitespace — engine and oracle share the ASCII rule.
_DIGIT_RE = re.compile(r"[0-9]")
_WS_RE = re.compile(r"[\t\n\f\r ]")
# uppercase CLASS: ASCII + Latin-1 uppercase ranges — a C-level regex count
# replacing the per-character isupper() loop (documented scope: beyond
# Latin-1 this undercounts; upper_ratio is a heuristic quality signal, not
# an oracle-checked column)
_UPPER_RE = re.compile(r"[A-ZÀ-ÖØ-Þ]")
_TOK_RE = re.compile(r"[^\t\n\f\r ]+")


def _exploded_tokens(texts: pd.Series) -> tuple[pd.Series, np.ndarray]:
    """One C-level explode of whitespace tokens shared by the stats below:
    returns (token Series indexed by doc position, n_words per doc).
    Tokenizes with the ASCII _TOK_RE (RE2 \\S+ parity) — NOT python
    str.split(), whose Unicode whitespace rule diverges from the SQL
    oracles on \\v / NBSP / unicode spaces."""
    split = texts.reset_index(drop=True).str.findall(_TOK_RE)
    n_words = split.str.len().to_numpy()
    ex = split.explode().dropna()
    return ex, n_words


class TokenCount:
    """documents(text) -> +n_tokens_ws (whitespace split; 0 for blank text)
    +n_tokens_re (word-or-punct regex tokens). The whitespace variant is the
    SQL-oracle-comparable one. Both counts are pandas str.count (per-row C
    regex), not python loops."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        df["n_tokens_ws"] = texts.str.count(_TOK_RE).astype(np.int64)
        df["n_tokens_re"] = texts.str.count(_WORD_RE).astype(np.int64)
        return df


class QualityStats:
    """documents(text) -> per-doc quality signals: n_chars, n_words,
    n_digits, mean word length, uppercase ratio, stopword ratio, plus a
    composite [0,1] quality score (monotone in 'looks like prose').

    All kernels are vectorized (pandas C regex counts + one token explode)
    — no per-character python loops. n_digits counts ASCII [0-9] (the
    oracle-parity rule shared across all text ops); uppercase counts the
    Latin-1 uppercase class [A-ZÀ-ÖØ-Þ] — a deliberate Latin-script
    heuristic (one C regex pass), NOT full-Unicode isupper; non-Latin
    scripts contribute 0 to upper_ratio."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        texts = df["text"].fillna("")
        n_chars = texts.str.len().to_numpy()
        n_digits = texts.str.count(_DIGIT_RE).to_numpy()
        n_upper = texts.str.count(_UPPER_RE).to_numpy()
        ex, n_words = _exploded_tokens(texts)
        wl_sum = np.zeros(len(texts), dtype=np.int64)
        stop_hits = np.zeros(len(texts), dtype=np.int64)
        if len(ex):
            pos = ex.index.to_numpy().astype(np.int64)
            np.add.at(wl_sum, pos, ex.str.len().to_numpy().astype(np.int64))
            hits = ex.str.lower().isin(_LEXICON["en"]).to_numpy()
            np.add.at(stop_hits, pos, hits.astype(np.int64))
        nz = np.maximum(n_words, 1)
        mean_wl = np.where(n_words > 0, wl_sum / nz, 0.0)
        stop = np.where(n_words > 0, stop_hits / nz, 0.0)
        out["n_chars"] = n_chars.astype(np.int64)
        out["n_words"] = n_words.astype(np.int64)
        out["n_digits"] = n_digits.astype(np.int64)
        out["mean_word_len"] = mean_wl
        out["upper_ratio"] = np.divide(n_upper, np.maximum(n_chars, 1))
        out["stopword_ratio"] = stop
        # composite: prose-like docs have 3<=mean_wl<=9, low digit/upper share
        wl_term = np.clip(1.0 - np.abs(mean_wl - 5.0) / 5.0, 0, 1)
        digit_term = 1.0 - np.divide(n_digits, np.maximum(n_chars, 1))
        upper_term = 1.0 - out["upper_ratio"].to_numpy()
        out["quality_score"] = (wl_term * digit_term * upper_term).astype(np.float64)
        return out


class QualityFilter:
    """documents(text) -> per-doc keep/drop decision from thresholded
    quality signals (the training-corpus pre-filter shape: cheap C-regex
    counts, one map_batches pass, no shuffle). Every signal reuses a
    SQL-parity formula (length / regexp counts / IEEE int-int division),
    so the whole filter is DuckDB-oracle-checkable:

      n_chars     = len(text)
      n_tokens    = whitespace tokens
      digit_ratio = \\d count / max(n_chars, 1)
      mean_wl     = non-whitespace chars / max(n_tokens, 1)
      keep        = n_chars >= min_chars AND n_tokens >= min_tokens
                    AND digit_ratio <= max_digit_ratio
                    AND min_mean_wl <= mean_wl <= max_mean_wl
    """

    def __init__(
        self,
        min_chars: int = 200,
        min_tokens: int = 20,
        max_digit_ratio: float = 0.3,
        min_mean_wl: float = 2.0,
        max_mean_wl: float = 4.8,
    ):
        self.min_chars = min_chars
        self.min_tokens = min_tokens
        self.max_digit_ratio = max_digit_ratio
        self.min_mean_wl = min_mean_wl
        self.max_mean_wl = max_mean_wl

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        n_chars = texts.str.len().to_numpy().astype(np.int64)
        n_tokens = texts.str.count(_TOK_RE).to_numpy().astype(np.int64)
        n_digits = texts.str.count(_DIGIT_RE).to_numpy().astype(np.int64)
        n_wchars = n_chars - texts.str.count(_WS_RE).to_numpy().astype(np.int64)
        digit_ratio = n_digits / np.maximum(n_chars, 1)
        mean_wl = n_wchars / np.maximum(n_tokens, 1)
        keep = (
            (n_chars >= self.min_chars)
            & (n_tokens >= self.min_tokens)
            & (digit_ratio <= self.max_digit_ratio)
            & (mean_wl >= self.min_mean_wl)
            & (mean_wl <= self.max_mean_wl)
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "digit_ratio": np.round(digit_ratio, 6),
                "mean_wl": np.round(mean_wl, 6),
                "keep": keep.astype(np.int64),
            }
        )


class LangId:
    """documents(text) -> +lang_pred: stopword-lexicon vote (deterministic;
    'und' when no lexicon hits; ties break to the alphabetically first
    language — argmax over sorted columns, same rule as the original
    per-doc loop). One token explode + isin per language: all C-level."""

    def __init__(self):
        self.langs = sorted(_LEXICON)
        self.lex = {k: frozenset(_LEXICON[k]) for k in self.langs}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        ex, _ = _exploded_tokens(texts)
        counts = np.zeros((len(texts), len(self.langs)), dtype=np.int64)
        if len(ex):
            low = ex.str.lower()
            pos = ex.index.to_numpy().astype(np.int64)
            for j, lang in enumerate(self.langs):
                hits = low.isin(self.lex[lang]).to_numpy()
                np.add.at(counts[:, j], pos, hits.astype(np.int64))
        best = np.argmax(counts, axis=1)  # first max wins = sorted-order tie rule
        best_n = counts[np.arange(len(texts)), best]
        langs_arr = np.array(self.langs)
        df["lang_pred"] = np.where(best_n > 0, langs_arr[best], "und")
        return df


class Fingerprint:
    """documents(text) -> +fingerprint: 64-bit polynomial rolling hash of
    the whitespace-normalized text (stable across runs/machines)."""

    B = np.uint64(1000003)
    _POW_CACHE = np.cumprod(np.full(1, 1, dtype=np.uint64))  # grown lazily

    @classmethod
    def _pows(cls, n: int) -> np.ndarray:
        if len(cls._POW_CACHE) < n:
            with np.errstate(over="ignore"):
                p = np.empty(max(n, 1 << 16), dtype=np.uint64)
                p[0] = 1
                np.cumprod(np.full(len(p) - 1, cls.B, dtype=np.uint64), out=p[1:])
                # np.cumprod on uint64 wraps mod 2^64 — exactly what we want
                cls._POW_CACHE = p
        return cls._POW_CACHE

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # whole-batch kernel: normalize + encode via pandas C string ops,
        # ONE flat byte array for the batch, per-doc polynomial sums as
        # uint64 segment reductions (mod-2^64 wrap is the hash arithmetic)
        # — no per-document numpy round-trips
        # ASCII-tokenized canonical form (same _TOK_RE rule as every other
        # text operator — unicode whitespace is token content, not a gap)
        texts = df["text"].fillna("").str.findall(_TOK_RE).str.join(" ")
        enc = texts.str.encode("utf-8")
        lens = enc.str.len().to_numpy().astype(np.int64)
        flat = np.frombuffer(b"".join(enc.tolist()), dtype=np.uint8).astype(np.uint64)
        ends = np.cumsum(lens)
        starts = ends - lens
        with np.errstate(over="ignore"):
            pows = self._pows(int(lens.max(initial=0)) + 1)
            sums = np.zeros(len(lens), dtype=np.uint64)
            if len(flat):
                # byte at global pos g of doc d carries weight B^(end_d-1-g)
                exp = np.repeat(ends, lens) - 1 - np.arange(len(flat), dtype=np.int64)
                nz = lens > 0
                sums[nz] = np.add.reduceat(flat * pows[exp], starts[nz])
            h = np.uint64(0xCBF29CE484222325) * pows[lens] + sums
        df["fingerprint"] = splitmix64(h)
        return df


class RepetitionStats:
    """documents(text) -> Gopher-style intra-document repetition signals
    over whitespace bigrams (training-corpus quality rule: repeated n-gram
    content marks boilerplate/spam): per doc,

      n_bigrams       = max(n_tokens - 1, 0)
      n_dup_bigrams   = n_bigrams - count(distinct bigrams)
      dup_bigram_frac = n_dup_bigrams / max(n_bigrams, 1)   (round 6)
      top_bigram_n    = occurrences of the most frequent bigram
      top_bigram_frac = top_bigram_n / max(n_bigrams, 1)    (round 6)

    One map_batches pass, no shuffle. Tokenization is the shared ASCII
    ``_TOK_RE`` rule (RE2 ``\\S+`` parity); bigrams are the literal
    ``tok[i] + ' ' + tok[i+1]`` strings, so the whole operator is
    DuckDB-oracle-checkable. Vectorized: one token explode, shifted-Series
    concat masked at doc boundaries, one pandas groupby — no per-doc loop."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        ex, n_words = _exploded_tokens(texts)
        n_bigrams = np.maximum(n_words - 1, 0).astype(np.int64)
        n_dup = np.zeros(len(texts), dtype=np.int64)
        top_n = np.zeros(len(texts), dtype=np.int64)
        if len(ex):
            pos = ex.index.to_numpy().astype(np.int64)
            toks = ex.reset_index(drop=True)
            big = (toks + " " + toks.shift(-1)).to_numpy()
            valid = np.zeros(len(pos), dtype=bool)
            if len(pos) >= 2:
                valid[:-1] = pos[:-1] == pos[1:]  # bigram must stay in-doc
            if valid.any():
                counts = (
                    pd.DataFrame({"d": pos[valid], "g": big[valid]})
                    .groupby(["d", "g"], sort=False)
                    .size()
                )
                per_doc = counts.groupby(level=0)
                tot, dis, mx = per_doc.sum(), per_doc.size(), per_doc.max()
                idx = tot.index.to_numpy().astype(np.int64)
                n_dup[idx] = (tot - dis).to_numpy().astype(np.int64)
                top_n[idx] = mx.to_numpy().astype(np.int64)
        denom = np.maximum(n_bigrams, 1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_bigrams": n_bigrams,
                "n_dup_bigrams": n_dup,
                "dup_bigram_frac": np.round(n_dup / denom, 6),
                "top_bigram_n": top_n,
                "top_bigram_frac": np.round(top_n / denom, 6),
            }
        )


def tfidf_top_terms(
    docs: "ray.data.Dataset",
    k: int = 3,
    num_shards: int = 64,
    join_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Per-document top-k terms by tf-idf: score = tf * ln(N / df), with
    tf the in-doc count, df the number of docs containing the token, N the
    corpus size. The keyword-extraction / document-signature shape for a
    training-data pipeline.

    100 TB shape: (doc_id, token, tf) pairs come out of ONE vectorized
    per-batch explode+groupby (each doc is a single row, so per-batch
    counts are complete — a combiner, not a partial); df is one
    token-keyed groupby over those pairs (each pair is distinct per doc,
    so count == document frequency); the idf join is a hash-bucketed
    merge — tf pairs and df rows co-partitioned by ``hash(token) % nb``
    in ONE groupby, merged + scored by a vectorized pandas kernel per
    bucket (never a broadcast — vocabulary grows with the corpus); the
    final per-doc top-k rides grouped_top_k, so at most k rows per doc
    per batch reach the last shuffle. Deterministic tie-break (score
    DESC, token ASC) — SQL-oracle-parity formula (DuckDB: tf * ln(N /
    df) with float division). (Ray 2.49's ``Dataset.join`` is avoided:
    a hash partition receiving zero rows on either side crashes its
    acero finalize, which any token-less corpus hits.)"""
    import ray
    import ray.data  # noqa: F401  (docs is a Dataset)
    import pyarrow as pa

    from ..ops import grouped_top_k

    if join_partitions is None:
        # size join partitions to the CPUs actually available — the join
        # operator pins one shuffle actor per partition, and over-
        # partitioning a small cluster stalls the pipeline
        join_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))
    n_docs = docs.count()

    def tf_pairs(df: pd.DataFrame) -> pa.Table:
        texts = df["text"].fillna("").reset_index(drop=True)
        ex = texts.str.findall(_TOK_RE).explode().dropna()
        if not len(ex):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        pos = ex.index.to_numpy().astype(np.int64)
        t = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()[pos], "token": ex.to_numpy()})
        g = t.groupby(["doc_id", "token"], as_index=False).size()
        return pa.table(
            {
                "doc_id": g["doc_id"].to_numpy().astype("int64"),
                "token": pa.array(g["token"].astype(str)),
                "tf": g["size"].to_numpy().astype("int64"),
            }
        )

    nb = join_partitions
    pairs = docs.map_batches(tf_pairs, batch_format="pandas")

    def tag(side: int, rename: dict | None = None):
        def f(d: pd.DataFrame) -> pd.DataFrame:
            if rename:
                d = d.rename(columns=rename)
            d = d.copy()
            if side == 1:
                d["doc_id"] = np.int64(-1)
                d["tf"] = np.int64(0)
            else:
                d["df"] = np.int64(0)
            d["bucket"] = (pd.util.hash_array(d["token"].to_numpy()) % np.uint64(nb)).astype(
                np.int64
            )
            d["side"] = np.int8(side)
            return d[["doc_id", "token", "tf", "df", "bucket", "side"]]

        return f

    dfreq = pairs.groupby("token").count().map_batches(
        tag(1, {"count()": "df"}), batch_format="pandas"
    )
    tagged = pairs.map_batches(tag(0), batch_format="pandas").union(dfreq)

    def merge_score(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["side"] == 0, ["doc_id", "token", "tf"]]
        right = g.loc[g["side"] == 1, ["token", "df"]]
        m = left.merge(right, on="token", how="inner")
        m["score"] = m["tf"].to_numpy().astype(np.float64) * np.log(
            float(n_docs) / m["df"].to_numpy().astype(np.float64)
        )
        return m[["doc_id", "token", "score"]]

    typed_empty = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "token": pd.Series(dtype="object"),
                "score": pd.Series(dtype="float64"),
            }
        )
    )
    scored = tagged.groupby("bucket").map_groups(merge_score, batch_format="pandas").union(
        typed_empty
    )
    # second typed union AFTER the top-k: its internal groupby emits
    # degenerate blocks on a token-less corpus and the schema is lost again
    return grouped_top_k(
        scored, ["doc_id"], ["score", "token"], k=k, descending=[True, False], num_shards=num_shards
    ).union(typed_empty)


def top_tokens(docs, k: int = 50):
    """Corpus-wide top-k whitespace tokens by count (vocabulary building).

    100 TB shape: per-batch explode + value_counts (combiner — the shuffle
    carries (token, partial_count) rows, not raw tokens), ONE global
    groupby(token).sum, then a per-batch top-k candidate pass so only
    O(k x blocks) rows reach the driver for the final merge. Deterministic
    tie-break: (count DESC, token ASC). Returns a pandas DataFrame."""
    import pyarrow as pa

    def explode_count(df: pd.DataFrame) -> pa.Table:
        # ASCII tokenization (_TOK_RE) matching the RE2 \s+ split in the
        # SQL oracle; Python str.split() would split on Unicode whitespace
        ex = df["text"].fillna("").str.findall(_TOK_RE).explode().dropna()
        vc = ex.value_counts()
        return pa.table(
            {"token": pa.array(vc.index.to_numpy().astype(str)), "n": vc.to_numpy().astype(np.int64)}
        )

    counted = docs.map_batches(explode_count, batch_format="pandas").groupby("token").sum("n")

    def topk_local(df: pd.DataFrame) -> pd.DataFrame:
        if "sum(n)" not in df.columns:  # zero-token corpus: the groupby on
            # an all-empty dataset emits degenerate schema-less blocks
            return pd.DataFrame({"token": pd.Series(dtype=str), "sum(n)": pd.Series(dtype=np.int64)})
        return df.sort_values(["sum(n)", "token"], ascending=[False, True]).head(k)

    cands = counted.map_batches(topk_local, batch_format="pandas").to_pandas()
    if "sum(n)" not in cands.columns:
        cands = pd.DataFrame({"token": pd.Series(dtype=str), "sum(n)": pd.Series(dtype=np.int64)})
    out = cands.sort_values(["sum(n)", "token"], ascending=[False, True]).head(k)
    return out.rename(columns={"sum(n)": "n"}).reset_index(drop=True)[["token", "n"]]


def skipgram_pairs(
    docs: "ray.data.Dataset",
    window: int = 2,
    min_count: int = 1,
) -> "ray.data.Dataset":
    """Corpus-wide skip-gram (center, context) pair counts with a
    symmetric token window — the word2vec/DeepWalk training-corpus prep
    step (the reference's walks exist to feed exactly this consumer;
    here the same operator serves token streams and walk paths alike).
    Output rows: (center, context, n) for every ordered pair of tokens
    at distance 1..window inside one document, n >= min_count.

    100 TB shape: one map_batches pass does the window explode as 2w
    vectorized shifted-Series alignments masked at doc boundaries and
    immediately value_counts them (combiner — the shuffle carries
    (pair, partial_count) rows, never raw token pairs), then ONE
    groupby(center, context).sum. min_count filters after the global
    sum, exactly like word2vec's vocabulary cut."""
    import pyarrow as pa

    w = int(window)
    if w <= 0:
        raise ValueError(f"window must be positive, got {window}")

    def pair_counts(df: pd.DataFrame) -> pa.Table:
        texts = df["text"].fillna("")
        ex, _ = _exploded_tokens(texts)
        empty = pa.table(
            {
                "center": pa.array([], pa.string()),
                "context": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if not len(ex):
            return empty
        pos = ex.index.to_numpy().astype(np.int64)
        toks = ex.to_numpy()
        centers, contexts = [], []
        for off in range(1, w + 1):
            if off >= len(toks):
                break
            valid = pos[:-off] == pos[off:]  # pair must stay in-doc
            a, b = toks[:-off][valid], toks[off:][valid]
            centers.append(a)
            contexts.append(b)
            centers.append(b)  # symmetric window: both directions
            contexts.append(a)
        if not centers:
            return empty
        t = pd.DataFrame({"center": np.concatenate(centers), "context": np.concatenate(contexts)})
        g = t.groupby(["center", "context"], sort=False, as_index=False).size()
        return pa.table(
            {
                "center": pa.array(g["center"].astype(str)),
                "context": pa.array(g["context"].astype(str)),
                "n": g["size"].to_numpy().astype(np.int64),
            }
        )

    summed = docs.map_batches(pair_counts, batch_format="pandas").groupby(["center", "context"]).sum("n")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if "sum(n)" not in df.columns:  # token-less corpus: degenerate block
            return pd.DataFrame(
                {
                    "center": pd.Series(dtype=str),
                    "context": pd.Series(dtype=str),
                    "n": pd.Series(dtype=np.int64),
                }
            )
        out = df.rename(columns={"sum(n)": "n"})
        return out[out["n"] >= min_count][["center", "context", "n"]]

    return summed.map_batches(finalize, batch_format="pandas")
