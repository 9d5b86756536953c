"""Property-based engine-vs-DuckDB parity fuzz for the text operators.

The contract oracles only ever see the synthetic corpus (plain words +
single spaces); this suite drives the SAME oracle SQL strings from
__ray_entry__.oracle_sql() against hostile documents — leading/trailing
tabs and newlines, vertical tabs (token content under RE2's ASCII \\s),
NBSP and unicode digits (NOT whitespace/digits under the shared ASCII
rule), empty and whitespace-only docs — and requires the engine kernels
to match row-for-row. This is what pins the documented ASCII tokenizer
parity to actual inputs rather than to the fixture's character set."""
import pathlib
import sys

import duckdb
import numpy as np
import pandas as pd
import ray
from hypothesis import given, settings, strategies as st

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import __ray_entry__ as _entry

from kkray.ops import to_pandas_typed
from kkray.textops import (
    QualityFilter,
    RepetitionStats,
    TokenCount,
    decontaminate,
    ngram_jaccard_pairs,
    top_tokens,
)

_SQLS = _entry.oracle_sql()

# hostile alphabet: ASCII words/space + tab/newline (RE2 \s) + vertical
# tab (NOT RE2 \s) + NBSP + arabic digit + accented latin + ascii digit
_ALPHABET = list("ab .\t\n") + ["\x0b", " ", "٣", "É", "1"]


def _docs_strategy():
    return st.lists(
        st.text(alphabet=st.sampled_from(_ALPHABET), min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )


def _con_with(df: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register("documents", df)
    return con


@settings(max_examples=10, deadline=None)
@given(texts=_docs_strategy())
def test_token_counts_and_quality_filter_parity(ray_session, texts):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    con = _con_with(df)

    got = TokenCount()(df.copy()).sort_values("doc_id").reset_index(drop=True)
    exp = con.execute(_SQLS["doc_token_counts"]).df().sort_values("doc_id").reset_index(drop=True)
    assert got["n_tokens_ws"].astype("int64").tolist() == exp["n_tokens_ws"].astype("int64").tolist(), texts

    # cross-operator consistency: QualityStats' token explode must agree
    # with TokenCount's regex count (both use the shared ASCII _TOK_RE)
    from kkray.textops import QualityStats

    gots = QualityStats()(df.copy()).sort_values("doc_id").reset_index(drop=True)
    assert gots["n_words"].astype("int64").tolist() == got["n_tokens_ws"].astype("int64").tolist(), texts

    gotq = QualityFilter()(df.copy()).sort_values("doc_id").reset_index(drop=True)
    expq = con.execute(_SQLS["doc_quality_filter"]).df().sort_values("doc_id").reset_index(drop=True)
    for col in ["n_chars", "n_tokens", "keep"]:
        assert gotq[col].astype("int64").tolist() == expq[col].astype("int64").tolist(), (col, texts)
    for col in ["digit_ratio", "mean_wl"]:
        assert np.allclose(gotq[col].to_numpy(), expq[col].to_numpy(), atol=0), (col, texts)


@settings(max_examples=6, deadline=None)
@given(texts=_docs_strategy())
def test_top_tokens_and_ngram_jaccard_parity(ray_session, texts):
    texts = texts + [texts[0]]  # a guaranteed duplicate so pair ops fire
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    con = _con_with(df)
    ds = ray.data.from_pandas(df)

    got = top_tokens(ds, k=50).reset_index(drop=True)
    exp = con.execute(_SQLS["top_tokens"]).df().reset_index(drop=True)
    assert got["token"].tolist() == exp["token"].tolist(), texts
    assert got["n"].astype("int64").tolist() == exp["n"].astype("int64").tolist(), texts

    gotp = (
        to_pandas_typed(ngram_jaccard_pairs(ds, shingle_n=5, threshold=0.5))
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    expp = con.execute(_SQLS["ngram_jaccard_pairs"]).df().sort_values(["a", "b"]).reset_index(drop=True)
    assert gotp[["a", "b"]].astype("int64").values.tolist() == expp[["a", "b"]].astype("int64").values.tolist(), texts
    assert np.allclose(gotp["jaccard"].to_numpy(), expp["jaccard"].to_numpy(), atol=0), texts


@settings(max_examples=6, deadline=None)
@given(texts=_docs_strategy())
def test_tfidf_parity(ray_session, texts):
    from kkray.textops import tfidf_top_terms

    texts = texts + ["a b a", "b b c c c"]  # guaranteed tokens + repeated terms
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    con = _con_with(df)

    got = (
        to_pandas_typed(tfidf_top_terms(ray.data.from_pandas(df)))
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    exp = (
        con.execute(_SQLS["tfidf_top_terms"]).df()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    assert got["doc_id"].astype("int64").tolist() == exp["doc_id"].astype("int64").tolist(), texts
    assert got["token"].tolist() == exp["token"].tolist(), texts
    # the oracle rounds to 6 decimals (as does the contract query)
    assert np.allclose(np.round(got["score"].to_numpy(), 6), exp["score"].to_numpy(), atol=1e-9), texts


def test_tfidf_tokenless_corpus_keeps_schema(ray_session):
    # Dataset.join used to crash acero finalize when a hash partition saw
    # zero rows on a side — any token-less corpus hit it; the bucketed
    # merge must return a typed empty result instead
    from kkray.textops import tfidf_top_terms

    for df in [
        pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype="object")}),
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["  ", "\t\n", ""]}),
    ]:
        out = to_pandas_typed(tfidf_top_terms(ray.data.from_pandas(df)))
        assert len(out) == 0 and list(out.columns) == ["doc_id", "token", "score"]


@settings(max_examples=10, deadline=None)
@given(texts=_docs_strategy())
def test_repetition_stats_parity(ray_session, texts):
    # a guaranteed self-repetitive doc so the dup/top paths always fire
    texts = texts + ["a b a b a b", (texts[0] + " ") * 3]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    con = _con_with(df)

    got = RepetitionStats()(df.copy()).sort_values("doc_id").reset_index(drop=True)
    exp = con.execute(_SQLS["doc_repetition_stats"]).df().sort_values("doc_id").reset_index(drop=True)
    for col in ["n_bigrams", "n_dup_bigrams", "top_bigram_n"]:
        assert got[col].astype("int64").tolist() == exp[col].astype("int64").tolist(), (col, texts)
    for col in ["dup_bigram_frac", "top_bigram_frac"]:
        assert np.allclose(got[col].to_numpy(), exp[col].to_numpy(), atol=0), (col, texts)


@settings(max_examples=6, deadline=None)
@given(texts=_docs_strategy())
def test_decontaminate_parity_and_hashed_mode(ray_session, texts):
    # guarantee >=5-token docs sharing shingles across the mod split: doc 0
    # (bench under %17) gets a long text echoed into two train docs
    long = "w0 w1 w2 w3 w4 w5 w6"
    texts = [long + " " + (texts[0] or "t")] + texts + [long, "x " + long]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    con = _con_with(df)

    train_df = df[df.doc_id % 17 != 0]
    bench_df = df[df.doc_id % 17 == 0]
    train = ray.data.from_pandas(train_df.reset_index(drop=True))
    bench = ray.data.from_pandas(bench_df.reset_index(drop=True))

    got = (
        to_pandas_typed(decontaminate(train, bench, shingle_n=5))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = con.execute(_SQLS["decontaminate_overlap"]).df().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].astype("int64").tolist() == exp["doc_id"].astype("int64").tolist(), texts
    assert got["n_shared"].astype("int64").tolist() == exp["n_shared"].astype("int64").tolist(), texts

    # the hashed (8-byte join key) scale mode must count identically
    goth = (
        to_pandas_typed(decontaminate(train, bench, shingle_n=5, hashed=True))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert goth["doc_id"].astype("int64").tolist() == got["doc_id"].astype("int64").tolist(), texts
    assert goth["n_shared"].astype("int64").tolist() == got["n_shared"].astype("int64").tolist(), texts

    # forcing the shuffle fallback (broadcast_limit=0) must not change
    # either mode's counts
    for hm in (False, True):
        gotf = (
            to_pandas_typed(decontaminate(train, bench, shingle_n=5, hashed=hm, broadcast_limit=0))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert gotf["doc_id"].astype("int64").tolist() == got["doc_id"].astype("int64").tolist(), (hm, texts)
        assert gotf["n_shared"].astype("int64").tolist() == got["n_shared"].astype("int64").tolist(), (hm, texts)


def test_skipgram_pairs_deterministic(ray_session):
    from kkray.textops import skipgram_pairs

    df = pd.DataFrame({"doc_id": np.int64([0, 1]), "text": ["a b a b", "c"]})
    out = (
        to_pandas_typed(skipgram_pairs(ray.data.from_pandas(df), window=2, min_count=1))
        .sort_values(["center", "context"])
        .reset_index(drop=True)
    )
    # "a b a b": dist-1 pairs ab, ba, ab (+reverses), dist-2 aa, bb (+reverses)
    got = {(r.center, r.context): r.n for r in out.itertuples()}
    assert got == {
        ("a", "b"): 3, ("b", "a"): 3,
        ("a", "a"): 2, ("b", "b"): 2,
    }


@settings(max_examples=8, deadline=None)
@given(texts=_docs_strategy())
def test_skipgram_pairs_parity(ray_session, texts):
    from kkray.textops import skipgram_pairs

    texts = texts + ["a b a b a"]  # guarantee pairs above min_count
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    con = _con_with(df)
    got = (
        to_pandas_typed(skipgram_pairs(ray.data.from_pandas(df).repartition(3), window=2, min_count=2))
        .sort_values(["center", "context"])
        .reset_index(drop=True)
    )
    exp = con.execute(_SQLS["skipgram_pairs"]).df().reset_index(drop=True)
    assert got["center"].tolist() == exp["center"].tolist(), texts
    assert got["context"].tolist() == exp["context"].tolist(), texts
    assert got["n"].astype("int64").tolist() == exp["n"].astype("int64").tolist(), texts
