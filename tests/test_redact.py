"""PII redaction, token chunking, and deterministic shard assignment —
deterministic kernels + engine-vs-DuckDB parity fuzz (same hostile-input
technique as test_textops_parity_property: the ACTUAL oracle SQL strings
from __ray_entry__.oracle_sql() run against adversarial documents and the
engine must match row-for-row)."""
import pathlib
import sys

import duckdb
import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings, strategies as st

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import __ray_entry__ as _entry

from kkray.ops import shard_assignment, to_pandas_typed
from kkray.textops import RedactPII, chunk_documents

_SQLS = _entry.oracle_sql()


# ---------------------------------------------------------------- redact


def test_redact_pii_known_strings():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "write john.doe+spam@mail.example.org today",
                "call 555-123-4567 or 555.123.4567 now",
                "server at 192.168.0.1 and 999.999.999.999",
                # order contract: the email pass consumes the embedded
                # phone-shaped run, so the phone pass sees nothing
                "a555-123-4567@b.com",
                "no pii here",
                "",
            ],
        }
    )
    out = RedactPII()(df.copy())
    assert out["n_emails"].tolist() == [1, 0, 0, 1, 0, 0]
    assert out["n_phones"].tolist() == [0, 2, 0, 0, 0, 0]
    assert out["n_ips"].tolist() == [0, 0, 2, 0, 0, 0]
    assert out["text_redacted"].tolist() == [
        "write <EMAIL> today",
        "call <PHONE> or <PHONE> now",
        "server at <IP> and <IP>",
        "<EMAIL>",
        "no pii here",
        "",
    ]


# redact fuzz alphabet: PII building blocks so partial/accidental matches
# exercise both regex engines' scan semantics (leftmost, greedy, 'g')
_PII_ALPHABET = list("ab@.-0159 \t\n%+")


@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(_PII_ALPHABET), min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_redact_pii_parity_vs_oracle(ray_session, texts):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(_SQLS["pii_redaction"]).df().sort_values("doc_id").reset_index(drop=True)

    suffix = pd.Series(
        [_entry.PII_SUFFIX_FMT.format(did=i, oct=i % 256) for i in df["doc_id"]],
        index=df.index,
    )
    aug = df.copy()
    aug["text"] = df["text"] + suffix
    got = RedactPII()(aug).sort_values("doc_id").reset_index(drop=True)
    for col in ["n_emails", "n_phones", "n_ips"]:
        assert got[col].astype("int64").tolist() == exp[col].astype("int64").tolist(), (col, texts)
    assert got["text_redacted"].tolist() == exp["text_redacted"].tolist(), texts


# ----------------------------------------------------------------- chunk


def test_chunk_documents_deterministic(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": np.array([7, 8, 9], dtype=np.int64),
            "text": ["t1 t2  t3\tt4 t5", "", "solo"],
        }
    )
    out = (
        chunk_documents(ray.data.from_pandas(df), chunk_size=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [7, 7, 7, 9]
    assert out["chunk_id"].tolist() == [0, 1, 2, 0]
    assert out["n_tokens"].tolist() == [2, 2, 1, 1]
    assert out["chunk_text"].tolist() == ["t1 t2", "t3 t4", "t5", "solo"]


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(list("ab .\t\n") + ["\x0b", " "]), max_size=200),
        min_size=1,
        max_size=6,
    )
)
def test_chunk_documents_parity_vs_oracle(ray_session, texts):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    exp = (
        con.execute(_SQLS["chunk_documents"]).df().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    )
    got = (
        to_pandas_typed(chunk_documents(ray.data.from_pandas(df), chunk_size=_entry.CHUNK_SIZE))
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp), texts
    for col in ["doc_id", "chunk_id", "n_tokens"]:
        assert got[col].astype("int64").tolist() == exp[col].astype("int64").tolist(), (col, texts)
    assert got["chunk_text"].tolist() == exp["chunk_text"].tolist(), texts


def test_chunk_documents_split_invariance(ray_session):
    """Chunking is per-row, so block boundaries must not matter — and
    re-joining the chunks reproduces each doc's canonical token stream."""
    rng = np.random.default_rng(11)
    texts = [" ".join(f"w{rng.integers(0, 50)}" for _ in range(int(n))) for n in rng.integers(0, 150, 40)]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        outs.append(
            chunk_documents(ds, chunk_size=16)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    rejoined = outs[0].groupby("doc_id")["chunk_text"].agg(" ".join)
    for did, text in zip(df["doc_id"], texts):
        toks = " ".join(text.split())
        if toks:
            assert rejoined[did] == toks


# ----------------------------------------------------------------- shard


def test_shard_assignment_matches_oracle_and_is_deterministic(ray_session):
    ids = np.concatenate(
        [
            np.arange(100, dtype=np.int64),
            np.array([2**33, 2**45 + 17, 2**62 - 1, 4294967291, 4294967290], dtype=np.int64),
        ]
    )
    df = pd.DataFrame({"doc_id": ids})
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(_SQLS["shard_assignment"]).df().sort_values("doc_id").reset_index(drop=True)
    got = (
        shard_assignment(ray.data.from_pandas(df).repartition(5), "doc_id", n_shards=_entry.SHARD_N)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ["doc_id", "shard", "pos"]:
        assert got[col].astype("int64").tolist() == exp[col].astype("int64").tolist(), col
    # per-shard positions are a dense 0..k-1 permutation
    for _, g in got.groupby("shard"):
        assert sorted(g["pos"].tolist()) == list(range(len(g)))
