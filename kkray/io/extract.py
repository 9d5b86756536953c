"""Deterministic text + hyperlink extraction from Common-Crawl-style HTML.

This is NEW scope relative to the reference (it replaces the reference's
``gconverter`` text->binary edge converter, reference src/tools/gconverter.cpp:93-115):
the engine's input is a Parquet table of web pages
``(url, warc_ts, html:binary, text, lang)`` (BASELINE.json input_hint) and the
edge table is derived from the pages.

The extractor is the *parity invariant*: per SURVEY.md §7.4 it must be a
frozen, byte-deterministic pure function of the ``html`` bytes — no bs4/lxml
(version-dependent behavior), only hand-rolled regex passes and stdlib
``urllib.parse`` (stable). Golden outputs are locked in tests/goldens.

Both functions are exposed as vectorized ``map_batches`` stages
(`ExtractText`, `ExtractLinks`) that compile their regexes once per actor
(stateful-stage pattern) and operate on Arrow batches.
"""
from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa

# --- frozen extraction spec (v1) -------------------------------------------
# 1. decode utf-8 with errors="replace"
# 2. drop <script>/<style>/<noscript>/<template> elements and <!-- comments -->
# 3. block-level tags emit a newline, all other tags emit nothing;
#    <br> also emits a newline
# 4. unescape a fixed entity subset (&amp; &lt; &gt; &quot; &#39; &apos;
#    &nbsp;) plus numeric &#NNN; / &#xHH;
# 5. collapse runs of spaces/tabs within a line, strip each line,
#    drop empty lines, join with "\n"

_BLOCK_TAGS = (
    "p|div|br|h1|h2|h3|h4|h5|h6|li|ul|ol|table|tr|td|th|title|head|body|html|"
    "section|article|header|footer|nav|blockquote|pre|hr|form|main|aside|figure|figcaption"
)

_RE_DROP = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_RE_BLOCK = re.compile(r"</?(?:%s)\b[^>]*>" % _BLOCK_TAGS, re.IGNORECASE)
_RE_TAG = re.compile(r"<[^>]*>")
_RE_NUM_ENT = re.compile(r"&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")
_RE_HSPACE = re.compile(r"[ \t\r\f\v]+")
_NAMED_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}


def _unescape(s: str) -> str:
    def num(m: re.Match) -> str:
        body = m.group(1)
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        if 0 < cp < 0x110000 and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
        return "�"

    s = _RE_NUM_ENT.sub(num, s)
    for k, v in _NAMED_ENTITIES.items():
        s = s.replace(k, v)
    return s


def extract_text(html: bytes) -> str:
    """Frozen html->text. Pure function of the bytes; byte-identical output
    per url is the judged invariant (BASELINE.json input_hint)."""
    s = html.decode("utf-8", errors="replace")
    s = _RE_DROP.sub("", s)
    s = _RE_BLOCK.sub("\n", s)
    s = _RE_TAG.sub("", s)
    s = _unescape(s)
    lines = []
    for raw in s.split("\n"):
        line = _RE_HSPACE.sub(" ", raw).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


_RE_HREF = re.compile(
    r"<a\b[^>]*?\bhref\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE | re.DOTALL,
)


def normalize_url(url: str) -> str | None:
    """Canonical url form: lowercase scheme+host, drop fragment, drop default
    port, strip trailing slash on non-root paths, empty path -> '/'.
    Returns None for non-http(s) or malformed urls."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.lower().rstrip(".")
    port = None
    try:
        port = parts.port
    except ValueError:
        return None
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = "%s:%d" % (host, port)
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    return urlunsplit((scheme, host, path, parts.query, ""))


def extract_links(html: bytes, base_url: str) -> list[str]:
    """Frozen html->outlinks: every <a href>, resolved against base_url,
    normalized; order preserved; duplicates preserved (dedup is a separate,
    explicit operator — SURVEY.md §2.6 'set ops')."""
    s = html.decode("utf-8", errors="replace")
    s = _RE_DROP.sub("", s)
    out = []
    for m in _RE_HREF.finditer(s):
        raw = m.group(2) or m.group(3) or m.group(4) or ""
        raw = _unescape(raw).strip()
        if not raw or raw.startswith(("javascript:", "mailto:", "#")):
            continue
        try:
            absu = urljoin(base_url, raw)
        except ValueError:
            continue
        norm = normalize_url(absu)
        if norm is not None:
            out.append(norm)
    return out


_RE_ACLOSE = re.compile(r"</a\s*>", re.IGNORECASE)
_RE_WSPACE = re.compile(r"[ \t\r\n\f\v]+")


def extract_anchors(html: bytes, base_url: str) -> list[tuple[str, str]]:
    """Frozen html->(outlink, anchor_text) pairs (spec v1) — the anchor-text
    corpus of a web link graph (the classic ranking/retrieval training
    signal riding the same hyperlink extraction as ``extract_links``).

    Spec: iterate the SAME ``<a href>`` matches as ``extract_links``
    (one shared href grammar — anchored links are a subset of
    extract_links' output BY CONSTRUCTION; a separate anchor regex can
    backtrack to a different href on malformed unquoted values, found
    by the hostile fuzz); a match yields an anchor only when its
    opening tag closes (`>`) and a `</a>` follows — unclosed ``<a``
    tags contribute no anchor. Href handling is identical to
    ``extract_links`` (unescape, strip, skip empty/javascript:/
    mailto:/#, resolve against base_url, normalize); anchor text =
    the span up to the first ``</a>`` with nested tags stripped,
    entities unescaped, ASCII whitespace runs collapsed to single
    spaces, stripped — empty anchor text (image links) is kept as ''.
    Deterministic pure function of the bytes, same rules as the other
    frozen extractors."""
    s = html.decode("utf-8", errors="replace")
    s = _RE_DROP.sub("", s)
    out: list[tuple[str, str]] = []
    for m in _RE_HREF.finditer(s):
        raw = m.group(2) or m.group(3) or m.group(4) or ""
        raw = _unescape(raw).strip()
        if not raw or raw.startswith(("javascript:", "mailto:", "#")):
            continue
        try:
            absu = urljoin(base_url, raw)
        except ValueError:
            continue
        norm = normalize_url(absu)
        if norm is None:
            continue
        gt = s.find(">", m.end())
        if gt == -1:
            continue  # opening tag never closes: no anchor span
        close = _RE_ACLOSE.search(s, gt + 1)
        if close is None:
            continue  # no </a>: unclosed anchor, no text span
        inner = _RE_TAG.sub("", s[gt + 1 : close.start()])
        anchor = _RE_WSPACE.sub(" ", _unescape(inner)).strip()
        out.append((norm, anchor))
    return out


# --- Ray Data stages --------------------------------------------------------


class ExtractText:
    """map_batches stage: pages(url, html) -> +text. Stateful-actor form so
    regexes/entities are compiled once per actor (SURVEY.md §7.2)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        texts = pa.array([extract_text(h) for h in htmls], type=pa.string())
        if "text" in batch.column_names:
            batch = batch.drop_columns(["text"])
        return batch.append_column("text", texts)


class ExtractLinks:
    """map_batches stage: pages(url, html) -> exploded (src_url, dst_url)
    edge candidates. Explode happens inside the batch via Arrow list
    flatten-equivalent (np.repeat of offsets), not per-row flat_map."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        srcs: list[str] = []
        dsts: list[str] = []
        for u, h in zip(urls, htmls):
            base = normalize_url(u) or u
            links = extract_links(h, base)
            srcs.extend([base] * len(links))
            dsts.extend(links)
        return pa.table({"src_url": pa.array(srcs, pa.string()), "dst_url": pa.array(dsts, pa.string())})


class ExtractAnchors:
    """map_batches stage: pages(url, html) -> exploded (src_url, dst_url,
    anchor) rows via the frozen ``extract_anchors`` spec — the anchor-text
    corpus builder (same explode shape as ExtractLinks)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        srcs: list[str] = []
        dsts: list[str] = []
        anchors: list[str] = []
        for u, h in zip(urls, htmls):
            base = normalize_url(u) or u
            for dst, anchor in extract_anchors(h, base):
                srcs.append(base)
                dsts.append(dst)
                anchors.append(anchor)
        return pa.table(
            {
                "src_url": pa.array(srcs, pa.string()),
                "dst_url": pa.array(dsts, pa.string()),
                "anchor": pa.array(anchors, pa.string()),
            }
        )


def anchor_profiles(pages, k: int = 3):
    """Per-target anchor-text profile: for every linked-to url, the top-k
    (anchor text, count) pairs across all pages linking to it — "what the
    web says about this page", the classic anchor-text retrieval/ranking
    training signal built on ``ExtractAnchors``.

    100 TB shape: the explode stage streams; per-batch (dst, anchor)
    value_counts is a combiner (the shuffle carries partial counts, not
    raw anchor rows); ONE (dst_url, anchor) groupby-sum; the per-dst
    top-k rides grouped_top_k (<= k rows per dst per batch shuffled).
    Tie-break: count DESC, anchor ASC. Returns a Dataset
    (dst_url, anchor, n)."""
    import pandas as pd

    from ..ops import grouped_top_k

    def partial_counts(t: pa.Table) -> pa.Table:
        df = ExtractAnchors()(t).to_pandas()
        g = df.groupby(["dst_url", "anchor"], sort=False, as_index=False).size()
        return pa.table(
            {
                "dst_url": pa.array(g["dst_url"].astype(str)),
                "anchor": pa.array(g["anchor"].astype(str)),
                "n": g["size"].to_numpy().astype(np.int64),
            }
        )

    summed = pages.map_batches(partial_counts, batch_format="pyarrow").groupby(
        ["dst_url", "anchor"]
    ).sum("n")

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        if "sum(n)" not in df.columns:  # anchor-less corpus degenerate block
            return pd.DataFrame(
                {"dst_url": pd.Series(dtype=str), "anchor": pd.Series(dtype=str), "n": pd.Series(dtype=np.int64)}
            )
        return df.rename(columns={"sum(n)": "n"})

    return grouped_top_k(
        summed.map_batches(rename, batch_format="pandas"),
        ["dst_url"],
        ["n", "anchor"],
        k=k,
        descending=[True, False],
    )
