"""Deterministic synthetic Common-Crawl-style page corpus.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
``(url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)``
where ``text`` is the *golden* expected extraction output, constructed
independently from the same content model that renders the HTML — so the
extractor (kkray.io.extract) is genuinely checked, not self-referential.

Link structure embeds (FIXTURES.md §1): hub pages (out-degree >> mean, the
skew case SURVEY.md §4 targets), multiple weakly-connected components of
known membership, triangles, >=1 zero-out-degree sink per component
(walker-termination edge case, reference include/walk.hpp:956-960),
self-links, links that are duplicates after normalization (trailing slash,
fragment, mixed-case host), and external/dangling links.

Everything is keyed by a Philox counter-based RNG — same (n_pages, seed)
-> byte-identical corpus.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..utils import rng_for

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basalt cobalt dune ember flint garnet harbor inlet "
    "jasper krypton lumen meadow nectar onyx prairie quartz russet summit "
    "timber umber vertex willow zenith"
).split()

_LANGS = ["en", "en", "en", "de", "fr", "es"]  # skewed like a real crawl
_HOSTS_PER_COMPONENT = 3


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _url_for(comp: int, idx: int) -> str:
    host = "site%02d-%d.example.com" % (comp, idx % _HOSTS_PER_COMPONENT)
    return "http://%s/page/%d" % (host, idx)


def _denormalize(url: str, variant: int) -> str:
    """Render a link target in a form that normalizes back to `url` —
    exercises normalize_url (trailing slash / fragment / case / default port)."""
    if variant == 1:
        return url + "/"
    if variant == 2:
        return url + "#section-2"
    if variant == 3:
        scheme, rest = url.split("://", 1)
        host, path = rest.split("/", 1)
        return scheme + "://" + host.upper() + "/" + path
    if variant == 4:
        return url.replace(".example.com/", ".example.com:80/", 1)
    return url


@dataclass
class SynthMeta:
    """Ground truth for oracles."""

    n_pages: int
    components: np.ndarray  # component id per page index
    urls: list[str] = field(default_factory=list)
    expected_edges: list[tuple[str, str]] = field(default_factory=list)  # normalized, with duplicates, crawled+external
    # (src, normalized dst, anchor text) per rendered link, in document
    # order — the independent ground truth for the anchor-text extractor
    # (mailto links excluded: the extractor skips them)
    expected_anchors: list[tuple[str, str, str]] = field(default_factory=list)


def synth_pages(n_pages: int = 1000, seed: int = 42, n_components: int = 3) -> tuple[pa.Table, SynthMeta]:
    rng = rng_for(seed, 0xC0FFEE, n_pages)
    bounds = np.linspace(0, n_pages, n_components + 1).astype(int)
    comp_of = np.zeros(n_pages, dtype=np.int64)
    for c in range(n_components):
        comp_of[bounds[c] : bounds[c + 1]] = c

    urls = [_url_for(int(comp_of[i]), i) for i in range(n_pages)]
    meta = SynthMeta(n_pages=n_pages, components=comp_of, urls=urls)

    url_col: list[str] = []
    ts_col: list[int] = []
    html_col: list[bytes] = []
    text_col: list[str] = []
    lang_col: list[str] = []
    base_ts = 1_600_000_000_000_000  # us

    for i in range(n_pages):
        c = int(comp_of[i])
        lo, hi = int(bounds[c]), int(bounds[c + 1])
        size = hi - lo
        prng = rng_for(seed, 0xBADC0DE, i)  # per-page stream
        title = " ".join(_VOCAB[int(j)] for j in prng.integers(0, len(_VOCAB), 3))

        # --- link targets (page indices) ---
        targets: list[int] = []
        is_sink = i == hi - 1  # last page of each component: zero out-degree
        is_hub = i == lo  # first page of each component: hub
        if not is_sink:
            targets.append(lo + (i - lo + 1) % size)  # ring keeps component connected
            if (i - lo) % 5 == 0 and size > 2:
                targets.append(lo + (i - lo + 2) % size)  # chord -> triangles
            n_rand = int(prng.integers(0, 3))
            if is_hub:
                n_rand = min(size - 1, max(10, size // 3))  # hub skew
            targets.extend((lo + prng.integers(0, size, n_rand)).tolist())

        # --- render paragraphs + golden text ---
        text_lines = [title, title]  # <title> line + <h1> line
        paras_html: list[str] = []
        link_urls: list[str] = []
        for t in targets:
            anchor = " ".join(_VOCAB[int(j)] for j in prng.integers(0, len(_VOCAB), 2))
            w1 = _VOCAB[int(prng.integers(0, len(_VOCAB)))]
            w2 = _VOCAB[int(prng.integers(0, len(_VOCAB)))]
            tgt_url = urls[int(t)]
            variant = int(prng.integers(0, 5))
            style = int(prng.integers(0, 3))
            if style == 0:
                href = _denormalize(tgt_url, variant)  # absolute
            elif style == 1:
                href = "/page/%d" % int(t) if (t % _HOSTS_PER_COMPONENT) == (i % _HOSTS_PER_COMPONENT) else _denormalize(tgt_url, variant)
            else:
                href = _denormalize(tgt_url, variant)
            paras_html.append('<p>%s <a href="%s">%s</a> %s &amp; more</p>' % (_esc(w1), _esc(href), _esc(anchor), _esc(w2)))
            text_lines.append("%s %s %s & more" % (w1, anchor, w2))
            link_urls.append(tgt_url)
            meta.expected_anchors.append((urls[i], tgt_url, anchor))
        if is_sink:
            paras_html.append("<p>terminal page %d</p>" % i)
            text_lines.append("terminal page %d" % i)
        # external/dangling + self-link + mailto noise on some pages
        if (i % 11) == 0:
            ext = "http://offsite-%d.external.org/x" % (i % 7)
            paras_html.append('<p>see <a href="%s">elsewhere</a> or <a href="mailto:x@y.z">mail</a></p>' % ext)
            text_lines.append("see elsewhere or mail")
            link_urls.append(ext)
            meta.expected_anchors.append((urls[i], ext, "elsewhere"))
        if (i % 13) == 0:
            paras_html.append('<p>self <a href="%s">loop</a></p>' % _denormalize(urls[i], 2))
            text_lines.append("self loop")
            link_urls.append(urls[i])
            meta.expected_anchors.append((urls[i], urls[i], "loop"))

        html = (
            "<html><head><title>%s</title>"
            "<style>body { margin: 0; }</style>"
            '<script type="text/javascript">var x = 1 < 2;</script>'
            "</head><body><!-- crawl %d --><h1>%s</h1>%s</body></html>"
        ) % (_esc(title), i, _esc(title), "".join(paras_html))

        url_col.append(urls[i])
        ts_col.append(base_ts + i * 1_000_003)
        html_col.append(html.encode("utf-8"))
        text_col.append("\n".join(text_lines))
        lang_col.append(_LANGS[int(prng.integers(0, len(_LANGS)))])
        meta.expected_edges.extend((urls[i], u) for u in link_urls)

    table = pa.table(
        {
            "url": pa.array(url_col, pa.string()),
            "warc_ts": pa.array(ts_col, pa.timestamp("us")),
            "html": pa.array(html_col, pa.binary()),
            "text": pa.array(text_col, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
        }
    )
    return table, meta
