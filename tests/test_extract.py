"""Extractor parity tests — the byte-identical-per-url invariant
(BASELINE.json input_hint; SURVEY.md §7.4 'byte-identical extraction')."""
import pyarrow as pa
import pytest

from kkray.io.extract import extract_links, extract_text, normalize_url
from kkray.io.synth import synth_pages


def test_text_byte_identical_vs_golden():
    t, _ = synth_pages(300, seed=42)
    for i in range(t.num_rows):
        html = t.column("html")[i].as_py()
        assert extract_text(html) == t.column("text")[i].as_py()


def test_text_deterministic_across_calls():
    t, _ = synth_pages(20, seed=7)
    h = t.column("html")[3].as_py()
    assert extract_text(h) == extract_text(h)


def test_text_handles_script_style_entities():
    html = (
        b"<html><head><title>T &amp; t</title><script>if (1<2) {}</script>"
        b"<style>a{}</style></head><body><h1>T &amp; t</h1>"
        b"<p>a &lt;b&gt; &#65;&#x42; &nbsp;c</p><!-- hidden --></body></html>"
    )
    assert extract_text(html) == "T & t\nT & t\na <b> AB c"


def test_text_malformed_utf8_is_deterministic():
    html = b"<p>ok \xff\xfe bad</p>"
    assert extract_text(html) == "ok \ufffd\ufffd bad"


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("HTTP://Example.COM/a/", "http://example.com/a"),
        ("http://example.com:80/a#frag", "http://example.com/a"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x/", "https://example.com:8443/x"),
        ("http://example.com", "http://example.com/"),
        ("ftp://example.com/a", None),
        ("mailto:x@y.z", None),
        ("not a url", None),
    ],
)
def test_normalize_url(raw, expected):
    assert normalize_url(raw) == expected


def test_links_resolution_and_filtering():
    html = (
        b'<a href="/rel">r</a> <a href="http://Other.COM/x/">abs</a> '
        b'<a href="#frag">skip</a> <a href="mailto:a@b.c">skip</a> '
        b"<a href='single.html'>s</a> <a href=bare>b</a> "
        b'<script>var a = "<a href=\\"http://no.com/\\">";</script>'
    )
    got = extract_links(html, "http://base.org/dir/page")
    assert got == [
        "http://base.org/rel",
        "http://other.com/x",
        "http://base.org/dir/single.html",
        "http://base.org/dir/bare",
    ]


def test_synth_links_match_extraction():
    t, meta = synth_pages(120, seed=42)
    got = []
    for i in range(t.num_rows):
        base = normalize_url(t.column("url")[i].as_py())
        got.extend((base, l) for l in extract_links(t.column("html")[i].as_py(), base))
    exp = [(normalize_url(a), normalize_url(b)) for a, b in meta.expected_edges]
    assert got == exp
