"""Extractor tests: byte-identity per url (BASELINE.json per-row invariant),
determinism, edge cases (SURVEY.md §5.1, §7.4.5)."""

import pyarrow.parquet as pq

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.extract import (
    html_to_text,
)


def test_byte_identity_full_corpus(pages_dir):
    tbl = pq.read_table(pages_dir, columns=["url", "html", "text"])
    for url, html, want in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist(),
                               tbl["text"].to_pylist()):
        got = html_to_text(html)
        assert got == want, f"extraction not byte-identical for {url}"


def test_determinism_across_runs(pages_dir):
    tbl = pq.read_table(pages_dir, columns=["html"])
    h = tbl["html"][0].as_py()
    assert html_to_text(h) == html_to_text(h) == html_to_text(bytearray(h))


def test_script_style_comment_stripped():
    h = b"<html><body><script>ignored()</script><style>.x{}</style>" \
        b"<!-- nope --><p>kept text</p></body></html>"
    assert html_to_text(h) == "kept text"


def test_entities_unescaped():
    assert html_to_text(b"<p>a &amp; b caf&#233; &lt;tag&gt;</p>") == "a & b caf\xe9 <tag>"


def test_inline_tags_no_break():
    assert html_to_text(b"<p>one <b>two</b> <i>three</i> four</p>") == "one two three four"


def test_block_tags_break():
    assert html_to_text(b"<div>a</div><div>b</div><p>c</p>") == "a\nb\nc"


def test_whitespace_collapse():
    assert html_to_text(b"<p>  a \n\t  b   </p>") == "a b"


def test_malformed_html():
    # unclosed tags, stray angle brackets — must not raise, must keep text
    out = html_to_text(b"<p>start <b>bold <p>next  para</i> 1 < 2 end")
    assert "start bold" in out and "next para" in out


def test_empty_and_nontext():
    assert html_to_text(b"") == ""
    assert html_to_text(b"<html><head><script>x</script></head></html>") == ""
