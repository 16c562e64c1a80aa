"""Extractor tests: byte-identity per url (BASELINE.json per-row invariant),
determinism, edge cases (SURVEY.md §5.1, §7.4.5)."""

import pyarrow.parquet as pq

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.extract import (
    html_to_text,
    html_to_text_reference,
)


def test_fast_scanner_equals_htmlparser_spec(pages_dir):
    """The regex scanner (production path) must byte-match the HTMLParser
    executable spec over the whole fixture corpus and on edge inputs."""
    import pyarrow.parquet as pq

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.extract import (
        html_to_text,
        html_to_text_reference,
    )
    t = pq.read_table(pages_dir, columns=["html"])
    for h in t["html"].to_pylist():
        assert html_to_text(h) == html_to_text_reference(h)
    for edge in (
        "", "plain text", "a < b>c", "<p>x<p>y", "<P>UPPER</P>",
        "<br/>line<br />two", "<!-- unterminated", "<script>1<2</script>ok",
        "<div class=\"a>b\">quoted gt</div>", "<p>caf&#233; &amp; t&eacute;</p>",
        "<![CDATA[raw]]>after", "<?pi target?>x", "<!DOCTYPE html><p>d</p>",
        "<a href='x>y'>link</a> tail",
    ):
        assert html_to_text(edge) == html_to_text_reference(edge), repr(edge)


def test_fast_scanner_fuzz_structured():
    """Property test: scanner == spec on generated HTML-ish documents
    (tags open/close/void, text runs, entities, comments, attributes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.extract import (
        html_to_text,
        html_to_text_reference,
    )

    tag = st.sampled_from(["p", "div", "b", "span", "li", "h1", "script",
                           "style", "pre", "td", "a"])
    text = st.text(alphabet="ab c\ndé&; .<", max_size=12)
    piece = st.one_of(
        text,
        tag.map(lambda t: f"<{t}>"),
        tag.map(lambda t: f"</{t}>"),
        tag.map(lambda t: f"<{t} class=\"x\">"),
        st.just("<br/>"),
        st.just("<!-- c -->"),
        st.just("&#233;"),
        st.just("&amp;"),
        st.just("<a href='u>v'>"),
    )
    doc = st.lists(piece, max_size=24).map("".join)

    @given(doc)
    @settings(max_examples=250, deadline=None)
    def check(s):
        assert html_to_text(s) == html_to_text_reference(s), repr(s)

    check()


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


def test_fast_scanner_bogus_markup_parity():
    """Deterministic harsh-alphabet fuzz: raw-text terminators with junk,
    spaced / bogus / empty end tags, stray '</' — forms the structured
    generator never produces but real crawled HTML contains.  3 000 docs,
    byte-equality against the HTMLParser spec."""
    import random
    rng = random.Random(7)
    frag = ["<script>", "</script>", "<style>", "</style>", "<b", "</scr",
            "ipt>", ">", "<", "</", "<p>", "</p>", "</ p>", "</p >",
            "</ p x>", "</p x>", "<div>", "&#233;", "&amp;", "text ",
            "a<b ", "</script foo>", "</ script>", "<!-- c -->", "x", " ",
            "\n", '"q"', "'s'", "<br/>", "</scriptty>", "<script src='a'>",
            "</>", "</ >", "</1>", "</&", "<noscript>", "</noscript>",
            "</ noscript>", "<template>", "</template>"]
    for _ in range(3000):
        doc = "".join(rng.choice(frag) for _ in range(rng.randint(1, 16)))
        assert html_to_text(doc) == html_to_text_reference(doc), repr(doc)
