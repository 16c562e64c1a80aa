"""Deterministic HTML -> text extraction (pure stdlib, versioned).

The reference has no HTML stage (its inputs are JSONL papers); the
Common-Crawl-style ``input_hint`` introduces it.  The per-row invariant is
*byte-identical extracted text per url* between pipeline, oracle and
re-runs (SURVEY.md §7.4.5), so this is a pure function with no third-party
dependency that could drift.

Contract
--------
* content of ``<script>``, ``<style>``, ``<template>``, ``<noscript>`` and
  comments is dropped;
* block-level elements (``p div h1..h6 li br title tr th td table ul ol
  section article header footer blockquote pre``) separate text blocks;
  inline elements (``b i em strong a span code ...``) do not;
* character/entity references are unescaped;
* within a block, whitespace runs collapse to a single space and the block
  is stripped; empty blocks are dropped; blocks join with ``"\\n"``.

Parity domain: the fast scanner byte-matches the HTMLParser spec over
well-formed markup, raw-text (<script>/<style>) pathologies, and the
bogus-end-tag classes ('</ name junk>', '</>', stray '</') — all asserted
by tests (incl. a 3k-doc harsh-alphabet fuzz).  DEEPER malformed-markup
recovery ('<!-' fragments, '<' inside start-tag attrs, tags unterminated
at EOF) follows the scanner's regex semantics rather than CPython's
recovery heuristics; both sides only disagree about junk characters.
Determinism (same bytes -> same text across pipeline, oracle and re-runs)
is unaffected: every production path, INCLUDING the brute-force BM25
oracle, calls this scanner — ``_TextExtractor`` exists only as the test
spec.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

EXTRACTOR_VERSION = "htx-3"  # htx-3: exact HTMLParser CDATA parity + "</ name>" end tags

_SKIP_CONTENT = {"script", "style", "template", "noscript"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "th", "td",
    "h1", "h2", "h3", "h4", "h5", "h6", "title", "head", "body", "html",
    "section", "article", "header", "footer", "blockquote", "pre",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._blocks: list[str] = []
        self._buf: list[str] = []

    def _flush(self) -> None:
        if self._buf:
            block = " ".join("".join(self._buf).split())
            self._buf.clear()
            if block:
                self._blocks.append(block)

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag in _BLOCK:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _BLOCK:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._buf.append(data)

    def result(self) -> str:
        self._flush()
        return "\n".join(self._blocks)


# --------------------------------------------------------------------------
# Fast scanner: one compiled regex walks the document; text between tag
# matches is buffered per block and entity-unescaped once per block.  Tags
# with quoted attribute values (which may contain '>') are matched by the
# quote-aware alternation.  Semantics mirror _TextExtractor (depth-counted
# skip elements, block flush on block tags); ~3x fewer Python-level calls
# than HTMLParser, which dominated index-build phase 1 (~105us/doc).
# _TextExtractor is kept as the executable spec; tests assert byte-equality
# of both implementations over the whole fixture corpus.
# End-tag semantics mirror html.parser empirically (asserted by the fuzz
# tests): '</name ...>' fires an end tag and consumes to the FIRST '>'
# (quotes do NOT protect; tagfind_tolerant path); '</ name >' (spaces, no
# junk) also fires (endtagfind); '</' + anything else up to '>' is a bogus
# comment consumed SILENTLY (no event — so no block flush, no skip-depth
# change); '</' with no '>' at all is literal text.  Start tags require the
# name immediately after '<' and are quote-aware.
_MARKUP_RE = re.compile(
    r"""<(?:
        !--.*?(?:-->|$)                              # comment
      | !\[CDATA\[.*?(?:\]\]>|$)                     # CDATA
      | ![^>]*>                                      # doctype / other decls
      | \?[^>]*>                                     # processing instruction
      | /(?P<endtag>[a-zA-Z][^\t\n\r\f\ />\x00]*)[^>]*>   # </name [junk]>
      | /\s*(?P<endtag2>[a-zA-Z][-.a-zA-Z0-9:_]*)\s*>    # </ name >
      | /[^>]*>                                      # bogus comment (silent)
      | (?P<tag>[a-zA-Z][a-zA-Z0-9:._-]*)            # start tag
        (?:[^>"']|"[^"]*"|'[^']*')*                  # attrs (quote-aware)
        >
    )""",
    re.S | re.X)


_RAWTEXT = {"script", "style"}  # HTML5 raw-text: only own end tag terminates

# Python 3.11 HTMLParser CDATA machinery: inside <script>/<style> the ONLY
# thing that ends raw-text mode is a full "</ \s* name \s* >" match — a
# candidate with junk before ">" ("</script foo>") is plain raw data, and
# the general _MARKUP_RE must not be used (raw-text like "<b</script>"
# would parse as one tag with "</script" inside its attrs and the real
# terminator would be missed).
_RAW_END = {t: re.compile(rf"</\s*{t}\s*>", re.I) for t in _RAWTEXT}


def _scan_rawtext(html: str, pos: int, tag: str) -> int:
    """Position just past ``tag``'s terminating end tag (len(html) if the
    element never terminates — content to EOF is dropped, like the parser
    left in cdata mode at close())."""
    m = _RAW_END[tag].search(html, pos)
    return m.end() if m else len(html)


def _fast_html_to_text(html: str) -> str:
    blocks: list[str] = []
    buf: list[str] = []
    skip_depth = 0          # <template>/<noscript> nesting (parsed normally)
    pos = 0
    n = len(html)

    def flush() -> None:
        if buf:
            block = " ".join("".join(buf).split())
            buf.clear()
            if block:
                blocks.append(block)

    while pos < n:
        m = _MARKUP_RE.search(html, pos)
        if m is None:
            if skip_depth == 0:
                seg = html[pos:]
                buf.append(unescape(seg) if "&" in seg else seg)
            break
        if m.start() > pos and skip_depth == 0:
            seg = html[pos:m.start()]
            # unescape BEFORE whitespace collapse (like HTMLParser's
            # convert_charrefs) so whitespace-valued refs collapse too
            buf.append(unescape(seg) if "&" in seg else seg)
        pos = m.end()
        end_tag = m.group("endtag") or m.group("endtag2")
        if end_tag is not None:
            end_tag = end_tag.lower()
            if end_tag in _SKIP_CONTENT and skip_depth > 0:
                skip_depth -= 1
            if end_tag in _BLOCK:
                flush()
            continue
        tag = m.group("tag")
        if tag is None:
            continue  # comment / doctype / PI / bogus '</...>' comment
        tag = tag.lower()
        if not m.group(0).endswith("/>"):
            if tag in _RAWTEXT:
                pos = _scan_rawtext(html, pos, tag)
            elif tag in _SKIP_CONTENT:
                skip_depth += 1
        if tag in _BLOCK:
            flush()
    flush()
    return "\n".join(blocks)


def html_to_text(html: bytes | str) -> str:
    """Extract visible text from an HTML document, deterministically."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    return _fast_html_to_text(html)


def html_to_text_reference(html: bytes | str) -> str:
    """HTMLParser-based executable spec (slow path; tests assert equality).

    One contract fix over raw HTMLParser: an unterminated ``<!--`` comment
    runs to EOF and is dropped (HTML5 behavior, matching the scanner) —
    CPython's parser would emit the tail as data on close().
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    pos = 0
    while True:
        i = html.find("<!--", pos)
        if i == -1:
            break
        j = html.find("-->", i + 4)
        if j == -1:
            html = html[:i]
            break
        pos = j + 3
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.result()
