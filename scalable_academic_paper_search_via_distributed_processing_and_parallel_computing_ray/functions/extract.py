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
"""

from __future__ import annotations

from html.parser import HTMLParser

EXTRACTOR_VERSION = "htx-1"

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


def html_to_text(html: bytes | str) -> str:
    """Extract visible text from an HTML document, deterministically."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.result()
