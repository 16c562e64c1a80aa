"""Canonical tokenizer + frozen stop-word list.

Single source of truth for BOTH the engine pipeline and the brute-force
oracle, so rank-parity of BM25 results is well defined (SURVEY.md §7.4.1).

Reference semantics (NOT copied, re-specified): Spark ML ``Tokenizer``
(lowercase, split on ``\\s+``) followed by ``StopWordsRemover`` — see
reference ``data_processing/Lexical_indexing/LexicalIndexer.scala:35-42``
and ``bm25_precompute.py:30-31``.  We deviate deliberately (documented,
versioned): NFC-normalize -> casefold -> split on non-word Unicode
boundaries (``\\w+``) -> drop frozen stop-words.  On ASCII corpora this is
equivalent to DuckDB ``regexp_split_to_array(lower(text), '\\W+')`` with
the same stop list, which is what the SQL oracle uses.
"""

from __future__ import annotations

import re
import unicodedata

TOKENIZER_VERSION = "uni-1"

# Frozen, versioned English stop list (deviation from Spark's default list,
# documented in SURVEY.md §7.4.1).  MUST stay in sync with the inline list in
# pipelines/oracle.py:stopword_sql_list() used by the DuckDB oracle.
STOPWORDS: frozenset[str] = frozenset(
    """
    a an and are as at be but by for from has have he her his i if in into is
    it its not of on or she so that the their them they this to was we were
    will with you your
    """.split()
)

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def normalize(text: str) -> str:
    """NFC normalize + casefold (== lower() on ASCII)."""
    return unicodedata.normalize("NFC", text).casefold()


def tokenize(text: str) -> list[str]:
    """All tokens, lowercased, stop-words INCLUDED (doc-length basis differs —
    see ``tokenize_filtered``)."""
    return _TOKEN_RE.findall(normalize(text))


def tokenize_filtered(text: str) -> list[str]:
    """Index-able tokens: lowercased, stop-words removed.  ``doc_len`` is the
    length of THIS list (reference: ``bm25_precompute.py:35-36`` computes
    doc_length over stop-filtered words)."""
    return [t for t in _TOKEN_RE.findall(normalize(text)) if t not in STOPWORDS]
