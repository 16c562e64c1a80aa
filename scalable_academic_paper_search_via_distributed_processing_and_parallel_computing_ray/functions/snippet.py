"""Query-biased snippet extraction for result serving.

The reference's UI shows each hit's stored title/abstract
(``api/combined.py`` result payloads); a web-page engine has no abstract
column, so the serving layer derives a query-biased snippet from the
stored extracted text instead: the token window with the most DISTINCT
query-term hits (ties: more total hits, then earliest), returned as the
original-text substring.

Pure per-doc function on the serving path (one fetched doc at a time) —
O(tokens) two-pointer sweep, no index support needed.  Token spans come
from running the tokenizer pattern over the ORIGINAL text (offsets must
index into it); each matched token is casefolded for comparison, which
matches the analyzer for everything but exotic non-NFC input (the
analyzer's NFC step changes offsets, so it cannot run first).
"""

from __future__ import annotations

import unicodedata

from .tokenize import _TOKEN_RE, tokenize_filtered


def make_snippet(text: str, query_text: str, width: int = 30,
                 max_chars: int = 300) -> dict:
    """Best ``width``-token window of ``text`` for ``query_text``.

    Returns ``{"snippet": str, "n_hits": int, "n_terms": int}`` —
    ``n_terms`` = distinct query terms present in the window.  Empty text
    or no query terms -> the text head (still a useful display row).
    """
    terms = set(tokenize_filtered(query_text))
    spans = [(m.start(), m.end(),
              unicodedata.normalize("NFC", m.group()).casefold())
             for m in _TOKEN_RE.finditer(text)]
    if not spans or not terms:
        return {"snippet": text[:max_chars], "n_hits": 0, "n_terms": 0}
    hits = [tok in terms for _, _, tok in spans]
    n = len(spans)
    w = min(width, n)
    # two-pointer sweep: maintain per-term counts in the current window
    from collections import Counter
    counts: Counter = Counter()
    total = 0
    for i in range(w):
        if hits[i]:
            counts[spans[i][2]] += 1
            total += 1
    best = (len(counts), total, 0)  # (distinct, total, -start) max; start asc
    best_start = 0
    for start in range(1, n - w + 1):
        out_i, in_i = start - 1, start + w - 1
        if hits[out_i]:
            tok = spans[out_i][2]
            counts[tok] -= 1
            if counts[tok] == 0:
                del counts[tok]
            total -= 1
        if hits[in_i]:
            counts[spans[in_i][2]] += 1
            total += 1
        key = (len(counts), total)
        if key > best[:2]:
            best = (key[0], key[1], -start)
            best_start = start
    lo = spans[best_start][0]
    hi = spans[min(best_start + w, n) - 1][1]
    snippet = text[lo:hi]
    if len(snippet) > max_chars:
        snippet = snippet[:max_chars]
    return {"snippet": snippet, "n_hits": best[1], "n_terms": best[0]}
