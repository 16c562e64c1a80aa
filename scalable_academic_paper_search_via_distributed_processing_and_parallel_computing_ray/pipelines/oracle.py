"""Brute-force single-process BM25 oracle (FIXTURES.md F3).

Pure Python/numpy loops over the SAME ``extract``/``tokenize``/``bm25``
modules as the engine, so rank-parity is internally well defined
(SURVEY.md §5.2).  Deliberately naive — dicts and per-doc loops — so it
shares no code path with the distributed pipeline beyond the pinned
semantic modules.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from ..functions import bm25
from ..functions.extract import html_to_text
from ..functions.tokenize import tokenize_filtered


@dataclass
class OracleIndex:
    doc_ids: list[int]
    doc_len: dict[int, int]
    tf: dict[int, Counter]          # doc_id -> term -> tf
    df: Counter                     # term -> doc freq
    avg_dl: float
    n_docs: int


def build_oracle_index(docs: dict[int, str], from_html: bool = False) -> OracleIndex:
    """docs: doc_id -> text (or html bytes when from_html)."""
    tf: dict[int, Counter] = {}
    doc_len: dict[int, int] = {}
    df: Counter = Counter()
    for did, body in docs.items():
        text = html_to_text(body) if from_html else body
        toks = tokenize_filtered(text)
        c = Counter(toks)
        tf[did] = c
        doc_len[did] = len(toks)
        for term in c:
            df[term] += 1
    n = len(docs)
    avg_dl = (sum(doc_len.values()) / n) if n else 1.0
    return OracleIndex(sorted(docs), doc_len, tf, df, avg_dl, n)


def oracle_topk(idx: OracleIndex, query_text: str, k: int = 10,
                mode: str = "or",
                allowed: set[int] | None = None) -> list[tuple[int, float]]:
    """[(doc_id, score)] sorted (score desc, doc_id asc), length <= k.

    ``allowed``: metadata filter — only these doc_ids may appear in the
    result.  Scores keep GLOBAL collection statistics (df, avg_dl), the
    same filtered-search semantics as ``IndexReader.search(mask=...)``."""
    qterms: list[str] = []
    for t in tokenize_filtered(query_text):
        if t not in qterms:
            qterms.append(t)
    qterms = [t for t in qterms if idx.df.get(t, 0) > 0]
    if not qterms:
        return []
    scores: dict[int, float] = {}
    hits: dict[int, int] = {}
    for t in qterms:
        idf_t = bm25.idf(idx.n_docs, idx.df[t])
        for did in idx.doc_ids:
            tf_td = idx.tf[did].get(t, 0)
            if tf_td:
                s = idf_t * bm25.tf_norm(tf_td, idx.doc_len[did], idx.avg_dl)
                scores[did] = scores.get(did, 0.0) + s
                hits[did] = hits.get(did, 0) + 1
    items = [(d, s) for d, s in scores.items()
             if (mode != "and" or hits[d] == len(qterms))
             and (allowed is None or d in allowed)]
    items.sort(key=lambda ds: (-ds[1], ds[0]))
    return items[:k]
