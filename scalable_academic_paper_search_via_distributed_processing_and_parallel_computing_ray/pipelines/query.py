"""Query side: segment reader, exhaustive BM25 scorer, block-max WAND top-k.

Replaces the reference's brute-force full-scan scorer
(``bm25_searcher.py:64-111`` — ``repartition(1)`` + score every doc, then
``orderBy(score desc).limit(10)``) with posting-list traversal:

* :meth:`IndexReader.search_exhaustive` — decode the query terms' postings
  and score them all (NOT the whole corpus).  Serves as the in-engine
  correctness oracle for WAND (SURVEY.md §2.6 O1).
* :meth:`IndexReader.search_wand` — block-max WAND with a bounded min-heap:
  cursors carry per-shard upper bounds (idf * max tf_norm) and per-block
  bounds, so most blocks are skipped without decoding.

A term's postings may live in several (salt, shard) rows; each row becomes
its own cursor — doc sets are disjoint, so correctness is unaffected and
head-term skew never concentrates in one list (SURVEY.md §4.3.1).
"""

from __future__ import annotations

import heapq
import os
from dataclasses import dataclass

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import bm25
from ..functions.codec import EncodedPostings, decode_block
from ..functions.tokenize import tokenize_filtered
from ..state import checkpoint as ckpt

_UB_MARGIN = 1.0 + 1e-5  # float32 block-max bounds -> widen before pruning


@dataclass
class TopkResult:
    doc_id: int
    score: float


class _Cursor:
    """Iterator over one encoded posting shard with next_geq block skipping."""

    __slots__ = ("enc", "idf", "ub", "bi", "ids", "tfs", "pos", "doc", "reader")

    def __init__(self, enc: EncodedPostings, idf: float, max_tfnorm: float, reader):
        self.enc = enc
        self.idf = idf
        self.ub = idf * max_tfnorm * _UB_MARGIN
        self.reader = reader
        self.bi = -1
        self.ids = self.tfs = None
        self.pos = 0
        self.doc = -1
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        if bi >= self.enc.block_first.size:
            self.doc = np.iinfo(np.int64).max  # exhausted sentinel
            return
        self.bi = bi
        self.ids, self.tfs = decode_block(self.enc, bi)
        self.pos = 0
        self.doc = int(self.ids[0])

    @property
    def exhausted(self) -> bool:
        return self.doc == np.iinfo(np.int64).max

    def block_ub(self) -> float:
        """Upper bound of scores within the current block."""
        if self.exhausted:
            return 0.0
        return self.idf * float(self.enc.block_max_tfnorm[self.bi]) * _UB_MARGIN

    def block_last(self) -> int:
        return int(self.enc.block_last[self.bi]) if not self.exhausted else np.iinfo(np.int64).max

    def next_geq(self, target: int) -> None:
        """Advance to the first doc >= target (block skip + in-block seek)."""
        if self.exhausted or self.doc >= target:
            return
        if target > int(self.enc.block_last[self.bi]):
            nbi = int(np.searchsorted(self.enc.block_last, target, side="left"))
            if nbi >= self.enc.block_first.size:
                self.doc = np.iinfo(np.int64).max
                return
            if nbi != self.bi:
                self._load_block(nbi)
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= self.ids.size:  # can only happen in final block
            self._load_block(self.bi + 1)
        else:
            self.doc = int(self.ids[self.pos])

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= self.ids.size:
            self._load_block(self.bi + 1)
        else:
            self.doc = int(self.ids[self.pos])

    def score_current(self, dl: float, avg_dl: float) -> float:
        return self.idf * bm25.tf_norm(float(self.tfs[self.pos]), dl, avg_dl)


class IndexReader:
    """Loads manifest + doc-length table + segment rows for query serving.

    At test scale everything is held in memory (the reference's serving layer
    similarly loads its stats/index at startup, ``api/combined.py:100-126``).
    At 10^12-doc scale the same layout serves via per-shard query actors that
    mmap their segment files and a driver-side k-way heap merge — the
    segment schema (offsets + block metadata) is designed for range reads.
    """

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.manifest = ckpt.read_json(os.path.join(index_dir, "manifest.json"))
        self.n_docs = int(self.manifest["n_docs"])
        self.avg_dl = float(self.manifest["avg_dl"])
        shards_root = os.path.join(index_dir, "shards")
        shard_names = sorted(os.listdir(shards_root))
        # doc-length table: sorted doc_id -> dl (numpy, binary-search lookups)
        ids_parts, dl_parts = [], []
        for s in shard_names:
            t = pq.read_table(os.path.join(shards_root, s, "docs"),
                              columns=["doc_id", "doc_len"])
            ids_parts.append(t["doc_id"].to_numpy())
            dl_parts.append(t["doc_len"].to_numpy())
        ids = np.concatenate(ids_parts) if ids_parts else np.zeros(0, np.int64)
        dls = np.concatenate(dl_parts) if dl_parts else np.zeros(0, np.int32)
        order = np.argsort(ids)
        self._doc_ids = ids[order]
        self._doc_lens = dls[order].astype(np.float64)
        # segments: term -> [(EncodedPostings, max_tfnorm), ...]
        self._postings: dict[str, list[tuple[EncodedPostings, float]]] = {}
        self._df: dict[str, int] = {}
        for s in shard_names:
            t = pq.read_table(os.path.join(shards_root, s, "seg"))
            d = t.to_pydict()
            for i in range(t.num_rows):
                enc = EncodedPostings(
                    df=d["df"][i],
                    doc_bytes=d["doc_bytes"][i],
                    tf_bytes=d["tf_bytes"][i],
                    block_first=np.asarray(d["block_first"][i], np.int64),
                    block_doc_off=np.asarray(d["block_doc_off"][i], np.int32),
                    block_tf_off=np.asarray(d["block_tf_off"][i], np.int32),
                    block_max_tfnorm=np.asarray(d["block_max_tfnorm"][i], np.float32),
                    block_last=np.asarray(d["block_last"][i], np.int64),
                )
                term = d["term"][i]
                self._postings.setdefault(term, []).append((enc, float(d["max_tfnorm"][i])))
                self._df[term] = self._df.get(term, 0) + enc.df

    # ------------------------------------------------------------ helpers --

    def doc_len(self, doc_id: int) -> float:
        i = int(np.searchsorted(self._doc_ids, doc_id))
        return float(self._doc_lens[i])

    def doc_lens_vec(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self._doc_ids, doc_ids)
        return self._doc_lens[idx]

    def idf(self, term: str) -> float:
        return bm25.idf(self.n_docs, self._df.get(term, 0))

    def query_terms(self, query_text: str) -> list[str]:
        """Unique query terms, first-occurrence order.  OOV terms simply have
        no postings (reference dropped them against its 50k vocab,
        ``bm25_searcher.py:52-53`` — observably the same)."""
        seen: dict[str, None] = {}
        for t in tokenize_filtered(query_text):
            seen.setdefault(t, None)
        return list(seen)

    # -------------------------------------------------------- exhaustive ---

    def search_exhaustive(self, query_text: str, k: int = 10,
                          mode: str = "or") -> list[TopkResult]:
        """Decode all query-term postings, score fully, top-k.  Vectorized."""
        terms = [t for t in self.query_terms(query_text) if t in self._postings]
        if not terms:
            return []
        from ..functions.codec import decode_postings
        all_docs, all_scores = [], []
        for t in terms:
            idf_t = self.idf(t)
            docs_t, scores_t = [], []
            for enc, _ in self._postings[t]:
                ids, tfs = decode_postings(enc)
                dls = self.doc_lens_vec(ids)
                docs_t.append(ids)
                scores_t.append(bm25.score_vec(idf_t, tfs, dls, self.avg_dl))
            all_docs.append(np.concatenate(docs_t))
            all_scores.append(np.concatenate(scores_t))
        docs = np.concatenate(all_docs)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(docs, return_inverse=True)
        agg = np.zeros(uniq.size)
        np.add.at(agg, inv, scores)
        if mode == "and":
            nterms = np.zeros(uniq.size, dtype=np.int64)
            np.add.at(nterms, inv, 1)
            keep = nterms == len(terms)
            uniq, agg = uniq[keep], agg[keep]
        order = np.lexsort((uniq, -agg))[:k]
        return [TopkResult(int(uniq[i]), float(agg[i])) for i in order]

    # -------------------------------------------------------------- WAND ---

    def search_wand(self, query_text: str, k: int = 10,
                    mode: str = "or") -> list[TopkResult]:
        """Block-max WAND (disjunctive) / block-skipping intersection (AND)."""
        terms = [t for t in self.query_terms(query_text) if t in self._postings]
        if not terms:
            return []
        cursors: list[_Cursor] = []
        term_of: dict[int, int] = {}
        for ti, t in enumerate(terms):
            idf_t = self.idf(t)
            for enc, mx in self._postings[t]:
                if enc.df:
                    c = _Cursor(enc, idf_t, mx, self)
                    term_of[id(c)] = ti
                    cursors.append(c)
        if mode == "and":
            return self._search_and(cursors, term_of, len(terms), k)
        return self._search_wand_or(cursors, k)

    def _push(self, heap: list, k: int, doc: int, score: float) -> None:
        item = (score, -doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    def _theta(self, heap: list, k: int) -> float:
        return heap[0][0] if len(heap) == k else -1.0

    def _search_wand_or(self, cursors: list[_Cursor], k: int) -> list[TopkResult]:
        heap: list[tuple[float, int]] = []
        INF = np.iinfo(np.int64).max
        while True:
            live = [c for c in cursors if not c.exhausted]
            if not live:
                break
            live.sort(key=lambda c: c.doc)
            theta = self._theta(heap, k)
            # find pivot: smallest prefix whose ub sum exceeds theta
            acc = 0.0
            pivot = -1
            for i, c in enumerate(live):
                acc += c.ub
                if acc > theta:
                    pivot = i
                    break
            if pivot < 0:
                break  # even the sum of all upper bounds can't beat theta
            pivot_doc = live[pivot].doc
            if pivot_doc == INF:
                break
            if live[0].doc == pivot_doc:
                # block-max check: can the current blocks possibly beat theta?
                bub = 0.0
                j = 0
                while j < len(live) and live[j].doc <= pivot_doc:
                    bub += live[j].block_ub()
                    j += 1
                if bub <= theta:
                    # Skip the prefix cursors to the nearest block boundary,
                    # capped by the first doc of any cursor BEYOND the prefix
                    # (docs in between exist only in the bounded blocks, so
                    # they cannot beat theta — BMW candidate selection).
                    boundary = min(live[i].block_last() for i in range(j))
                    target = boundary + 1
                    if j < len(live):
                        target = min(target, live[j].doc)
                    target = max(target, pivot_doc + 1)
                    for i in range(j):
                        live[i].next_geq(target)
                    continue
                dl = self.doc_len(pivot_doc)
                score = 0.0
                for c in live:
                    if c.doc != pivot_doc:
                        break
                    score += c.score_current(dl, self.avg_dl)
                    c.advance()
                self._push(heap, k, pivot_doc, score)
            else:
                # advance, among cursors strictly BEFORE the pivot doc, the
                # one with the largest upper bound (advancing a cursor already
                # at pivot_doc would be a no-op -> livelock)
                best = max((i for i in range(pivot) if live[i].doc < pivot_doc),
                           key=lambda i: live[i].ub)
                live[best].next_geq(pivot_doc)
        out = sorted(heap, key=lambda it: (-it[0], -it[1]))
        return [TopkResult(-d, s) for s, d in out]

    def _search_and(self, cursors: list[_Cursor], term_of: dict[int, int],
                    n_terms: int, k: int) -> list[TopkResult]:
        """Conjunction: a doc qualifies iff every TERM matches (a term's
        shards are disjoint, so per term at most one shard holds the doc)."""
        heap: list[tuple[float, int]] = []
        INF = np.iinfo(np.int64).max
        # per-term cursor groups
        groups: dict[int, list[_Cursor]] = {}
        for c in cursors:
            groups.setdefault(term_of[id(c)], []).append(c)
        if len(groups) < n_terms:
            return []  # some term has no postings at all -> empty intersection
        candidate = 0
        while True:
            # for each term, the min current doc >= candidate
            max_min = -1
            all_have = True
            for g in groups.values():
                for c in g:
                    c.next_geq(candidate)
                term_min = min((c.doc for c in g), default=INF)
                if term_min == INF:
                    return self._finalize(heap)
                max_min = max(max_min, term_min)
                if term_min != candidate:
                    all_have = False
            if candidate != max_min:
                candidate = max_min
                continue
            # verify every term actually has `candidate`
            if all(any(c.doc == candidate for c in g) for g in groups.values()):
                dl = self.doc_len(candidate)
                score = 0.0
                for g in groups.values():
                    for c in g:
                        if c.doc == candidate:
                            score += c.score_current(dl, self.avg_dl)
                self._push(heap, k, candidate, score)
            candidate += 1

    def _finalize(self, heap: list) -> list[TopkResult]:
        out = sorted(heap, key=lambda it: (-it[0], -it[1]))
        return [TopkResult(-d, s) for s, d in out]
