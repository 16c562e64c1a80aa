"""v4 impact-frontier WAND: exact per-block bounds let block-max WAND skip
tied blocks (the v3 cross-doc (max_tf, min_dl) bound could not — BASELINE.md
round-5 "honest scope note"; this closes it), while staying rank-identical
to the exhaustive scorer.

Reference analog: none — the reference scores every doc in one Spark task
(``bm25_searcher.py:104``); impact-ordered block metadata is the standard
Lucene BMW design (LUCENE-4198) rebuilt Ray-Data-native here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    build,
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources.pages import (
    PAGES_SCHEMA,
)


def _pages(rows):
    cols = {n: [] for n in PAGES_SCHEMA.names}
    for did, body in rows:
        cols["doc_id"].append(did)
        cols["url"].append(f"https://x.example/{did}")
        cols["warc_ts"].append(0)
        cols["html"].append(f"<p>{body}</p>".encode())
        cols["text"].append(body)
        cols["lang"].append("en")
    return pa.table(cols, schema=PAGES_SCHEMA)


def _fmt(results):
    return [(r.doc_id, round(r.score, 6)) for r in results]


@pytest.fixture(scope="module")
def tied_idx(ray_session, tmp_path_factory):
    """4 000 byte-identical docs (the replicated-corpus shape that defeated
    the v3 bound) + 8 early high-tf docs that own the true top-k."""
    d = tmp_path_factory.mktemp("tied")
    rows = [(i, "alpha alpha alpha beta gamma") for i in range(1, 9)]
    rows += [(1000 + i, "alpha beta gamma") for i in range(4000)]
    pq.write_table(_pages(rows), d / "p.parquet")
    idx = str(d / "idx")
    build.build_index(str(d), idx,
                      build.BuildParams(num_shards=2, num_salts=2))
    return idx


def test_wand_skips_tied_blocks(tied_idx):
    r = query.IndexReader(tied_idx)
    want = _fmt(r.search_exhaustive("alpha beta", 10))
    got = _fmt(r.search_wand("alpha beta", 10))
    assert got == want
    st = r.last_wand_stats
    assert st is not None and st["blocks_total"] > 40
    # exact bounds: once the heap holds k docs at the tie score, every
    # remaining tied block's ub == theta and is skipped; the suffix-max
    # early-exit then ends traversal.  The v3 bound decoded everything.
    assert st["blocks_decoded"] * 4 < st["blocks_total"], st


def test_or_window_bound_is_per_term_not_per_cursor(ray_session,
                                                    tmp_path_factory):
    """A multi-shard reader holds SEVERAL cursors for one term (one per
    shard/salt stream), but any doc sits in exactly one of them, so the
    OR-mode window bound must sum per-TERM maxima, not per-cursor bounds —
    summing cursors inflates the bound ~(shards x salts)x and kills
    pruning (measured 99%+ blocks decoded on single-term queries over an
    8-shard reader before the aggregation fix)."""
    d = tmp_path_factory.mktemp("orbound")
    # 8 high-tf docs own the top-k; 3000 low-score fillers spread across
    # 4 shards give every shard long prunable tails
    rows = [(i, "kiwi kiwi kiwi kiwi") for i in range(1, 9)]
    rows += [(1000 + i, "kiwi " + "pad " * 10) for i in range(3000)]
    pq.write_table(_pages(rows), d / "p.parquet")
    idx = str(d / "idx")
    build.build_index(str(d), idx,
                      build.BuildParams(num_shards=4, num_salts=2))
    r = query.IndexReader(idx)
    assert _fmt(r.search_wand("kiwi", 8)) == \
        _fmt(r.search_exhaustive("kiwi", 8))
    st = r.last_wand_stats
    assert st["blocks_total"] > 20
    # with the per-term bound, theta (the 8 high-tf docs' tied score)
    # dominates every filler block's exact bound and the tails prune
    assert st["blocks_decoded"] * 2 < st["blocks_total"], st


def test_wand_parity_mixed_lengths(ray_session, tmp_path_factory):
    """Frontier bounds on a corpus with wildly varying doc lengths stay
    rank-identical to exhaustive across modes and k."""
    rng = np.random.RandomState(5)
    vocab = ["red", "blue", "green", "cyan", "plum", "jade"]
    rows = []
    for i in range(600):
        n = int(rng.randint(2, 60))
        rows.append((i + 1, " ".join(rng.choice(vocab, n))))
    d = tmp_path_factory.mktemp("mixed")
    pq.write_table(_pages(rows), d / "p.parquet")
    idx = str(d / "idx")
    build.build_index(str(d), idx,
                      build.BuildParams(num_shards=2, num_salts=2))
    r = query.IndexReader(idx)
    for q in ("red blue", "green cyan plum", "jade", "red red jade"):
        for mode in ("or", "and"):
            for k in (1, 5, 20):
                assert _fmt(r.search_wand(q, k, mode)) == \
                    _fmt(r.search_exhaustive(q, k, mode)), (q, mode, k)


def test_wand_parity_survives_extend(ray_session, tmp_path_factory):
    """Extending the index shifts global avg_dl; frontier bounds are raw
    (tf, dl) pairs so the reader re-derives exact bounds and WAND stays
    rank-identical (the extend-safety property the v2/v3 raw bounds had)."""
    d = tmp_path_factory.mktemp("ext")
    rows = [(i + 1, "apple pear " + "pad " * (i % 7)) for i in range(300)]
    pq.write_table(_pages(rows), d / "a.parquet")
    idx = str(d / "idx")
    build.build_index(str(d / "a.parquet"), idx,
                      build.BuildParams(num_shards=1, num_salts=2))
    rows2 = [(10_000 + i, "apple " + "filler " * 40) for i in range(200)]
    pq.write_table(_pages(rows2), d / "b.parquet")
    build.extend_index(str(d / "b.parquet"), idx, num_new_shards=1)
    r = query.IndexReader(idx)
    for q in ("apple", "apple pear", "pear filler"):
        assert _fmt(r.search_wand(q, 15)) == _fmt(r.search_exhaustive(q, 15))
